"""Scale evidence for the fingerprint near-dup family (image/audio/video):
band WIDTH, not the join, is what must change at scale.

- 8-bit bands (the sf-scale default: 64-bit dHash as 8x8) collapse on large
  corpora: buckets average n/256 per band, so candidates grow ~n^2/256 —
  quantified here at 100k.
- 16-bit bands (the documented wide path: 16x17 dHash grid / 257 audio
  windows -> 16x16-bit keys) keep buckets ~n/65536 and the SAME
  phash_neardup_pairs join serves 1M fingerprints; pigeonhole still
  guarantees recovery (injected near-copies flip <= 3 of 256 bits, 16 bands
  -> at least 13 untouched).

Fingerprints are hash-derived (deterministic, partitioning-independent);
injected copies at id+10^7 flip 3 fixed bit positions derived from the id.

Usage: python tools/phash_scale_probe.py [n] [band_bits|auto]

"auto" (the default) selects the layout the shipped queries use
(media_codecs.auto_dhash_grid), with phash_neardup_pairs' DEFAULT caps —
i.e. exactly the registered code path at scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from vers_spark.operators.pipeline_queries import phash_neardup_pairs
    from vers_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    sel = sys.argv[2] if len(sys.argv) > 2 else "auto"
    if sel == "auto":
        # the shipped dial (r10): auto_dhash_grid(corpus) -> (rows, cols) =
        # rows bands of cols-1 bits; 1M lands on 16x16-bit
        from vers_spark.operators.media_codecs import auto_dhash_grid

        g_rows, g_cols = auto_dhash_grid(n)
        n_bands, band_bits = g_rows, g_cols - 1
    else:
        band_bits = int(sel)
        n_bands = 16 if band_bits == 16 else 8
    dup_every = 100  # 1% near-copies
    spark = get_spark(app_name="phash_scale", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))

    ids = spark.range(0, n, 1, 64).select(F.col("id").alias("media_id"))
    band_idx = F.sequence(F.lit(0), F.lit(n_bands - 1))
    key = lambda b: F.pmod(  # noqa: E731
        F.xxhash64(F.concat_ws(":", F.lit("fp"), F.col("media_id"), b)),
        F.lit(1 << band_bits),
    ).cast("int")
    base = ids.select("media_id", F.transform(band_idx, key).alias("bands"))
    # near-copies: flip one low bit in 3 id-derived bands (hamming <= 3)
    flip_pos = lambda j: F.pmod(  # noqa: E731
        F.xxhash64(F.concat_ws(":", F.lit(f"flip{j}"), F.col("media_id"))),
        F.lit(n_bands),
    ).cast("int")
    dup_src = ids.filter(F.col("media_id") % dup_every == 0)
    # dup band keys hash from the SOURCE id (same fingerprint), then flip
    # one low bit in 3 id-derived band positions (hamming <= 3)
    dups = (
        dup_src.select(
            F.col("media_id").alias("_src"),
            (F.col("media_id") + 10_000_000).alias("media_id"),
            F.array(*[flip_pos(j) for j in range(3)]).alias("_fl"),
        )
        .withColumn(
            "bands",
            F.transform(
                band_idx,
                lambda b: F.when(
                    F.array_contains("_fl", b.cast("int")),
                    F.pmod(
                        F.xxhash64(F.concat_ws(":", F.lit("fp"), F.col("_src"), b)),
                        F.lit(1 << band_bits),
                    ).cast("int").bitwiseXOR(F.lit(1)),
                ).otherwise(
                    F.pmod(
                        F.xxhash64(F.concat_ws(":", F.lit("fp"), F.col("_src"), b)),
                        F.lit(1 << band_bits),
                    ).cast("int")
                ),
            ),
        )
        .select("media_id", "bands")
    )
    fps = base.unionByName(dups).localCheckpoint()
    n_total = fps.count()
    n_dups = n // dup_every

    max_ham = n_bands - 1
    t0 = time.perf_counter()
    # one materialization for both counts — the join runs ONCE (the two
    # original actions each re-ran the whole candidate pipeline)
    pairs = phash_neardup_pairs(
        fps, max_hamming=max_ham, n_bands=n_bands, n_hint=n_total
    ).localCheckpoint()
    injected_found = (
        pairs.filter(F.col("media_b") == F.col("media_a") + 10_000_000)
        .filter(F.col("media_a") % dup_every == 0)
        .count()
    )
    wall = round(time.perf_counter() - t0, 1)
    n_pairs = pairs.count()
    out = {
        "n": n,
        "n_total_rows": n_total,
        "band_bits": band_bits,
        "n_bands": n_bands,
        "max_hamming": max_ham,
        "n_injected": n_dups,
        "n_injected_found": injected_found,
        "n_pairs_total": n_pairs,
        "join_wall_sec": wall,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
