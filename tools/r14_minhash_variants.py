"""Round-14 experiment: materialization strategy for the shingle-array
intermediate in minhash_neardup_pairs (guide §1: measure first).

Variants (all compute the identical pair set — same expressions, different
materialization of the (doc_id, shingles array<string>) frame that feeds the
signature aggregate AND both sides of the Jaccard verification):
  cache    — HEAD: .cache() (columnar in-memory; nested arrays suspected
             pathological)
  ckpt     — .localCheckpoint(eager=True) (serialized InternalRows, no
             columnar conversion)
  nocache  — no materialization: 3 recomputes of the row-local chain
  semijoin — no materialization of the corpus arrays; verification
             recomputes arrays ONLY for candidate docs via a broadcast
             semi-join on the (tiny) candidate id set

Each timed with the bench action (.count()) after a sf0.001 JIT warmup,
cache cleared between attempts. Run alternating reps to see noise.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from vers_spark.operators import text_dedup as TD  # noqa: E402
from vers_spark.operators.text_dedup_queries import NEAR_TAIL, _augmented  # noqa: E402
from vers_spark.session import get_spark  # noqa: E402

BAND_SIZE = TD.BAND_SIZE
BAND_POWERS = TD.BAND_POWERS


def _pairs_from_sets(sets: DataFrame, verify_sets: DataFrame | None = None,
                     threshold: float = 0.8, num_hashes: int = 16) -> DataFrame:
    wide = TD._sig_wide(sets, num_hashes, "md5")
    n_bands = num_hashes // BAND_SIZE
    band_structs = [
        F.struct(
            F.lit(j).alias("band_id"),
            sum(
                F.col(f"h{j * BAND_SIZE + k}") * F.lit(BAND_POWERS[k])
                for k in range(BAND_SIZE)
            ).alias("band_key"),
        )
        for j in range(n_bands)
    ]
    bands = wide.select("doc_id", F.explode(F.array(*band_structs)).alias("b")).select(
        "doc_id", "b.band_id", "b.band_key"
    )
    cands = TD.band_candidates(bands, max_bucket=None)
    return TD.jaccard_verify(cands, verify_sets if verify_sets is not None else sets, threshold)


def v_cache(docs):
    sets = TD.shingle_array(docs, 3).cache()
    return _pairs_from_sets(sets)


def v_ckpt(docs):
    sets = TD.shingle_array(docs, 3).localCheckpoint(eager=True)
    return _pairs_from_sets(sets)


def v_nocache(docs):
    sets = TD.shingle_array(docs, 3)
    return _pairs_from_sets(sets)


def v_semijoin(docs):
    sets = TD.shingle_array(docs, 3)
    wide = TD._sig_wide(sets, 16, "md5")
    n_bands = 16 // BAND_SIZE
    band_structs = [
        F.struct(
            F.lit(j).alias("band_id"),
            sum(
                F.col(f"h{j * BAND_SIZE + k}") * F.lit(BAND_POWERS[k])
                for k in range(BAND_SIZE)
            ).alias("band_key"),
        )
        for j in range(n_bands)
    ]
    bands = wide.select("doc_id", F.explode(F.array(*band_structs)).alias("b")).select(
        "doc_id", "b.band_id", "b.band_key"
    )
    cands = TD.band_candidates(bands, max_bucket=None).localCheckpoint(eager=True)
    cand_ids = cands.select(F.col("doc_a").alias("doc_id")).union(
        cands.select(F.col("doc_b"))
    ).distinct()
    docs_small = docs.join(F.broadcast(cand_ids), "doc_id", "left_semi")
    sets_small = TD.shingle_array(docs_small, 3)
    return TD.jaccard_verify(cands, sets_small, 0.8)


VARIANTS = {"cache": v_cache, "ckpt": v_ckpt, "nocache": v_nocache, "semijoin": v_semijoin}


def main():
    spark = get_spark(app_name="r14_minhash_variants", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = (sys.argv[1].split(",") if len(sys.argv) > 1 else list(VARIANTS))
    reps = int(os.environ.get("REPS", "3"))

    # JIT warmup at sf0.001
    for name in names:
        docs = _augmented(spark, "/root/testdata/sf0.001", 7, NEAR_TAIL)
        VARIANTS[name](docs).count()
        spark.catalog.clearCache()

    results = {n: [] for n in names}
    counts = {}
    for r in range(reps):
        for name in names:
            docs = _augmented(spark, sf_dir, 7, NEAR_TAIL)
            spark.sparkContext.setJobDescription(f"minhash-variant {name} rep{r}")
            t0 = time.perf_counter()
            c = VARIANTS[name](docs).count()
            dt = round(time.perf_counter() - t0, 3)
            results[name].append(dt)
            counts[name] = c
            spark.catalog.clearCache()
            try:
                jmap = spark.sparkContext._jsc.getPersistentRDDs()
                for rid in list(jmap.keySet().toArray()):
                    jmap.get(rid).unpersist(False)
            except Exception:
                pass
            print(f"# rep{r} {name}: {dt}s rows={c}", file=sys.stderr)
    print({n: (min(v), v) for n, v in results.items()}, "counts:", counts)


if __name__ == "__main__":
    main()
