"""A/B: ivf_build_fixed's Lloyd chain lazy (materialize=False, current) vs
frozen-per-iteration (materialize=True, the designed checkpoint path).

The lazy plan's final join (stats branch + centroids branch) re-executes the
3-iteration chain per broadcast branch: 9 corpus scans / 7 assignment folds
vs the frozen path's 4 folds across 4 shallow jobs (guide §1.2/§3.3 —
broadcast build sides cannot reuse each other's work).

Interleaved reps (guide §1.3 + this round's host-throttle protocol: only
min-of-reps of interleaved variants is meaningful). Equality is checked
exactly (collected rows) at the bench SF before any timing.

Usage: python tools/r14_lloyd_freeze_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from vers_spark.session import get_spark  # noqa: E402
from vers_spark.sources.tables import load_table  # noqa: E402
from vers_spark.indexes.ivfflat import lloyd_fixed  # noqa: E402


def build_df(spark, sf_dir: str, materialize):
    cents, _ = lloyd_fixed(
        load_table(spark, sf_dir, "embeddings"),
        k=8,
        iters=3,
        seed=42,
        materialize=materialize,
    )
    return cents.select(
        "cluster_id",
        F.posexplode("centroid").alias("dim", "cval"),
        "n_assigned",
        "cost_fp",
    ).orderBy("cluster_id", "dim")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark()

    # exact-equality gate first (frozen f64 round-trip must be bit-identical)
    a = build_df(spark, sf_dir, False).collect()
    for mat in (True, "last"):
        b = build_df(spark, sf_dir, mat).collect()
        assert len(a) == len(b), (len(a), len(b))
        for ra, rb in zip(a, b):
            assert ra == rb, (ra, rb)
    print(f"equality: {len(a)} rows identical across all 3 modes", flush=True)

    times: dict[str, list[float]] = {"lazy": [], "frozen": [], "last": []}
    for rep in range(reps):
        for name, mat in (("lazy", False), ("frozen", True), ("last", "last")):
            spark.sparkContext.setJobDescription(f"lloyd_{name}_rep{rep}")
            t0 = time.perf_counter()
            build_df(spark, sf_dir, mat).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(f"rep{rep} {name:7s} {dt:7.2f}s", flush=True)
    for name, ts in times.items():
        print(f"{name:7s} min={min(ts):7.2f}s  all={['%.2f' % t for t in ts]}")


if __name__ == "__main__":
    main()
