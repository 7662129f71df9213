"""Quantify the r13 probe-side-broadcast fix on 1M IVF saved-store serving:
build the reference config (k=20, 3 attempts, 10 iters), save, reload, and
measure the declarative search at batch 1/10/100 with n_probes=4, recording
the runtime partitions-read metric off the posting-list scan (the fix's
whole point: pre-r13 Spark broadcast the posting lists and the DPP subquery
degenerated, so the scan read every cluster partition)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from pyspark.sql import functions as F

    from vers_spark.indexes.ivfflat import IVFFlatIndex
    from vers_spark.plans import audit
    from vers_spark.session import get_spark

    spark = get_spark(
        app_name="ivf1m_saved", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    full = spark.read.parquet(f"{REPO}/.scale_data/emb1m_1000000.parquet")
    corpus = full.filter("vec_id < 1000000")
    path = f"{REPO}/.scale_data/ivf1m_idx"
    out: dict = {}
    if not os.path.isdir(path):
        t0 = time.perf_counter()
        idx = IVFFlatIndex.build(
            corpus, num_clusters=20, num_attempts=3, max_iterations=10, seed=42
        )
        idx.save(path)
        out["build_save_s"] = round(time.perf_counter() - t0, 1)
    lsh = IVFFlatIndex.load(spark, path)
    total = lsh.assignments.select("cluster_id").distinct().count()
    out["clusters"] = total
    for bs in (1, 10, 100):
        qb = full.filter(
            (F.col("vec_id") >= 1_000_000) & (F.col("vec_id") < 1_000_000 + bs)
        ).localCheckpoint()
        qb.count()
        walls = []
        res = None
        for _ in range(3):
            t0 = time.perf_counter()
            res = lsh.search(qb, k=10, n_probes=4)
            n = len(res.collect())
            walls.append(round(time.perf_counter() - t0, 2))
        assert n == bs * 10
        scans = [
            s
            for s in audit.scan_runtime_metrics(res, "cluster_id#")
            if "numPartitions" in s
        ]
        out[f"batch{bs}"] = {
            "warm_s": min(walls[1:]),
            "walls": walls,
            "partitions_read": scans,
        }
        print(f"bs={bs}: {out[f'batch{bs}']}", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
