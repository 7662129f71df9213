"""Quantify the r13 static shard pruning on 1M HNSW serving: build the
§r10/r11 config (64-parent balanced k-means, 12k cap), then measure batch
search walls at batch sizes 1/10/100 with 8-parent probes (the r11 numbers
to compare: search batch 16.6-82.1 s at 100 queries across windows, with
every shard scanned + shuffled into the cogroup regardless of probes).
Also records the probed-shard union size per batch — the pruning's
denominator — and recall@10 vs exact for the 100-query batch."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from pyspark.sql import functions as F

    from vers_spark.indexes.hnsw import HNSWIndex
    from vers_spark.operators.knn import exact_knn
    from vers_spark.session import get_spark

    spark = get_spark(
        app_name="hnsw1m_serve", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    full = spark.read.parquet(f"{REPO}/.scale_data/emb1m_1000000.parquet")
    corpus = full.filter("vec_id < 1000000").withColumnRenamed("vec_id", "id")
    t0 = time.perf_counter()
    hnsw = HNSWIndex.build(
        corpus,
        id_col="id",
        num_layers=12,
        ef_construction=100,
        ef_search=32,
        m=24,
        num_shards=64,
        shard_by="kmeans",
        seed=42,
        max_shard_rows=12000,
    )
    hnsw.graph.count()
    out = {"build_wall_s": round(time.perf_counter() - t0, 1)}
    out["effective_shards"] = int(hnsw.params["num_shards"])

    for bs in (1, 10, 100):
        qb = full.filter(
            (F.col("vec_id") >= 1_000_000) & (F.col("vec_id") < 1_000_000 + bs)
        ).localCheckpoint()
        qb.count()
        walls = []
        for _ in range(3):  # warm-up + 2 measured
            t0 = time.perf_counter()
            res = hnsw.search(qb, k=10, n_probe_shards=8, ef_search="auto")
            n = len(res.collect())
            walls.append(round(time.perf_counter() - t0, 2))
        assert n == bs * 10
        out[f"batch{bs}_walls"] = walls
        out[f"batch{bs}_warm_s"] = min(walls[1:])
    # recall on the 100-query batch
    qb = full.filter(
        (F.col("vec_id") >= 1_000_000) & (F.col("vec_id") < 1_000_100)
    ).localCheckpoint()
    res = hnsw.search(qb, k=10, n_probe_shards=8, ef_search="auto")
    got = {(r["query_id"], r["neighbour_id"]) for r in res.collect()}
    exact = {
        (r["query_id"], r["neighbour_id"])
        for r in exact_knn(
            qb, corpus.withColumnRenamed("id", "vec_id"), k=10
        ).collect()
    }
    out["recall_at_10"] = round(len(got & exact) / len(exact), 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
