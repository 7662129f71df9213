"""VERDICT r8 item 7: is the 1M LSH recall ceiling the candidate BUDGET or
the GEOMETRY? The reference config (8 trees x max_node 100 ~ 800-candidate
budget) measured recall@10 0.065 / mp2 0.112 / mp4 0.198. One row at
16 trees x max_node 400 (~6400-candidate budget, 8x) answers it: recall
scaling ~ linearly with the budget confirms budget-bound; a plateau says the
hyperplane geometry itself is binding.

Run under tmux with SPARK_GRAFT_DRIVER_MEM=32g (memory playbook).
Index cached at .scale_data/lsh1m_t16_idx for serving reruns.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from pyspark.sql import functions as F

    from vers_spark.indexes.lsh import LSHForestIndex
    from vers_spark.operators.knn import exact_knn_blocked
    from vers_spark.session import get_spark

    spark = get_spark(app_name="lsh1m_t16", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n = 1_000_000
    full = spark.read.parquet(f"{REPO}/.scale_data/emb1m_{n}.parquet")
    corpus = full.filter(F.col("vec_id") < n).repartition(64)
    queries = full.filter(F.col("vec_id") >= n).localCheckpoint()
    out: dict = {"n": n, "trees": 16, "max_node": 400}

    t0 = time.perf_counter()
    gt = {
        (r["query_id"], r["neighbour_id"])
        for r in exact_knn_blocked(queries, corpus, k=10).collect()
    }
    print(f"# ground truth: {time.perf_counter() - t0:.1f}s", flush=True)

    def recall(res_df) -> float:
        hits = {
            (r["query_id"], r["neighbour_id"])
            for r in res_df.select("query_id", "neighbour_id").collect()
        }
        return round(len(hits & gt) / len(gt), 4)

    idx_path = f"{REPO}/.scale_data/lsh1m_t16_idx"
    if not os.path.isdir(idx_path):
        t0 = time.perf_counter()
        lsh = LSHForestIndex.build(corpus, num_trees=16, max_node_size=400, seed=42)
        lsh.leaves.count()
        out["build_sec"] = round(time.perf_counter() - t0, 1)
        print(f"# build: {out['build_sec']}s", flush=True)
        t0 = time.perf_counter()
        lsh.save(idx_path)
        out["save_sec"] = round(time.perf_counter() - t0, 1)
    lsh = LSHForestIndex.load(spark, idx_path)

    t0 = time.perf_counter()
    res = lsh.search(queries, k=10)
    out["recall_at_10"] = recall(res)
    out["search_batch_sec"] = round(time.perf_counter() - t0, 1)
    print(f"# single-probe: {json.dumps(out)}", flush=True)

    for p in (2, 4):
        t0 = time.perf_counter()
        res = lsh.search_multiprobe(queries, k=10, n_probes=p, compute="blocked")
        out[f"mp{p}_recall_at_10"] = recall(res)
        out[f"mp{p}_search_batch_sec"] = round(time.perf_counter() - t0, 1)
        print(f"# mp{p}: {json.dumps(out)}", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
