"""VERDICT r11 item 2: attest the _leaf_order_pack engine's 1M claim.

The pack engine shipped in the final r11 commit with sf0.1 parity gates but
no 1M measurement; BASELINE §r11's LSH table still attributed the 41-83 s
leaf-enumeration term to "untouched r9 code". This A/B runs BOTH engines on
the SAME warm 100-query batch against the saved reference-config forest
(1M x 300-dim, T=8, max_node 100, ~126k leaves, depth <= 24):

  - pack vs frontier leaf-order enumeration wall time (P=2 and P=4),
  - probed-set equality (the engines must enumerate identical
    (query, tree, path) rows — the parity contract at scale),
  - full search_multiprobe end-to-end under the auto default (pack),
  - the r12 DPP evidence: dynamicpruning on the saved leaf store's scan
    plus probed-bucket count vs total leaf partitions (the prune ratio).

Run uncontended (no concurrent pytest/bench) under local[32].
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
    from vers_spark.session import get_spark

    spark = get_spark(app_name="lsh1m_pack_ab", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    full = spark.read.parquet(f"{REPO}/.scale_data/emb1m_1000000.parquet")
    queries = full.filter(F.col("vec_id") >= 1_000_000).localCheckpoint()
    nq = queries.count()
    lsh = LSHForestIndex.load(spark, f"{REPO}/.scale_data/lsh1m_idx")
    out: dict = {"n_queries": nq, "n_leaf_paths": lsh._n_leaf_paths()}

    t0 = time.perf_counter()
    pack = lsh._planes_pack()
    out["pack_build_s"] = round(time.perf_counter() - t0, 2)
    assert pack is not None, "pack exceeded cap — A/B needs the packed engine"

    qp = lsh.assign_paths(queries, "vec_id", "embedding").localCheckpoint()
    qp.count()
    pairs = qp.select("query_id", "tree_id", "q_vec").localCheckpoint()
    pairs.count()

    for P in (2, 4):
        for _ in range(2):  # warm then measured
            t0 = time.perf_counter()
            got_pack = lsh._leaf_order_pack(pairs, "margin", P)
            n_pack = got_pack.count()
            t_pack = time.perf_counter() - t0
        for _ in range(2):
            t0 = time.perf_counter()
            got_fr = lsh._leaf_order_frontier(pairs, lsh.leaves, "margin", P)
            n_fr = got_fr.count()
            t_fr = time.perf_counter() - t0
        a = {tuple(r) for r in got_pack.select("query_id", "tree_id", "path").collect()}
        b = {tuple(r) for r in got_fr.select("query_id", "tree_id", "path").collect()}
        out[f"P{P}"] = {
            "pack_s": round(t_pack, 2),
            "frontier_s": round(t_fr, 2),
            "rows_pack": n_pack,
            "rows_frontier": n_fr,
            "probed_sets_identical": a == b,
        }
        print(f"P={P}: pack {t_pack:.2f}s frontier {t_fr:.2f}s identical={a == b}", flush=True)

    # end-to-end under the auto default (pack engine) + DPP evidence
    t0 = time.perf_counter()
    res = lsh.search_multiprobe(queries, k=10, n_probes=4)
    rn = res.count()
    out["multiprobe_p4_end_to_end_s"] = round(time.perf_counter() - t0, 2)
    out["multiprobe_rows"] = rn
    plan = res._jdf.queryExecution().executedPlan().toString()
    out["dpp_on_leaf_scan"] = "dynamicpruning" in plan
    probed = lsh._leaf_order_pack(pairs, "margin", 4)
    from vers_spark.indexes.lsh import _pp_of

    buckets = (
        probed.select("tree_id", _pp_of(F.col("path")).alias("_pp")).distinct().count()
    )
    total = lsh.leaves.select("tree_id", "_pp").distinct().count()
    out["probed_buckets"] = buckets
    out["total_leaf_partitions"] = total
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
