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

    # end-to-end under the auto default (pack engine) + DPP evidence.
    # collect(), not count(): count() wraps the plan in a NEW QueryExecution
    # whose agg executes instead of res's own — the metrics read below
    # would then come off a never-executed plan and report zeros.
    t0 = time.perf_counter()
    res = lsh.search_multiprobe(queries, k=10, n_probes=4)
    rn = len(res.collect())
    out["multiprobe_p4_end_to_end_s"] = round(time.perf_counter() - t0, 2)
    out["multiprobe_rows"] = rn
    qe = res._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    out["dpp_on_leaf_scan"] = "dynamicpruning" in plan
    probed = lsh._leaf_order_pack(pairs, "margin", 4)
    from vers_spark.indexes.lsh import _pp_of

    buckets = (
        probed.select(
            _pp_of(F.col("tree_id"), F.col("path"), lsh._pp_len()).alias("_pp")
        ).distinct().count()
    )
    total = lsh.leaves.select("tree_id", "_pp").distinct().count()
    out["probed_buckets"] = buckets
    out["total_leaf_partitions"] = total
    out["probed_bucket_ratio"] = round(buckets / max(total, 1), 4)
    # MEASURED prune (ADVICE r12): pull "number of partitions read" off the
    # executed leaf scans, so a planner regression (DPP subquery silently
    # not planted) shows up as a measured full scan, not just a missing
    # plan string. Walks the executed plan through AQE/stage wrappers.
    scanned = _scan_partitions_read(qe.executedPlan(), "lsh1m_idx")
    out["leaf_partitions_scanned"] = scanned
    if scanned:
        # both legs (main + backup fill) scan the store; each is pruned to
        # its probed buckets, so every scan must read <= the probed count
        assert max(scanned) <= buckets, (
            f"DPP regression: a leaf scan read {max(scanned)} partitions, "
            f"> {buckets} probed buckets (total {total})"
        )
    print(json.dumps(out), flush=True)


def _scan_partitions_read(jplan, path_token: str) -> list:
    """Best-effort walk of an executed physical plan (through adaptive /
    query-stage / InMemory wrappers) collecting the `numPartitions` metric
    value of every file scan whose description mentions ``path_token``.
    Returns [] when the metric is unreachable (plan-shape drift across
    Spark versions) — callers treat that as 'no measured evidence', never
    as a pass."""
    found: list = []
    seen: set = set()

    def walk(node) -> None:
        oid = node.hashCode()
        if oid in seen:
            return
        seen.add(oid)
        cls = node.getClass().getSimpleName()
        try:
            if "FileSourceScan" in cls or "BatchScan" in cls:
                if path_token in node.toString():
                    m = node.metrics()
                    if m.contains("numPartitions"):
                        found.append(int(m.apply("numPartitions").value()))
                return
            # wrappers that hide their real subtree outside children()
            if "AdaptiveSparkPlan" in cls:
                walk(node.executedPlan())
            elif "QueryStage" in cls:
                walk(node.plan())
            elif "InMemoryTableScan" in cls:
                walk(node.relation().cachedPlan())
            ch = node.children()
            for i in range(ch.size()):
                walk(ch.apply(i))
            # subqueries (the DPP subquery itself lives here)
            sq = node.subqueries()
            for i in range(sq.size()):
                walk(sq.apply(i))
        except Exception:
            pass

    try:
        walk(jplan)
    except Exception:
        return []
    return found


if __name__ == "__main__":
    main()
