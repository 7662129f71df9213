"""Warm-alternating multiprobe serving probe at the 1M saved store, plus a
debug dump of the executed-plan scan metrics (which scans exist, what each
reports for numFiles/numPartitions). Complements lsh1m_pack_ab.py: that
tool's end-to-end line is a single cold sample; deployment serves warm, so
the alternating P=4/P=2 walls here are the recordable numbers (same
methodology as the r12 review's follow-up)."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
REPO = "/root/repo"


def dump_scans(jplan, out=None, seen=None):
    """Walk the executed plan, printing every scan node's class + metrics.
    The seen-set guard matters: reused exchanges make the executed DAG a
    graph, and an unguarded walk re-expands shared subtrees exponentially."""
    if out is None:
        out, seen = [], set()
    try:
        oid = jplan.hashCode()
        if oid in seen:
            return out
        seen.add(oid)
        cls = jplan.getClass().getSimpleName()
    except Exception:
        return out
    if "FileSourceScan" in cls or "BatchScan" in cls:
        row = {"cls": cls, "desc": jplan.toString()[:120].replace("\n", " ")}
        try:
            m = jplan.metrics()
            for key in ("numFiles", "numPartitions", "numOutputRows", "filesSize"):
                if m.contains(key):
                    row[key] = int(m.apply(key).value())
        except Exception as e:
            row["metrics_err"] = str(e)[:80]
        out.append(row)
        return out
    if "AdaptiveSparkPlan" in cls:
        try:
            dump_scans(jplan.executedPlan(), out, seen)
        except Exception:
            pass
    elif "QueryStage" in cls:
        try:
            dump_scans(jplan.plan(), out, seen)
        except Exception:
            pass
    try:
        ch = jplan.children()
        for i in range(ch.size()):
            dump_scans(ch.apply(i), out, seen)
    except Exception:
        pass
    try:
        sq = jplan.subqueries()
        for i in range(sq.size()):
            dump_scans(sq.apply(i), out, seen)
    except Exception:
        pass
    return out


def main():
    from pyspark.sql import functions as F

    from vers_spark.indexes.lsh import LSHForestIndex
    from vers_spark.session import get_spark

    spark = get_spark(app_name="lsh1m_warm", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    full = spark.read.parquet(f"{REPO}/.scale_data/emb1m_1000000.parquet")
    queries = full.filter(F.col("vec_id") >= 1_000_000).localCheckpoint()
    queries.count()
    lsh = LSHForestIndex.load(spark, f"{REPO}/.scale_data/lsh1m_idx")
    t0 = time.perf_counter()
    assert lsh._planes_pack() is not None
    print(f"pack_build {time.perf_counter() - t0:.1f}s", flush=True)

    walls = {}
    res = None
    for label, P in [("warm_p4", 4), ("p2_a", 2), ("p4_a", 4), ("p2_b", 2), ("p4_b", 4)]:
        t0 = time.perf_counter()
        res = lsh.search_multiprobe(queries, k=10, n_probes=P)
        # collect, not count: metrics below must come off THIS DataFrame's
        # executed QueryExecution (count() plans a separate agg query)
        n = len(res.collect())
        walls[label] = round(time.perf_counter() - t0, 1)
        print(f"{label} P={P}: {walls[label]}s ({n} rows)", flush=True)

    scans = dump_scans(res._jdf.queryExecution().executedPlan())
    for s in scans:
        print(json.dumps(s), flush=True)
    print(json.dumps({"walls": walls}), flush=True)


if __name__ == "__main__":
    main()
