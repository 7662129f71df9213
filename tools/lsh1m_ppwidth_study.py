"""VERDICT r12 item 4: measure the `_pp` leaf-bucket prefix-width dial at
the 1M×300 reference-config store (the phash band-width methodology applied
to the saved leaf layout).

For widths 4 (shipped default), 6, and 8: re-save the forest at that width
(save(pp_len=w), one-time cost recorded), then for batch sizes 1/10/100
measure warm multiprobe P=4 end-to-end wall (min of 2 after a warm-up),
the probed-bucket ratio (distinct probed (tree, _pp) / total leaf
partitions), and the MEASURED partitions-read metric off the executed leaf
scan. The question: does a finer prefix make DPP bite for large batches
(r12 observation: at width 4 a 100-query P=4 batch probes 119/128 buckets
— only ~7% skipped), and does it help or hurt the small-batch serving case
(more, smaller files per bucket)?

Run uncontended. Widths 6/8 stores are written next to the base store and
deleted afterwards unless KEEP_STORES=1.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = f"{REPO}/.scale_data/lsh1m_idx"

from lsh1m_warm_serve import dump_scans  # noqa: E402  (same tools dir)


def main() -> None:
    from pyspark.sql import functions as F

    from vers_spark.indexes.lsh import LSHForestIndex, _pp_of
    from vers_spark.session import get_spark

    spark = get_spark(
        app_name="lsh1m_ppwidth", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    full = spark.read.parquet(f"{REPO}/.scale_data/emb1m_1000000.parquet")
    out: dict = {}
    tmp_stores = []
    try:
        for w in (4, 6, 8):
            if w == 4:
                path = BASE
            else:
                path = f"{REPO}/.scale_data/lsh1m_idx_w{w}"
                tmp_stores.append(path)
                if not os.path.isdir(path):
                    base = LSHForestIndex.load(spark, BASE)
                    t0 = time.perf_counter()
                    base.save(path, pp_len=w)
                    out[f"w{w}_resave_s"] = round(time.perf_counter() - t0, 1)
            lsh = LSHForestIndex.load(spark, path)
            assert lsh._pp_len() == w
            assert lsh._planes_pack() is not None
            total = lsh.leaves.select("tree_id", "_pp").distinct().count()
            row: dict = {"total_leaf_partitions": total}
            for bs in (1, 10, 100):
                qb = full.filter(
                    (F.col("vec_id") >= 1_000_000) & (F.col("vec_id") < 1_000_000 + bs)
                ).localCheckpoint()
                assert qb.count() == bs
                walls = []
                res = None
                for i in range(3):  # warm-up + 2 measured
                    t0 = time.perf_counter()
                    res = lsh.search_multiprobe(qb, k=10, n_probes=4)
                    n = len(res.collect())
                    walls.append(round(time.perf_counter() - t0, 2))
                assert n == bs * 10
                scans = dump_scans(res._jdf.queryExecution().executedPlan())
                # the leaf scan is the only one carrying the _pp partition
                # column (dump_scans' desc truncates before the file path,
                # so match on the projected column list instead)
                read = [
                    {
                        "numPartitions": s.get("numPartitions"),
                        "numOutputRows": s.get("numOutputRows"),
                    }
                    for s in scans
                    if "_pp#" in s.get("desc", "")
                ]
                probed = lsh._leaf_order_pack(
                    lsh.assign_paths(qb, "vec_id", "embedding").select(
                        "query_id", "tree_id", "q_vec"
                    ),
                    "margin",
                    4,
                )
                buckets = (
                    probed.select(
                        _pp_of(F.col("tree_id"), F.col("path"), w).alias("_pp")
                    )
                    .distinct()
                    .count()
                )
                row[f"batch{bs}"] = {
                    "e2e_warm_s": min(walls[1:]),
                    "walls": walls,
                    "probed_buckets": buckets,
                    "probed_ratio": round(buckets / max(total, 1), 4),
                    "partitions_read": read,
                }
                print(f"w={w} bs={bs}: {row[f'batch{bs}']}", flush=True)
            out[f"w{w}"] = row
        print(json.dumps(out), flush=True)
    finally:
        if os.environ.get("KEEP_STORES") != "1":
            for p in tmp_stores:
                shutil.rmtree(p, ignore_errors=True)


if __name__ == "__main__":
    main()
