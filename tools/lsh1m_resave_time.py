"""Rewrite the saved 1M forest into the r7 level-partitioned hyperplane
layout, then re-time the serving stages (no rebuild — pure layout A/B)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from vers_spark.session import get_spark
from vers_spark.indexes.lsh import LSHForestIndex

spark = get_spark(app_name="lsh1m_resave", cpus="32")
full = spark.read.parquet("/root/repo/.scale_data/emb1m_1000000.parquet")
queries = full.filter(F.col("vec_id") >= 1_000_000).localCheckpoint()
old = LSHForestIndex.load(spark, "/root/repo/.scale_data/lsh1m_idx")
NEW = "/root/repo/.scale_data/lsh1m_idx_lvl"
if not os.path.isdir(NEW):
    t0 = time.perf_counter()
    old.save(NEW)
    print(f"re-save {time.perf_counter()-t0:.0f}s", flush=True)
lsh = LSHForestIndex.load(spark, NEW)
t0 = time.perf_counter()
qp = lsh.assign_paths(queries, "vec_id", "embedding").localCheckpoint()
print(f"assign_paths {time.perf_counter()-t0:.1f}s ({qp.count()} pairs)", flush=True)
for p in (2, 4):
    t0 = time.perf_counter()
    res = lsh.search_multiprobe(queries, k=10, n_probes=p)
    n = res.count()
    print(f"mp{p}: {time.perf_counter()-t0:.1f}s batch ({n} rows)", flush=True)
