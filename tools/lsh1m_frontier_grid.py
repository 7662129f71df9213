"""Grid the frontier knobs (beam, stride) on the SAVED 1M forest: time the
probed-leaf enumeration per config and verify the probed set is identical
across configs (the bound, not the beam, should be doing the pruning)."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from vers_spark.session import get_spark
from vers_spark.indexes.lsh import LSHForestIndex

spark = get_spark(app_name="lsh1m_grid", cpus="32")
full = spark.read.parquet("/root/repo/.scale_data/emb1m_1000000.parquet")
queries = full.filter(F.col("vec_id") >= 1_000_000).localCheckpoint()
lsh = LSHForestIndex.load(spark, "/root/repo/.scale_data/lsh1m_idx")
qp = lsh.assign_paths(queries, "vec_id", "embedding").localCheckpoint()
pairs = qp.select("query_id", "tree_id", "q_vec")
ref = None
for beam, stride in [(32, 2), (16, 2), (8, 2), (16, 4), (16, 1)]:
    t0 = time.perf_counter()
    probed = lsh._leaf_order_frontier(pairs, lsh.leaves, "margin", 2, beam=beam, stride=stride)
    got = sorted(map(tuple, probed.collect()))
    dt = time.perf_counter() - t0
    same = "ref" if ref is None else ("SAME" if got == ref else "DIFF")
    if ref is None:
        ref = got
    print(f"beam={beam} stride={stride}: {dt:.1f}s ({len(got)} probed) {same}", flush=True)
