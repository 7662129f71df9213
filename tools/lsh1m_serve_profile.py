"""One-off: build (or load) the reference-config LSH forest at 1M, SAVE it,
then profile the multiprobe serving stages separately: assign_paths,
frontier leaf enumeration, candidate join + exact rerank. Drives the r7
decision of where the remaining per-query serving cost lives."""
import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from vers_spark.session import get_spark
from vers_spark.indexes.lsh import LSHForestIndex

REPO = "/root/repo"
IDX = f"{REPO}/.scale_data/lsh1m_idx"
spark = get_spark(app_name="lsh1m_profile", cpus="32")
full = spark.read.parquet(f"{REPO}/.scale_data/emb1m_1000000.parquet")
corpus = full.filter(F.col("vec_id") < 1_000_000).repartition(64)
queries = full.filter(F.col("vec_id") >= 1_000_000).localCheckpoint()

if not os.path.isdir(IDX):
    t0 = time.perf_counter()
    lsh = LSHForestIndex.build(corpus, num_trees=8, max_node_size=100, seed=42)
    lsh.leaves.count()
    print(f"build {time.perf_counter()-t0:.0f}s", flush=True)
    lsh.save(IDX)
    print("saved", flush=True)
lsh = LSHForestIndex.load(spark, IDX)
print("n_leaf_paths", lsh._n_leaf_paths(), flush=True)

t0 = time.perf_counter()
qp = lsh.assign_paths(queries, "vec_id", "embedding").localCheckpoint()
n = qp.count()
print(f"assign_paths {time.perf_counter()-t0:.1f}s ({n} pairs)", flush=True)

pairs = qp.select("query_id", "tree_id", "q_vec")
t0 = time.perf_counter()
probed = lsh._leaf_order_frontier(pairs, lsh.leaves, "margin", 2)
np_ = probed.count()
print(f"frontier(P=2) {time.perf_counter()-t0:.1f}s ({np_} probed)", flush=True)

t0 = time.perf_counter()
res = lsh.search_multiprobe(queries, k=10, n_probes=2)
rn = res.count()
print(f"full multiprobe P=2 {time.perf_counter()-t0:.1f}s ({rn} rows)", flush=True)
t0 = time.perf_counter()
res = lsh.search_multiprobe(queries, k=10, n_probes=4)
print(f"full multiprobe P=4 {time.perf_counter()-t0:.1f}s ({res.count()} rows)", flush=True)
