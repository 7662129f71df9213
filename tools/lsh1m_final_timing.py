"""Final r7 evidence: end-to-end multiprobe serving on the SAVED 1M forest
with the shipped defaults (frontier beam=max(4P,8), stride=2, blocked
rerank) + recall vs exact ground truth."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from vers_spark.session import get_spark
from vers_spark.indexes.lsh import LSHForestIndex
from vers_spark.operators.knn import exact_knn_blocked

spark = get_spark(app_name="lsh1m_final", cpus="32")
full = spark.read.parquet("/root/repo/.scale_data/emb1m_1000000.parquet")
corpus = full.filter(F.col("vec_id") < 1_000_000)
queries = full.filter(F.col("vec_id") >= 1_000_000).localCheckpoint()
gt = {(r["query_id"], r["neighbour_id"]) for r in exact_knn_blocked(queries, corpus, k=10).collect()}
lsh = LSHForestIndex.load(spark, "/root/repo/.scale_data/lsh1m_idx")
for p in (2, 4):
    t0 = time.perf_counter()
    res = lsh.search_multiprobe(queries, k=10, n_probes=p)
    hits = {(r["query_id"], r["neighbour_id"]) for r in res.select("query_id", "neighbour_id").collect()}
    dt = time.perf_counter() - t0
    print(f"mp{p}: {dt:.1f}s batch, {dt*10:.0f} ms/q, recall@10 {len(hits & gt)/len(gt):.4f}", flush=True)
