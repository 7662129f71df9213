"""Boundary-replication A/B on corpora where the boundary MATTERS.

Round-6 shipped ``boundary_eps`` (hnsw.py: near-boundary points are ALSO
inserted into their runner-up cluster's shard graph) but only measured it on
50 well-SEPARATED latent clusters, where a query's true neighbours
essentially never straddle a k-means shard boundary — eps structurally
cannot help there (+0.4pp measured). This experiment builds the corpus
shapes where cross-boundary neighbour mass is real and answers the round-6
verdict ask: does eps>0 beat auto-ef alone there, or does auto-ef dominate
everywhere measured?

Corpus shapes (n=100k, d=64, deterministic hash-derived — the gen_corpus
discipline of ann_scale_run.py):

- separated:   50 centers in ±2.0, noise ±0.5 → inter-center distance >>
               noise; the r6 baseline shape (control).
- overlapping: 20 centers in ±0.35, noise ±0.5 → clusters interpenetrate;
               k-means cuts run straight through neighbour neighbourhoods.
- annulus:     points on a radius-2 ring in a random 2-D subspace + full-D
               noise ±0.25 → a connected 1-D manifold with NO cluster
               structure; every k-means cell boundary cuts true-neighbour
               pairs.

For each shape × eps ∈ {0.0, 0.2} × probes ∈ {2, 4}: build a 16-way
k-means-sharded HNSW (reference hyperparameters), search 400 held-out
queries (ANN recall A/Bs need >= 400 queries — 30-query samples flip sign)
with ef_search="auto", record recall@10 vs the exact blocked-BLAS ground
truth, plus the eps replication factor and search wall.

Usage: python tools/hnsw_boundary_ab.py [--n 100000] [--shapes a,b,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIMS = 64
N_QUERIES = 400


def gen_corpus(spark, n: int, shape: str, path: str) -> None:
    from pyspark.sql import functions as F

    df = spark.range(0, n + N_QUERIES, 1, 64).select(
        F.col("id").alias("vec_id"),
    )
    d = F.sequence(F.lit(0), F.lit(DIMS - 1))

    def h(tag, key, dim, mod):
        return F.pmod(F.xxhash64(F.concat_ws(":", F.lit(tag), key, dim)), F.lit(mod))

    if shape in ("separated", "overlapping"):
        n_clusters = 50 if shape == "separated" else 20
        spread = 2.0 if shape == "separated" else 0.35
        label = (F.col("vec_id") % n_clusters).cast("int")

        def elem(dim):
            center = (h("c", label, dim, 4000) / 2000.0 - 1.0) * spread
            noise = h("n", F.col("vec_id"), dim, 1000) / 1000.0 - 0.5
            return (center + noise).cast("float")

    elif shape == "annulus":
        # angle θ per point; ring lives in dims 0/1 of a fixed rotation —
        # use raw dims 0/1 (rotation changes nothing for k-means/L2)
        theta = (h("t", F.col("vec_id"), F.lit(0), 1_000_000) / 1_000_000.0) * 6.283185307

        def elem(dim):
            ring = (
                F.when(dim == 0, F.cos(theta) * 2.0)
                .when(dim == 1, F.sin(theta) * 2.0)
                .otherwise(F.lit(0.0))
            )
            noise = (h("n", F.col("vec_id"), dim, 1000) / 1000.0 - 0.5) * 0.5
            return (ring + noise).cast("float")

    else:
        raise ValueError(f"unknown shape {shape!r}")

    df.select("vec_id", F.transform(d, elem).alias("embedding")).write.mode(
        "overwrite"
    ).parquet(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--shapes", default="separated,overlapping,annulus")
    ap.add_argument("--eps", default="0.0,0.2")
    ap.add_argument("--probes", default="2,4")
    ap.add_argument("--shards", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from vers_spark.indexes.hnsw import HNSWIndex
    from vers_spark.operators.knn import exact_knn_blocked
    from vers_spark.session import get_spark

    spark = get_spark(app_name="hnsw_boundary_ab", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    results = []
    for shape in args.shapes.split(","):
        path = f"{REPO}/.scale_data/ab_{shape}_{args.n}.parquet"
        if not os.path.isdir(path):
            gen_corpus(spark, args.n, shape, path)
        full = spark.read.parquet(path)
        corpus = full.filter(F.col("vec_id") < args.n).repartition(64).localCheckpoint()
        queries = full.filter(F.col("vec_id") >= args.n).localCheckpoint()
        gt = {
            (r["query_id"], r["neighbour_id"])
            for r in exact_knn_blocked(queries, corpus, k=10).collect()
        }
        print(f"# {shape}: ground truth done ({len(gt)} pairs)", flush=True)
        for eps in [float(e) for e in args.eps.split(",")]:
            t0 = time.perf_counter()
            idx = HNSWIndex.build(
                corpus,
                num_shards=args.shards,
                shard_by="kmeans",
                max_shard_rows=12_000,
                boundary_eps=eps,
                seed=42,
            )
            # kind 0 = node rows; count > n under eps replication
            n_nodes = idx.graph.filter(F.col("kind") == 0).count()  # materialize
            build_s = round(time.perf_counter() - t0, 1)
            repl = round(n_nodes / args.n, 3)
            for probes in [int(p) for p in args.probes.split(",")]:
                t0 = time.perf_counter()
                res = idx.search(queries, k=10, n_probe_shards=probes, ef_search="auto")
                hits = {
                    (r["query_id"], r["neighbour_id"])
                    for r in res.select("query_id", "neighbour_id").collect()
                }
                row = {
                    "shape": shape,
                    "eps": eps,
                    "probes": probes,
                    "recall_at_10": round(len(hits & gt) / len(gt), 4),
                    "search_sec": round(time.perf_counter() - t0, 1),
                    "build_sec": build_s,
                    "replication": repl,
                }
                results.append(row)
                print(json.dumps(row), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
