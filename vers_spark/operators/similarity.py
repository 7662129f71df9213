"""Embedding-space similarity operators: near-duplicate pairs and
all-pairs-style similarity join, built on the ANN indexes (SURVEY.md §2.C/E —
the metadata+vector composition the reference lacks entirely).

Scale shapes:
- near-dup: candidates = vectors sharing an LSH leaf in ANY tree (identical
  vectors always share every leaf — plane tests are deterministic — so exact
  duplicates can never be missed); verification is candidate-sized.
- similarity join: both sides partitioned by IVF cluster; neighbours searched
  within each vector's own cluster (n_probes=1 self-join co-located on
  cluster_id — no corpus² shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from vers_spark.functions import vector as V
from vers_spark.indexes.ivfflat import IVFFlatIndex
from vers_spark.indexes.lsh import LSHForestIndex


def _corpus_paths(forest: LSHForestIndex, emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(query_id, q_vec, tree_id, path) for the FULL corpus without a second
    tree descent: the build's ``leaves`` already carry every deduped row's
    final path; the rows the build dropped (exact duplicates, lsh.rs:113-130)
    copy their representative's paths with one equi-join on the vector value —
    identical vectors descend identically, so the paths are the same ones a
    re-descent would compute. At scale this replaces depth× broadcast joins
    over the whole corpus with one join sized by the duplicate count."""
    kept = forest.leaves.select(
        "tree_id", "path", F.col("id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    dupes = (
        emb.select(F.col(id_col).cast("long").alias("query_id"), F.col(vec_col).alias("q_vec"))
        .join(kept.select("query_id").distinct(), "query_id", "left_anti")
    )
    dup_paths = dupes.join(
        forest.leaves.select("tree_id", "path", F.col("embedding").alias("q_vec")), "q_vec"
    ).select("tree_id", "path", "query_id", "q_vec")
    return kept.unionByName(dup_paths.select("tree_id", "path", "query_id", "q_vec"))


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float,
    num_trees: int = 4,
    max_node_size: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> DataFrame:
    """(id_a < id_b, distance) pairs with squared Euclidean ≤ threshold,
    LSH-bucketed candidate generation + exact verification."""
    forest = LSHForestIndex.build(
        emb, num_trees=num_trees, max_node_size=max_node_size, id_col=id_col, vec_col=vec_col, seed=seed
    )
    # paths feeds both sides of the bucket self-join; unmaterialized, the
    # dupes anti-join + the array-valued q_vec equi-join inside
    # _corpus_paths run once per side (r14 plan: 4 corpus scans → 2).
    # LAZY: an eager checkpoint adds a blocking job ahead of the candidate
    # join and measured behind both alternatives at sf0.1 (r14 A/B); lazy
    # keeps one execution with no extra action.
    paths = _corpus_paths(forest, emb, id_col, vec_col).localCheckpoint(eager=False)
    a = paths.select("tree_id", "path", F.col("query_id").alias("id_a"), F.col("q_vec").alias("va"))
    b = paths.select("tree_id", "path", F.col("query_id").alias("id_b"), F.col("q_vec").alias("vb"))
    cands = (
        a.join(b, ["tree_id", "path"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    dist = V.sq_euclidean(F.col("va"), F.col("vb"))
    return (
        cands.withColumn("distance", dist)
        .filter(F.col("distance") <= threshold)
        .select("id_a", "id_b", "distance")
    )


def embedding_cosine_neardup_pairs(
    emb: DataFrame,
    threshold: float,
    num_trees: int = 4,
    max_node_size: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> DataFrame:
    """(id_a < id_b, cos_distance) pairs with cosine distance ≤ threshold:
    normalize, LSH-bucket, verify with 1 − dot. Identical vectors normalize
    identically and share every leaf, so exact duplicates can't be missed."""
    # keep f64 end-to-end: the DuckDB oracle reproduces the same left-fold
    # normalize + dot bit-exactly (functions.vector numeric contract)
    unit = emb.select(F.col(id_col).alias(id_col), V.normalize(F.col(vec_col)).alias(vec_col))
    forest = LSHForestIndex.build(
        unit, num_trees=num_trees, max_node_size=max_node_size, id_col=id_col, vec_col=vec_col, seed=seed
    )
    # same both-sides lazy materialization as embedding_neardup_pairs above
    paths = _corpus_paths(forest, unit, id_col, vec_col).localCheckpoint(eager=False)
    a = paths.select("tree_id", "path", F.col("query_id").alias("id_a"), F.col("q_vec").alias("va"))
    b = paths.select("tree_id", "path", F.col("query_id").alias("id_b"), F.col("q_vec").alias("vb"))
    cands = (
        a.join(b, ["tree_id", "path"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    dist = F.lit(1.0) - V.dot(F.col("va"), F.col("vb"))
    return (
        cands.withColumn("cos_distance", dist)
        .filter(F.col("cos_distance") <= threshold)
        .select("id_a", "id_b", "cos_distance")
    )


def mllib_brp_neardup_pairs(
    emb: DataFrame,
    sq_threshold: float,
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Documented MLlib fast path: BucketedRandomProjectionLSH
    approxSimilarityJoin (classic bucketed LSH). Identical vectors hash
    identically in every table, so exact duplicates are provably found;
    distance reported as SQUARED euclidean to match the forest variant."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    c = emb.select(
        F.col(id_col).cast("long").alias("id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(c)
    joined = model.approxSimilarityJoin(c, c, float(sq_threshold) ** 0.5, distCol="eucl")
    return (
        joined.select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            (F.col("eucl") * F.col("eucl")).alias("distance"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.col("distance") <= sq_threshold)
    )


def ivf_similarity_join(
    emb: DataFrame,
    k: int,
    num_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    index: IVFFlatIndex | None = None,
) -> DataFrame:
    """Approximate all-pairs top-k: neighbours restricted to each vector's IVF
    cluster — the co-located self-join shape that scales linearly in cluster
    size instead of corpus². Pass ``index`` to reuse an existing build (the
    build-once/serve-many contract — a recurring similarity join should not
    re-train k-means per run)."""
    idx = index or IVFFlatIndex.build(
        emb, num_clusters=num_clusters, id_col=id_col, vec_col=vec_col, seed=seed
    )
    num_clusters = int(idx.params["num_clusters"])
    asg = idx.assignments
    a = asg.select("cluster_id", F.col("id").alias("query_id"), F.col("embedding").alias("qv"))
    b = asg.select("cluster_id", F.col("id").alias("neighbour_id"), F.col("embedding").alias("cv"))
    if num_clusters == 1:
        # degenerate oracle config: a constant join key would funnel every
        # pair into ONE shuffle partition. Broadcast the candidate side and
        # spread the probe side across the cluster — parallelism follows
        # the probe side's partitions, which a single parquet file would
        # otherwise leave at 1-2 tasks. (The degenerate config is the
        # exact-twin/testing path; real configs keep the co-located join.)
        a = a.repartition(emb.sparkSession.sparkContext.defaultParallelism, "query_id")
        b = F.broadcast(b)
    w = W.partitionBy("query_id").orderBy(F.asc("distance"), F.asc("neighbour_id"))
    return (
        a.join(b, "cluster_id")
        .filter(F.col("query_id") != F.col("neighbour_id"))
        .withColumn("distance", V.sq_euclidean(F.col("qv"), F.col("cv")))
        # drop the vector payloads BEFORE the rank window: the top-k shuffle
        # moves (id, id, double) rows, not 2×dim arrays per candidate pair
        .select("query_id", "neighbour_id", "distance")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbour_id", "distance", "rank")
    )
