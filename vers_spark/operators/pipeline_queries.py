"""Driver queries for embedding similarity + multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vers_spark.operators.multimodal import (
    extract_features,
    sample_frames,
    synthesize_media_from_documents,
)
from vers_spark.operators.similarity import embedding_neardup_pairs, ivf_similarity_join
from vers_spark.sources.tables import load_table

NEARDUP_THRESHOLD = 0.5  # natural min pairwise sq-euclid in testdata is ≈0.97


def _augmented_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dups = emb.filter(F.col("vec_id") % 11 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    return emb.unionByName(dups)


def emb_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed embedding near-dup over a corpus with injected exact
    duplicates. Identical vectors share every leaf, so no dup can be missed —
    the result provably equals the brute-force oracle at this threshold."""
    return embedding_neardup_pairs(_augmented_emb(spark, sf_dir), NEARDUP_THRESHOLD)


def emb_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cluster-co-located approximate top-3 similarity self-join —
    rows-only (k-means clustering not SQL-expressible)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_similarity_join(emb, k=3)


def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction over synthesized media payloads —
    rows-only (sha256-derived fake features; decode seam stubbed)."""
    media = synthesize_media_from_documents(load_table(spark, sf_dir, "documents"))
    return extract_features(media, decode="fake")


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling plumbing — rows-only."""
    media = synthesize_media_from_documents(load_table(spark, sf_dir, "documents"))
    return sample_frames(media, every_ms=1000, decode="fake")


_SQE = (
    "list_reduce(list_transform(list_zip({a}, {b}),"
    " s -> (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE)) * (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))),"
    " (x,y) -> x + y)"
)

ORACLE_SQL: dict[str, str] = {
    "emb_neardup_pairs": f"""
        WITH corpus AS (
            SELECT vec_id, embedding FROM embeddings
            UNION ALL
            SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 11 = 0
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {_SQE.format(a='a.embedding', b='b.embedding')} AS distance
        FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        WHERE {_SQE.format(a='a.embedding', b='b.embedding')} <= {NEARDUP_THRESHOLD}
    """,
}

QUERIES = {
    "emb_neardup_pairs": emb_neardup_pairs,
    "emb_similarity_join": emb_similarity_join,
    "mm_feature_extract": mm_feature_extract,
    "mm_frame_sample": mm_frame_sample,
}
