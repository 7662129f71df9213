"""Deduplication operators (exact family; MinHash/SimHash live in
``vers_spark.operators.text_dedup``).

Reference parity: LSH build-time bit-exact dedup with "first occurrence wins"
(`vers/src/indexes/lsh.rs:113-130`). Spark-first: dedup is a hash aggregate /
ranking window — one shuffle on the dedup key, map-side combine, AQE-coalesced.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def dedup_exact(df: DataFrame, keys: Sequence[str], order_by: Sequence[str]) -> DataFrame:
    """Keep exactly one row per key group — the FIRST by ``order_by`` (the
    deterministic variant of ``dropDuplicates``; lsh.rs:119-129 semantics
    where insertion order = id order)."""
    w = W.partitionBy(*keys).orderBy(*[F.asc(c) for c in order_by])
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def dedup_group_stats(df: DataFrame, keys: Sequence[str], id_col: str) -> DataFrame:
    """Per duplicate-group summary: surviving id (min) + multiplicity.

    The aggregate form of dedup — preferred at scale when only survivors are
    needed (no window sort, pure partial/final hash agg).
    """
    return df.groupBy(*keys).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dupes")
    )


def dedup_vectors(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Vector dedup by array value (HashKey analogue; see functions.vector
    note on 0.0/-0.0 divergence). Returns survivors only."""
    return dedup_exact(df, [vec_col], [id_col])
