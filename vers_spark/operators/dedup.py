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


def dedup_vectors(df: DataFrame, vec_col: str, id_col: str, bitexact: bool = False) -> DataFrame:
    """Vector dedup by array value. Default keys on Spark array equality
    (-0.0 == 0.0, NaNs normalized — SURVEY §1.2 documented divergence);
    ``bitexact=True`` keys on the packed-f32-bytes digest instead, the
    reference's HashKey identity (base.rs:113-117) where -0.0 ≠ 0.0 and
    NaN payloads are distinct. Returns survivors only."""
    if bitexact:
        from vers_spark.functions.vector_np import bitexact_key_udf

        return (
            df.withColumn("_bk", bitexact_key_udf(F.col(vec_col)))
            .transform(lambda d: dedup_exact(d, ["_bk"], [id_col]))
            .drop("_bk")
        )
    return dedup_exact(df, [vec_col], [id_col])
