"""Blocked IVF×PQ serving twin (pq.ivfpq_search_blocked): bit-parity of the
returned (query, neighbour, rank) rows with the declarative engines it
replaces at 1M serving scale — whole-vector AND residual codes, ADC-only
AND exact-reranked. The declarative fold carries an m×k LUT per candidate
row; the blocked twin broadcasts the LUT tensor once and gathers in numpy —
a pure plan choice, so the rows must not move."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vers_spark.indexes.ivfflat import IVFFlatIndex
from vers_spark.indexes.pq import (
    PQCodec,
    ivfpq_search,
    ivfpq_search_blocked,
    ivfpq_search_residual,
    persist_codes_partitioned,
    residuals,
)
from vers_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def setup(spark, sf_dir, tmp_path_factory):
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 29 != 0)
    queries = emb.filter(F.col("vec_id") % 29 == 0)
    ivf = IVFFlatIndex.build(corpus, num_clusters=8, seed=3)
    base = tmp_path_factory.mktemp("pqstore")
    codec = PQCodec.train(corpus, m=16, k_codebook=32, max_iter=10)
    codes = persist_codes_partitioned(
        codec.encode(corpus), ivf._serving_assignments(), str(base / "plain")
    )
    res_df = residuals(ivf)
    rcodec = PQCodec.train(res_df, m=16, k_codebook=32, max_iter=10)
    rcodes = persist_codes_partitioned(
        rcodec.encode(res_df), ivf._serving_assignments(), str(base / "res")
    )
    return corpus, queries, ivf, codec, codes, rcodec, rcodes


def _rows(df):
    return sorted(
        (r["query_id"], r["neighbour_id"], r["rank"]) for r in df.collect()
    )


def test_blocked_parity_whole_vector(spark, setup):
    corpus, queries, ivf, codec, codes, _, _ = setup
    for extra in ({}, {"corpus": corpus}):
        want = _rows(
            ivfpq_search(ivf, codec, codes, queries, k=10, n_probes=4, **extra)
        )
        got = _rows(
            ivfpq_search_blocked(
                ivf, codec, codes, queries, k=10, n_probes=4, residual=False, **extra
            )
        )
        assert got == want and len(got) > 0, bool(extra)


def test_blocked_parity_residual(spark, setup):
    corpus, queries, ivf, _, _, rcodec, rcodes = setup
    for extra in ({}, {"corpus": corpus}):
        want = _rows(
            ivfpq_search_residual(
                ivf, rcodec, rcodes, queries, k=10, n_probes=4, **extra
            )
        )
        got = _rows(
            ivfpq_search_blocked(
                ivf, rcodec, rcodes, queries, k=10, n_probes=4, residual=True, **extra
            )
        )
        assert got == want and len(got) > 0, bool(extra)


def test_blocked_underflow_fill_prefix(spark, setup):
    """n_probes=1 with k > the probed posting list forces the underflow
    fill prefix — both engines must extend probing identically."""
    corpus, queries, ivf, codec, codes, _, _ = setup
    want = _rows(ivfpq_search(ivf, codec, codes, queries, k=60, n_probes=1))
    got = _rows(
        ivfpq_search_blocked(ivf, codec, codes, queries, k=60, n_probes=1)
    )
    assert got == want and len(got) > 0


def test_blocked_requires_cluster_store(spark, setup):
    corpus, queries, ivf, codec, _, _, _ = setup
    bare = codec.encode(corpus)
    with pytest.raises(ValueError, match="cluster-partitioned"):
        ivfpq_search_blocked(ivf, codec, bare, queries, k=10)


def test_blocked_code_store_partition_prunes(spark, setup):
    """The cluster-partitioned code store must be read with a
    PartitionFilters entry on cluster_id under the blocked engine's
    literal isin — at 100 TB only the probed posting-list directories are
    listed/read at all. Mirrors test_plans' IVF store gate."""
    corpus, queries, ivf, codec, codes, _, _ = setup
    from pyspark.sql import functions as F

    pruned = codes.filter(F.col("cluster_id").isin([0, 1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster_id" in plan, plan[:800]
    # and the filter must actually reach the scan, not sit above it
    assert "PartitionFilters: []" not in plan.replace(" ", ""), plan[:800]
