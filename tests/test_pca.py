"""PCA reduction (operators/pca.py): decomposition invariants, exact
distributed-transform parity with numpy, and reduced-space KNN recall."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from vers_spark.operators.pca import PCAModel, emb_pca_knn_recall, emb_pca_stats
from vers_spark.sources.tables import load_table


def test_components_orthonormal_and_variance_sorted(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    m = PCAModel.fit(emb, d=16)
    W = m.components
    assert np.allclose(W @ W.T, np.eye(16), atol=1e-8)
    assert all(a >= b for a, b in zip(m.explained_var, m.explained_var[1:], strict=False))
    assert 0.0 < float(np.sum(m.explained_var)) <= m.total_var + 1e-9
    # sign convention: each component's largest-|coeff| entry is positive
    for row in W:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_transform_matches_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    m = PCAModel.fit(emb, d=16)
    got = {
        r["vec_id"]: np.array(r["reduced"])
        for r in m.transform(emb).select("vec_id", "reduced").collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    for r in rows:
        expected = ((np.array(r["embedding"], dtype=np.float64) - m.mean) @ m.components.T).astype(
            np.float32
        )
        assert np.array_equal(got[r["vec_id"]], expected)


def test_pca_stats_query(spark, sf_dir):
    rows = emb_pca_stats(spark, sf_dir).collect()
    assert len(rows) == 16
    ratios = [r["cum_ratio"] for r in rows]
    assert all(a <= b for a, b in zip(ratios, ratios[1:], strict=False))
    assert 0.0 < ratios[-1] <= 1.0 + 1e-9


def test_reduced_space_recall_beats_chance(spark, sf_dir):
    """Recall@10 at d=16 on this (near-isotropic) corpus is modest but must
    far exceed the random baseline (k/N ≈ 0.02-0.05)."""
    row = emb_pca_knn_recall(spark, sf_dir).collect()[0]
    assert row["total"] == 200
    assert row["recall"] >= 0.15
