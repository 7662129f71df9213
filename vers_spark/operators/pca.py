"""PCA dimensionality reduction over the embeddings corpus — the standard
pre-ANN compression step (reduce 64→16 dims before index build / KNN).
No counterpart in the reference (vectors are used at native dim); included
as part of the §E training-pipeline surface.

Scale shape: the COVARIANCE FIT happens on a driver-sized sample — a D×D
covariance needs O(D²) memory regardless of corpus size, and a uniform
sample of ~100k rows pins it to third-decimal accuracy at any scale (same
sample-then-broadcast pattern as the IVF centroid build). The TRANSFORM is
the distributed half: a single Arrow-batched pandas UDF doing one matmul
per batch — embarrassingly parallel, no shuffle, linear in corpus bytes.

Determinism: eigh on the same sample gives the same decomposition; the
remaining sign ambiguity is fixed by making each component's
largest-|coefficient| entry positive.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vers_spark.sources.tables import load_table


class PCAModel:
    def __init__(
        self,
        mean: np.ndarray,
        components: np.ndarray,
        explained_var: np.ndarray,
        total_var: float,
    ):
        self.mean = mean  # (D,)
        self.components = components  # (d, D), rows orthonormal
        self.explained_var = explained_var  # (d,) descending
        self.total_var = total_var  # trace of the full covariance (all D dims)

    @staticmethod
    def fit(
        emb: DataFrame,
        d: int,
        vec_col: str = "embedding",
        sample_rows: int = 100_000,
        seed: int = 11,
    ) -> "PCAModel":
        n = emb.count()
        src = emb.select(vec_col) if n <= sample_rows else emb.select(vec_col).sample(
            fraction=min(1.0, sample_rows / n), seed=seed
        )
        X = np.array([r[0] for r in src.collect()], dtype=np.float64)
        mu = X.mean(axis=0)
        Xc = X - mu
        cov = (Xc.T @ Xc) / max(len(X) - 1, 1)
        vals, vecs = np.linalg.eigh(cov)  # ascending
        order = np.argsort(vals)[::-1][:d]
        W = vecs[:, order].T  # (d, D)
        # sign convention: largest-|coeff| entry of each component positive
        for i in range(W.shape[0]):
            j = int(np.argmax(np.abs(W[i])))
            if W[i, j] < 0:
                W[i] = -W[i]
        return PCAModel(mu, W, vals[order], float(np.trace(cov)))

    def transform(self, emb: DataFrame, vec_col: str = "embedding", out_col: str = "reduced") -> DataFrame:
        from pyspark.sql.functions import pandas_udf

        mu, W = self.mean, self.components

        @pandas_udf("array<float>")
        def proj(s: pd.Series) -> pd.Series:
            X = np.array(list(s), dtype=np.float64)
            R = (X - mu) @ W.T
            return pd.Series([r.astype(np.float32).tolist() for r in R])

        return emb.withColumn(out_col, proj(F.col(vec_col)))


# ---- driver queries (eigendecomposition → rows-only; exact invariants are
# pinned by tests/test_pca.py) ----


def emb_pca_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-component explained variance + cumulative ratio for a 16-dim
    reduction of the 64-dim corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    m = PCAModel.fit(emb, d=16)
    rows = []
    cum = 0.0
    for i, v in enumerate(m.explained_var):
        cum += float(v)
        rows.append((i, float(v), cum / m.total_var if m.total_var else 0.0))
    return spark.createDataFrame(rows, "component int, explained_var double, cum_ratio double")


def emb_pca_knn_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of exact KNN in the 16-dim PCA space against full-space
    exact KNN for the first 20 query vectors — the quality metric that
    decides whether a reduced-space index is usable."""
    from vers_spark.operators.knn import exact_knn

    emb = load_table(spark, sf_dir, "embeddings")
    m = PCAModel.fit(emb, d=16)
    red = m.transform(emb).select("vec_id", F.col("reduced").alias("embedding"))
    q_full = emb.filter(F.col("vec_id") < 20)
    q_red = red.filter(F.col("vec_id") < 20)
    full = exact_knn(q_full, emb, k=10)
    reduced = exact_knn(q_red, red, k=10)
    hits = full.join(reduced, ["query_id", "neighbour_id"], "inner").count()
    total = full.count()
    return spark.createDataFrame(
        [(16, hits, total, hits / total if total else 0.0)],
        "pca_dim int, hits long, total long, recall double",
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "emb_pca_stats": emb_pca_stats,
    "emb_pca_knn_recall": emb_pca_knn_recall,
}

ORACLE_SQL: dict[str, str] = {}
