"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()``
exposes every implemented operator from SURVEY.md §2 as (spark, sf_dir) →
DataFrame; ``oracle_sql()`` gives the DuckDB twin for each SQL-expressible
query (same column names/types). Non-SQL-expressible ops (approximate ANN
search, iterative builds) appear in ``queries()`` only → rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Spark's Python WORKERS inherit the driver's PYTHONPATH env (not its
# sys.path): a pandas-UDF closure that references vers_spark by module
# raises ModuleNotFoundError in the worker whenever the harness launches
# from a cwd other than the repo root. Export the repo root before any
# worker daemon starts (import time is early enough — workers spawn lazily
# on the first Python UDF).
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# Runtime-settable session tuning applied on the driver's session the first
# time any registered query runs: the driver may hand us a vanilla session
# (shuffle=200, AQE off), which would cost ~6x task overhead at sweep SF and
# mis-size every shuffle. All keys here are safe to set post-start; static
# conf (e.g. parquet nanosAsLong) is handled structurally in sources/tables.
_RUNTIME_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
}

_TUNED: set[int] = set()


def _tune(spark: SparkSession) -> None:
    if id(spark) in _TUNED:
        return
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # immutable in this deployment — keep going
            pass
    _TUNED.add(id(spark))


def _tuned(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        _tune(spark)
        return fn(spark, sf_dir)

    wrapper.__name__ = getattr(fn, "__name__", "query")
    wrapper.__doc__ = fn.__doc__
    wrapper.__wrapped__ = fn  # bench.py resolves the defining module for
    return wrapper  # its per-line code fingerprints through this


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q5-shape revenue-by-nation on sf0.001."""
    from vers_spark.operators.relational import q5_revenue_by_nation

    _tune(spark)
    return q5_revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from vers_spark.operators import (
        curation,
        diversity,
        index_queries,
        pca,
        pipeline_queries,
        relational,
        streaming_queries,
        temporal,
        text_analysis,
        text_dedup_queries,
        vector_queries,
    )

    from vers_spark.operators import bpe, rag

    # Registration order IS the driver's sweep order, and the sweep has
    # truncated at exactly 50 queries in every prior round. Round-11 order
    # (VERDICT r10 item 2, executed exactly):
    #   1. the fingerprint near-dup family — its JOIN KERNEL changed again
    #      this round (small-corpus n_hint bypass + hamming_words_fixed
    #      width guard + NULL-band filter), so every query through
    #      phash_neardup_pairs re-certifies at the head (changed-kernel
    #      discipline, third round running);
    #   2. the 27 rows whose newest driver row is r6 — the current oldest
    #      evidence on the board (hnsw/doc/evt/stream sketch cohorts; the
    #      hnsw queries also re-certify this round's insert-kernel
    #      vectorization);
    #   3. oldest r7 rows fill to the 50-cap, kernel-adjacent first (the
    #      knn/vector cohort shares functions/vector.py, which changed;
    #      lsh/hnsw serving shares the index modules). After this sweep
    #      nothing on the board is older than r7.
    modules = [
        vector_queries.QUERIES,
        index_queries.QUERIES,
        text_analysis.QUERIES,
        bpe.QUERIES,
        rag.QUERIES,
        text_dedup_queries.QUERIES,
        pipeline_queries.QUERIES,
        pca.QUERIES,
        diversity.QUERIES,
        streaming_queries.QUERIES,
        curation.QUERIES,
        temporal.QUERIES,
        relational.QUERIES,
    ]
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in modules:
        merged.update(m)

    priority = [
        # -- r11 #1: the fingerprint family whose shared join kernel changed
        # again (n_hint small-corpus bypass + width-guarded unrolled
        # hamming + NULL-band filter) — oracle-backed twins first, then the
        # real-decode paths --
        "mm_phash_neardup_fake",
        "mm_audio_fp_fake",
        "mm_video_phash_fake",
        "mm_phash_leakage_split",
        "stream_phash_gate",
        "mm_image_phash_neardup",
        "mm_audio_fp_neardup",
        "mm_video_phash_neardup",
        # -- r11 #2: the 27 rows whose newest driver row is r6 (the board's
        # oldest); hnsw_* also re-certify the vectorized insert kernel --
        "hnsw_layer_stats",
        "hnsw_search",
        "hnsw_search_frontier",
        "ivf_range_search",
        "ivf_search_fixed_p4",
        "emb_dbscan_clusters",
        "emb_cluster_outliers",
        "minhash_neardup",
        "simhash_neardup",
        "neardup_components_star",
        "neardup_kcore",
        "neardup_leakage_split",
        "graph_hits_topk",
        "rag_mmr_rerank",
        "doc_quality_budget_curve",
        "doc_sample_quantiles",
        "doc_window_dups",
        "evt_anomaly_mad",
        "evt_hll_hourly",
        "evt_hll_setops",
        "evt_hll_sliding",
        "evt_markov_transitions",
        "q_skew_salted_agg",
        "stream_cms_merge",
        "stream_hll_merge",
        "stream_markov_merge",
        "stream_neardup_pairs",
        # -- r11 #3: oldest r7 rows to the 50-cap, kernel-adjacent first
        # (vector.py / index-module changes this round) --
        "hnsw_search_filtered",
        "lsh_search_forest",
        "lsh_search_backup",
        "vk_vector_ops",
        "knn_exact_cosine",
        "knn_exact_euclidean",
        "knn_int8_euclidean",
        "knn_binary_rerank",
        "knn_matryoshka_rerank",
        "dedup_vectors_stats",
        "dedup_docs_first_wins",
        "ann_recall_report",
        "ivf_build_ref",
        "ivf_search_all",
        "ivf_search_filtered",
    ]
    missing = [n for n in priority if n not in merged]
    assert not missing, f"priority list references unknown queries: {missing}"
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in priority:
        out[name] = merged[name]
    for name, fn in merged.items():
        if name not in out:
            out[name] = fn
    return {name: _tuned(fn) for name, fn in out.items()}


def oracle_sql() -> dict[str, str]:
    from vers_spark.operators import (
        curation,
        diversity,
        index_queries,
        pca,
        pipeline_queries,
        relational,
        streaming_queries,
        temporal,
        text_analysis,
        text_dedup_queries,
        vector_queries,
    )

    from vers_spark.operators import bpe, rag

    out: dict[str, str] = {}
    out.update(bpe.ORACLE_SQL)
    out.update(rag.ORACLE_SQL)
    out.update(curation.ORACLE_SQL)
    out.update(diversity.ORACLE_SQL)
    out.update(temporal.ORACLE_SQL)
    out.update(relational.ORACLE_SQL)
    out.update(vector_queries.ORACLE_SQL)
    out.update(index_queries.ORACLE_SQL)
    out.update(pca.ORACLE_SQL)
    out.update(text_analysis.ORACLE_SQL)
    out.update(text_dedup_queries.ORACLE_SQL)
    out.update(pipeline_queries.ORACLE_SQL)
    out.update(streaming_queries.ORACLE_SQL)
    return out
