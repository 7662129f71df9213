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
    return wrapper


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
    # truncated at exactly 50 queries in every prior round. Round-9 order
    # (VERDICT r8 item 1, executed exactly):
    #   1. mm_mp4_frames — the only registered query with no driver row
    #      (landed after the r8 sweep), then mm_feature_extract — its r8
    #      rows-only→hash-oracle conversion needs an official green row;
    #   2. new round-9 queries (never swept);
    #   3. the remaining r3-era rows;
    #   4. the r4-era cohort, oracle-backed first — after this sweep no
    #      query's newest row is older than r4.
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
        # -- r9 #1: the only registry row with no driver evidence (landed
        # 199th, after the r8 sweep ran), then the r8 rows-only→hash-oracle
        # conversion whose green row isn't official yet --
        "mm_mp4_frames",
        "mm_feature_extract",
        # -- r9 NEW operators (never swept): image-modality perceptual-hash
        # near-dup — real JPEG decode path (rows-only, recovery-gated) and
        # its fake twin carrying the full hash oracle --
        "mm_phash_neardup_fake",
        "mm_image_phash_neardup",
        # audio-modality twin: windowed-energy-delta fingerprint through
        # the same banded join (real WAV path + hash-oracle fake twin)
        "mm_audio_fp_fake",
        "mm_audio_fp_neardup",
        # video-modality composition: per-frame dHash over sniffed MIXED
        # containers (MJPEG/AVI/MP4) + matched-frame aggregation
        "mm_video_phash_fake",
        "mm_video_phash_neardup",
        # leakage-safe image split: dHash components -> component-keyed
        # split, cross-split audit 0 by construction (full hash oracle)
        "mm_phash_leakage_split",
        # streaming image NEAR-dup gate: banded-Hamming store lookup per
        # micro-batch, quarantine-not-drop store (full hash oracle)
        "stream_phash_gate",
        # -- queries whose serving KERNELS changed this round (boundary-tie
        # re-admission + sequential ADC fold in PQCodec.search,
        # exact_knn_blocked, ivfpq_search_blocked) — changed code paths
        # head the sweep, per the r8 discipline --
        "knn_blocked_euclidean",
        "knn_pq_fixed",
        "knn_pq_euclidean",
        "ivfpq_blocked_serve",
        # -- the remaining r3-era rows (oldest evidence after the head) --
        "mm_meta_stats",
        "emb_pca_stats",
        "emb_pca_knn_recall",
        "emb_similarity_join",
        "mm_real_pipeline",
        # -- the r4-era cohort, oracle-backed first — clears the freshness
        # tail toward "nothing older than r4". The sweep truncates at 50:
        # with the 12 head slots above, the cohort tail past position 50
        # (stream_quality_gate onward) keeps its exactly-r4 rows and
        # rotates first in r10 --
        "bpe_train_merges",
        "doc_cms_heavy_hitters",
        "doc_curation_pipeline",
        "doc_decontaminate_bloom",
        "doc_mixture_sample",
        "doc_pretrain_batches",
        "doc_version_diff",
        "doc_weighted_sample",
        "evt_error_context",
        "evt_funnel_conversion",
        "evt_gapfill_locf",
        "evt_hourly_rollup_serve",
        "evt_purchase_asof_click",
        "evt_sessionize_batch",
        "evt_user_trend",
        "evt_zorder_range_scan",
        "graph_pagerank_topk",
        "graph_ppr_customer_affinity",
        "ivf_build_fixed",
        "mm_audio_resample",
        "mm_resize",
        "neardup_components",
        "neardup_triangles",
        "q_events_hourly",
        "rag_retrieve_chunks",
        "stream_dedup_ingest",
        "stream_events_hourly",
        "stream_events_sliding",
        "stream_funnel",
        "stream_ivf_assign_fixed",
        "stream_merge_versioned",
        "stream_quality_gate",
        "stream_retention",
        "stream_rollup_serve",
        "stream_sessions",
        "stream_sessions_tws",
        # -- r4 rows-only tail --
        "ivfpq_residual_search",
        "stream_ivf_assign_stats",
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
