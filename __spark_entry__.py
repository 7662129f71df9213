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
    # truncated at exactly 50 queries in every prior round. Round-10 order
    # (VERDICT r9 items 1-3, executed exactly):
    #   1. the fingerprint near-dup family — its JOIN KERNEL changed this
    #      round (distinct-first restructure + default caps + auto band
    #      width), so every query through phash_neardup_pairs re-certifies
    #      at the head (changed-kernel discipline);
    #   2. the two rows-only→hash-oracle conversions (emb_similarity_join,
    #      ivf_cluster_stats) plus the NEW hash-gated residual IVF×PQ twin
    #      (knn_pq_residual_fixed) — new oracles need official green rows;
    #   3. the 7 queries whose newest row is exactly r4 (the cohort tail the
    #      r9 sweep's 50-cap displaced), then the 18 r5-era rows (TPC-H
    #      q12-q22 + the window/JSON cohort) — after this sweep nothing on
    #      the board is older than r6;
    #   4. the oldest r6-era rows fill the remaining slots (TPC-H q1-q11 +
    #      text-analysis heads), thinning the r6 cohort for r11.
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
        # -- r10 #1: the fingerprint family whose shared join kernel changed
        # (phash_neardup_pairs: distinct-first + default caps + auto band
        # width) — oracle-backed twins first, then the real-decode paths --
        "mm_phash_neardup_fake",
        "mm_audio_fp_fake",
        "mm_video_phash_fake",
        "mm_phash_leakage_split",
        "stream_phash_gate",
        "mm_image_phash_neardup",
        "mm_audio_fp_neardup",
        "mm_video_phash_neardup",
        # -- r10 #2: rows-only→hash-oracle conversions (new oracles + new
        # deterministic builds behind them) --
        "emb_similarity_join",
        "ivf_cluster_stats",
        "knn_pq_residual_fixed",
        # -- r10 #3a: the 7 queries whose newest row is exactly r4 --
        "stream_quality_gate",
        "stream_retention",
        "stream_rollup_serve",
        "stream_sessions",
        "stream_sessions_tws",
        "ivfpq_residual_search",
        "stream_ivf_assign_stats",
        # -- r10 #3b: the 18 r5-era rows (TPC-H q12-q22 + window/JSON) --
        "q12_priority_classes",
        "q13_customer_distribution",
        "q14_promo_revenue",
        "q15_top_supplier",
        "q16_supplier_count",
        "q17_small_quantity_revenue",
        "q18_large_volume_customers",
        "q19_disjunctive_revenue",
        "q20_bulk_suppliers",
        "q21_sole_late_supplier",
        "q22_idle_rich_customers",
        "q_customer_value_windows",
        "q_doc_length_percentiles",
        "q_events_grouping_sets",
        "q_events_props_json",
        "q_events_range_window",
        "q_events_user_stats",
        "q_top_customers_per_nation",
        # -- r10 #4: oldest r6-era rows fill to the 50-cap (TPC-H q1-q11 +
        # text heads); the rest of the r6 cohort rotates first in r11 --
        "q1_pricing_summary",
        "q2_cheapest_supplier",
        "q3_shipping_priority",
        "q4_late_orders",
        "q5_revenue_by_nation",
        "q6_forecast_revenue",
        "q7_volume_shipping",
        "q8_market_share",
        "q9_product_profit",
        "q10_returned_items",
        "q11_part_value_concentration",
        "doc_bm25_topk",
        "doc_fingerprint",
        "doc_hll_distinct",
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
