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
    # truncated at exactly 50 queries in every prior round. Round-14 order
    # (VERDICT r13 item 1, plus this round's own kernel changes):
    #   1. NEW queries needing their first driver row: the saved-store
    #      serving pair (lsh_saved_search — full hash oracle via the
    #      degenerate config — and lsh_saved_multiprobe, the new bench
    #      headline), then changed-kernel re-certification — the plane
    #      pack is now persisted at save()/loaded at load() and
    #      _planes_pack was restructured (collect → assemble split), so
    #      every pack-engine serving query re-certifies, plus
    #      index_lifecycle_roundtrip for the IVF file-loaded search's
    #      new sizing-count checkpoint;
    #   2. the 26 rows whose newest driver row is r9 — the board's
    #      oldest (curation/temporal/events, graph, streaming cohorts);
    #   3. oldest-r10 rows fill to the 50-cap, kernel-adjacent serving
    #      rows first. After this sweep nothing on the board is older
    #      than r10.
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
        # -- r14 #1: new saved-store serving queries (first driver rows)
        # + changed-kernel re-certification (persisted plane pack,
        # _planes_pack restructure, IVF file-loaded sizing checkpoint) --
        "lsh_saved_search",
        "lsh_saved_multiprobe",
        "lsh_search_multiprobe",
        "lsh_multiprobe_frontier",
        "lsh_search_backup",
        "index_lifecycle_roundtrip",
        # -- r14 #2: the 26 rows whose newest driver row is r9 (the
        # board's oldest) --
        "doc_curation_pipeline",
        "doc_mixture_sample",
        "doc_weighted_sample",
        "doc_version_diff",
        "doc_pretrain_batches",
        "doc_decontaminate_bloom",
        "rag_retrieve_chunks",
        "evt_purchase_asof_click",
        "evt_error_context",
        "evt_sessionize_batch",
        "evt_funnel_conversion",
        "evt_user_trend",
        "evt_gapfill_locf",
        "evt_hourly_rollup_serve",
        "evt_zorder_range_scan",
        "q_events_hourly",
        "neardup_components",
        "neardup_triangles",
        "graph_pagerank_topk",
        "graph_ppr_customer_affinity",
        "stream_events_hourly",
        "stream_dedup_ingest",
        "stream_funnel",
        "stream_events_sliding",
        "stream_merge_versioned",
        "stream_ivf_assign_fixed",
        # -- r14 #3: oldest-r10 rows to the 50-cap, kernel-adjacent
        # serving rows first --
        "ivf_cluster_stats",
        "ivfpq_residual_search",
        "knn_pq_residual_fixed",
        "stream_ivf_assign_stats",
        "stream_rollup_serve",
        "emb_similarity_join",
        "doc_bm25_topk",
        "doc_hll_distinct",
        "doc_fingerprint",
        "stream_sessions",
        "stream_sessions_tws",
        "stream_quality_gate",
        "stream_retention",
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_revenue_by_nation",
        "q6_forecast_revenue",
        "q_events_props_json",
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
