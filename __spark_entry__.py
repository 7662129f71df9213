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
    # truncated at exactly 50 queries in every prior round. Round-12 order
    # (VERDICT r11 item 3, executed exactly):
    #   1. changed-kernel re-certification: every LSH serving query (the
    #      multiprobe/backup paths gained the broadcast-hinted DPP probe
    #      join and _join_leaves gained the selective-predicate filter;
    #      add() now retires the plane pack — index_lifecycle_roundtrip
    #      exercises it), and every HNSW search query (the local kernel
    #      now f64-re-ranks the full ef set before the k-cut — the
    #      duplicate-heavy ADVICE fix);
    #   2. the 26 rows whose newest driver row is r7 — the board's oldest
    #      (knn/vector remnants, r5-era doc/evt/relational rows);
    #   3. oldest-r8 rows fill to the 50-cap, kernel-adjacent first
    #      (embedding near-dup + vector-corpus cohorts share the index
    #      and vector modules). After this sweep nothing on the board is
    #      older than r8.
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
        # -- r12 #1: changed-kernel re-certification. LSH serving: the
        # probe side of the leaf join is now broadcast-hinted and carries
        # the selective startswith(_pp,'p') predicate (restores dynamic
        # partition pruning on the saved store); add() retires the source
        # instance's plane-pack broadcast. HNSW serving: the local search
        # kernel f64-re-ranks the full ef candidate set before the k-cut --
        "lsh_search_multiprobe",
        "lsh_multiprobe_frontier",
        "lsh_search_forest",
        "lsh_search_backup",
        "lsh_search_degenerate",
        "lsh_search_filtered",
        "index_lifecycle_roundtrip",
        "hnsw_search",
        "hnsw_search_frontier",
        "hnsw_search_filtered",
        "ann_recall_report",
        # -- r12 #2: the 26 rows whose newest driver row is r7 (the
        # board's oldest; lsh_search_multiprobe already heads the list) --
        "ivf_search_p4",
        "ivfpq_search",
        "emb_kcenter_sample",
        "emb_quantize_stats",
        "emb_semantic_dedup",
        "emb_similarity_join_fixed",
        "emb_triplet_mining",
        "doc_collocation_pmi",
        "doc_pack_sequences",
        "doc_pack_sequences_sharded",
        "doc_quality",
        "doc_split_assign",
        "doc_stratified_sample",
        "doc_token_stats",
        "evt_retention_cohorts",
        "evt_rfm_segments",
        "evt_value_outliers",
        "mm_jpeg_pipeline",
        "q_customer_balance_deciles",
        "q_customer_order_activity",
        "q_nation_presence",
        "q_orders_cube",
        "q_orders_pivot_status",
        "q_rollup_orders",
        "q_sketch_stats",
        # -- r12 #3: oldest-r8 rows to the 50-cap, kernel-adjacent first
        # (embedding near-dup / vector-corpus cohorts share the index and
        # vector modules this round touched) --
        "emb_brp_neardup",
        "emb_cosine_neardup",
        "emb_knn_selfjoin_exact",
        "emb_neardup_pairs",
        "emb_label_centroids",
        "vec_corpus_pyds",
        "vec_corpus_roundtrip",
        "minhash_signatures",
        "ngram_jaccard_pairs",
        "ngram_jaccard_prefix",
        "simhash_docs",
        "dedup_docs_normalized",
        "doc_containment_pairs",
        "neardup_best_quality",
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
