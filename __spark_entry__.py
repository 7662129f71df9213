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
    # truncated at exactly 50 queries in every prior round. Round-13 order
    # (VERDICT r12 item 3, plus this round's own kernel changes):
    #   1. changed-kernel re-certification: the multiprobe serving path
    #      gained the _BROADCAST_QUERY_CAP gate (hints off above the cap;
    #      the checkpoint-materializing count lands in every call), and
    #      LSH/HNSW add() now refresh the manifest (telemetry +
    #      entrypoints) — index_lifecycle_roundtrip exercises add();
    #   2. the 31 rows whose newest driver row is r8 — the board's oldest
    #      (format roundtrips, staging-heavy merge/versioned queries,
    #      mm container queries, BPE/doc analysis);
    #   3. oldest-r9 rows fill to the 50-cap, the mm/audio fingerprint
    #      cohort first, then the kernel-adjacent knn/ivf/pq serving
    #      rows. After this sweep nothing on the board is older than r9.
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
        # -- r13 #1: changed-kernel re-certification (this round's diff:
        # multiprobe broadcast gate + checkpoint-materializing count;
        # LSH/HNSW add() manifest refresh) --
        "lsh_search_multiprobe",
        "lsh_multiprobe_frontier",
        "lsh_search_backup",
        "index_lifecycle_roundtrip",
        # -- r13 #2: the 31 rows whose newest driver row is r8 (the
        # board's oldest) --
        "doc_avro_roundtrip",
        "doc_csv_roundtrip",
        "doc_jsonl_roundtrip",
        "doc_orc_roundtrip",
        "doc_schema_evolution",
        "doc_merge_full",
        "doc_upsert_merge",
        "doc_time_travel",
        "doc_decontaminate",
        "doc_expectations",
        "doc_pii_scrub",
        "doc_mllib_exactdup",
        "doc_bigram_topk",
        "doc_heavy_hitter_tokens",
        "doc_lang_confusion",
        "doc_lang_id",
        "doc_repetition_quality",
        "doc_tfidf_topk",
        "doc_vocab_coverage",
        "doc_chunk_udtf",
        "doc_chunk_windows",
        "bpe_corpus_tokens",
        "bpe_segment_vocab",
        "mm_audio_mulaw",
        "mm_avi_frames",
        "mm_frame_sample",
        "mm_mjpeg_frames",
        "rag_maxsim_rerank",
        "stream_dedup_users",
        "stream_interval_join",
        "stream_static_enrich",
        # -- r13 #3: oldest-r9 rows to the 50-cap: the mm/audio
        # fingerprint cohort first, then kernel-adjacent knn/ivf/pq
        # serving rows --
        "mm_audio_resample",
        "mm_feature_extract",
        "mm_meta_stats",
        "mm_mp4_frames",
        "mm_real_pipeline",
        "mm_resize",
        "ivf_build_fixed",
        "ivfpq_blocked_serve",
        "knn_blocked_euclidean",
        "knn_pq_euclidean",
        "knn_pq_fixed",
        "emb_pca_knn_recall",
        "emb_pca_stats",
        "bpe_train_merges",
        "doc_cms_heavy_hitters",
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
