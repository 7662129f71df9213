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

    # Registration order IS the driver's sweep order, and the sweep runs
    # under a wall-clock budget (r01 truncated mid-list). Order by marginal
    # value per second: the suites the r01 sweep never reached come FIRST
    # (vector kernels, ANN indexes, text analysis/dedup, similarity,
    # streaming), the r01-green relational/curation/temporal suites re-run
    # at the end (each ≤1s), and vec_corpus_roundtrip — the entry the r01
    # sweep stopped after (driver-side temp-file I/O) — registers dead last.
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(vector_queries.QUERIES)
    pyds = out.pop("vec_corpus_pyds")
    roundtrip = out.pop("vec_corpus_roundtrip")
    out.update(index_queries.QUERIES)
    out.update(text_analysis.QUERIES)
    from vers_spark.operators import bpe, rag

    out.update(bpe.QUERIES)
    out.update(rag.QUERIES)
    out.update(text_dedup_queries.QUERIES)
    out.update(pipeline_queries.QUERIES)
    out.update(pca.QUERIES)
    out.update(diversity.QUERIES)
    out.update(streaming_queries.QUERIES)
    out.update(curation.QUERIES)
    out.update(temporal.QUERIES)
    out.update(relational.QUERIES)
    out["vec_corpus_roundtrip"] = roundtrip
    out["vec_corpus_pyds"] = pyds
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
