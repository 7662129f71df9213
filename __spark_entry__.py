"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()``
exposes every implemented operator from SURVEY.md §2 as (spark, sf_dir) →
DataFrame; ``oracle_sql()`` gives the DuckDB twin for each SQL-expressible
query (same column names/types). Non-SQL-expressible ops (approximate ANN
search, iterative builds) appear in ``queries()`` only → rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q5-shape revenue-by-nation on sf0.001."""
    from vers_spark.operators.relational import q5_revenue_by_nation

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
    roundtrip = out.pop("vec_corpus_roundtrip")
    out.update(index_queries.QUERIES)
    out.update(text_analysis.QUERIES)
    out.update(text_dedup_queries.QUERIES)
    out.update(pipeline_queries.QUERIES)
    out.update(pca.QUERIES)
    out.update(diversity.QUERIES)
    out.update(streaming_queries.QUERIES)
    out.update(curation.QUERIES)
    out.update(temporal.QUERIES)
    out.update(relational.QUERIES)
    out["vec_corpus_roundtrip"] = roundtrip
    return out


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

    out: dict[str, str] = {}
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
