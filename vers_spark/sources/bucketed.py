"""Bucketed table layout — the co-located-join scale path (SURVEY.md §4).

Writing both sides of a recurring equi-join bucketed (and optionally sorted)
by the join key lets Spark's SortMergeJoin consume the scans directly: the
bucket-id ⇄ partition-id contract replaces the shuffle Exchange on BOTH
sides, and the sortBy order removes the per-task sort. At 100 TB this is the
difference between re-shuffling the fact table on every pipeline run and
shuffling it exactly once at ingest — the same trade the reference makes by
persisting posting lists per cluster (`ivfflat.rs:123-127`), generalized to
any join key.

Rules that make the no-shuffle plan actually happen (all asserted in
tests/test_plans.py):
- both tables bucketed on the SAME key set and the SAME bucket count
  (mismatched counts shuffle the smaller side);
- the join keys must cover the bucket keys exactly;
- bucket count is a capacity decision: at 100 TB pick
  ``total_size / bucket_count ≈ 128-512 MB per bucket per partition-dir``,
  and over-provision (e.g. 4096) since it cannot change without a rewrite.

Bucketed tables need the session catalog (bucket metadata lives there, not
in the parquet footer), so tables are registered with ``saveAsTable`` over
an explicit external ``path`` — plain ``spark.read.parquet`` of the same
files still works but sees no bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_keys: list[str],
    num_buckets: int,
    sort_keys: list[str] | None = None,
) -> DataFrame:
    """Write ``df`` as an external bucketed (and optionally sorted) parquet
    table registered as ``table``; returns the catalog-backed DataFrame
    (which carries the bucketing spec into join planning)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_keys)
    )
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    writer.saveAsTable(table)
    return spark.table(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — the only path that preserves the bucketing spec."""
    return spark.table(table)
