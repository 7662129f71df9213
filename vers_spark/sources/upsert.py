"""Keyed copy-on-write upsert (MERGE INTO) over a hash-bucketed parquet
layout — the Delta/Hudi-shaped incremental-refresh primitive a 100 TB corpus
needs: a daily update batch must not rewrite the whole table.

Layout: the table is written ``partitionBy(_part)`` where ``_part =
pmod(hash(key), n_buckets)`` — a directory per bucket. ``merge_into`` then

1. computes the IMPACTED buckets from the update batch (a tiny distinct
   over the updates — at scale a broadcast-sized set, never the table);
2. reads ONLY those bucket directories (Catalyst partition pruning — the
   scan's PartitionFilters clause, guarded in tests);
3. anti-joins the bucket rows against the update keys and unions the
   updates (update-wins semantics, inserts included);
4. overwrites just the impacted directories via dynamic partition
   overwrite — untouched buckets keep their files byte-identical.

Cost is proportional to the update batch's bucket fan-out, not table size.
The same key-hash bucketing keeps each update's rewrite local, and readers
get bucket-pruned point lookups for free. (The reference has no persistent
mutable table at all — its corpus lives in memory, ``vers/src/utils.rs`` —
so this is a from-scratch Spark-first capability, not a port.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PART_COL = "_part"


def _bucket(key: str, n_buckets: int):
    # pmod(xxhash64) — engine-internal hash is fine here: bucketing is a
    # physical layout choice, invisible to query results.
    return F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")


def write_cow_table(df: DataFrame, path: str, key: str, n_buckets: int) -> None:
    """Materialize ``df`` as a hash-bucketed COW table (one directory per
    bucket of ``key``)."""
    (
        df.withColumn(PART_COL, _bucket(key, n_buckets))
        .write.mode("overwrite")
        .partitionBy(PART_COL)
        .parquet(path)
    )


def read_cow_table(spark: SparkSession, path: str) -> DataFrame:
    """Read the table back (drops the physical bucket column)."""
    return spark.read.parquet(path).drop(PART_COL)


def merge_into(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    n_buckets: int,
    deletes: DataFrame | None = None,
) -> list[int]:
    """Full MERGE INTO on the COW table at ``path``: ``updates`` upsert
    (update-wins on ``key``; unmatched keys insert), ``deletes`` (a DataFrame
    with a ``key`` column) remove rows. A key present in both is DELETED —
    deletes win, stated once here so the semantics are engine-checkable.
    Rewrites only impacted buckets; returns their ids (sorted).

    Edge case dynamic partition overwrite cannot express: a bucket whose
    every row is deleted produces NO output rows, so the overwrite never
    touches its directory and stale files would survive. Those buckets are
    removed explicitly after the write."""
    import shutil

    upd = updates.withColumn(PART_COL, _bucket(key, n_buckets))
    del_keys = None
    if deletes is not None:
        del_keys = deletes.select(key).withColumn(PART_COL, _bucket(key, n_buckets))
    parts_df = upd.select(PART_COL)
    if del_keys is not None:
        parts_df = parts_df.unionByName(del_keys.select(PART_COL))
    impacted = sorted(r[PART_COL] for r in parts_df.distinct().collect())

    base = spark.read.parquet(path).filter(F.col(PART_COL).isin(impacted))
    drop = upd.select(key)
    if del_keys is not None:
        drop = drop.unionByName(del_keys.select(key))
    keep = base.join(drop.distinct(), on=key, how="left_anti")
    surviving_upd = (
        upd if del_keys is None else upd.join(del_keys.select(key), on=key, how="left_anti")
    )
    merged = keep.unionByName(surviving_upd)
    # evaluated BEFORE the overwrite: merged's plan reads the base files the
    # write is about to replace, so any post-write evaluation would hit
    # deleted files. localCheckpoint would also work; one tiny distinct over
    # data already being computed is cheaper.
    written = {r[PART_COL] for r in merged.select(PART_COL).distinct().collect()}

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # merged covers the impacted buckets, so dynamic overwrite replaces
        # exactly those directories and leaves every other bucket's files
        # untouched (asserted file-level in tests).
        merged.write.mode("overwrite").partitionBy(PART_COL).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    for p in impacted:
        if p not in written:
            shutil.rmtree(f"{path}/{PART_COL}={p}", ignore_errors=True)
    return impacted
