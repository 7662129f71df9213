"""Continuous-aggregate rollup (the "hypertable rollup" pattern — public
design from TimescaleDB continuous aggregates / Druid rollup segments): a
materialized hourly aggregate over the events stream plus a serving view
that unions the rollup for CLOSED hours with a raw scan of only the OPEN
tail.

Why it matters at 100 TB: an hourly dashboard query over a year of events
must not rescan a year of raw rows. With the rollup materialized and
partitioned by hour, the served plan reads ~8760 tiny aggregate rows plus
raw events of the last open hour — partition pruning does the rest. The
refresh is INCREMENTAL: a watermark manifest records the last closed hour
already rolled up; a refresh re-aggregates only hours after it (one
filtered scan of the new tail, dynamic partition overwrite of only the
touched HOUR partitions — hour-granular, so a refresh can never clobber
earlier hours sharing a coarser partition, and untouched history is never
rewritten, same discipline as sources/upsert.py).

Determinism note: the rollup stores per-hour BIGINT counts and SUM(value)
as DECIMAL(18,4) — integer/decimal partials re-aggregate exactly, so
serving from the rollup is bit-identical to aggregating raw rows (a float
sum would make rollup-vs-raw differ by summation order; the driver hash
gate would catch exactly that).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# value carries ~6 significant digits; 4 fractional decimal digits at
# DECIMAL(18,4) is exact for the shipped corpus and re-aggregates exactly
_VAL_DEC = "decimal(18,4)"


def _hour(col):
    return F.date_trunc("hour", col)


def hourly_rollup(events: DataFrame) -> DataFrame:
    """(hour, hour_key, event_type, n_events, sum_value_dec) — the stored shape."""
    return (
        events.groupBy(
            _hour("ts").alias("hour"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast(_VAL_DEC)).cast(_VAL_DEC).alias("sum_value_dec"),
        )
        .withColumn("hour_key", F.date_format("hour", "yyyy-MM-dd-HH"))
    )


def refresh_rollup(spark: SparkSession, events: DataFrame, path: str) -> dict:
    """Incremental refresh: roll up hours in (watermark, max_closed] only.

    Closed hour = strictly before the hour of max(ts) (the open hour keeps
    receiving rows). Touched HOUR partitions are dynamically overwritten;
    returns the manifest written (watermark + hours refreshed)."""
    bounds = events.agg(F.max("ts").alias("mx")).collect()[0]
    if bounds["mx"] is None:
        return {"watermark": None, "hours_refreshed": 0}
    manifest_path = f"{path}/_rollup_manifest.json"
    watermark = None
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            watermark = json.load(f)["watermark"]

    closed = events.filter(_hour(F.col("ts")) < _hour(F.lit(bounds["mx"])))
    if watermark is not None:
        closed = closed.filter(_hour(F.col("ts")) > F.lit(watermark).cast("timestamp"))
    delta = hourly_rollup(closed)
    n_hours = delta.select("hour").distinct().count()
    if n_hours:
        with _dynamic_overwrite(spark):
            delta.write.mode("overwrite").partitionBy("hour_key").parquet(path)
    new_wm = closed.agg(F.max(_hour(F.col("ts")))).collect()[0][0]
    manifest = {
        "watermark": str(new_wm) if new_wm is not None else watermark,
        "hours_refreshed": int(n_hours),
    }
    os.makedirs(path, exist_ok=True)
    with open(manifest_path, "w") as f:
        json.dump(manifest, f)
    return manifest


class _dynamic_overwrite:
    """Scoped spark.sql.sources.partitionOverwriteMode=dynamic (overwrite
    only the partitions present in the written frame)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", self.prev)


def serve_hourly(spark: SparkSession, events: DataFrame, path: str) -> DataFrame:
    """The continuous-aggregate view: rollup rows for closed hours UNION a
    raw aggregation of ONLY the open tail (rows at or after the hour of
    max(ts)). Exactly equal to aggregating raw — by construction, because
    the stored partials are integers/decimals."""
    bounds = events.agg(F.max("ts").alias("mx")).collect()[0]
    open_hour = _hour(F.lit(bounds["mx"]))
    stored = spark.read.parquet(path).filter(F.col("hour") < open_hour)
    tail = hourly_rollup(events.filter(_hour(F.col("ts")) >= open_hour))
    return stored.select("hour", "event_type", "n_events", "sum_value_dec").unionByName(
        tail.select("hour", "event_type", "n_events", "sum_value_dec")
    )
