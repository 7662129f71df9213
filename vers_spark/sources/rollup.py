"""Continuous-aggregate rollup (the "hypertable rollup" pattern — public
design from TimescaleDB continuous aggregates / Druid rollup segments): a
materialized hourly aggregate over the events stream plus a serving view
that unions the rollup for CLOSED hours with a raw scan of only the OPEN
tail.

Why it matters at 100 TB: an hourly dashboard query over a year of events
must not rescan a year of raw rows. With the rollup materialized and
partitioned by day, the served plan reads ~8760 tiny aggregate rows plus
raw events of the last open hour — partition pruning does the rest. The
refresh is INCREMENTAL: a watermark manifest records the last closed hour
already rolled up; a refresh re-aggregates only hours after it (one
filtered scan of the new tail, APPENDED into day partitions — a
refresh's hours are provably disjoint from everything stored (delta ∈
(watermark, open), strictly above the highest stored hour; the
no-overlap/no-gap property is test-gated), so plain append is exact, a
boundary day simply accumulates one small file per refresh that touches
it, and untouched history is never rewritten. Day granularity keeps the
store at ~365 partitions/year instead of 8760 hour dirs of tiny files. Exactly-once under task retries
comes from the parquet job commit protocol per refresh; a multi-writer
deployment would wrap each refresh in a manifest commit like
sources/versioned.py).

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


def _parse_watermark(wm) -> int | None:
    """Manifest-format migration: the watermark was originally persisted as
    a timestamp STRING and is now int unix-micros. Accept both — a pre-change
    manifest must not crash the refresh — and treat anything unparseable as
    None (forces one full re-roll, which the disjointness property makes
    append-safe only on an empty store, so fall back by re-reading stored
    hours is NOT needed: None simply means 'no incremental bound', and the
    closed-hour filter plus the caller's fresh store keep semantics; for a
    populated store an unparseable watermark raises instead of silently
    double-appending)."""
    if wm is None or isinstance(wm, int):
        return wm
    s = str(wm)
    try:
        return int(s)
    except ValueError:
        pass
    from datetime import datetime, timezone

    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S.%f"):
        try:
            dt = datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)
            return int(dt.timestamp() * 1_000_000)
        except ValueError:
            continue
    raise ValueError(
        f"unparseable rollup watermark {wm!r}: refusing to refresh (an append "
        "with no incremental bound would double-count stored hours)"
    )


def hourly_rollup(events: DataFrame) -> DataFrame:
    """(hour, day, event_type, n_events, sum_value_dec) — the stored shape."""
    return (
        events.groupBy(
            _hour("ts").alias("hour"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast(_VAL_DEC)).cast(_VAL_DEC).alias("sum_value_dec"),
        )
        .withColumn("day", F.to_date("hour"))
    )


def refresh_rollup(spark: SparkSession, events: DataFrame, path: str) -> dict:
    """Incremental refresh: roll up hours in (watermark, max_closed] only.

    Closed hour = strictly before the hour of max(ts) (the open hour keeps
    receiving rows). The delta's hours are APPENDED as new files into their
    day partitions — NOT overwritten: the delta is provably disjoint from
    everything stored (its hours lie strictly above the watermark = the
    highest stored hour, the no-overlap/no-gap property the tests gate), so
    append is exact and a re-run of the same refresh is a no-op delta, never
    a duplicate. Out-of-order arrivals into already-closed hours are the one
    case append cannot see — :func:`reconcile_rollup` handles those.
    Returns the manifest written (watermark + hours refreshed).

    The watermark is stored and compared as UNIX MICROS (bigint): a
    timestamp string round-trip would re-enter as a session-timezone
    TIMESTAMP and shift the bound by the UTC offset under a non-UTC
    ``spark.sql.session.timeZone``, silently double-counting (append!) or
    dropping the boundary hours; epoch micros are timezone-independent."""
    bounds = events.agg(F.max("ts").alias("mx")).collect()[0]
    if bounds["mx"] is None:
        return {"watermark": None, "hours_refreshed": 0}
    manifest_path = f"{path}/_rollup_manifest.json"
    watermark = None
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            watermark = _parse_watermark(json.load(f)["watermark"])

    closed = events.filter(_hour(F.col("ts")) < _hour(F.lit(bounds["mx"])))
    if watermark is not None:
        closed = closed.filter(
            F.unix_micros(_hour(F.col("ts"))) > F.lit(int(watermark)).cast("long")
        )
    delta = hourly_rollup(closed)
    n_hours = delta.select("hour").distinct().count()
    if n_hours:
        delta.write.mode("append").partitionBy("day").parquet(path)
    new_wm = closed.agg(F.max(F.unix_micros(_hour(F.col("ts"))))).collect()[0][0]
    manifest = {
        "watermark": int(new_wm) if new_wm is not None else watermark,
        "hours_refreshed": int(n_hours),
    }
    os.makedirs(path, exist_ok=True)
    with open(manifest_path, "w") as f:
        json.dump(manifest, f)
    return manifest


def reconcile_rollup(spark: SparkSession, events: DataFrame, path: str) -> dict:
    """Late-data reconciliation: the incremental refresh assumes a
    time-ordered append log, so rows that arrive AFTER their hour closed
    leave the stored rollup stale. Reconciliation compares stored per-hour
    row counts against a raw recount (one COUNT aggregate over closed
    hours — no values move) and re-aggregates ONLY the day partitions
    containing drifted hours, via dynamic partition overwrite: untouched
    history is never rewritten, and cost is ∝ drifted days, not table size.
    Returns {"hours_drifted", "days_rewritten"}."""
    bounds = events.agg(F.max("ts").alias("mx")).collect()[0]
    if bounds["mx"] is None or not os.path.exists(f"{path}/_rollup_manifest.json"):
        return {"hours_drifted": 0, "days_rewritten": 0}
    open_hour = _hour(F.lit(bounds["mx"]))
    stored_h = (
        spark.read.parquet(path)
        .groupBy("hour")
        .agg(F.sum("n_events").cast("long").alias("n_stored"))
    )
    raw_h = (
        events.filter(_hour(F.col("ts")) < open_hour)
        .groupBy(_hour("ts").alias("hour"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_raw"))
    )
    drifted = (
        raw_h.join(stored_h, "hour", "left")
        .filter(F.coalesce(F.col("n_stored"), F.lit(0)) != F.col("n_raw"))
        .select(F.to_date("hour").alias("day"), "hour")
    )
    days = sorted({r["day"] for r in drifted.select("day").distinct().collect()})
    n_hours = drifted.count()
    if not days:
        return {"hours_drifted": 0, "days_rewritten": 0}
    day_lits = [F.lit(d) for d in days]
    delta = hourly_rollup(
        events.filter(_hour(F.col("ts")) < open_hour).filter(
            F.to_date(_hour(F.col("ts"))).isin(day_lits)
        )
    )
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        delta.write.mode("overwrite").partitionBy("day").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    return {"hours_drifted": int(n_hours), "days_rewritten": len(days)}


def compact_rollup(spark: SparkSession, path: str, max_files_per_day: int = 8) -> dict:
    """Bound small-file accumulation in a long-lived rollup store: every
    incremental refresh APPENDS one parquet file per day it touches, so a
    boundary day collects one file per refresh — after months of hourly
    refreshes a day partition is hundreds of tiny files and the serving
    scan pays per-file open cost. Compaction rewrites ONLY the day
    partitions whose file count exceeds the bound, each into a single file
    (rows verbatim — no re-aggregation, so the exactness story is
    untouched), via dynamic partition overwrite; untouched days keep their
    files byte-identical. Cost ∝ fragmented days, not store size. Returns
    {"days_compacted", "files_removed"}."""
    if not os.path.isdir(path):
        return {"days_compacted": 0, "files_removed": 0}
    frag: dict[str, int] = {}
    for d in os.listdir(path):
        if not d.startswith("day="):
            continue
        n = len(
            [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        )
        if n > max_files_per_day:
            frag[d.split("=", 1)[1]] = n
    if not frag:
        return {"days_compacted": 0, "files_removed": 0}
    days = sorted(frag)
    df = (
        spark.read.parquet(path)
        .filter(F.col("day").isin(days))
        # one task per fragmented day → exactly one output file per day dir
        .repartition(len(days), F.col("day"))
    )
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy("day").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    return {
        "days_compacted": len(days),
        "files_removed": sum(frag.values()) - len(days),
    }


def serve_hourly(spark: SparkSession, events: DataFrame, path: str) -> DataFrame:
    """The continuous-aggregate view: rollup rows for closed hours UNION a
    raw aggregation of ONLY the open tail (rows at or after the hour of
    max(ts)). Exactly equal to aggregating raw — by construction, because
    the stored partials are integers/decimals."""
    bounds = events.agg(F.max("ts").alias("mx")).collect()[0]
    open_hour = _hour(F.lit(bounds["mx"]))
    stored = (
        spark.read.parquet(path)
        # day-level predicate first so partition PRUNING applies, then the
        # exact hour bound for the boundary day
        .filter(F.col("day") <= F.to_date(open_hour))
        .filter(F.col("hour") < open_hour)
    )
    tail = hourly_rollup(events.filter(_hour(F.col("ts")) >= open_hour))
    return stored.select("hour", "event_type", "n_events", "sum_value_dec").unionByName(
        tail.select("hour", "event_type", "n_events", "sum_value_dec")
    )
