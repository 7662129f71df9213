"""Stateful streaming funnel: the view → click → purchase conversion funnel
(operators/temporal.evt_funnel_conversion) as an incremental
``applyInPandasWithState`` operator — per-user state machine over an
in-order event stream, exact batch equivalence.

State machine (per user, events processed in (ts, event_id) order — the
same total order as the batch window program, so every decision matches):

- view(t): count it; park t in ``pending`` (awaiting its first later click).
- click(t): t is the first-following click for EVERY parked view; each view
  within the hop window moves to ``awaiting`` (with this click's t), the
  rest finalize unconverted. ``pending`` clears — later clicks are not
  "first" for these views.
- purchase(t): t is the first-following purchase for every ``awaiting``
  pair; pairs whose click is within the hop window of t finalize CONVERTED,
  the rest unconverted. ``awaiting`` clears.

State is O(events between consecutive clicks) per user — bounded by burst
size, not stream length. Each batch emits the user's snapshot "as if the
stream ended now" (parked/awaiting entries contribute zero conversions);
the LAST emission per user therefore equals the batch answer exactly, and
the driver query hash-matches the batch funnel's SQL oracle.

Ordering contract: micro-batches are staged as ts-range-partitioned files
with pinned mtimes (the stream_dedup_ingest trick), so arrival order is ts
order and ties stay inside one batch; within a batch rows are sorted by
(ts, event_id) before the state machine runs.
"""

from __future__ import annotations

import glob as _glob
import os
import tempfile
import time as _time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from vers_spark.sources.tables import load_table
from vers_spark.streaming.events import scratch_dir

_HOP_US = 172_800_000_000  # 48 h, matching operators.temporal.evt_funnel_conversion

_OUT_SCHEMA = "user_id long, n_views long, n_conversions long"
_STATE_SCHEMA = (
    "pending array<bigint>, await_click array<bigint>, nv bigint, ncv bigint"
)


def stream_funnel(
    spark: SparkSession, sf_dir: str, sink_dir: str, n_files: int = 4
) -> DataFrame:
    """Run the funnel state machine over a micro-batched event stream and
    return the final per-user (n_views, n_conversions) — the last emission
    per user from the update-mode sink."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("event_id", F.unix_micros("ts").alias("tus"), "user_id", "event_type")
    )
    src_dir = scratch_dir("vs_funnel_src_")
    ev.repartitionByRange(n_files, "tus").write.mode("overwrite").parquet(src_dir)
    base = _time.time() - 3600
    for i, f in enumerate(sorted(_glob.glob(f"{src_dir}/part-*.parquet"))):
        os.utime(f, (base + i, base + i))

    stream = (
        spark.readStream.schema("event_id long, tus long, user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            pending_s, awaiting_s, nv, ncv = state.get
            pending, awaiting = list(pending_s), list(awaiting_s)
            nv, ncv = int(nv), int(ncv)
        else:
            pending, awaiting, nv, ncv = [], [], 0, 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["tus", "event_id"])
            for t, et in zip(pdf["tus"], pdf["event_type"]):
                t = int(t)
                if et == "view":
                    nv += 1
                    pending.append(t)
                elif et == "click":
                    awaiting.extend(t for vts in pending if t <= vts + _HOP_US)
                    pending = []
                elif et == "purchase":
                    ncv += sum(1 for cts in awaiting if t <= cts + _HOP_US)
                    awaiting = []
        state.update((pending, awaiting, nv, ncv))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_views": [nv], "n_conversions": [ncv]}
        )

    updates = stream.groupBy("user_id").applyInPandasWithState(
        fn, _OUT_SCHEMA, _STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )

    def sink(bdf: DataFrame, batch_id: int) -> None:
        bdf.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(sink_dir)

    from vers_spark.streaming.events import _stream_conf

    with _stream_conf(spark):
        q = (
            updates.writeStream.foreachBatch(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{sink_dir}_ckpt")
            .start()
        )
        q.awaitTermination()

    from pyspark.sql import Window as W

    all_snaps = spark.read.parquet(sink_dir)
    w = W.partitionBy("user_id").orderBy(F.desc("batch_id"))
    return (
        all_snaps.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        # the batch program only emits users with >=1 view; a user with
        # clicks/purchases but no view must not appear here either, or
        # batch equivalence becomes data-dependent
        .filter(F.col("n_views") > 0)
        .select("user_id", "n_views", "n_conversions")
    )


def stream_retention_ingest(
    spark: SparkSession, sf_dir: str, store_dir: str, n_files: int = 4
) -> DataFrame:
    """Incremental retention-cohort ingest: each micro-batch reduces to its
    distinct (user_id, active_week) pairs, anti-joins the accumulated
    activity store, and appends only the NEW pairs — the store holds
    exactly one row per (user, week), the same only-ever-grows
    fingerprint-store shape as stream_dedup_ingest. Week truncation is
    monotone in ts, so min(week) per user in the FINAL store is the user's
    first-seen (cohort) week — the batch evt_retention_cohorts matrix
    falls out of one aggregate over the store, hash-matching its oracle.
    Store lookups stay cheap at scale by bucketing the store on user_id;
    per-batch work never exceeds the batch's distinct pairs."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    src_dir = scratch_dir("vs_retn_src_")
    ev.repartitionByRange(n_files, "ts", "event_id").write.mode("overwrite").parquet(src_dir)
    base = _time.time() - 3600
    for i, f in enumerate(sorted(_glob.glob(f"{src_dir}/part-*.parquet"))):
        os.utime(f, (base + i, base + i))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def ingest(bdf: DataFrame, batch_id: int) -> None:
        sess = bdf.sparkSession
        pairs = bdf.select(
            "user_id",
            F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week"),
        ).distinct()
        # only the store's absence means "first batch" — any other read
        # error must surface, not silently skip the anti-join
        if os.path.exists(store_dir):
            store = sess.read.parquet(store_dir)
            pairs = pairs.join(store, ["user_id", "week"], "left_anti")
        pairs.write.mode("append").parquet(store_dir)

    from vers_spark.streaming.events import _stream_conf

    with _stream_conf(spark):
        q = (
            stream.writeStream.foreachBatch(ingest)
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{store_dir}_ckpt")
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(store_dir)
