"""Temporal joins over the ``events`` stream table: as-of join and bounded
range join — operators Spark has no built-in for (SURVEY.md §2.E extension
surface; the reference has no temporal ops at all, `base.rs:27-58`).

Scale shapes (the whole point — neither operator may go O(n²)):

- **as-of join** = union both sides, ONE shuffle on the key, one window pass
  with ``last(..., ignorenulls)``. No range explosion, no per-row probe: at
  100 TB this is a single sort-shuffle per side, and skewed users are just
  big partitions (AQE). This is the standard distributed as-of shape (same
  trick as pandas ``merge_asof`` after a co-sort).
- **range join** = temporal bucketing: quantize time into interval-sized
  buckets, explode the PROBE side into the ≤3 buckets its window covers,
  equi-join on (key, bucket), then exact ±window filter. Fan-out is bounded
  by ``window/bucket + 1`` copies of the probe side only; the (usually much
  bigger) context side keeps exactly one row per event. Catalyst sees a
  plain equi-join → broadcast/AQE/skew handling all apply.

Determinism: every tie is broken by event_id; all time arithmetic is integer
microseconds (``unix_micros`` ⇄ DuckDB ``epoch_us``), never float seconds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vers_spark.sources.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tie_col: str = "event_id",
) -> DataFrame:
    """For each left row, attach the latest right row with ``right.ts <
    left.ts`` (strictly prior) and equal join keys; ties on equal right ts
    broken by the largest ``tie_col``. Left rows with no prior right row keep
    nulls (left-outer as-of).

    Single shuffle on ``on``; no inequality join, no explosion.
    """
    right_cols = right_cols or [c for c in right.columns if c not in on]
    payload_fields = list(dict.fromkeys([right_ts, tie_col, *right_cols]))
    payload = F.struct(*[F.col(c) for c in payload_fields if c in right.columns])
    # side 0 = right, but at EQUAL ts the left row must sort FIRST so the
    # frame (up to current row) excludes same-instant right rows → strict <
    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.col(tie_col).alias("_tie"),
        payload.alias("_payload"),
    )
    l = left.select(
        *left.columns,
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tie_col).alias("_tie") if tie_col in left.columns else F.lit(0).alias("_tie"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l.unionByName(r.select(*on, "_ts", "_side", "_tie", "_payload"), allowMissingColumns=True)
    matched = matched.withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
    return matched.filter(F.col("_side") == 0).drop("_ts", "_side", "_tie", "_payload")


def range_join_bucketed(
    probe: DataFrame,
    ctx: DataFrame,
    on: list[str],
    window_us: int,
    probe_ts: str = "ts",
    ctx_ts: str = "ts",
) -> DataFrame:
    """All (probe, ctx) pairs with equal keys and ``|ctx.ts − probe.ts| ≤
    window_us``, via bucketed equi-join (no O(n²) theta join). Probe columns
    come through as-is; ctx columns prefixed ``ctx_``."""
    bucket = lambda c: (F.unix_micros(F.col(c)) / F.lit(window_us)).cast("long")  # noqa: E731
    p = probe.withColumn("_us", F.unix_micros(F.col(probe_ts))).withColumn(
        "_bucket",
        F.explode(F.sequence(bucket(probe_ts) - 1, bucket(probe_ts) + 1)),
    )
    c = ctx.select(
        *[F.col(k) for k in on],
        *[F.col(x).alias(f"ctx_{x}") for x in ctx.columns if x not in on],
        bucket(ctx_ts).alias("_bucket"),
        F.unix_micros(F.col(ctx_ts)).alias("_ctx_us"),
    )
    return (
        p.join(c, [*on, "_bucket"])
        .filter(F.abs(F.col("_ctx_us") - F.col("_us")) <= window_us)
        .drop("_bucket", "_us", "_ctx_us")
    )


# ---- driver-checkable queries ------------------------------------------------


def evt_purchase_asof_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution as-of join: each purchase event ↔ the user's most recent
    strictly-prior click, plus the gap in microseconds."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    out = asof_join(purchases, clicks, on=["user_id"], right_cols=["event_id"])
    return out.select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
        F.col("_match.event_id").alias("click_id"),
        (F.unix_micros("ts") - F.unix_micros("_match.ts")).alias("gap_us"),
    )


def evt_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: per error event, the count + max value of the same user's
    click/view events within ±5 minutes (diagnostic context window)."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    ctx = ev.filter(F.col("event_type").isin("click", "view")).select(
        "event_id", "user_id", "ts", "value"
    )
    joined = range_join_bucketed(errors, ctx, on=["user_id"], window_us=300_000_000)
    agg = joined.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_ctx"),
        F.max("ctx_value").alias("max_ctx_value"),
    )
    return (
        errors.join(agg, "event_id", "left")
        .select(
            F.col("event_id").alias("error_id"),
            "user_id",
            F.coalesce("n_ctx", F.lit(0)).alias("n_ctx"),
            "max_ctx_value",
        )
    )


def evt_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization — the SQL-expressible twin of
    ``streaming.sessions.sessionize`` (same 30-min inactivity gap): a session
    break is a gap > 1800 s from the previous event of the same user; the
    session id is the running count of breaks. Two ordered window passes over
    one shuffle on user_id, then one aggregate — no state store needed in
    batch. Gap arithmetic is integer microseconds (unix_micros ⇄ epoch_us),
    never float seconds."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_s = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    sess = ev.withColumn(
        "session_id",
        F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias("duration_us"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .orderBy("user_id", "session_id")
    )


_HOP_US = 172_800_000_000  # 48 h — sized to the corpus's ~34 h median next-click gap


def evt_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: a view converts when the
    FIRST click after it (in (ts, event_id) order) lands within the hop
    window (48 h) and the first purchase after that click lands within the
    same window of the click. Per-user conversion counts and rate.

    Shape: ONE shuffle on user_id for the following-frame window (masked
    min gives each row its next click/purchase timestamp — no self-join,
    no range explosion), then an equi-join of views to the deduplicated
    click table on (user_id, next_click_ts). All time arithmetic is integer
    microseconds; every tie is broken by event_id, so the identical window
    program in DuckDB hash-matches."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "event_id", F.unix_micros("ts").alias("tus"), "event_type")
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    e = ev.withColumns(
        {
            "nc": F.min(F.when(F.col("event_type") == "click", F.col("tus"))).over(w_next),
            "np": F.min(F.when(F.col("event_type") == "purchase", F.col("tus"))).over(w_next),
        }
    )
    w_dedup = Window.partitionBy("user_id", "tus").orderBy("event_id")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("tus").alias("cts"), F.col("np").alias("c_np"))
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("tus").alias("vts"), "nc"
    )
    j = views.join(
        clicks,
        (views.user_id == clicks.user_id) & (views.nc == clicks.cts),
        "left",
    ).select(views.user_id, "vts", "nc", "c_np")
    converted = (
        F.col("nc").isNotNull()
        & (F.col("nc") <= F.col("vts") + F.lit(_HOP_US))
        & F.col("c_np").isNotNull()
        & (F.col("c_np") <= F.col("nc") + F.lit(_HOP_US))
    ).cast("long")
    return j.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_views"),
        F.sum(converted).alias("n_conversions"),
        (
            F.sum(converted).cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("conv_rate"),
    )


def evt_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value trend: closed-form OLS slope of event value over time
    — the grouped regression primitive (drift/engagement-trend detection)
    as ONE aggregation, no ML library.

    Cross-engine exactness discipline: every SUM is integer — x is seconds
    relative to the user's first event (BIGINT), y is value in DECIMAL(18,4)
    ten-thousandths (BIGINT) — so summation order cannot perturb anything;
    the only float math is the final slope division over exact BIGINT
    operands (< 2^53, cast exactly), where both engines execute the same
    IEEE ops on identical inputs. slope = (nΣxy − ΣxΣy)/((nΣx² − (Σx)²)·1e4)
    in value-units per second; NULL for degenerate (single-instant) users."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d = ev.select(
        "user_id",
        F.expr("(unix_micros(ts) - min(unix_micros(ts)) OVER (PARTITION BY user_id)) div 1000000").alias("x"),
        F.expr("CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)").alias("y"),
    )
    agg = d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("x").alias("sx"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * y")).alias("sxy"),
    )
    n, sx, sxx, sy, sxy = (F.col(c).cast("double") for c in ["n_events", "sx", "sxx", "sy", "sxy"])
    den = n * sxx - sx * sx
    slope = F.when(den == 0.0, F.lit(None).cast("double")).otherwise(
        (n * sxy - sx * sy) / (den * F.lit(10000.0))
    )
    return agg.select(
        "user_id",
        "n_events",
        slope.alias("slope_per_sec"),
        (sy / (n * F.lit(10000.0))).alias("mean_value"),
    ).orderBy("user_id")


def evt_hourly_rollup_serve(spark, sf_dir: str):
    """Continuous-aggregate serving (sources/rollup.py — the hypertable-
    rollup pattern): materialize the hourly rollup INCREMENTALLY (two
    refreshes: first over a simulated yesterday, then the full table — the
    second touches only the new tail hours), then serve closed hours from
    the rollup parquet UNION an open-tail raw aggregation. Stored partials
    are BIGINT/DECIMAL(18,4), so serving from the rollup is bit-identical
    to aggregating raw rows — which is exactly what the oracle states."""
    from vers_spark.sources.rollup import refresh_rollup, serve_hourly
    from vers_spark.streaming.events import scratch_dir

    events = load_table(spark, sf_dir, "events")
    path = scratch_dir("vs_rollup_") + "/hourly"
    cut = events.agg(
        F.timestamp_micros(
            ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2).cast("long")
        ).alias("mid")
    ).collect()[0]["mid"]
    refresh_rollup(spark, events.filter(F.col("ts") <= F.lit(cut)), path)
    refresh_rollup(spark, events, path)
    served = serve_hourly(spark, events, path)
    # Driver-canonicalizer discipline (r3 hash-fail): the STORED partials
    # stay DECIMAL(18,4)/BIGINT (that's the bit-exact re-aggregation story),
    # but the query OUTPUT projects the timestamp through date_format and
    # the decimal to ×10⁴ fixed-point BIGINT — raw TIMESTAMP/DECIMAL cells
    # render differently in Spark-via-Arrow vs DuckDB pandas frames
    # (ns-vs-µs units, Decimal-object vs float64) and break the repr hash
    # even when values agree.
    return served.select(
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
        "n_events",
        (F.col("sum_value_dec") * 10000).cast("long").alias("sum_value_fp"),
    )


def evt_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid densification + last-observation-carried-forward — the
    time-series feature-engineering op (gap filling) Spark has no builtin
    for. Per user: an hourly grid spanning [first, last] event hour
    (``sequence`` + explode — the grid is generated, never joined against a
    calendar table), left-joined with the user's hourly aggregate, missing
    hours flagged and their value carried forward with
    ``last(ignorenulls)`` over one user-ordered window. One shuffle on
    user_id; grid fan-out is bounded by each user's own span. Counts are
    BIGINT and the carried value DECIMAL(18,4), so the DuckDB twin
    (generate_series + IGNORE NULLS last_value) hash-matches exactly."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("decimal(18,4)").alias("sum_dec"),
    )
    span = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = span.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("hour"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "hour"], "left")
        .withColumn("is_gap", F.col("n_events").isNull())
        .withColumn("n_events", F.coalesce("n_events", F.lit(0)).cast("long"))
        .withColumn("locf_sum", F.last("sum_dec", ignorenulls=True).over(w))
        # output projection discipline (r3 driver hash-fail): timestamp →
        # formatted string, DECIMAL → ×10⁴ fixed-point BIGINT; the LOCF
        # math itself stays exact DECIMAL
        .select(
            "user_id",
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "n_events",
            "is_gap",
            (F.col("locf_sum") * 10000).cast("long").alias("locf_sum_fp"),
        )
    )


def evt_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences —
    the behavioral-model summary (what follows what, per user journey) that
    funnels can't express because they fix the step order up front. Per
    user, events sort by (ts, event_id); each consecutive pair is one
    (from_type, to_type) observation; the matrix row normalizes by the
    from-state's outgoing total. One shuffle (user window) + one count
    aggregate; the probability is ONE exact integer division per output
    row (n/row_total — engine-identical, no transcendentals), so the whole
    matrix carries a hash oracle. At 100 TB the aggregate key space is
    |event_type|² — tiny; the window shuffle on user_id is the cost, and
    it is the same partitioning every sessionize/funnel query reuses."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .select(F.col("event_type").alias("from_type"), "to_type")
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wrow = Window.partitionBy("from_type")
    return (
        counts.withColumn("row_total", F.sum("n").over(wrow).cast("long"))
        .select(
            "from_type",
            "to_type",
            "n",
            "row_total",
            (F.col("n").cast("double") / F.col("row_total").cast("double")).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


def global_row_number(
    df: DataFrame, *sort_cols, out: str = "_grn", check_total: bool = False
) -> DataFrame:
    """Distributed global row_number over a TOTAL order — the scale-safe
    replacement for ``row_number().over(Window.orderBy(...))``, which Spark
    executes as an Exchange SinglePartition (ALL rows through ONE task).

    Two-phase, the ``curation._budgeted`` discipline: range-partition on the
    sort expressions (RangePartitioner keeps partition id monotone in the
    sort order), rank locally within each range partition, then add
    per-partition row-count offsets. The offset table is ≤ shuffle-partition
    rows — collected (bounded, like _budgeted's totals) and broadcast back,
    so no globally-ordered window ever touches the data itself.

    EXACT (the 1..n permutation of the sort order) iff ``sort_cols`` is a
    total order — every caller must append a unique tiebreaker (user_id,
    doc_id, …) as the last sort column. Without one, rows tied on the full
    key can straddle a range boundary and their relative ranks become
    partitioning-dependent (still a permutation of 1..n, but not a
    deterministic one). ``check_total=True`` verifies the contract at the
    cost of one extra aggregate over the (already checkpointed) frame and
    raises on duplicate sort keys — use it when the tiebreaker's uniqueness
    is not structurally guaranteed; the skewed-ties property test in
    tests/test_temporal.py pins both the exactness with a tiebreaker and
    this guard."""
    n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    ranged = df.repartitionByRange(n_parts, *sort_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    # localCheckpoint BEFORE reading the partition counts: range boundaries
    # come from per-EXECUTION sampling (seeded off the physical rdd id), so
    # the counts action and the consumer's action would otherwise re-sample
    # DIFFERENT partitionings — offsets off by the boundary wobble, ranks
    # duplicated/overflowing (caught at sf0.1: 375 duplicate ranks). The
    # checkpoint freezes one partitioning for both reads.
    wloc = Window.partitionBy("_pid").orderBy(*sort_cols)
    lcl = ranged.withColumn("_lrn", F.row_number().over(wloc))
    if check_total:
        # ties make rank() fall behind row_number() in the same window;
        # RangePartitioner assigns by key comparison, so equal keys always
        # share a partition and the within-partition check is complete
        lcl = lcl.withColumn("_rk", F.rank().over(wloc))
    local = lcl.localCheckpoint()
    if check_total:
        if local.filter(F.col("_rk") != F.col("_lrn")).limit(1).collect():
            raise ValueError(
                "global_row_number sort key is not a total order: append a "
                "unique tiebreaker column — ranks among tied rows are "
                "partitioning-dependent"
            )
        local = local.drop("_rk")
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c")).collect()
    offsets, acc = [], 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], acc))
        acc += row["_c"]
    off = F.broadcast(
        df.sparkSession.createDataFrame(offsets, "_pid int, _off long")
    )
    return (
        local.join(off, "_pid")
        .withColumn(out, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )


def _idiv(a: Column, b: Column) -> Column:
    """Exact BIGINT floor division for non-negative operands: the numerator
    is made exactly divisible first (a − a%b), so the double division is
    exact — no near-integer truncation hazard."""
    return ((a - a % b) / b).cast("long")


def _ntile_of_rank(rank: Column, n: Column, k: int) -> Column:
    """SQL ntile(k) as pure arithmetic on a 1-based global rank: the first
    n%k tiles hold n÷k+1 rows, the rest n÷k (exactly Spark's and DuckDB's
    NTileFunction). Integer-only, so it is engine-exact wherever the rank
    is."""
    kk = F.lit(k).cast("long")
    q = _idiv(n, kk)
    r = n - q * kk
    big = r * (q + 1)  # rows covered by the (q+1)-sized tiles
    return (
        F.when(rank <= big, _idiv(rank + q, q + 1))
        .otherwise(r + _idiv(rank - big + q - 1, F.greatest(q, F.lit(1))))
        .cast("int")
    )


def evt_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM user segmentation (recency / frequency / monetary — the classic
    behavioral-cohort operator): per user, last-event recency in whole
    hours from the corpus max timestamp (integer microsecond arithmetic),
    event count, and the DECIMAL-summed purchase value; each dimension
    quintiles over a FULL deterministic order (metric, then user_id — a
    total order makes tied users' quintiles engine-exact). Output: one row
    per (r, f, m) cell with user count and the monetary total as ×10⁴
    fixed-point BIGINT — 125 cells max, a broadcastable segment table.

    Scale shape: the per-user aggregate is ONE shuffle on user_id; each
    quintile dimension is a distributed global rank (global_row_number —
    range-partition + local rank + broadcast offsets, NO single-partition
    window; DuckDB's ntile oracle is reproduced arithmetically from the
    rank by _ntile_of_rank, engine-exact). The per-user frame is
    localCheckpointed once: three rank branches plus the final join would
    otherwise re-run the events aggregation 4x. Gated by
    test_plans.py::test_rfm_no_single_partition_exchange."""
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max(F.unix_micros("ts")).alias("_mx"))
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.unix_micros("ts")).alias("_last"),
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("_money"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            ((F.col("_mx") - F.col("_last")) / F.lit(3_600_000_000)).cast("long").alias(
                "recency_h"
            ),
            "freq",
            "_money",
        )
        .localCheckpoint()
    )
    n = F.col("_n")
    tot = per_user.agg(F.count(F.lit(1)).cast("long").alias("_n"))

    def tiles(keep: list[str], alias: str, *order) -> DataFrame:
        ranked = global_row_number(per_user.select("user_id", *keep), *order, out="_rk")
        return ranked.crossJoin(F.broadcast(tot)).select(
            "user_id", *[c for c in keep if c == "_money"],
            _ntile_of_rank(F.col("_rk"), n, 5).alias(alias),
        )

    # The three quintile branches are independent and each runs two driver
    # actions (the rank checkpoint + the offsets collect) over the SAME
    # already-checkpointed per-user frame; submitting them from a small
    # thread pool lets each branch's jobs back-fill the others' stage tails
    # (guide §2.6) instead of serializing ~6 driver round-trips. Results
    # are unchanged: every branch is deterministic in isolation (range
    # partition + local rank + offsets) and the final join is associative.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        fut_r = pool.submit(tiles, ["recency_h"], "r", F.asc("recency_h"), F.asc("user_id"))
        fut_f = pool.submit(tiles, ["freq"], "f", F.desc("freq"), F.asc("user_id"))
        fut_m = pool.submit(tiles, ["_money"], "m", F.desc("_money"), F.asc("user_id"))
        r_t, f_t, m_t = fut_r.result(), fut_f.result(), fut_m.result()
    scored = m_t.join(r_t, "user_id").join(f_t, "user_id")
    return (
        scored.groupBy("r", "f", "m")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            (F.sum("_money") * 10000).cast("long").alias("money_fp"),
        )
        .orderBy("r", "f", "m")
    )


QUERIES = {
    "evt_markov_transitions": evt_markov_transitions,
    "evt_rfm_segments": evt_rfm_segments,
    "evt_user_trend": evt_user_trend,
    "evt_gapfill_locf": evt_gapfill_locf,
    "evt_purchase_asof_click": evt_purchase_asof_click,
    "evt_error_context": evt_error_context,
    "evt_sessionize_batch": evt_sessionize_batch,
    "evt_funnel_conversion": evt_funnel_conversion,
    "evt_hourly_rollup_serve": evt_hourly_rollup_serve,
}

ORACLE_SQL: dict[str, str] = {
    "evt_rfm_segments": """
        WITH anchor AS (SELECT max(epoch_us(ts)) AS mx FROM events),
        per_user AS (
            SELECT user_id,
                   CAST((mx - max(epoch_us(ts))) // 3600000000 AS BIGINT) AS recency_h,
                   CAST(count(*) AS BIGINT) AS freq,
                   sum(CAST(value AS DECIMAL(18,4))) AS money
            FROM events, anchor GROUP BY user_id, mx
        ),
        scored AS (
            SELECT money,
                   ntile(5) OVER (ORDER BY recency_h ASC, user_id ASC) AS r,
                   ntile(5) OVER (ORDER BY freq DESC, user_id ASC) AS f,
                   ntile(5) OVER (ORDER BY money DESC, user_id ASC) AS m
            FROM per_user
        )
        SELECT r, f, m, CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(money) * 10000 AS BIGINT) AS money_fp
        FROM scored GROUP BY r, f, m ORDER BY r, f, m
    """,
    "evt_markov_transitions": """
        WITH seq AS (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS to_type
            FROM events
        ), counts AS (
            SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
            FROM seq WHERE to_type IS NOT NULL
            GROUP BY from_type, to_type
        )
        SELECT from_type, to_type, n,
               CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS row_total,
               CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
        FROM counts
        ORDER BY from_type, to_type
    """,
    "evt_gapfill_locf": """
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS hour,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_dec
            FROM events GROUP BY 1, 2
        ), span AS (
            SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY user_id
        ), grid AS (
            SELECT user_id, unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS hour FROM span
        )
        SELECT g.user_id,
               strftime(g.hour, '%Y-%m-%d %H:%M:%S') AS hour,
               CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events,
               h.n_events IS NULL AS is_gap,
               CAST(last_value(h.sum_dec IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 10000 AS BIGINT)
                   AS locf_sum_fp
        FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour
    """,
    "evt_hourly_rollup_serve": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) * 10000 AS BIGINT)
                   AS sum_value_fp
        FROM events GROUP BY 1, 2
    """,
    "evt_user_trend": """
        WITH d AS (
            SELECT user_id,
                   (epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id)) // 1000000 AS x,
                   CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS y
            FROM events WHERE value IS NOT NULL
        ), a AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x*x) AS BIGINT) AS sxx,
                   CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x*y) AS BIGINT) AS sxy
            FROM d GROUP BY user_id
        )
        SELECT user_id, n_events,
               CASE WHEN CAST(n_events AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0.0 THEN NULL
                    ELSE (CAST(n_events AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / ((CAST(n_events AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 10000.0)
               END AS slope_per_sec,
               CAST(sy AS DOUBLE) / (CAST(n_events AS DOUBLE) * 10000.0) AS mean_value
        FROM a ORDER BY user_id
    """,

    "evt_funnel_conversion": """
        WITH e AS (
            SELECT user_id, event_id, epoch_us(ts) AS tus, event_type,
                   min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) OVER w AS nc,
                   min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) OVER w AS np
            FROM events WHERE event_type IN ('view', 'click', 'purchase')
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        ), clicks AS (
            SELECT user_id, tus AS cts, np AS c_np FROM (
                SELECT user_id, tus, np,
                       row_number() OVER (PARTITION BY user_id, tus ORDER BY event_id) AS rn
                FROM e WHERE event_type = 'click')
            WHERE rn = 1
        ), v AS (
            SELECT e.user_id, e.tus AS vts, e.nc, c.c_np
            FROM (SELECT * FROM e WHERE event_type = 'view') e
            LEFT JOIN clicks c ON c.user_id = e.user_id AND c.cts = e.nc
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_views,
               CAST(sum(CASE WHEN nc IS NOT NULL AND nc <= vts + 172800000000
                              AND c_np IS NOT NULL AND c_np <= nc + 172800000000
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_conversions,
               CAST(sum(CASE WHEN nc IS NOT NULL AND nc <= vts + 172800000000
                              AND c_np IS NOT NULL AND c_np <= nc + 172800000000
                        THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS conv_rate
        FROM v GROUP BY user_id
    """,
    # identical union+window formulation (NOT DuckDB ASOF JOIN, whose
    # equal-ts tie-break is unspecified): side 1 rows are clicks, frame up to
    # current row, last click payload ignoring nulls, ties by event_id.
    "evt_purchase_asof_click": """
        WITH u AS (
            SELECT user_id, ts, 0 AS side, event_id, value,
                   CAST(NULL AS BIGINT) AS c_id, CAST(NULL AS TIMESTAMP) AS c_ts
            FROM events WHERE event_type = 'purchase'
            UNION ALL
            SELECT user_id, ts, 1 AS side, event_id, NULL,
                   event_id AS c_id, ts AS c_ts
            FROM events WHERE event_type = 'click'
        ), w AS (
            SELECT *,
                   last_value(c_id IGNORE NULLS) OVER win AS click_id,
                   last_value(c_ts IGNORE NULLS) OVER win AS click_ts
            FROM u
            WINDOW win AS (PARTITION BY user_id ORDER BY ts, side, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT user_id, event_id AS purchase_id, value AS purchase_value,
               click_id, epoch_us(ts) - epoch_us(click_ts) AS gap_us
        FROM w WHERE side = 0
    """,
    "evt_error_context": """
        SELECT e.event_id AS error_id, e.user_id,
               CAST(count(c.event_id) AS BIGINT) AS n_ctx,
               max(c.value) AS max_ctx_value
        FROM events e
        LEFT JOIN events c
          ON c.user_id = e.user_id
         AND c.event_type IN ('click', 'view')
         AND abs(epoch_us(c.ts) - epoch_us(e.ts)) <= 300000000
        WHERE e.event_type = 'error'
        GROUP BY e.event_id, e.user_id
    """,
    "evt_sessionize_batch": """
        WITH tagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, ts, value,
                   CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                       AS session_id
            FROM tagged
        )
        SELECT user_id, session_id,
               CAST(count(*) AS BIGINT) AS n_events,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM sess
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
}
