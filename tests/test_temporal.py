"""As-of join + bucketed range join: oracle parity and the scale-critical
plan shapes (one key-shuffle for as-of, equi-join — never a theta/cartesian
join — for the range join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle import duckdb_connection, compare
from vers_spark.operators import temporal
from vers_spark.plans import audit
from vers_spark.sources.tables import load_table


def test_asof_matches_oracle(spark, sf_dir):
    con = duckdb_connection(sf_dir)
    r = compare(
        temporal.evt_purchase_asof_click(spark, sf_dir),
        con,
        temporal.ORACLE_SQL["evt_purchase_asof_click"],
    )
    assert r["values_match"] and r["cols_match"] and r["rows_match"], r["first_mismatches"][:3]


def test_range_join_matches_oracle(spark, sf_dir):
    con = duckdb_connection(sf_dir)
    r = compare(
        temporal.evt_error_context(spark, sf_dir),
        con,
        temporal.ORACLE_SQL["evt_error_context"],
    )
    assert r["values_match"] and r["cols_match"] and r["rows_match"], r["first_mismatches"][:3]


def test_asof_plan_no_join(spark, sf_dir):
    """As-of is union + window: there must be NO join operator at all — the
    match comes from one sort-shuffle on the key."""
    df = temporal.evt_purchase_asof_click(spark, sf_dir)
    plan = audit.executed_plan(df).lower()
    assert "join" not in plan
    # both scans push their event_type predicate down
    pushed = " ".join(audit.pushed_filters(df))
    assert "event_type" in pushed


def test_range_join_is_equi_join(spark, sf_dir):
    """Bucketing must turn the |Δt| ≤ w predicate into an equi-join on
    (user_id, bucket); a BroadcastNestedLoop/cartesian plan would be O(n²)
    at scale."""
    df = temporal.evt_error_context(spark, sf_dir)
    plan = audit.executed_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert audit.has_broadcast_join(df) or audit.has_sort_merge_join(df) or "ShuffledHashJoin" in plan


def test_asof_strictly_prior_and_tiebreak(spark):
    """Strict <: a click at the exact purchase instant must NOT match; ties
    among equal prior click timestamps resolve to the larger event_id."""
    rows = [
        # user 1: click@10 and click@20 (two ids at same ts), purchase@20
        (1, 1, "click", 10_000_000),
        (2, 1, "click", 20_000_000),
        (3, 1, "purchase", 20_000_000),
        # user 2: clicks at 5 (ids 4 and 5), purchase at 6
        (4, 2, "click", 5_000_000),
        (5, 2, "click", 5_000_000),
        (6, 2, "purchase", 6_000_000),
        # user 3: purchase with no prior click
        (7, 3, "purchase", 1_000_000),
    ]
    ev = spark.createDataFrame(
        [(i, u, t, ts) for i, u, t, ts in rows], "event_id long, user_id long, event_type string, us long"
    ).select("event_id", "user_id", "event_type", F.timestamp_micros("us").alias("ts"))
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    out = temporal.asof_join(purchases, clicks, on=["user_id"], right_cols=["event_id"])
    got = {r["event_id"]: r["_match"]["event_id"] if r["_match"] else None for r in out.collect()}
    assert got == {3: 1, 6: 5, 7: None}


def test_rollup_incremental_refresh_and_exact_serve(spark, sf_dir):
    """Continuous aggregate (sources/rollup.py): the second refresh touches
    only hours after the first watermark (incremental, no full rescan), a
    boundary hour is never clobbered (hour-granular dynamic overwrite), and
    the served view equals a direct raw aggregation exactly."""
    from pyspark.sql import functions as F

    from vers_spark.sources.rollup import hourly_rollup, refresh_rollup, serve_hourly
    from vers_spark.sources.tables import load_table
    from vers_spark.streaming.events import scratch_dir

    events = load_table(spark, sf_dir, "events")
    path = scratch_dir("vs_rollup_t_") + "/hourly"
    cut = events.agg(
        F.timestamp_micros(
            ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2).cast("long")
        ).alias("mid")
    ).collect()[0]["mid"]
    m1 = refresh_rollup(spark, events.filter(F.col("ts") <= F.lit(cut)), path)
    m2 = refresh_rollup(spark, events, path)
    total_closed = (
        hourly_rollup(events).select("hour").distinct().count() - 1
    )  # all hours except the open one
    assert m1["hours_refreshed"] > 0 and m2["hours_refreshed"] > 0
    # incremental: the two refreshes partition the closed hours (no overlap,
    # no gap) — a full-rescan implementation would give m2 == total_closed
    assert m1["hours_refreshed"] + m2["hours_refreshed"] == total_closed
    assert m2["hours_refreshed"] < total_closed

    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value_dec"])
        for r in serve_hourly(spark, events, path).collect()
    }
    want = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value_dec"])
        for r in hourly_rollup(events).collect()
    }
    assert got == want


def test_rollup_late_data_reconciliation(spark, sf_dir):
    """Out-of-order arrival: rows landing in hours that already closed and
    rolled up are invisible to the append-only incremental refresh (their
    hours sit below the watermark). reconcile_rollup recounts closed hours
    (COUNT-only scan), rewrites ONLY the drifted day partitions via dynamic
    overwrite, and the served view equals direct aggregation again; a second
    reconcile is a no-op."""
    from pyspark.sql import functions as F

    from vers_spark.sources.rollup import (
        hourly_rollup,
        reconcile_rollup,
        refresh_rollup,
        serve_hourly,
    )
    from vers_spark.sources.tables import load_table
    from vers_spark.streaming.events import scratch_dir

    events = load_table(spark, sf_dir, "events")
    path = scratch_dir("vs_rollup_late_") + "/hourly"
    ontime = events.filter(F.col("event_id") % 7 != 0)  # late slice held back
    refresh_rollup(spark, ontime, path)
    # the late rows arrive — a plain refresh cannot see them (below watermark)
    refresh_rollup(spark, events, path)
    rec = reconcile_rollup(spark, events, path)
    assert rec["hours_drifted"] > 0 and rec["days_rewritten"] > 0

    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value_dec"])
        for r in serve_hourly(spark, events, path).collect()
    }
    want = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value_dec"])
        for r in hourly_rollup(events).collect()
    }
    assert got == want
    assert reconcile_rollup(spark, events, path) == {
        "hours_drifted": 0,
        "days_rewritten": 0,
    }


def test_rollup_watermark_manifest_migration(spark, sf_dir):
    """Manifest-format migration: a pre-change manifest stored the watermark
    as a timestamp STRING; the current reader must parse it into unix-micros
    (not crash on int()) and keep the refresh incremental — while a junk
    watermark must raise rather than silently double-append stored hours."""
    import json

    import pytest as _pytest
    from pyspark.sql import functions as F

    from vers_spark.sources.rollup import (
        _parse_watermark,
        hourly_rollup,
        refresh_rollup,
        serve_hourly,
    )
    from vers_spark.sources.tables import load_table
    from vers_spark.streaming.events import scratch_dir

    events = load_table(spark, sf_dir, "events")
    path = scratch_dir("vs_rollup_mig_") + "/hourly"
    cut = events.agg(
        F.timestamp_micros(
            ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2).cast("long")
        ).alias("mid")
    ).collect()[0]["mid"]
    m1 = refresh_rollup(spark, events.filter(F.col("ts") <= F.lit(cut)), path)

    # rewrite the manifest in the LEGACY string format, micros-equivalent
    from datetime import datetime, timezone

    legacy = datetime.fromtimestamp(m1["watermark"] / 1e6, tz=timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S"
    )
    assert _parse_watermark(legacy) == m1["watermark"]  # string form round-trips
    with open(f"{path}/_rollup_manifest.json", "w") as f:
        json.dump({"watermark": legacy, "hours_refreshed": m1["hours_refreshed"]}, f)

    m2 = refresh_rollup(spark, events, path)  # must not raise ValueError
    total_closed = hourly_rollup(events).select("hour").distinct().count() - 1
    assert m1["hours_refreshed"] + m2["hours_refreshed"] == total_closed  # still incremental

    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value_dec"])
        for r in serve_hourly(spark, events, path).collect()
    }
    want = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value_dec"])
        for r in hourly_rollup(events).collect()
    }
    assert got == want

    with _pytest.raises(ValueError, match="unparseable rollup watermark"):
        _parse_watermark("not-a-watermark")


def test_rollup_compaction_bounds_files_and_preserves_serve(spark, sf_dir):
    """Long-lived store maintenance: four staged refreshes append one file
    per touched day (the boundary days accumulate several); compact_rollup
    rewrites ONLY the over-bound day partitions to one file each, leaves
    other days' files byte-identical, and the served view is unchanged."""
    import os

    from pyspark.sql import functions as F

    from vers_spark.sources.rollup import compact_rollup, refresh_rollup, serve_hourly
    from vers_spark.sources.tables import load_table
    from vers_spark.streaming.events import scratch_dir

    events = load_table(spark, sf_dir, "events")
    path = scratch_dir("vs_rollup_cpt_") + "/hourly"
    qs = [
        int(q)
        for q in events.select(F.unix_micros("ts").alias("us")).approxQuantile(
            "us", [0.25, 0.5, 0.75], 0.0
        )
    ]
    lo = None
    for hi in [*qs, None]:
        part = events
        if lo is not None:
            part = part.filter(F.unix_micros("ts") > F.lit(lo))
        if hi is not None:
            part = part.filter(F.unix_micros("ts") <= F.lit(hi))
        # cumulative slice like a growing log: refresh sees all data so far
        refresh_rollup(spark, events.filter(F.unix_micros("ts") <= F.lit(hi)) if hi else events, path)
        lo = hi

    def day_files():
        return {
            d: sorted(
                f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")
            )
            for d in os.listdir(path)
            if d.startswith("day=")
        }

    before = day_files()
    assert any(len(fl) > 1 for fl in before.values()), "staging produced no fragmentation"
    served_before = sorted(
        map(tuple, serve_hourly(spark, events, path).collect())
    )

    res = compact_rollup(spark, path, max_files_per_day=1)
    assert res["days_compacted"] >= 1 and res["files_removed"] >= 1
    after = day_files()
    assert all(len(fl) == 1 for fl in after.values())
    # days already at the bound kept their exact files
    for d, fl in before.items():
        if len(fl) == 1:
            assert after[d] == fl, d
    assert sorted(map(tuple, serve_hourly(spark, events, path).collect())) == served_before
    # idempotent
    assert compact_rollup(spark, path, max_files_per_day=1)["days_compacted"] == 0


def test_markov_transitions_stochastic(spark, sf_dir):
    """Transition matrix rows are proper distributions: per from_type the
    probabilities sum to 1 (exact rational n/row_total), row_total equals
    the sum of its counts, and the pair count equals total events minus
    one per active user (each user contributes len-1 transitions)."""
    from vers_spark.operators.temporal import evt_markov_transitions
    from vers_spark.sources.tables import load_table

    rows = evt_markov_transitions(spark, sf_dir).collect()
    assert rows
    by_from = {}
    for r in rows:
        by_from.setdefault(r["from_type"], []).append(r)
    for ft, rs in by_from.items():
        tot = rs[0]["row_total"]
        assert all(r["row_total"] == tot for r in rs)
        assert sum(r["n"] for r in rs) == tot
        assert abs(sum(r["p"] for r in rs) - 1.0) < 1e-9, ft
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n"] for r in rows) == n_events - n_users


def test_rfm_segments_partition_and_balance(spark, sf_dir):
    """RFM cells partition the user base (Σ n_users = |users|); each
    dimension's quintiles are balanced to ±1 user (ntile contract over a
    total order); money_fp reconciles with the events table."""
    from vers_spark.operators.temporal import evt_rfm_segments
    from vers_spark.sources.tables import load_table

    rows = evt_rfm_segments(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows) == n_users
    for dim in ("r", "f", "m"):
        per_q = {}
        for r in rows:
            per_q[r[dim]] = per_q.get(r[dim], 0) + r["n_users"]
        assert set(per_q) == {1, 2, 3, 4, 5}
        assert max(per_q.values()) - min(per_q.values()) <= 1
    total_fp = ev.agg(
        (F.sum(F.col("value").cast("decimal(18,4)")) * 10000).cast("long")
    ).collect()[0][0]
    assert sum(r["money_fp"] for r in rows) == total_fp


def test_global_row_number_exact_and_stable(spark, sf_dir):
    """global_row_number must emit exactly the permutation 1..n that a
    single-partition row_number would, and be STABLE across executions:
    repartitionByRange samples its boundaries per execution, so without the
    internal checkpoint the offsets job and the consumer job could see
    different partitionings (caught live at sf0.1: 375 duplicate ranks)."""
    from pyspark.sql import Window, functions as F

    from vers_spark.operators.temporal import global_row_number
    from vers_spark.sources.tables import load_table

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").cast("decimal(12,2)").alias("bal")
    )
    n = cust.count()
    got = {
        (r["c_custkey"], r["_grn"])
        for r in global_row_number(cust, F.desc("bal"), F.asc("c_custkey")).collect()
    }
    ranks = sorted(rk for _, rk in got)
    assert ranks == list(range(1, n + 1))  # exact permutation, no dupes/gaps
    ref = {
        (r["c_custkey"], r["rn"])
        for r in cust.withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.desc("bal"), F.asc("c_custkey"))),
        ).collect()
    }
    assert got == ref
    again = {
        (r["c_custkey"], r["_grn"])
        for r in global_row_number(cust, F.desc("bal"), F.asc("c_custkey")).collect()
    }
    assert again == got


def test_global_row_number_skewed_ties(spark):
    """Stress the documented contract: a MASSIVELY tied sort column (3
    distinct values over 6000 rows, so every tie run dwarfs a range
    partition and must straddle boundaries) still yields the exact 1..n
    permutation — as long as the caller appends a unique tiebreaker. The
    forced-small partition count makes boundary splits within tie runs
    certain rather than incidental; and the opt-in check_total guard must
    refuse the same frame when the tiebreaker is omitted."""
    import pytest
    from pyspark.sql import Window, functions as F

    from vers_spark.operators.temporal import global_row_number

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        df = spark.range(6000).select(
            F.col("id"), (F.col("id") % 3).alias("val")
        )
        got = {
            (r["id"], r["_grn"])
            for r in global_row_number(df, F.asc("val"), F.asc("id")).collect()
        }
        ranks = sorted(rk for _, rk in got)
        assert ranks == list(range(1, 6001))
        ref = {
            (r["id"], r["rn"])
            for r in df.withColumn(
                "rn",
                F.row_number().over(Window.orderBy(F.asc("val"), F.asc("id"))),
            ).collect()
        }
        assert got == ref
        # no tiebreaker: partitioning-dependent ranks — the guard refuses
        with pytest.raises(ValueError, match="total order"):
            global_row_number(df, F.asc("val"), check_total=True).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
