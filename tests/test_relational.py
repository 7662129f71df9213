"""Every relational query hash-matches its DuckDB oracle at sf0.001 (fast)
and the flagship set also at sf0.01 (the driver's t2 scale)."""

from __future__ import annotations

import pytest

from tests.oracle import assert_oracle_match
from vers_spark.operators.relational import ORACLE_SQL, QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_match_smoke(spark, sf_dir, name):
    if name not in ORACLE_SQL:  # rows-only (sketches): accuracy-gated below
        assert QUERIES[name](spark, sf_dir).count() > 0
        return
    assert_oracle_match(spark, sf_dir, name, QUERIES[name], ORACLE_SQL[name])


def test_sketch_stats_accuracy(spark, sf_dir):
    """Sketch results track their exact twins: HLL++ distinct within 5%,
    t-digest p50/p90 within 10% of exact interpolated percentiles."""
    from pyspark.sql import functions as F

    from vers_spark.operators.relational import q_sketch_stats
    from vers_spark.sources.tables import load_table

    got = {r["event_type"]: r for r in q_sketch_stats(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY value)").alias("p50"),
            F.expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY value)").alias("p90"),
        )
        .collect()
    }
    for et, ex in exact.items():
        g = got[et]
        assert abs(g["approx_users"] - ex["users"]) <= max(0.05 * ex["users"], 2)
        for p in ("p50", "p90"):
            assert abs(g[p] - ex[p]) <= max(0.10 * abs(ex[p]), 1e-6)


@pytest.mark.parametrize("name", ["q1_pricing_summary", "q5_revenue_by_nation", "q_events_user_stats"])
def test_oracle_match_sf001(spark, sf_oracle_dir, name):
    assert_oracle_match(spark, sf_oracle_dir, name, QUERIES[name], ORACLE_SQL[name])


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_skew_salted_agg_plan_and_parity(spark, sf_dir):
    """The salted two-phase aggregate: (a) its physical plan really carries
    the salt key into the first exchange (the fan-out is in the PLAN, not
    just the algebra), and (b) the result is row-identical to the direct
    single-phase GROUP BY computed in-engine."""
    from pyspark.sql import functions as F

    from vers_spark.operators.relational import QUERIES as RQ
    from vers_spark.sources.tables import load_table

    df = RQ["q_skew_salted_agg"](spark, sf_dir)
    plan = df._jdf.queryExecution().toString()
    assert "xxhash64" in plan and "salt" in plan  # phase-1 salt key in plan
    got = {r["event_type"]: r.asDict() for r in df.collect()}
    ev = load_table(spark, sf_dir, "events")
    direct = {
        r["event_type"]: r.asDict()
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
            (
                F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert got == direct


def test_mad_anomaly_semantics(spark, sf_dir):
    """MAD anomaly detection replays exactly for a sampled user (median,
    MAD, and flag count recomputed in Python from the raw values), and the
    degenerate-MAD guard means zero flags whenever mad == 0."""
    from pyspark.sql import functions as F

    from vers_spark.operators.relational import QUERIES as RQ
    from vers_spark.sources.tables import load_table

    rows = {r["user_id"]: r for r in RQ["evt_anomaly_mad"](spark, sf_dir).collect()}
    assert rows
    for r in rows.values():
        if r["mad_degenerate"] == 1:
            assert r["n_anomalies"] == 0
    import statistics

    uid = sorted(rows)[0]
    vals = [
        x["value"]
        for x in load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") == uid)
        .select("value")
        .collect()
    ]
    med = statistics.median(vals)
    mad = statistics.median([abs(v - med) for v in vals])
    r = rows[uid]
    assert r["n_events"] == len(vals)
    assert abs(r["med"] - med) < 1e-9 and abs(r["mad"] - mad) < 1e-9
    want = sum(1 for v in vals if mad > 0 and abs(v - med) > 3.0 * (1.4826 * mad))
    assert r["n_anomalies"] == want
