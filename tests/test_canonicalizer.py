"""Driver-canonicalizer contract twin (tests/oracle.py): the local compare
must reproduce the driver's red/green behavior on every failure shape the
driver has exhibited across rounds, and must NOT be stricter than the driver
on the divergences the driver provably tolerates.

Evidence base (CORRECTNESS_r01..r03):
- struct/array/map cells → driver ERR  (r2 ivf_build_fixed; r3 mm_resize)
- Spark object-Decimal vs DuckDB float64 → driver hash_match=false
  (r3 evt_gapfill_locf, evt_hourly_rollup_serve)
- Spark datetime64[ns] vs DuckDB datetime64[us] → driver GREEN
  (r3 stream_events_hourly)
- Spark int32 vs DuckDB int64 → driver GREEN (r1 q_top_customers_per_nation)
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle import compare


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def test_decimal_vs_float_is_red(spark, con):
    df = spark.sql("SELECT 1 AS id, CAST(12.5 AS DECIMAL(18,4)) AS v")
    r = compare(df, con, "SELECT 1 AS id, CAST(12.5 AS DECIMAL(18,4)) AS v")
    # str forms agree ('12.5'), so ONLY the dtype gate can catch this —
    # exactly the r3 silent hash-fail shape
    assert not r["dtype_match"]
    assert not r["values_match"]


def test_struct_cell_raises_like_driver(spark, con):
    df = spark.sql(
        "SELECT 1 AS id, named_struct('w', 8, 'h', 4) AS meta "
        "UNION ALL SELECT 2, named_struct('w', 9, 'h', 5)"
    )
    with pytest.raises(TypeError, match="unhashable"):
        compare(df, con, "SELECT 1 AS id, {'w': 8} AS meta")


def test_array_cell_raises_like_driver(spark, con):
    df = spark.sql("SELECT 1 AS id, array(1, 2) AS a UNION ALL SELECT 2, array(3, 4)")
    with pytest.raises(TypeError, match="unhashable"):
        compare(df, con, "SELECT 1 AS id, [1, 2] AS a")


def test_timestamp_unit_divergence_is_green(spark, con):
    df = spark.sql(
        "SELECT timestamp'2024-01-01 05:00:00' AS ts, 1 AS n "
        "UNION ALL SELECT timestamp'2024-01-02 06:30:00', 2"
    )
    r = compare(
        df,
        con,
        "SELECT TIMESTAMP '2024-01-01 05:00:00' AS ts, 1 AS n "
        "UNION ALL SELECT TIMESTAMP '2024-01-02 06:30:00', 2",
    )
    assert r["dtype_match"] and r["values_match"], (r["spark_dtypes"], r["duck_dtypes"])


def test_int_width_divergence_is_green(spark, con):
    df = spark.sql("SELECT CAST(5 AS INT) AS rnk, CAST(7 AS BIGINT) AS k")
    r = compare(df, con, "SELECT CAST(5 AS BIGINT) AS rnk, CAST(7 AS BIGINT) AS k")
    assert r["dtype_match"] and r["values_match"], (r["spark_dtypes"], r["duck_dtypes"])


def test_value_mismatch_is_red(spark, con):
    df = spark.sql("SELECT 1 AS id, CAST(2.5 AS DOUBLE) AS v")
    r = compare(df, con, "SELECT 1 AS id, CAST(2.6 AS DOUBLE) AS v")
    assert r["dtype_match"] and not r["values_match"]


def test_fixed_point_discipline_is_green(spark, con):
    """The repo-wide green shape for money/measure columns: ×10⁴ BIGINT."""
    df = spark.sql("SELECT CAST(12.5 * 10000 AS BIGINT) AS v_fp")
    r = compare(df, con, "SELECT CAST(12.5 * 10000 AS BIGINT) AS v_fp")
    assert r["dtype_match"] and r["values_match"]
