"""Every relational query hash-matches its DuckDB oracle at sf0.001 (fast)
and the flagship set also at sf0.01 (the driver's t2 scale)."""

from __future__ import annotations

import pytest

from tests.oracle import assert_oracle_match
from vers_spark.operators.relational import ORACLE_SQL, QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_match_smoke(spark, sf_dir, name):
    assert_oracle_match(spark, sf_dir, name, QUERIES[name], ORACLE_SQL[name])


@pytest.mark.parametrize("name", ["q1_pricing_summary", "q5_revenue_by_nation", "q_events_user_stats"])
def test_oracle_match_sf001(spark, sf_oracle_dir, name):
    assert_oracle_match(spark, sf_oracle_dir, name, QUERIES[name], ORACLE_SQL[name])


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
