"""Local re-implementation of the driver's Spark-vs-DuckDB compare so we can
hash-match every oracle-backed query before the driver does: row count,
column names, and an order-insensitive value hash (columns sorted by name,
rows sorted, floats compared via repr of float64).
"""

from __future__ import annotations

import math

import duckdb

from vers_spark.sources.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(float(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def canonicalize(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    return cols, out


def compare(spark_df, con, sql: str) -> dict:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    res = con.execute(sql)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()
    sc, sv = canonicalize(s_cols, s_rows)
    dc, dv = canonicalize(d_cols, d_rows)
    mismatches = [i for i, (a, b) in enumerate(zip(sv, dv)) if a != b][:5]
    return {
        "rows_match": len(s_rows) == len(d_rows),
        "cols_match": sc == dc,
        "values_match": sv == dv,
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "spark_cols": sc,
        "duck_cols": dc,
        "first_mismatches": [(sv[i], dv[i]) for i in mismatches],
    }


def assert_oracle_match(spark, sf_dir: str, name: str, query_fn, sql: str):
    con = duckdb_connection(sf_dir)
    try:
        result = compare(query_fn(spark, sf_dir), con, sql)
    finally:
        con.close()
    assert result["rows_match"], f"{name}: row count {result['spark_rows']} != {result['duck_rows']}"
    assert result["cols_match"], f"{name}: columns {result['spark_cols']} != {result['duck_cols']}"
    assert result["values_match"], f"{name}: value mismatch, first: {result['first_mismatches']}"
