"""Parquet scan layer for the driver's synthetic star schema (TESTDATA.md).

Reads stay plain ``spark.read.parquet`` so Catalyst's parquet source gets
predicate pushdown + column pruning for free — every downstream operator
filters/projects declaratively and the scan shows ``PushedFilters`` /
narrowed ``ReadSchema`` in ``.explain``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor (region and
# nation are bounded by geography, not SF; supplier/part/customer grow with SF
# and must NOT be assumed broadcastable at 100 TB).
ALWAYS_BROADCAST = ("region", "nation")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # Normalize the event timestamp to plain TIMESTAMP (session tz = UTC):
    # - TIMESTAMP(NANOS) parquet arrives as long (nanosAsLong conf) —
    #   truncate to microseconds exactly like DuckDB's micro-resolution
    #   reader. Integer `div`, NOT `/1000` — ~1.7e18 ns exceeds double's
    #   2^53 mantissa, so float division is off by ±1 µs.
    # - timestamp[us] without tz arrives as TIMESTAMP_NTZ, which Spark 4
    #   refuses to feed to unix_micros / numeric casts — value-preserving
    #   cast to LTZ under the pinned UTC session zone.
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.name == "ts" and isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so operators can use spark.sql."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
