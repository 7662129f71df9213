"""CSV corpus source/sink with the same scale discipline as sources.jsonl:
mandatory explicit schema (no double-scan inference), PERMISSIVE mode with a
``_corrupt_record`` quarantine column (no silent drops), splittable layout
(many files / splittable compression — a single .gz serializes the scan).

CSV adds two hazards JSONL doesn't have: embedded separators/newlines need
quoting (handled by Spark's RFC-4180 quote mode, enabled here with
``multiLine`` OFF — multiLine kills input-split parallelism, so documents
with literal newlines belong in JSONL/Parquet, not CSV), and a header row
per file that must be skipped consistently (``header`` on both ends).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_csv(df: DataFrame, path: str, num_files: int | None = None) -> None:
    out = df.repartition(num_files) if num_files else df
    out.write.mode("overwrite").option("header", True).option("quoteAll", True).csv(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    keep_corrupt: bool = True,
) -> DataFrame:
    full = schema
    if keep_corrupt:
        full = T.StructType(
            list(schema.fields) + [T.StructField("_corrupt_record", T.StringType(), True)]
        )
    return (
        spark.read.schema(full)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
