"""JSONL corpus source/sink — the lingua franca of LLM training-data
pipelines (one JSON document per line, e.g. RedPajama/Dolma-style dumps).

Scale rules baked in:
- **Explicit schema always.** ``inferSchema``/schema-of-json sampling reads
  the data twice and silently widens types between runs; at 100 TB both are
  disqualifying. Readers here take a mandatory schema (or use the documented
  documents schema).
- **Line-splittable.** JSONL (unlike a JSON array file) splits on newlines,
  so a 100 TB dump parallelizes to byte-range file splits with no parsing
  coordination; compression should be splittable too (zstd-seekable/bzip2,
  or many files) — a single .gz file serializes the whole scan to one task.
- **Corrupt-record policy is explicit**: PERMISSIVE + a ``_corrupt_record``
  column routed to a quarantine sink, never silent row drops (``DROPMALFORMED``
  hides data loss at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def write_jsonl(df: DataFrame, path: str, num_files: int | None = None) -> None:
    """Write ``df`` as JSONL. ``num_files`` controls output parallelism for
    downstream splittability (None keeps the upstream partitioning)."""
    out = df.repartition(num_files) if num_files else df
    out.write.mode("overwrite").json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Schema-enforced JSONL read; malformed lines land in
    ``_corrupt_record`` (kept for quarantine routing) instead of being
    dropped silently."""
    full = schema
    if keep_corrupt:
        full = T.StructType(
            list(schema.fields) + [T.StructField("_corrupt_record", T.StringType(), True)]
        )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
