"""Output-layout control: the small-files problem and its inverse.

A 100 TB pipeline stage that writes one file per post-shuffle task produces
millions of KB-sized parquet files (metadata-bound scans, NameNode/listing
pressure) — or, after a heavy filter, a handful of multi-GB files (no scan
parallelism). Both are layout bugs, fixed at WRITE time:

- ``maxRecordsPerFile`` caps file size without an extra shuffle (a task
  rolls to a new file when full) — the cheap knob, applied always;
- ``compact()`` additionally coalesces/repartitions to hit a target file
  COUNT, trading one round-robin shuffle for a clean layout. Use after
  heavy filters; skip when upstream partitioning is already right.

Parquet-specific: files in the 128 MB-1 GB range with row groups ~128 MB
keep scans splittable and footers cheap; at local test scale we target row
counts instead of bytes (same mechanism, observable in tests).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_compacted(
    df: DataFrame,
    path: str,
    target_rows_per_file: int,
    row_count: int | None = None,
) -> int:
    """Write ``df`` as parquet in ``ceil(rows / target_rows_per_file)``
    roughly equal files; returns the file count. ``row_count`` skips the
    counting job when the caller already knows it (at scale, pull it from
    the previous stage's metrics rather than re-scanning)."""
    n = row_count if row_count is not None else df.count()
    files = max(1, math.ceil(n / target_rows_per_file))
    (
        df.repartition(files)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target_rows_per_file)
        .parquet(path)
    )
    return files


def read_back(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def zorder_key(a_expr: str, b_expr: str, a_min: int, a_max: int, b_min: int, b_max: int, bits: int = 16) -> Column:
    """Z-order (Morton) key over two integer SQL expressions: each is
    min-max quantized to ``bits`` bits, then bit-interleaved. Pure unrolled
    integer expressions — whole-stage codegen, no UDF. Sorting by this key
    gives multi-column data clustering: rows close in BOTH dimensions land
    in the same parquet files, so each file's per-column min/max footer
    stats form a tight bounding box and predicates on EITHER column skip
    files/row groups (the mechanism behind Delta/Iceberg Z-ORDER OPTIMIZE
    — a single-column sort only prunes on that one column)."""
    scale = (1 << bits) - 1

    def quant(expr: str, lo: int, hi: int) -> Column:
        span = max(hi - lo, 1)
        # multiply-then-DIV: exact integer arithmetic; product bounded by
        # span * 2^bits, so keep bits ≤ 16 for µs-scale timestamp spans
        return F.expr(f"CAST((({expr}) - ({lo})) * {scale} DIV {span} AS BIGINT)")

    qa, qb = quant(a_expr, a_min, a_max), quant(b_expr, b_min, b_max)
    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(qa, i).bitwiseAND(F.lit(1)).cast("long")
        bbit = F.shiftright(qb, i).bitwiseAND(F.lit(1)).cast("long")
        key = key + F.shiftleft(abit, 2 * i) + F.shiftleft(bbit, 2 * i + 1)
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    a_expr: str,
    b_expr: str,
    num_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` clustered by the Z-order of two integer SQL expressions
    (e.g. ``"user_id"``, ``"unix_micros(ts)"``): one cheap min/max
    aggregate for the quantization bounds, range-partition + sort on the
    Morton key, drop the key, write. The key never hits disk — the
    clustering survives as row order, which is all footer stats need.

    The input is cpu_spread first (r15): the min/max bounds pass, the range
    sampler, and the Morton-key shuffle map side all inherit the scan's
    parallelism, and a byte-tiny single-file input ran each of them
    single-task (profiled 0.72 s + 0.51 s stages at sf0.1); the gate keeps
    real-scale inputs untouched. The written ROWS are identical; only
    range-boundary placement may shift with the sampler's view, which the
    query contract (layout-invariant results; footer-stats tightness) is
    explicitly independent of."""
    from vers_spark.functions.spread import cpu_spread

    df = cpu_spread(df)
    r = df.selectExpr(
        f"min({a_expr})", f"max({a_expr})", f"min({b_expr})", f"max({b_expr})"
    ).collect()[0]
    key = zorder_key(a_expr, b_expr, int(r[0]), int(r[1]), int(r[2]), int(r[3]), bits)
    (
        df.withColumn("_z", key)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int | None = None,
) -> None:
    """Hive-style partitioned layout (``partitionBy`` directories): the
    on-disk twin of partition pruning — a reader filtering on a partition
    column opens only the matching directories, no file footers touched
    elsewhere. The pre-write ``repartition(partition_cols)`` routes all of
    a partition value's rows to ONE task, so each directory gets one file
    instead of one per upstream task (the partitioned flavor of the
    small-files bug: tasks × partitions files); oversized partitions roll
    to extra files via ``maxRecordsPerFile``, no salt column needed.
    Partition columns must be low-cardinality (lang, date, source — never
    doc_id): each distinct value is a directory, and a high-cardinality
    key recreates the listing pressure pruning was meant to solve."""
    out = df.repartition(*[df[c] for c in partition_cols])
    writer = out.write.mode("overwrite")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_cols).parquet(path)
