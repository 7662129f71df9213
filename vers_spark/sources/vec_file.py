"""FastText ``.vec`` text-format loader (reference: `vers/src/utils.rs:7-66`).

Format: header line "<count> <dim>", then one row per word:
``word v1 v2 ... vN`` space-separated. The reference parses line-by-line,
L2-normalizes every vector at ingest (`utils.rs:48`), builds word↔index maps
(`utils.rs:22-23,44-45`), and holds out one query word ("queen",
`utils.rs:38-42`).

Spark re-expression: ``spark.read.text`` → split → slice/cast — a single
declarative scan (the 1M×300 corpus parses in parallel across partitions;
the reference's loader is a serial BufReader loop). The id↔word map lives IN
the DataFrame (id, word, emb) instead of caller-side hashmaps — SURVEY §1.3.

Dense file-order ids without a global sort: per-partition row_number plus a
broadcast cumulative partition offset (text-file partitions are contiguous
byte ranges, so partition order IS file order). One tiny count job — no
single-partition shuffle, scales to the 1M-row corpus and beyond.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from vers_spark.functions import vector as V


def _with_dense_ids(df: DataFrame) -> DataFrame:
    """Add dense 0..n-1 ``id`` in input order (reference enumerate,
    utils.rs:28-45) via partition-offset, not a global sort."""
    tagged = df.withColumn("_part", F.spark_partition_id()).withColumn(
        "_mid", F.monotonically_increasing_id()
    )
    counts = tagged.groupBy("_part").agg(F.count(F.lit(1)).alias("_n")).collect()
    offsets, acc = {}, 0
    for r in sorted(counts, key=lambda r: r["_part"]):
        offsets[r["_part"]] = acc
        acc += r["_n"]
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(p, o) for p, o in offsets.items()], "_part int, _off long"
        )
    )
    local = F.row_number().over(W.partitionBy("_part").orderBy("_mid")) - 1
    return (
        tagged.withColumn("_local", local)
        .join(off_df, "_part")
        .withColumn("id", (F.col("_off") + F.col("_local")).cast("long"))
        .drop("_part", "_mid", "_local", "_off")
    )


def load_vec_file(
    spark: SparkSession,
    path: str,
    normalize: bool = True,
    holdout_word: str | None = None,
) -> tuple[DataFrame, DataFrame | None]:
    """Parse a ``.vec`` file → (corpus, holdout) DataFrames with schema
    (id LONG, word STRING, emb ARRAY<FLOAT>).

    ``holdout_word`` mirrors the reference's "queen" holdout: the row is
    EXCLUDED from the corpus and returned separately (`utils.rs:38-42`).
    """
    raw = spark.read.text(path)
    # drop the "<count> <dim>" header — the only line with exactly 2 tokens
    # (utils.rs:26 skips line 0)
    toks = F.split(F.trim(F.col("value")), r"\s+")
    parsed = (
        raw.select(toks.alias("t"))
        .filter(F.size("t") > 2)
        .select(
            F.element_at("t", 1).alias("word"),
            F.slice("t", 2, F.size("t") - 1).cast("array<float>").alias("emb"),
        )
    )
    if normalize:
        parsed = parsed.withColumn("emb", V.normalize(F.col("emb")).cast("array<float>"))
    parsed = _with_dense_ids(parsed).select("id", "word", "emb")

    holdout = None
    if holdout_word is not None:
        holdout = parsed.filter(F.col("word") == holdout_word)
        parsed = parsed.filter(F.col("word") != holdout_word)
    return parsed, holdout
