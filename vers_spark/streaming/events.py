"""Structured Streaming surface (SURVEY §7 phase 6 — pure north-star: the
reference has no streaming at all).

Micro-batch ingest of the ``events`` table: tumbling/sliding windowed
aggregates with an event-time watermark, and the streaming analogue of
IVFFlat ``add`` (`ivfflat.rs:200-213`) — each micro-batch of new vectors is
scored against FROZEN centroids in ``foreachBatch`` and appended to the
posting lists.

Correctness contract: every streaming query here is run with
``trigger(availableNow=True)`` over the finite testdata files and its sink
table is returned as a plain DataFrame, so the driver's DuckDB oracle checks
the STREAM output itself (batch/stream equivalence is the test, not a
proxy). Window aggregates use ``complete`` output mode into a memory sink —
with a finite source the watermark never closes the final window in append
mode, and complete mode is exactly the batch-equivalent answer.

Scale notes: file-source micro-batches shard by file; the windowed aggregate
is a streaming state-store aggregation keyed by (window, event_type) —
state size is windows × types, not events. The IVF assign path is
stateless per batch (centroids broadcast once), so it scales with batch
size only; posting-list appends go to Parquet partitioned by cluster_id,
same layout the batch index uses.
"""

from __future__ import annotations

import itertools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# TIMESTAMP(NANOS) parquet arrives as long under nanosAsLong (see session.py)
_EVENTS_FILE_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, value double, props string"
)
_EMB_FILE_SCHEMA = "vec_id long, embedding array<float>, label int"

_sink_counter = itertools.count()


_STAGE_CACHE: dict[str, str] = {}


def _stage_dir(sf_dir: str, name: str) -> str:
    """FileStreamSource needs a DIRECTORY; testdata ships single files (and is
    read-only), so stage a tempdir holding a symlink to the parquet file."""
    key = f"{sf_dir}/{name}"
    if key not in _STAGE_CACHE:
        d = tempfile.mkdtemp(prefix=f"vs_stream_{name}_")
        os.symlink(f"{sf_dir}/{name}.parquet", f"{d}/{name}_000.parquet")
        _STAGE_CACHE[key] = d
    return _STAGE_CACHE[key]


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (micro-batch per file)."""
    raw = spark.readStream.schema(_EVENTS_FILE_SCHEMA).parquet(_stage_dir(sf_dir, "events"))
    # integer div: float /1000 loses µs precision on ns-scale longs
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling (or sliding, if ``slide``) window counts per event_type with
    an event-time watermark bounding state for late data."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # declared-precision discipline: double summation order differs
            # between engines (and between runs at scale); round at the edge
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_to_table(stream_df: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Drain a finite stream with availableNow into a memory sink; return the
    sink as a batch DataFrame (the oracle-checkable stream result)."""
    name = f"vs_stream_sink_{next(_sink_counter)}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def stream_ivf_ingest(
    spark: SparkSession,
    sf_dir: str,
    sink_dir: str,
    num_clusters: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Streaming analogue of IVFFlat ``add`` (ivfflat.rs:200-213): build the
    index once on the batch corpus, freeze its centroids, then stream the
    corpus back through ``foreachBatch`` scoring every micro-batch against
    the frozen centroids and appending Parquet posting lists partitioned by
    cluster_id. Returns the ingested assignment table."""
    import numpy as np

    from vers_spark.indexes.ivfflat import IVFFlatIndex
    from vers_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    idx = IVFFlatIndex.build(emb, num_clusters=num_clusters, seed=seed)
    cents = np.array(
        [r["centroid"] for r in idx.centroids.orderBy("cluster_id").collect()],
        dtype=np.float64,
    )

    stream = (
        spark.readStream.schema(_EMB_FILE_SCHEMA)
        .parquet(_stage_dir(sf_dir, "embeddings"))
        .select(F.col("vec_id").alias("id"), "embedding")
    )

    def ingest_batch(bdf: DataFrame, batch_id: int) -> None:
        assigned = IVFFlatIndex._assign(bdf, cents)
        assigned.write.mode("append").partitionBy("cluster_id").parquet(sink_dir)

    q = (
        stream.writeStream.foreachBatch(ingest_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{sink_dir}_ckpt")
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(sink_dir)
