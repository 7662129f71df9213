"""FastText ``.vec`` as a Spark 4 PYTHON DATA SOURCE — the modern connector
surface (``pyspark.sql.datasource``), demonstrated against the same format
``sources/vec_file.py`` handles with ``spark.read.text``:

- ``partitions()`` splits the file into newline-ALIGNED byte ranges on the
  driver with O(n_partitions) seeks (seek to size·i/n, advance past the next
  newline) — no full driver scan, so a 1 GB corpus costs a handful of reads;
- ``read()`` streams its range's lines in the worker: a partition owns every
  line that STARTS inside [start, end), the same ownership rule Hadoop text
  splits use, so rows are covered exactly once;
- partition order is the ``partitions()`` list order, so the existing
  dense-id assignment (``vec_file._with_dense_ids``: per-partition
  row_number + broadcast cumulative offsets) composes unchanged.

The loader twin (`load_vec_datasource`) produces the SAME (id, word, emb)
contract as ``load_vec_file`` — vec_corpus_pyds hash-matches the identical
DuckDB oracle as vec_corpus_roundtrip, certifying the two connectors agree
bit-for-bit. (Parsing: Python ``float()`` and the JVM cast are both
correctly-rounded decimal→double; the array<float> schema re-rounds to the
original f32s.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _ByteRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class VecFileReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.n = int(options.get("numpartitions", options.get("numPartitions", "4")))

    def partitions(self):
        size = os.path.getsize(self.path)
        bounds = [0]
        with open(self.path, "rb") as f:
            for i in range(1, self.n):
                pos = size * i // self.n
                if pos <= bounds[-1]:
                    continue
                f.seek(pos)
                f.readline()  # advance to the next line start
                nxt = f.tell()
                if nxt < size:
                    bounds.append(nxt)
        bounds.append(size)
        return [_ByteRange(a, b) for a, b in zip(bounds, bounds[1:])]

    def read(self, part: _ByteRange):
        with open(self.path, "rb") as f:
            f.seek(part.start)
            while f.tell() < part.end:
                line = f.readline()
                if not line:
                    break
                toks = line.decode("utf-8").split()
                if len(toks) <= 2:  # "<count> <dim>" header or blank line
                    continue
                yield (toks[0], [float(x) for x in toks[1:]])


class VecFileDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "vecfile"

    def schema(self) -> str:
        return "word string, emb array<float>"

    def reader(self, schema) -> VecFileReader:
        return VecFileReader(self.options)


def load_vec_datasource(
    spark: SparkSession,
    path: str,
    normalize: bool = True,
    holdout_word: str | None = None,
    num_partitions: int = 3,
) -> tuple[DataFrame, DataFrame | None]:
    """``load_vec_file`` twin over the Python data source: same
    (id, word, emb) schema, same dense file-order ids, same normalize and
    holdout semantics."""
    from vers_spark.functions import vector as V
    from vers_spark.sources.vec_file import _with_dense_ids

    try:
        spark.dataSource.register(VecFileDataSource)
    except Exception:  # already registered in this session
        pass
    parsed = (
        spark.read.format("vecfile")
        .option("path", path)
        .option("numPartitions", str(num_partitions))
        .load()
    )
    if normalize:
        parsed = parsed.withColumn("emb", V.normalize(F.col("emb")).cast("array<float>"))
    parsed = _with_dense_ids(parsed).select("id", "word", "emb")
    holdout = None
    if holdout_word is not None:
        holdout = parsed.filter(F.col("word") == holdout_word)
        parsed = parsed.filter(F.col("word") != holdout_word)
    return parsed, holdout
