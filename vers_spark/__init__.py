"""vers_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``ashrielbrian/vers`` (a single-node Rust
vector database: IVFFlat / LSH / HNSW ANN indexes over f32 vectors), rebuilt
Spark-first and extended with the relational + LLM-data-pipeline surface a
large-scale training-data pipeline needs.

Design notes
------------
- Everything is declared through the DataFrame/SQL API so Catalyst owns the
  physical plan (pushdown, pruning, broadcast, AQE).
- Vector math has two twin implementations: JVM-side column expressions
  (``functions.vector``) used on oracle-checked paths, and Arrow-batched
  numpy kernels (``functions.vector_np``) used on throughput paths.
- ANN indexes are DataFrames persisted as Parquet (+ a JSON manifest), not
  opaque binary blobs — cluster/bucket pruning is partition pruning.
"""

__version__ = "0.1.0"

from vers_spark.session import get_spark  # noqa: F401
