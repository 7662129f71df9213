"""Unified index API — the Spark-native equivalent of the reference's
``Index`` trait (`base.rs:27-58`): the reference's entire query surface is
exactly ``add``, ``search_approximate``, ``save_index``, ``load_index``
(plus per-kind constructors in `main.rs:58-81`), and this module exposes the
same four verbs over every index kind so a reference user can switch
without learning each class. The pyo3 bindings the reference intended
(`vers-py/src/lib.rs:21-123`, WIP/non-building as committed) are superseded
by this module: arbitrary dims, full build/search surface, DataFrames in
and out.

``load_index`` dispatches on a ``kind.json`` sidecar written by
``save_index`` next to each index's own parquet tables + manifest — the
index payloads themselves stay plain Parquet (partition-prunable), never
opaque blobs.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from vers_spark.indexes.hnsw import HNSWIndex
from vers_spark.indexes.ivfflat import IVFFlatIndex
from vers_spark.indexes.lsh import LSHForestIndex

_KINDS = {
    "ivfflat": IVFFlatIndex,
    "lsh": LSHForestIndex,
    "hnsw": HNSWIndex,
}

AnyIndex = IVFFlatIndex | LSHForestIndex | HNSWIndex


def _kind_of(index: AnyIndex) -> str:
    for kind, cls in _KINDS.items():
        if isinstance(index, cls):
            return kind
    raise TypeError(f"not a vers_spark index: {type(index)!r}")


def build_index(kind: str, corpus: DataFrame, validate: bool = False, **params) -> AnyIndex:
    """Build an index of ``kind`` ∈ {ivfflat, lsh, hnsw} over ``corpus``
    (id + embedding columns; names via ``id_col``/``vec_col`` kwargs).
    Remaining kwargs are the kind's hyperparameters — the same names as the
    reference harness (num_clusters/num_attempts/max_iterations for IVFFlat
    `main.rs:63-66`; num_trees/max_node_size for LSH `main.rs:81`;
    num_layers/ef_construction/ef_search/num_neighbours for HNSW
    `main.rs:70-79`). ``validate=True`` adds the one-pass dimension
    constraint check the reference gets from its const-generic type
    (`base.rs:15-17`) — opt-in because it is a full extra scan; run it at
    ingest, not per build."""
    if kind not in _KINDS:
        raise KeyError(f"unknown index kind {kind!r}; expected one of {sorted(_KINDS)}")
    if validate:
        from vers_spark.functions.validate import check_dims

        check_dims(corpus, params.get("vec_col", "embedding"))
    return _KINDS[kind].build(corpus, **params)


def add(index: AnyIndex, vectors: DataFrame, **kwargs) -> AnyIndex:
    """Insert a batch of vectors (`base.rs:28` made batch-first): returns the
    updated index. Honors caller-supplied ids for every kind — including
    IVFFlat, where the reference shadows the passed id (`ivfflat.rs:209`),
    a bug we deliberately do not reproduce."""
    return index.add(vectors, **kwargs)


def search_approximate(index: AnyIndex, queries: DataFrame, top_k: int, **kwargs) -> DataFrame:
    """ANN search (`base.rs:29`): returns (query_id, neighbour_id, distance,
    rank), ascending distance, ties by id — the DataFrame form of the
    reference's ``Vec<(usize, f32)>``. Kind-specific knobs pass through
    (n_probes, ef_search, ...)."""
    return index.search(queries, k=top_k, **kwargs)


def save_index(index: AnyIndex, path: str) -> None:
    """Persist as parquet tables + JSON manifest (replaces the bincode blob,
    `base.rs:31-43`) plus a ``kind.json`` sidecar for dispatch."""
    index.save(path)
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/kind.json", "w") as f:
        json.dump({"kind": _kind_of(index)}, f)


def load_index(spark: SparkSession, path: str) -> AnyIndex:
    """Load any saved index (`base.rs:45-58`), dispatching on the sidecar."""
    with open(f"{path}/kind.json") as f:
        kind = json.load(f)["kind"]
    return _KINDS[kind].load(spark, path)
