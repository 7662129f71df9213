"""Embedding similarity + multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle import assert_oracle_match
from vers_spark.operators import pipeline_queries as PQ
from vers_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
    synthesize_media_from_documents,
)
from vers_spark.sources.tables import load_table


@pytest.mark.parametrize("name", sorted(PQ.ORACLE_SQL))
def test_pipeline_oracles(spark, sf_dir, name):
    assert_oracle_match(spark, sf_dir, name, PQ.QUERIES[name], PQ.ORACLE_SQL[name])


def test_similarity_join_shape(spark, sf_dir):
    res = PQ.emb_similarity_join(spark, sf_dir)
    rows = res.collect()
    assert rows
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
        assert r["neighbour_id"] != r["query_id"]
    assert all(len(v) <= 3 for v in per_q.values())


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return synthesize_media_from_documents(load_table(spark, sf_dir, "documents")).cache()


def test_feature_extract_deterministic(media):
    a = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    b = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert a == b
    dims = {len(v) for v in a.values()}
    assert dims == {16}
    assert len(a) == media.count()


def test_real_decode_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|image/audio"):
        extract_features(media, decode="real").collect()


def test_resize_and_frames(media):
    resized = resize_images(media, 8, 4).collect()
    assert resized and all(len(r["payload"]) == 32 for r in resized)
    assert all(r["meta"]["width"] == 8 for r in resized)
    frames = sample_frames(media, every_ms=1000).collect()
    assert frames
    by_media = {}
    for fr in frames:
        by_media.setdefault(fr["media_id"], []).append(fr["frame_idx"])
    for idxs in by_media.values():
        assert sorted(idxs) == list(range(len(idxs)))


def test_connected_components_vs_union_find(spark):
    """Label propagation equals classic union-find on a seeded random graph
    plus a long path (worst-case diameter for the propagation loop)."""
    import random

    from vers_spark.operators.graph import connected_components

    rng = random.Random(42)
    edges = [(rng.randrange(0, 60), rng.randrange(0, 60)) for _ in range(45)]
    edges += [(100 + i, 101 + i) for i in range(25)]  # path: diameter 25
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == expected
