"""End-to-end harness parity with the reference smoke runs
(`utils.rs:117-158` run_test): load .vec corpus (normalize, holdout
"queen") → build index → add the held-out vector → save → load → search →
semantically sensible neighbours + identical results after reload.

Plus micro-append (`add``) behavior for LSH and HNSW.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vers_spark.indexes.hnsw import HNSWIndex
from vers_spark.indexes.ivfflat import IVFFlatIndex
from vers_spark.indexes.lsh import LSHForestIndex
from vers_spark.sources.vec_file import load_vec_file


@pytest.fixture(scope="module")
def royal_vec_path(tmp_path_factory):
    """60-word corpus with a 'royal' cluster near (1,0,...) — queen's true
    neighbours are king/monarch/prince/princess by construction."""
    rng = np.random.default_rng(3)
    dim = 16
    royal_axis = np.zeros(dim)
    royal_axis[0] = 1.0
    words = {}
    for i, w in enumerate(["queen", "king", "monarch", "prince", "princess", "royal"]):
        words[w] = royal_axis + rng.normal(0, 0.05, dim)
    for i in range(54):
        v = rng.normal(0, 1, dim)
        v[0] = -abs(v[0])  # keep the bulk away from the royal axis
        words[f"w{i}"] = v
    p = tmp_path_factory.mktemp("royal") / "royal.vec"
    lines = [f"{len(words)} {dim}"]
    for w, v in words.items():
        lines.append(w + " " + " ".join(f"{x:.6f}" for x in v))
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_run_test_harness_hnsw(spark, royal_vec_path, tmp_path):
    corpus, holdout = load_vec_file(spark, royal_vec_path, holdout_word="queen")
    corpus = corpus.cache()
    idx = HNSWIndex.build(
        corpus, num_shards=2, m=8, ef_construction=32, ef_search=16,
        id_col="id", vec_col="emb", seed=5, metric="cosine",
    )
    idx = idx.add(holdout, id_col="id", vec_col="emb")  # utils.rs:136 add held-out

    idx.save(str(tmp_path / "royal_idx"))
    reloaded = HNSWIndex.load(spark, str(tmp_path / "royal_idx"))

    q = holdout.select("id", "emb")
    res = reloaded.search(q, k=5, n_probe_shards=2, query_id="id", query_vec="emb").collect()
    words = {r["word"]: r["id"] for r in spark.read.text(royal_vec_path).limit(0).collect()}  # noqa: F841
    id2word = {r["id"]: r["word"] for r in load_vec_file(spark, royal_vec_path)[0].collect()}
    got = [id2word[r["neighbour_id"]] for r in sorted(res, key=lambda r: r["rank"])]
    assert got[0] == "queen"  # the vector itself, distance ~0
    assert set(got[1:]) <= {"king", "monarch", "prince", "princess", "royal"}
    assert abs(sorted(res, key=lambda r: r["rank"])[0]["distance"]) < 1e-6
    # cosine distances are in [0, 2]
    assert all(-1e-9 <= r["distance"] <= 2.0 for r in res)
    # reload gives identical results (utils.rs:140-148 round-trip property)
    res2 = idx.search(q, k=5, n_probe_shards=2, query_id="id", query_vec="emb").collect()
    assert sorted(map(tuple, res)) == sorted(map(tuple, res2))


def test_lsh_add_routes_to_leaves(spark, sf_dir):
    from vers_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 10)
    extra = emb.filter(F.col("vec_id") < 10)
    idx = LSHForestIndex.build(base, num_trees=2, max_node_size=64, seed=3)
    idx2 = idx.add(extra)
    n_trees = idx.params["num_trees"]
    assert idx2.leaves.count() == idx.leaves.count() + 10 * n_trees
    # an added vector must be findable: exact self-match at distance 0
    res = idx2.search(extra.limit(3), k=1).collect()
    assert all(r["query_id"] == r["neighbour_id"] and r["distance"] == 0.0 for r in res)


def test_hnsw_add_only_rebuilds_affected_shards(spark, sf_dir):
    from vers_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 20)
    extra = emb.filter(F.col("vec_id") < 20)
    idx = HNSWIndex.build(base, num_shards=4, seed=9)
    idx2 = idx.add(extra)
    assert idx2.nodes.count() == 500
    # added vectors are searchable (self-match at distance 0)
    res = idx2.search(extra.limit(5), k=1, n_probe_shards=4).collect()
    assert all(r["query_id"] == r["neighbour_id"] and r["distance"] == 0.0 for r in res)


def test_ivf_add_honors_ids(spark, sf_dir):
    from vers_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 5)
    extra = emb.filter(F.col("vec_id") < 5)
    idx = IVFFlatIndex.build(base, num_clusters=8, seed=1)
    idx2 = idx.add(extra)
    added_ids = {r["id"] for r in idx2.assignments.filter(F.col("id") < 5).collect()}
    assert added_ids == {0, 1, 2, 3, 4}  # NOT remapped (ivfflat.rs:209 bug fixed)


def test_unified_api_trait_roundtrip(spark, sf_dir, tmp_path):
    """The reference's whole query surface through the unified facade
    (api.py ≙ Index trait, base.rs:27-58): for every kind — build, add a
    held-out vector, save, load, search — the held-out vector must find
    itself at rank 1 (distance 0), mirroring the queen harness
    (utils.rs:117-158)."""
    from pyspark.sql import functions as F

    from vers_spark import api
    from vers_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    held = emb.orderBy(F.desc("vec_id")).limit(1).cache()
    held_id = held.collect()[0]["vec_id"]
    corpus = emb.filter(F.col("vec_id") != held_id)
    for kind, params in [
        ("ivfflat", {"num_clusters": 4}),
        ("lsh", {"num_trees": 2, "max_node_size": 50}),
        ("hnsw", {"num_layers": 4, "num_shards": 2}),
    ]:
        idx = api.build_index(kind, corpus, **params)
        idx = api.add(idx, held.select("vec_id", "embedding"))
        path = str(tmp_path / f"api_{kind}")
        api.save_index(idx, path)
        back = api.load_index(spark, path)
        hits = api.search_approximate(back, held.select("vec_id", "embedding"), top_k=3)
        top = hits.orderBy("rank").collect()[0]
        assert top["neighbour_id"] == held_id, kind
        assert top["distance"] == 0.0, kind
