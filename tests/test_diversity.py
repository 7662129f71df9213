"""Embedding-space curation ops (operators/diversity.py): exact numpy replay
of the k-center greedy selection and of SemDeDup's within-cluster greedy."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from vers_spark.operators.diversity import kcenter_sample, semantic_dedup
from vers_spark.sources.tables import load_table


def _numpy_kcenter(ids: np.ndarray, X: np.ndarray, k: int) -> list[int]:
    """Reference greedy farthest-point replay, same tie-breaks (max dist,
    then min id). Distances in f64; gaps on random data dwarf fold-order
    ulp differences vs the Spark expression."""
    order = np.argsort(ids)
    ids, X = ids[order], X[order].astype(np.float64)
    picked = [0]  # minimum id first
    min_d = np.full(len(ids), np.inf)
    for _ in range(k - 1):
        diff = X - X[picked[-1]]
        min_d = np.minimum(min_d, np.einsum("ij,ij->i", diff, diff))
        best = np.lexsort((ids, -min_d))[0]
        picked.append(int(best))
    return [int(ids[i]) for i in picked]


def test_kcenter_matches_numpy_greedy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows])
    expected = _numpy_kcenter(ids, X, 16)
    got = [r["vec_id"] for r in kcenter_sample(emb, k=16).orderBy("rank").collect()]
    assert got == expected


def test_kcenter_maximin_monotone(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = kcenter_sample(emb, k=16).orderBy("rank").collect()
    dists = [r["maximin_sq_dist"] for r in out[1:]]  # rank 0 is inf by definition
    assert all(a >= b for a, b in zip(dists, dists[1:], strict=False))
    assert len({r["vec_id"] for r in out}) == 16


def _replay_cluster_greedy(rows, tau: float) -> dict[int, bool]:
    """Numpy replay of the within-cluster greedy over the Spark-reported
    (cluster_id, d_cent) — verifies the keep/drop decisions exactly."""
    kept: dict[int, bool] = {}
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for members in by_cluster.values():
        members.sort(key=lambda r: (r["d_cent"], r["vec_id"]))
        X = np.array([m["emb"] for m in members], dtype=np.float64)
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0.0] = 1.0
        Xn = X / norms[:, None]
        S = Xn @ Xn.T
        kept_rows: list[int] = []
        for i, m in enumerate(members):
            if kept_rows and float(np.max(S[i, kept_rows])) >= tau:
                kept[m["vec_id"]] = False
                continue
            kept[m["vec_id"]] = True
            kept_rows.append(i)
    return kept


def test_semantic_dedup_matches_numpy_replay(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = semantic_dedup(emb, num_clusters=16, tau=0.95)
    joined = out.join(
        emb.select("vec_id", F.col("embedding").alias("emb")), "vec_id"
    ).collect()
    assert len(joined) == emb.count()  # every vector annotated, none dropped
    expected = _replay_cluster_greedy(joined, 0.95)
    got = {r["vec_id"]: r["kept"] for r in joined}
    assert got == expected


def test_semantic_dedup_drops_exact_twin(spark, sf_dir):
    """An exact duplicate vector lands in the same cluster with cosine
    similarity 1.0 ≥ tau to its twin, so the greedy must drop whichever
    of the pair comes second — guaranteed, regardless of clustering."""
    emb = load_table(spark, sf_dir, "embeddings")
    twin = emb.orderBy("vec_id").limit(1).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    out = semantic_dedup(emb.unionByName(twin), num_clusters=16, tau=0.95)
    kept = {
        r["vec_id"]: r["kept"]
        for r in out.filter(F.col("vec_id").isin([0, 1_000_000])).collect()
    }
    assert len(kept) == 2
    assert sum(kept.values()) == 1  # exactly one of the twins survives


def test_semantic_dedup_spill_path_agrees_with_gram(spark, sf_dir, monkeypatch):
    """The giant-cluster spill form (per-row dot vs kept set) must make the
    same keep/drop decisions as the Gram-matrix form on real data."""
    from vers_spark.operators import diversity as D
    from vers_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    gram = {
        r["vec_id"]: r["kept"]
        for r in D.semantic_dedup(emb, num_clusters=4, tau=0.95).collect()
    }
    monkeypatch.setattr(D, "GRAM_MAX_ROWS", 1)  # force spill on every cluster
    spill = {
        r["vec_id"]: r["kept"]
        for r in D.semantic_dedup(emb, num_clusters=4, tau=0.95).collect()
    }
    assert gram == spill


def test_kcenter_oracle(spark, sf_dir):
    """The k driver rounds of Gonzalez farthest-point hash-match the
    unrolled DuckDB twin (every round is a fold + deterministic argmax)."""
    from tests.oracle import assert_oracle_match
    from vers_spark.operators import diversity as DV

    assert_oracle_match(
        spark,
        sf_dir,
        "emb_kcenter_sample",
        DV.QUERIES["emb_kcenter_sample"],
        DV.ORACLE_SQL["emb_kcenter_sample"],
    )


def test_dbscan_invariants_and_local_replay(spark, sf_dir):
    """emb_dbscan_clusters: textbook DBSCAN invariants hold, and the full
    (role, cluster, n_eps) assignment matches a local numpy replay of
    Ester et al.'s definition with the same min-cluster border rule."""
    import numpy as np

    from vers_spark.operators.index_queries import (
        DBSCAN_EPS2,
        DBSCAN_MIN_PTS,
        DBSCAN_MOD,
        emb_dbscan_clusters,
    )

    got = {r["vec_id"]: r for r in emb_dbscan_clusters(spark, sf_dir).collect()}
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") % DBSCAN_MOD == 0
    )
    rows = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in emb.collect()
    )
    ids = [i for i, _ in rows]
    X = np.array([v for _, v in rows])
    d = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    adj = d <= DBSCAN_EPS2
    np.fill_diagonal(adj, True)
    deg = adj.sum(1)
    core = deg >= DBSCAN_MIN_PTS
    # union-find CC over core-core edges
    lab = {ids[i]: ids[i] for i in range(len(ids)) if core[i]}

    def find(x):
        while lab[x] != x:
            lab[x] = lab[lab[x]]
            x = lab[x]
        return x

    for i in range(len(ids)):
        if not core[i]:
            continue
        for j in range(i + 1, len(ids)):
            if core[j] and adj[i, j]:
                a, b = find(ids[i]), find(ids[j])
                if a != b:
                    lab[max(a, b)] = min(a, b)
    expect = {}
    for i, vid in enumerate(ids):
        if core[i]:
            expect[vid] = ("core", find(vid), int(deg[i]))
        else:
            core_nbrs = [find(ids[j]) for j in range(len(ids)) if core[j] and adj[i, j] and j != i]
            if core_nbrs:
                expect[vid] = ("border", min(core_nbrs), int(deg[i]))
            else:
                expect[vid] = ("noise", -1, int(deg[i]))
    assert {v: (r["role"], r["cluster"], r["n_eps"]) for v, r in got.items()} == expect
    roles = {r["role"] for r in got.values()}
    assert roles == {"core", "border", "noise"}  # params give real structure
