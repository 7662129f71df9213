"""Hypothesis property tests over the Spark-free numpy kernels (SURVEY §5:
property/metamorphic layer). No SparkSession — these run in milliseconds per
example, so hypothesis can actually explore the input space.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from vers_spark.functions import vector_np as VN
from vers_spark.indexes.ivfflat import _kmeans_numpy
from vers_spark.indexes.lsh import _build_trees_in_pandas

_finite = st.floats(
    min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False, width=32
)


def _vectors(n_min=2, n_max=40, dim_min=2, dim_max=8):
    return st.integers(dim_min, dim_max).flatmap(
        lambda d: st.lists(
            st.lists(_finite, min_size=d, max_size=d), min_size=n_min, max_size=n_max
        )
    )


@given(_vectors())
@settings(max_examples=50, deadline=None)
def test_pairwise_distances_properties(vecs):
    X = np.array(vecs, dtype=np.float64)
    D = VN.pairwise_distances(X, X, "sq_euclidean")
    assert np.all(D >= -1e-9)  # non-negative up to fp error
    assert np.allclose(np.diag(D), 0.0, atol=1e-6)  # d(x,x)=0
    assert np.allclose(D, D.T, atol=1e-6)  # symmetric


@given(_vectors(n_min=4), st.integers(1, 4), st.integers(0, 10_000))
@settings(max_examples=30, deadline=None)
def test_kmeans_numpy_invariants(vecs, k, seed):
    X = np.array(vecs, dtype=np.float64)
    cents, cost = _kmeans_numpy(X, k, max_iter=5, seed=seed)
    assert cents.shape == (k, X.shape[1])
    assert cost >= 0.0
    # reported cost is consistent: assigning X to the PREVIOUS centroids can
    # only have cost >= the converged inertia lower bound of 0; recompute
    # against returned centroids must not exceed cost by more than one
    # update step's improvement (cost was measured before the last update)
    d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    recomputed = d.min(axis=1).sum()
    assert recomputed <= cost + 1e-6


@given(_vectors(n_min=4), st.integers(0, 10_000))
@settings(max_examples=30, deadline=None)
def test_kmeans_restart_picks_min_cost(vecs, seed):
    """Multi-restart argmin semantics (ivfflat.rs:108-121): best-of-3 cost
    ≤ every individual run's cost."""
    X = np.array(vecs, dtype=np.float64)
    costs = [_kmeans_numpy(X, 2, max_iter=4, seed=seed + a)[1] for a in range(3)]
    assert min(costs) <= max(costs)


@given(_vectors(n_min=3, n_max=60, dim_min=2, dim_max=6),
       st.integers(1, 8), st.integers(0, 10_000))
@settings(max_examples=30, deadline=None)
def test_local_lsh_tree_invariants(vecs, max_node_size, seed):
    """Per-tree local build (lsh.rs:96-111 semantics): every input id lands in
    exactly one leaf; leaves respect max_node_size unless depth-capped; every
    leaf path has a matching plane prefix chain."""
    X = np.unique(np.array(vecs, dtype=np.float64), axis=0)  # build dedups first
    pdf = pd.DataFrame(
        {"tree_id": 0, "id": np.arange(len(X)), "embedding": list(X)}
    )
    max_depth = 12
    out = _build_trees_in_pandas(1, max_node_size, seed, max_depth)(pdf)
    leaves = out[out["kind"] == "leaf"]
    planes = out[out["kind"] == "plane"]
    assert sorted(leaves["id"].astype(int)) == list(range(len(X)))
    by_path = leaves.groupby("path").size()
    for path, n in by_path.items():
        assert n <= max_node_size or len(path) >= max_depth
    plane_paths = set(planes["path"])
    for path in by_path.index:
        for i in range(len(path)):
            assert path[:i] in plane_paths  # split chain exists


@given(_vectors(n_min=2, n_max=20), st.integers(0, 10_000))
@settings(max_examples=30, deadline=None)
def test_local_lsh_split_sides(vecs, seed):
    """Hyperplane construction property (lsh.rs:58-94): for plane built from
    points a, b — coeff = b − a, const = −coeff·midpoint — a is strictly
    below and b strictly above, so no split is ever empty."""
    X = np.unique(np.array(vecs, dtype=np.float64), axis=0)
    if len(X) < 2:
        return
    rng = np.random.default_rng(seed)
    i, j = rng.choice(len(X), 2, replace=False)
    a, b = X[i], X[j]
    if np.array_equal(a, b):
        return
    coeff = b - a
    const = float(-(coeff @ ((a + b) / 2.0)))
    assert coeff @ a + const < 0 <= coeff @ b + const
