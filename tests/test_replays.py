"""Independent pure-Python replays of the engine's deterministic kernels.

The DuckDB oracles prove Spark ≡ DuckDB; these prove Spark ≡ a from-scratch
Python model of the CONTRACT, so a bug shared by both SQL formulations (or
an oracle that accidentally mirrors an implementation quirk) still gets
caught. All inputs are tiny and synthetic-random with fixed seeds.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_lloyd_fixed_matches_python_replay(spark):
    """lloyd_fixed ≡ an independent numpy/python implementation of the same
    contract: md5 hash-ordered init, left-fold f64 argmin with cluster-id
    tie-break, 1e-8 fixed-point BIGINT means, empty→zero."""
    from vers_spark.indexes.ivfflat import lloyd_fixed

    rng = np.random.default_rng(7)
    n, dim, k, iters, seed = 60, 6, 4, 3, 42
    X32 = rng.normal(size=(n, dim)).astype(np.float32)
    rows = [(i, [float(x) for x in X32[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents, assigned = lloyd_fixed(df, k=k, iters=iters, seed=seed)
    got = {
        r["cluster_id"]: (tuple(r["centroid"]), r["n_assigned"], r["cost_fp"])
        for r in cents.collect()
    }

    # ---- python replay (no Spark, no SQL) ----
    X = X32.astype(np.float64)

    def fold_sqe(a, b):
        acc = 0.0
        for xa, xb in zip(a, b):
            d = float(xa) - float(xb)
            acc += d * d
        return acc

    order = sorted(range(n), key=lambda i: (_hash60(f"{i}:ivf:{seed}"), i))
    C = [list(map(float, X32[i])) for i in order[:k]]

    def assign():
        out = []
        for i in range(n):
            best = min(
                ((fold_sqe(X[i], C[c]), c) for c in range(k)), key=lambda t: (t[0], t[1])
            )
            out.append(best)
        return out

    for _ in range(iters):
        a = assign()
        newC = []
        for c in range(k):
            members = [i for i, (_, cc) in enumerate(a) if cc == c]
            if not members:
                newC.append([0.0] * dim)
                continue
            sums = [
                sum(int(round(float(X32[i][d]) * 1e8)) for i in members)
                for d in range(dim)
            ]
            newC.append([s / float(len(members) * 10**8) for s in sums])
        C = newC
    final = assign()
    want = {}
    for c in range(k):
        members = [(d, i) for i, (d, cc) in enumerate(final) if cc == c]
        cost = sum(int(round(d * 1e8)) for d, _ in members)
        want[c] = (tuple(C[c]), len(members), cost)
    assert got == want


def test_asof_join_matches_pandas_merge_asof(spark):
    """asof_join (union + window last-ignorenulls) ≡ pandas merge_asof with
    allow_exact_matches=False on random keyed event frames."""
    from vers_spark.operators.temporal import asof_join

    rng = np.random.default_rng(11)
    nl, nr = 80, 60
    left = pd.DataFrame(
        {
            "user_id": rng.integers(0, 5, nl),
            "ts": rng.integers(0, 10_000, nl),
            "event_id": np.arange(nl),
        }
    )
    right = pd.DataFrame(
        {
            "user_id": rng.integers(0, 5, nr),
            "ts": rng.integers(0, 10_000, nr),
            "event_id": np.arange(100, 100 + nr),
            "payload": rng.integers(0, 1000, nr),
        }
    )
    # pandas asof breaks exact-ts ties arbitrarily on unsorted input order —
    # dedupe (user, ts) on the right to keep the model unambiguous, and keep
    # left timestamps unique per user for the same reason
    right = right.drop_duplicates(["user_id", "ts"])
    left = left.drop_duplicates(["user_id", "ts"])

    ldf = spark.createDataFrame(left.astype("int64"))
    rdf = spark.createDataFrame(right.astype("int64"))
    out = asof_join(ldf, rdf, on=["user_id"], right_cols=["payload"]).select(
        "user_id", "ts", "event_id", F.col("_match.payload").alias("payload")
    )
    got = {
        (r["user_id"], r["ts"]): r["payload"] for r in out.collect()
    }

    lp = left.sort_values("ts").reset_index(drop=True)
    rp = right.sort_values("ts").reset_index(drop=True)
    merged = pd.merge_asof(
        lp,
        rp[["user_id", "ts", "payload"]],
        on="ts",
        by="user_id",
        allow_exact_matches=False,
        direction="backward",
    )
    want = {
        (int(r.user_id), int(r.ts)): (None if pd.isna(r.payload) else int(r.payload))
        for r in merged.itertuples()
    }
    assert got == want


def test_gapfill_locf_matches_python_replay(spark, sf_dir):
    """evt_gapfill_locf ≡ a dict-based python replay over the same events."""
    from vers_spark.operators.temporal import evt_gapfill_locf
    from vers_spark.sources.tables import load_table

    # query output: hour as 'yyyy-MM-dd HH:mm:ss' string, LOCF value as
    # ×10⁴ fixed-point BIGINT (driver-canonicalizer discipline, round 4)
    out = {
        (r["user_id"], r["hour"]): (r["n_events"], r["is_gap"], r["locf_sum_fp"])
        for r in evt_gapfill_locf(spark, sf_dir).collect()
    }

    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("hour", "ts").alias("hour"),
                F.col("value").cast("decimal(18,4)").alias("v"))
        .collect()
    )
    from collections import defaultdict
    from datetime import timedelta

    per = defaultdict(lambda: defaultdict(lambda: [0, None]))
    for r in ev:
        cell = per[r["user_id"]][r["hour"]]
        cell[0] += 1
        cell[1] = r["v"] if cell[1] is None else cell[1] + r["v"]
    def fp(dec):
        return None if dec is None else int(dec * 10000)

    want = {}
    for u, hours in per.items():
        h0, h1 = min(hours), max(hours)
        last = None
        h = h0
        while h <= h1:
            key = (u, h.strftime("%Y-%m-%d %H:%M:%S"))
            if h in hours:
                n, s = hours[h]
                last = s
                want[key] = (n, False, fp(last))
            else:
                want[key] = (0, True, fp(last))
            h = h + timedelta(hours=1)
    assert out == want


def test_bpe_trainer_matches_python_replay(spark):
    """train_merges_on ≡ a from-scratch Python BPE trainer with the same
    pinned semantics (pair counts over the word-frequency table, argmax with
    (count DESC, pair ASC) tie-break, two-pass literal-replace application)
    on a randomized synthetic corpus."""
    from collections import Counter

    from vers_spark.operators.bpe import EOW, train_merges_on

    rng = np.random.default_rng(23)
    words = ["".join(rng.choice(list("abcd"), size=rng.integers(2, 7))) for _ in range(40)]
    docs = [" ".join(rng.choice(words, size=rng.integers(3, 12))) for _ in range(30)]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    got, _ = train_merges_on(df, k=6)

    # python replay
    freqs = Counter(w for d in docs for w in d.lower().split())
    vocab = {w: f" {' '.join(w)} {EOW} " for w in freqs}
    merges = []
    for step in range(1, 7):
        pc = Counter()
        for w, seq in vocab.items():
            syms = seq.split()
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += freqs[w]
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((step, l, r, c))
        pat, rep = f" {l} {r} ", f" {l}{r} "
        vocab = {w: s.replace(pat, rep).replace(pat, rep) for w, s in vocab.items()}
    assert got == merges
