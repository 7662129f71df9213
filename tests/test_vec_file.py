""".vec loader: parsing, normalize-on-load, dense file-order ids, holdout —
the utils.rs:7-66 contract."""

from __future__ import annotations

import math

import pytest

from vers_spark.sources.vec_file import load_vec_file

WORDS = [
    ("king", [1.0, 2.0, 2.0]),
    ("queen", [2.0, 1.0, 2.0]),
    ("apple", [0.0, 3.0, 4.0]),
    ("zero", [0.0, 0.0, 0.0]),  # degenerate: normalize must be identity
]


@pytest.fixture(scope="module")
def vec_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("vec") / "tiny.vec"
    lines = [f"{len(WORDS)} 3"] + [f"{w} " + " ".join(str(x) for x in v) for w, v in WORDS]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_parse_and_normalize(spark, vec_path):
    corpus, holdout = load_vec_file(spark, vec_path)
    assert holdout is None
    rows = {r["word"]: r for r in corpus.collect()}
    assert set(rows) == {w for w, _ in WORDS}
    king = rows["king"]["emb"]
    assert abs(math.sqrt(sum(x * x for x in king)) - 1.0) < 1e-6
    assert abs(king[0] - 1 / 3) < 1e-6  # [1,2,2]/3
    # degenerate vector passes through unchanged (base.rs:99-105)
    assert rows["zero"]["emb"] == [0.0, 0.0, 0.0]


def test_dense_file_order_ids(spark, vec_path):
    corpus, _ = load_vec_file(spark, vec_path, normalize=False)
    by_id = {r["id"]: r["word"] for r in corpus.collect()}
    assert by_id == {i: w for i, (w, _) in enumerate(WORDS)}


def test_holdout_word(spark, vec_path):
    corpus, holdout = load_vec_file(spark, vec_path, holdout_word="queen")
    words = {r["word"] for r in corpus.collect()}
    assert "queen" not in words and len(words) == 3
    h = holdout.collect()
    assert len(h) == 1 and h[0]["word"] == "queen"


def test_raw_values_unnormalized(spark, vec_path):
    corpus, _ = load_vec_file(spark, vec_path, normalize=False)
    rows = {r["word"]: r["emb"] for r in corpus.collect()}
    assert rows["apple"] == [0.0, 3.0, 4.0]
