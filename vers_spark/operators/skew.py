"""Explicit skew mitigation for shuffle joins (SURVEY.md §4 scale notes).

AQE's skew-join splitting (on by default, see session.py) handles most skew by
splitting oversized post-shuffle partitions — but it only fires for sort-merge
joins after a shuffle materializes, and it cannot help when one key's rows
must still MEET one matching row replicated to every split. The classic
production pattern it doesn't cover: a fact-fact join where a handful of hot
keys (null-ish defaults, bot users, empty-text fingerprints) dwarf AQE's
split threshold or where the runtime stats arrive too late. The explicit
split-union plan here fixes the worst case deterministically:

- rows with a HOT key take a broadcast path: the hot slice of the right side
  is tiny by definition of "few hot keys", so it broadcasts; the hot left
  rows never shuffle at all;
- everything else takes the normal shuffle join.

Catalyst sees two independent joins and a union — every standard
optimization (pushdown, AQE coalescing on the cold path) still applies. Hot
keys can be supplied (known-bad sentinel values) or discovered with one cheap
sampled aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def find_hot_keys(
    df: DataFrame, key: str, threshold: float = 0.01, sample_fraction: float = 0.1
) -> list:
    """Keys holding more than ``threshold`` of a sampled row share. One
    sampled partial-aggregate job; at 100 TB run it on a 0.1-1% sample —
    heavy hitters by definition survive sampling."""
    sampled = df.sample(fraction=sample_fraction, seed=42)
    total = sampled.count()
    if total == 0:
        return []
    rows = (
        sampled.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > threshold * total)
        .collect()
    )
    return [r[key] for r in rows]


def skew_split_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    hot_keys: list,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot keys routed through a broadcast path and the
    rest through the normal shuffle join; result equals
    ``left.join(right, left[left_key] == right[right_key], how)`` for
    ``how`` in (inner, left). Empty ``hot_keys`` degrades to the plain join."""
    if how not in ("inner", "left"):
        raise ValueError(f"skew_split_join supports inner/left, got {how!r}")
    cond = left[left_key] == right[right_key]
    if not hot_keys:
        return left.join(right, cond, how)
    is_hot_l = F.col(left_key).isin(hot_keys)
    is_hot_r = F.col(right_key).isin(hot_keys)
    hot = left.filter(is_hot_l).join(F.broadcast(right.filter(is_hot_r)), cond, how)
    cold = left.filter(~is_hot_l | F.col(left_key).isNull()).join(
        right.filter(~is_hot_r), cond, how
    )
    return hot.unionByName(cold)
