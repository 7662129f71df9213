"""Physical-plan audit helpers: assert the plan SHAPE we designed for, so a
refactor that silently drops a pushdown, broadcast, or partial aggregate
fails a test instead of a 100 TB run.

SURVEY §4: the engine needs no custom Catalyst rules — these checks pin the
built-in behaviors (predicate pushdown, column pruning, broadcast joins,
partial/final aggregation) the operators rely on.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count(df: DataFrame, pattern: str) -> int:
    return len(re.findall(pattern, executed_plan(df)))


def has_broadcast_join(df: DataFrame) -> bool:
    return count(df, r"BroadcastHashJoin|BroadcastNestedLoopJoin") > 0


def has_sort_merge_join(df: DataFrame) -> bool:
    return count(df, r"SortMergeJoin") > 0


def pushed_filters(df: DataFrame) -> list[str]:
    """Every non-empty PushedFilters list across the plan's parquet scans."""
    return [
        m
        for m in re.findall(r"PushedFilters: \[([^\]]*)\]", executed_plan(df))
        if m.strip()
    ]


def scan_columns(df: DataFrame) -> list[set[str]]:
    """Output column sets per parquet scan — column pruning made assertable.
    Parsed from the FileScan bracket list (ReadSchema is truncated in
    executedPlan().toString())."""
    out = []
    for m in re.findall(r"FileScan parquet[^\[]*\[([^\]]*)\]", executed_plan(df)):
        out.append({re.sub(r"#\d+L?", "", c).strip() for c in m.split(",") if c.strip()})
    return out


def has_partial_aggregate(df: DataFrame) -> bool:
    """Map-side combine present (partial_ function in a HashAggregate)."""
    return count(df, r"partial_") > 0


def num_exchanges(df: DataFrame) -> int:
    return count(df, r"\bExchange\b")
