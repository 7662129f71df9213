"""Process-wide memo for intermediates shared across driver queries.

The driver's correctness sweep calls every ``__spark_entry__.queries()`` entry
in one process against one sf_dir. Several entries share an expensive
intermediate (the MinHash candidate pairs + connected components are used by
three queries; the k=16 IVF build by four). Rebuilding those per query is pure
waste — at sweep time AND at 100 TB, where an index/components table is built
once and served to many consumers. This memo is that "built once" contract in
miniature: keyed by (name, sf_dir, params), holding cached DataFrames or index
objects for the life of the process.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")

_CACHE: dict[tuple, object] = {}


def memo(key: tuple, build: Callable[[], T]) -> T:
    if key not in _CACHE:
        _CACHE[key] = build()
    return _CACHE[key]  # type: ignore[return-value]
