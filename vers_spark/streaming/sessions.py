"""Custom stateful streaming operator: inactivity-gap sessionization via
``applyInPandasWithState`` (the task's custom-stateful-operator surface; no
counterpart in the reference).

Semantics: per user, consecutive events with gaps ≤ ``gap`` belong to one
session; a gap > ``gap`` closes the session. The operator EMITS ONLY CLOSED
sessions — each user's trailing (still-open) session lives in state and is
never emitted on a finite stream. That makes the stream output deterministic
and batch-expressible: the DuckDB twin is the classic lag/cumsum
sessionization minus each user's last session.

State per user is one open session (4 scalars) — size is O(active users),
not O(events). Cross-batch stitching (a session spanning micro-batches) is
exercised in tests with a 2-file source.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
_STATE_SCHEMA = "start long, last long, n long, sv double"

_US = 1_000_000


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """events(user_id, ts, value) stream → closed sessions per user."""
    gap_us = gap_minutes * 60 * _US

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, last, n, sv = state.get
        else:
            start = last = -1
            n, sv = 0, 0.0
        closed: list[tuple[Any, ...]] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, value in zip(pdf["ts"], pdf["value"]):
                t = int(ts.value // 1_000)  # pandas ns → µs
                v = float(value)
                if start < 0:
                    start, last, n, sv = t, t, 1, v
                elif t - last > gap_us:
                    closed.append((user_id, start, last, n, sv))
                    start, last, n, sv = t, t, 1, v
                else:
                    last, n, sv = t, n + 1, sv + v
        state.update((start, last, n, sv))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "n_events": [c[3] for c in closed],
                    "sum_value": [round(c[4], 4) for c in closed],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, _OUT_SCHEMA, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
