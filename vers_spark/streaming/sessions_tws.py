"""Inactivity-gap sessionization on Spark 4's ``transformWithStateInPandas``
— the arbitrary-stateful API that supersedes ``applyInPandasWithState``
(typed state variables with Value/List/Map state, timers, per-state TTL,
RocksDB-backed stores). This is the same operator contract as
:mod:`vers_spark.streaming.sessions` — per user, gaps ≤ ``gap`` chain a
session, larger gaps close it, only CLOSED sessions are emitted — defined
identically so BOTH implementations hash-match the same batch SQL oracle:
the engine-migration guarantee (old-API and new-API programs provably
compute the same answer) stated as a driver-checkable query.

State here is one ValueState holding the open session (4 scalars), so the
store size is O(active users) regardless of event volume; with RocksDB the
working set can also exceed executor memory — the 100 TB-stream reason this
API exists. ``timeMode="None"`` keeps the finite availableNow drain
deterministic (timer-based emission depends on wall-clock/watermark arrival
and would break exact batch equivalence).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
_STATE_SCHEMA = "start long, last long, n long, sv double"
_US = 1_000_000

_ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def tws_runtime_available() -> bool:
    """transformWithStateInPandas' state API speaks protobuf to the JVM
    (pyspark.sql.streaming.proto.StateMessage_pb2) — on runtimes without the
    ``protobuf`` package the TWS driver worker dies at init. Callers should
    fall back to the applyInPandasWithState twin (same contract, same
    oracle) when this is False."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _make_session_processor(gap_us: int) -> StatefulProcessor:
    """Per-user open-session state machine (same fold as sessions.py:39-71).

    The class is defined INSIDE this factory so cloudpickle serializes it by
    VALUE: Spark's TransformWithStateInPySpark spawns a separate Python
    "driver worker" that unpickles the processor, and a module-level class
    pickles by reference — which that worker cannot import (vers_spark is
    not on its path) and dies on without a traceback."""

    class _SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._open = handle.getValueState("open_session", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            if self._open.exists():
                start, last, n, sv = self._open.get()
            else:
                start = last = -1
                n, sv = 0, 0.0
            closed: list[tuple] = []
            for pdf in rows:
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
            self._open.update((start, last, n, sv))
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

        def close(self) -> None:
            pass

    return _SessionProcessor()


class rocksdb_state_store:
    """Pin the RocksDB state-store provider while a stream starts (the
    provider is read at stream start and pinned into the checkpoint, so
    scoping it here affects only streams started inside the block).
    transformWithState requires RocksDB; the other streaming queries keep
    the default HDFS-backed store."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.old = self.spark.conf.get(_PROVIDER_KEY, None)
        self.spark.conf.set(_PROVIDER_KEY, _ROCKSDB)

    def __exit__(self, *exc):
        if self.old is None:
            self.spark.conf.unset(_PROVIDER_KEY)
        else:
            self.spark.conf.set(_PROVIDER_KEY, self.old)
        return False


def sessionize_tws(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """events(user_id, ts, value, event_id) stream → closed sessions per
    user, via the transformWithStateInPandas StatefulProcessor."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_session_processor(gap_minutes * 60 * _US),
        outputStructType=_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
