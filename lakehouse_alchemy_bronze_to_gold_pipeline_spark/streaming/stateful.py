"""Spark 4 ``transformWithStateInPandas`` operators (engine
extension; the reference has no stateful streaming at all — SURVEY
2.9).  This is the arbitrary-state API that supersedes
``applyInPandasWithState`` with capabilities the older API lacks:

- **event-time TIMERS**: a key can schedule work for a future
  watermark instant and be invoked with NO new input for that key
  (``handleExpiredTimer``) — the only way to close an idle session
  exactly when the watermark passes its gap;
- **state TTL**: per-state-variable wall-clock expiry enforced by the
  store itself — bounded state for dedup-style operators without any
  watermark column on the input;
- composite state variables (value/list/map) per key.

Both operators keep the hot path Arrow-batched (pandas in/out) and
hash-partitioned by key — state lives in the per-partition RocksDB
store (``transformWithState`` requires the RocksDB provider; see
``rocksdb_conf``), so a 1000-executor cluster shards it with no
driver involvement.  Skewed keys skew the store; salt hot keys
upstream if one key's open state exceeds an executor's share.
"""

from __future__ import annotations

import sys
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)


def _ship_by_value() -> None:
    """transformWithState spins up a dedicated Python *driver worker*
    that unpickles the StatefulProcessor — by reference, so it fails
    with ModuleNotFoundError unless this package is importable in that
    fresh process.  Registering the module for pickle-BY-VALUE makes
    the processor self-contained on the wire (the same fix works for
    executors without the package on PYTHONPATH)."""
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])

#: transformWithState only runs on the RocksDB state store — callers
#: set this on the session before starting the query.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def rocksdb_conf(spark) -> None:
    """Point the streaming state store at RocksDB (required by every
    ``transformWithState`` query; harmless for the HDFS-backed ops)."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )


# ------------------------------------------------- timer sessions

#: output of timer_sessions
SESSION_SCHEMA = (
    "user string, session_start_ms bigint, session_end_ms bigint, "
    "n_events bigint, sum_value double"
)

#: one open session per key
_SESSION_STATE = "start_ms bigint, last_ms bigint, n bigint, total double"


class _SessionTimerProcessor(StatefulProcessor):
    """Inactivity-gap sessionization with event-time timers.

    In-batch gap splits emit their closed sessions immediately; the
    *open* session is held in a ValueState and closed by a timer
    registered at ``last_ms + gap_ms`` — ``handleExpiredTimer`` fires
    when the watermark passes that instant, with no further input for
    the key required (the semantics ``F.session_window`` gives you
    only for built-in aggs, now available to arbitrary per-session
    logic).  Events are processed in event-time order within a batch;
    cross-batch reordering is bounded by the watermark as usual.
    """

    def __init__(self, gap_ms: int) -> None:
        self._gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._open = handle.getValueState("open_session", _SESSION_STATE)

    def _row(self, key: str, s) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user": [key],
                "session_start_ms": [int(s[0])],
                "session_end_ms": [int(s[1])],
                "n_events": [int(s[2])],
                "sum_value": [float(s[3])],
            }
        )

    def handleInputRows(
        self,
        key: Any,
        rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        events = pd.concat(list(rows), ignore_index=True).sort_values(
            "ts_ms"
        )
        cur = list(self._open.get()) if self._open.exists() else None
        if cur is not None:
            # the open session's close timer moves with every batch
            self._handle.deleteTimer(int(cur[1]) + self._gap_ms)
        for ts, val in zip(events["ts_ms"], events["value"]):
            ts, val = int(ts), float(val)
            if cur is None:
                cur = [ts, ts, 1, val]
            elif ts - cur[1] > self._gap_ms:
                yield self._row(key[0], cur)  # gap inside the batch
                cur = [ts, ts, 1, val]
            else:
                cur[1] = max(cur[1], ts)
                cur[2] += 1
                cur[3] += val
        self._open.update(tuple(cur))
        self._handle.registerTimer(int(cur[1]) + self._gap_ms)

    def handleExpiredTimer(
        self,
        key: Any,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo,
    ) -> Iterator[pd.DataFrame]:
        if self._open.exists():
            cur = self._open.get()
            # a stale timer (superseded by a later batch) must not
            # close a session that has since been extended
            if int(cur[1]) + self._gap_ms <= expiredTimerInfo.getExpiryTimeInMs():
                yield self._row(key[0], cur)
                self._open.clear()

    def close(self) -> None:
        pass


def timer_sessions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-user inactivity sessions closed by EVENT-TIME TIMERS: a
    session emits when the watermark passes ``last_event + gap`` even
    if the key never receives another event — the case neither
    ``applyInPandasWithState`` timeouts (coarse, whole-key) nor batch
    ``operators.sessionize`` (needs all data) covers incrementally.
    """
    _ship_by_value()
    shaped = events.withWatermark(ts_col, watermark).select(
        F.col(user_col).cast("string").alias("user"),
        (F.unix_micros(F.col(ts_col)) / 1000).cast("bigint").alias("ts_ms"),
        F.col("value").cast("double").alias("value"),
    )
    return shaped.groupBy("user").transformWithStateInPandas(
        statefulProcessor=_SessionTimerProcessor(gap_seconds * 1000),
        outputStructType=SESSION_SCHEMA,
        outputMode="append",
        timeMode="EventTime",
    )


# --------------------------------------------------- TTL dedup

#: output of dedup_ttl: first-seen rows pass through
DEDUP_SCHEMA = "key string, first_ts_ms bigint, n_suppressed bigint"


class _TtlDedupProcessor(StatefulProcessor):
    """First-seen gate with store-enforced TTL: a key row passes once,
    repeats are counted and suppressed while the state lives; after
    ``ttl_ms`` of wall-clock the store itself expires the entry, so
    the key passes again.  Bounded state with NO watermark — the TTL
    is the bound, which is exactly what an at-least-once ingest dedup
    in front of a bronze table wants (duplicates cluster in time)."""

    def __init__(self, ttl_ms: int) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState(
            "seen", "first_ts_ms bigint", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self,
        key: Any,
        rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        n = sum(len(pdf) for pdf in rows)
        if self._seen.exists():
            return  # TTL window still live: suppress the whole batch
        now = timerValues.getCurrentProcessingTimeInMs()
        self._seen.update((now,))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "first_ts_ms": [int(now)],
                "n_suppressed": [int(n - 1)],
            }
        )

    def close(self) -> None:
        pass


def dedup_ttl(
    events: DataFrame, key_col: str, ttl_ms: int = 3_600_000
) -> DataFrame:
    """Emit each key once per TTL window (state expires by itself —
    the store-level TTL that ``applyInPandasWithState`` cannot
    express; its timeouts require the operator to see the key again)."""
    _ship_by_value()
    shaped = events.select(F.col(key_col).cast("string").alias("key"))
    return shaped.groupBy("key").transformWithStateInPandas(
        statefulProcessor=_TtlDedupProcessor(ttl_ms),
        outputStructType=DEDUP_SCHEMA,
        outputMode="append",
        timeMode="ProcessingTime",
    )


# ---------------------------------------------------------------
# applyInPandasWithState twins.  transformWithState's Python state
# protocol needs google.protobuf, which this sandbox lacks (same
# environment class as delta-spark) — these twins express the SAME
# semantics on the older GroupState API (no extra deps) and carry the
# executable tests; the TWS versions above are the forward path and
# share the output schemas so callers can swap freely.
# ---------------------------------------------------------------


def timer_sessions_gst(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """``timer_sessions`` on ``applyInPandasWithState`` +
    ``EventTimeTimeout``: the per-key timeout timestamp plays the
    single session-close timer (GroupState allows exactly one, which
    is all inactivity sessions need); when the watermark passes it,
    the function is invoked with ``hasTimedOut`` and NO input rows —
    the idle session emits without new traffic for the key."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_seconds * 1000

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            if state.exists:
                s = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user": [key[0]],
                        "session_start_ms": [int(s[0])],
                        "session_end_ms": [int(s[1])],
                        "n_events": [int(s[2])],
                        "sum_value": [float(s[3])],
                    }
                )
            return
        events_pd = pd.concat(list(pdfs), ignore_index=True).sort_values(
            "ts_ms"
        )
        cur = list(state.get) if state.exists else None
        closed = []
        for ts, val in zip(events_pd["ts_ms"], events_pd["value"]):
            ts, val = int(ts), float(val)
            if cur is None:
                cur = [ts, ts, 1, val]
            elif ts - cur[1] > gap_ms:
                closed.append(cur)
                cur = [ts, ts, 1, val]
            else:
                cur[1] = max(cur[1], ts)
                cur[2] += 1
                cur[3] += val
        state.update(tuple(cur))
        # the close instant must sit above the current watermark or
        # Spark rejects it; clamping to wm+1 just fires next batch
        state.setTimeoutTimestamp(
            max(cur[1] + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield pd.DataFrame(
                {
                    "user": [key[0]] * len(closed),
                    "session_start_ms": [int(s[0]) for s in closed],
                    "session_end_ms": [int(s[1]) for s in closed],
                    "n_events": [int(s[2]) for s in closed],
                    "sum_value": [float(s[3]) for s in closed],
                }
            )

    # EventTimeTimeout needs a WATERMARKED TimestampType column to
    # survive into the grouped relation — shape first, watermark last
    shaped = events.select(
        F.col(user_col).cast("string").alias("user"),
        F.col(ts_col).alias("ts"),
        (F.unix_micros(F.col(ts_col)) / 1000).cast("bigint").alias("ts_ms"),
        F.col("value").cast("double").alias("value"),
    ).withWatermark("ts", watermark)
    return shaped.groupBy("user").applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def dedup_ttl_gst(
    events: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    ttl_ms: int = 3_600_000,
    watermark: str = "30 minutes",
) -> DataFrame:
    """``dedup_ttl`` on GroupState, keyed on EVENT time: a key's
    first event passes, repeats with ``ts < first + ttl`` suppress,
    an event past the TTL re-admits (and restarts the window).
    Event-time TTL is deterministic under replay — the same input
    always dedups identically, unlike the wall-clock TTL of the TWS
    variant — and the ``EventTimeTimeout`` garbage-collects a key's
    state as soon as the watermark passes its expiry (wall-clock
    timeouts would pin an ``availableNow`` run alive until they
    fire).  ``n_suppressed`` counts suppressions within the emitting
    batch; later batches suppress silently (append output is final)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        events_pd = pd.concat(list(pdfs), ignore_index=True).sort_values(
            "ts_ms"
        )
        first = state.get[0] if state.exists else None
        admitted, suppressed = [], []
        for ts in events_pd["ts_ms"]:
            ts = int(ts)
            if first is None or ts - first >= ttl_ms:
                first = ts
                admitted.append(ts)
                suppressed.append(0)
            elif admitted:
                suppressed[-1] += 1
        state.update((first,))
        state.setTimeoutTimestamp(
            max(first + ttl_ms, state.getCurrentWatermarkMs() + 1)
        )
        if admitted:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(admitted),
                    "first_ts_ms": admitted,
                    "n_suppressed": suppressed,
                }
            )

    shaped = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).alias("ts"),
        (F.unix_micros(F.col(ts_col)) / 1000).cast("bigint").alias("ts_ms"),
    ).withWatermark("ts", watermark)
    return shaped.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=DEDUP_SCHEMA,
        stateStructType="first_ts_ms bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
