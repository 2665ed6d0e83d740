"""Stateful streaming operator twins: event-time-timer-closed
sessions (emission with NO further input for the key) and
TTL-expiring first-seen dedup.

Each operator has two implementations sharing one output schema:
``*_gst`` on applyInPandasWithState (runs everywhere, carries the
assertions) and the transformWithStateInPandas forward path, which
needs google.protobuf for its Python state protocol — absent in this
sandbox (same environment class as delta-spark), so those params
skip-gate.  Both are pinned across availableNow runs through a shared
checkpoint."""

from __future__ import annotations

import importlib.util
import json
import os
import time

import pytest
from pyspark.sql import functions as F

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.streaming.stateful import (
    dedup_ttl,
    dedup_ttl_gst,
    rocksdb_conf,
    timer_sessions,
    timer_sessions_gst,
)

SCHEMA = "user_id string, ts timestamp, value double"

try:
    _HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:  # no 'google' namespace package at all
    _HAS_PROTOBUF = False

SESSION_IMPLS = [
    pytest.param(timer_sessions_gst, id="gst"),
    pytest.param(
        timer_sessions,
        id="tws",
        marks=pytest.mark.skipif(
            not _HAS_PROTOBUF,
            reason="transformWithState needs google.protobuf",
        ),
    ),
]
_tws = pytest.mark.skipif(
    not _HAS_PROTOBUF, reason="transformWithState needs google.protobuf"
)


def _write(dirpath, name, rows):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.fixture()
def rocksdb(spark):
    """transformWithState requires the RocksDB provider; the GST ops
    run on it too, so every param uses the same store."""
    old = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    rocksdb_conf(spark)
    yield spark
    if old is None:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    else:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", old
        )


def _run(spark, src, cp, op, mode="append"):
    rows = []
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = (
        op(stream)
        .writeStream.foreachBatch(lambda df, _id: rows.extend(df.collect()))
        .outputMode(mode)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rows


def _hm(ms):
    return time.strftime("%H:%M", time.gmtime(ms // 1000))


@pytest.mark.parametrize("sessions", SESSION_IMPLS)
def test_timer_closes_idle_session_without_new_key_input(
    rocksdb, tmp_path, sessions
):
    spark = rocksdb
    src, cp = str(tmp_path / "src"), str(tmp_path / "cp")
    op = lambda s: sessions(s, gap_seconds=1800, watermark="30 minutes")

    # u1: two events 10 min apart (one session) then a 110-min gap to
    # a second session — the IN-BATCH gap split emits session 1 right
    # away; u9 is the clock that pushes the watermark to 13:00, past
    # session 2's close instant (12:30), so its TIMER fires inside the
    # same run's no-data batch with no further u1 input.
    _write(src, "a.json", [
        {"user_id": "u1", "ts": "2024-01-01 10:00:00", "value": 1.0},
        {"user_id": "u1", "ts": "2024-01-01 10:10:00", "value": 2.0},
        {"user_id": "u1", "ts": "2024-01-01 12:00:00", "value": 4.0},
        {"user_id": "u9", "ts": "2024-01-01 13:30:00", "value": 8.0},
    ])
    rows1 = _run(spark, src, cp, op)
    u1 = sorted(
        [r for r in rows1 if r.user == "u1"],
        key=lambda r: r.session_start_ms,
    )
    assert [
        (_hm(r.session_start_ms), _hm(r.session_end_ms), r.n_events, r.sum_value)
        for r in u1
    ] == [("10:00", "10:10", 2, 3.0), ("12:00", "12:00", 1, 4.0)]
    # u9's own session (closes 14:00) is still open in state
    assert [r for r in rows1 if r.user == "u9"] == []

    # run 2: a later clock advances the watermark past 14:00 -> u9's
    # checkpointed session flushes purely from a timer
    _write(src, "b.json", [
        {"user_id": "u8", "ts": "2024-01-01 16:00:00", "value": 0.0},
    ])
    rows2 = _run(spark, src, cp, op)
    u9 = [r for r in rows2 if r.user == "u9"]
    assert [(r.n_events, r.sum_value) for r in u9] == [(1, 8.0)]


@pytest.mark.parametrize("sessions", SESSION_IMPLS)
def test_timer_session_extends_instead_of_splitting(
    rocksdb, tmp_path, sessions
):
    spark = rocksdb
    src, cp = str(tmp_path / "src"), str(tmp_path / "cp")
    op = lambda s: sessions(s, gap_seconds=1800, watermark="30 minutes")

    _write(src, "a.json", [
        {"user_id": "u1", "ts": "2024-01-01 10:00:00", "value": 1.0},
    ])
    _run(spark, src, cp, op)
    # second run arrives INSIDE the gap: the open session extends (the
    # close timer moves from 10:30 to 10:50), and the 12:00 clock then
    # closes it as ONE two-event session
    _write(src, "b.json", [
        {"user_id": "u1", "ts": "2024-01-01 10:20:00", "value": 2.0},
        {"user_id": "u9", "ts": "2024-01-01 12:00:00", "value": 0.0},
    ])
    rows2 = _run(spark, src, cp, op)
    u1 = [r for r in rows2 if r.user == "u1"]
    assert [
        (_hm(r.session_start_ms), _hm(r.session_end_ms), r.n_events)
        for r in u1
    ] == [("10:00", "10:20", 2)]


def test_dedup_event_time_ttl_suppress_and_readmit(rocksdb, tmp_path):
    spark = rocksdb
    src, cp = str(tmp_path / "src"), str(tmp_path / "cp")
    op = lambda s: dedup_ttl_gst(s, "user_id", ttl_ms=3_600_000)

    # u1 admits at 10:00, suppresses the 10:30 dup (inside the 1 h
    # TTL), then RE-ADMITS at 11:30 (past it); u2 admits once
    _write(src, "a.json", [
        {"user_id": "u1", "ts": "2024-01-01 10:00:00", "value": 1.0},
        {"user_id": "u1", "ts": "2024-01-01 10:30:00", "value": 1.0},
        {"user_id": "u1", "ts": "2024-01-01 11:30:00", "value": 1.0},
        {"user_id": "u2", "ts": "2024-01-01 10:00:00", "value": 1.0},
    ])
    rows1 = _run(spark, src, cp, op)
    got = sorted((r.key, _hm(r.first_ts_ms), r.n_suppressed) for r in rows1)
    assert got == [("u1", "10:00", 1), ("u1", "11:30", 0), ("u2", "10:00", 0)]

    # run 2, same checkpoint: a dup INSIDE u1's live 11:30 window
    # suppresses silently; past-TTL traffic re-admits
    _write(src, "b.json", [
        {"user_id": "u1", "ts": "2024-01-01 12:00:00", "value": 1.0},
        {"user_id": "u2", "ts": "2024-01-01 13:00:00", "value": 1.0},
    ])
    rows2 = _run(spark, src, cp, op)
    got2 = sorted((r.key, _hm(r.first_ts_ms)) for r in rows2)
    assert got2 == [("u2", "13:00")]  # u1 suppressed, u2 re-admitted


def test_dedup_event_time_state_gc_after_watermark(rocksdb, tmp_path):
    """Once the watermark passes first+ttl the key's state is GONE
    (EventTimeTimeout removal), so the key admits fresh afterwards."""
    spark = rocksdb
    src, cp = str(tmp_path / "src"), str(tmp_path / "cp")
    op = lambda s: dedup_ttl_gst(
        s, "user_id", ttl_ms=3_600_000, watermark="10 minutes"
    )

    _write(src, "a.json", [
        {"user_id": "u1", "ts": "2024-01-01 10:00:00", "value": 1.0},
        # the clock pushes the watermark to 17:50, far past 11:00
        {"user_id": "u9", "ts": "2024-01-01 18:00:00", "value": 1.0},
    ])
    rows1 = _run(spark, src, cp, op)
    assert ("u1") in {r.key for r in rows1}

    _write(src, "b.json", [
        {"user_id": "u1", "ts": "2024-01-01 18:30:00", "value": 1.0},
    ])
    rows2 = _run(spark, src, cp, op)
    assert {r.key for r in rows2} == {"u1"}  # state was GC'd, re-admit


@_tws
def test_dedup_ttl_tws_wall_clock(rocksdb, tmp_path):
    """Store-level TTL on transformWithState (wall-clock): suppress
    inside the TTL, re-admit after the store expires the entry."""
    spark = rocksdb
    src, cp = str(tmp_path / "src"), str(tmp_path / "cp")
    short_ttl = lambda s: dedup_ttl(s, "user_id", ttl_ms=50)

    _write(src, "a.json", [
        {"user_id": "u1", "ts": "2024-01-01 10:00:00", "value": 1.0},
        {"user_id": "u1", "ts": "2024-01-01 10:01:00", "value": 1.0},
    ])
    rows1 = _run(spark, src, cp, short_ttl)
    assert [(r.key, r.n_suppressed) for r in rows1] == [("u1", 1)]

    time.sleep(1.0)  # wall-clock passes the 50 ms TTL
    _write(src, "b.json", [
        {"user_id": "u1", "ts": "2024-01-01 12:00:00", "value": 1.0},
    ])
    rows2 = _run(spark, src, cp, short_ttl)
    assert {r.key for r in rows2} == {"u1"}


# --------------------------------------- batch/stream differential

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.sessionize import (
    session_stats,
    sessionize,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    raw=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 7200)),
        min_size=1,
        max_size=25,
        unique=True,
    )
)
def test_stream_sessions_match_batch_sessionize(rocksdb, tmp_path_factory, raw):
    """Differential: the SAME events sessionized by the batch
    lag/cumsum operator and by the streaming timer operator must
    yield identical (user, start, end, n_events) sessions once a
    far-future clock event flushes every open session through the
    watermark.  Both split on gap > gap_seconds (strict), so the
    boundary semantics must agree event-for-event."""
    import time as _time

    spark = rocksdb
    gap = 600
    base = 1_700_000_000  # fixed epoch so timestamps are stable
    events = sorted({(f"u{u}", base + off) for u, off in raw})

    # ---- batch reference
    bdf = spark.createDataFrame(
        [(u, t) for u, t in events], "user_id string, sec bigint"
    ).withColumn("ts", F.col("sec").cast("timestamp"))
    ref = {
        (r.user_id, int(r.session_start.timestamp()),
         int(r.session_end.timestamp()), r.n_events)
        for r in session_stats(
            sessionize(bdf, "user_id", "ts", gap_seconds=gap)
        ).collect()
    }

    # ---- streaming run: one availableNow pass + a clock that pushes
    # the watermark past every possible close instant
    tmp = tmp_path_factory.mktemp("sessdiff")
    src, cp = str(tmp / "src"), str(tmp / "cp")
    clock = max(t for _, t in events) + gap + 3600 + 120
    rows = [
        {"user_id": u,
         "ts": _time.strftime("%Y-%m-%d %H:%M:%S", _time.gmtime(t)),
         "value": 1.0}
        for u, t in events
    ] + [{"user_id": "zz_clock",
          "ts": _time.strftime("%Y-%m-%d %H:%M:%S", _time.gmtime(clock)),
          "value": 0.0}]
    _write(src, "a.json", rows)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        got_rows = _run(
            spark, src, cp,
            lambda s: timer_sessions_gst(
                s, gap_seconds=gap, watermark="30 minutes"
            ),
        )
    finally:
        spark.conf.unset("spark.sql.session.timeZone")
    got = {
        (r.user, r.session_start_ms // 1000, r.session_end_ms // 1000,
         r.n_events)
        for r in got_rows
        if r.user != "zz_clock"
    }
    assert got == ref


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    raw=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 7200)),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
def test_dedup_ttl_matches_python_reference(rocksdb, tmp_path_factory, raw):
    """Differential: event-time TTL dedup vs a pure-python reference
    of the same rule (first event admits; ts - first < ttl
    suppresses; ts - first >= ttl re-admits and restarts the window).
    Deterministic under replay is the operator's contract — the
    reference IS the replay."""
    import time as _time

    spark = rocksdb
    ttl_s = 900
    base = 1_700_000_000
    events = sorted({(f"u{u}", base + off) for u, off in raw})

    ref = set()
    first: dict[str, int] = {}
    for u, t in events:  # sorted by (user, ts): per-user ts order
        if u not in first or t - first[u] >= ttl_s:
            first[u] = t
            ref.add((u, t))

    tmp = tmp_path_factory.mktemp("ttldiff")
    src, cp = str(tmp / "src"), str(tmp / "cp")
    rows = [
        {"user_id": u,
         "ts": _time.strftime("%Y-%m-%d %H:%M:%S", _time.gmtime(t)),
         "value": 1.0}
        for u, t in events
    ]
    _write(src, "a.json", rows)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        got_rows = _run(
            spark, src, cp,
            lambda s: dedup_ttl_gst(s, "user_id", ttl_ms=ttl_s * 1000),
        )
    finally:
        spark.conf.unset("spark.sql.session.timeZone")
    got = {(r.key, r.first_ts_ms // 1000) for r in got_rows}
    assert got == ref
