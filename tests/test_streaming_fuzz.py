"""Streaming differential fuzz: random event streams (keys x
timestamps x late-arrival offsets) split across TWO checkpointed
availableNow runs, asserting each stateful operator equals its batch
replay — sessionize, event-time-TTL dedup, and the tumbling rollup.

The late dimension is the part hand-written two-run tests sample
thinly: run 1 persists a watermark; run 2 delivers a mix of
clearly-late events (below wm1 by more than a window — the stream
MUST drop them) and fresh events (above every run-1 timestamp — the
stream MUST fold them into still-open state).  The batch replay is
the same operator/reference over (run1 UNION fresh run2): any
divergence is a real watermark/state bug, never a boundary ambiguity
(the clear-late/clear-fresh construction keeps every event away from
the <= vs < edges, which hand tests pin separately).
"""

from __future__ import annotations

import json
import os
import time

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.sessionize import (
    session_stats,
    sessionize,
)
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.streaming.stateful import (
    dedup_ttl_gst,
    rocksdb_conf,
    timer_sessions_gst,
)
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.streaming.windows import (
    tumbling_agg,
)

SCHEMA = "user_id string, ts timestamp, value double"

BASE = 1_700_000_000  # fixed epoch so timestamps are stable
GAP = 600             # session gap (s)
TTL = 900             # dedup TTL (s)
WIN = 3600            # tumbling window (s)
DELAY = 1800          # watermark delay (s) — "30 minutes"
SLACK = 61            # keeps every event off boundary instants

SETTINGS = dict(
    max_examples=7,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: run-1 events: (user 0-3, offset s) ; run-2 events add a LATE flag
RAW1 = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 7200)),
    min_size=1, max_size=12, unique=True,
)
RAW2 = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 3600), st.booleans()),
    max_size=10, unique=True,
)


@pytest.fixture()
def rocksdb(spark):
    old = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    rocksdb_conf(spark)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    yield spark
    spark.conf.unset("spark.sql.session.timeZone")
    if old is None:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    else:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", old
        )


def _materialize(raw1, raw2):
    """Resolve the hypothesis sample into absolute-epoch event lists:
    b1 events, b2 events (fresh strictly above max(b1); late strictly
    below wm1 - WIN - SLACK), and the fresh subset the batch replay
    keeps."""
    b1 = sorted({(f"u{u}", BASE + off) for u, off in raw1})
    max1 = max(t for _, t in b1)
    wm1 = max1 - DELAY
    b2, fresh = [], []
    for u, off, late in raw2:
        if late:
            t = wm1 - WIN - SLACK - off
        else:
            t = max1 + SLACK + off
            fresh.append((f"u{u}", t))
        b2.append((f"u{u}", t))
    b2 = sorted(set(b2))
    fresh = sorted(set(fresh))
    return b1, b2, fresh


def _write(dirpath, name, events, clock=None):
    os.makedirs(dirpath, exist_ok=True)
    rows = [
        {"user_id": u,
         "ts": time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime(t)),
         "value": 1.0}
        for u, t in events
    ]
    if clock is not None:
        rows.append(
            {"user_id": "zz_clock",
             "ts": time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime(clock)),
             "value": 0.0}
        )
    with open(os.path.join(dirpath, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, src, cp, op):
    rows = []
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = (
        op(stream)
        .writeStream.foreachBatch(lambda df, _id: rows.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rows


def _batch_df(spark, events):
    return spark.createDataFrame(
        [(u, t, 1.0) for u, t in events],
        "user_id string, sec bigint, value double",
    ).select(
        "user_id", F.col("sec").cast("timestamp").alias("ts"), "value"
    )


@settings(**SETTINGS)
@given(raw1=RAW1, raw2=RAW2)
def test_sessions_late_arrival_parity(rocksdb, tmp_path_factory, raw1, raw2):
    spark = rocksdb
    b1, b2, fresh = _materialize(raw1, raw2)
    tmp = tmp_path_factory.mktemp("sessfuzz")
    src, cp = str(tmp / "src"), str(tmp / "cp")
    clock = max(t for _, t in b1 + fresh) + GAP + DELAY + WIN + 120

    op = lambda s: timer_sessions_gst(  # noqa: E731
        s, gap_seconds=GAP, watermark="30 minutes"
    )
    _write(src, "b1.json", b1)
    rows = _run(spark, src, cp, op)
    _write(src, "b2.json", b2, clock=clock)
    rows += _run(spark, src, cp, op)

    got = sorted(
        (r.user, r.session_start_ms // 1000, r.session_end_ms // 1000,
         r.n_events)
        for r in rows if r.user != "zz_clock"
    )
    ref = sorted(
        (r.user_id, int(r.session_start.timestamp()),
         int(r.session_end.timestamp()), r.n_events)
        for r in session_stats(
            sessionize(_batch_df(spark, b1 + fresh), "user_id", "ts",
                       gap_seconds=GAP)
        ).collect()
    )
    assert got == ref


@settings(**SETTINGS)
@given(raw1=RAW1, raw2=RAW2)
def test_dedup_ttl_late_arrival_parity(rocksdb, tmp_path_factory, raw1, raw2):
    spark = rocksdb
    b1, b2, fresh = _materialize(raw1, raw2)
    tmp = tmp_path_factory.mktemp("ttlfuzz")
    src, cp = str(tmp / "src"), str(tmp / "cp")

    op = lambda s: dedup_ttl_gst(  # noqa: E731
        s, "user_id", ttl_ms=TTL * 1000, watermark="30 minutes"
    )
    _write(src, "b1.json", b1)
    rows = _run(spark, src, cp, op)
    _write(src, "b2.json", b2)
    rows += _run(spark, src, cp, op)

    # python reference over (b1 UNION fresh) in ts order — fresh
    # events are strictly later than every b1 event, so per-user
    # arrival order equals ts order and the rule replays exactly
    ref, first = set(), {}
    for u, t in sorted(set(b1) | set(fresh)):
        if u not in first or t - first[u] >= TTL:
            first[u] = t
            ref.add((u, t))
    got = {(r.key, r.first_ts_ms // 1000) for r in rows}
    assert got == ref
    assert len(rows) == len(ref)  # no duplicate emissions across runs


@settings(**SETTINGS)
@given(raw1=RAW1, raw2=RAW2)
def test_tumbling_late_arrival_parity(rocksdb, tmp_path_factory, raw1, raw2):
    spark = rocksdb
    b1, b2, fresh = _materialize(raw1, raw2)
    tmp = tmp_path_factory.mktemp("tumbfuzz")
    src, cp = str(tmp / "src"), str(tmp / "cp")
    clock = max(t for _, t in b1 + fresh) + DELAY + WIN + 120

    op = lambda s: tumbling_agg(  # noqa: E731
        s, "ts", "1 hour", "30 minutes", keys=("user_id",)
    )
    _write(src, "b1.json", b1)
    rows = _run(spark, src, cp, op)
    _write(src, "b2.json", b2, clock=clock)
    rows += _run(spark, src, cp, op)

    got = sorted(
        (int(r.window_start.timestamp()), r.user_id, r.n_events,
         r.sum_value)
        for r in rows if r.user_id != "zz_clock"
    )
    ref = sorted(
        (int(r.window_start.timestamp()), r.user_id, r.n_events,
         r.sum_value)
        for r in tumbling_agg(
            _batch_df(spark, b1 + fresh), "ts", "1 hour",
            "30 minutes", keys=("user_id",)
        ).collect()
    )
    assert got == ref  # sorted lists: duplicates would diverge too
