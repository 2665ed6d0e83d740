"""Regression tests for queries/data.py's events loader.

The driver's synthetic ``events.parquet`` silently changed physical
ts type between rounds (TIMESTAMP(NANOS) -> timestamp[us]/NTZ), which
broke every events query.  These tests pin both formats so the next
upstream drift is a one-test diagnosis, not a dead round.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.data import load

# 2024-03-05T06:47:08.123456 UTC, as microseconds since epoch.
# minute=47 deliberately exercises the int32-overflow range of
# minute * 60_000_000 (overflows for minute >= 36 if not widened).
_US = 1709621228123456


def _write_events(path: str, ts_array: pa.Array) -> None:
    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7], pa.int64()),
            "event_type": pa.array(["click"], pa.string()),
            "value": pa.array([1.5], pa.float64()),
            "props": pa.array(['{"k":"v"}'], pa.string()),
        }
    )
    pq.write_table(tbl, path)


def _load_events_row(spark, tmp_path):
    df = load(spark, str(tmp_path), "events")
    assert df.schema["ts_us"].dataType.simpleString() == "bigint"
    return df.collect()[0]


def test_events_ts_timestamp_us(spark, tmp_path):
    """Current driver format: parquet timestamp[us] (reads as NTZ)."""
    dt = datetime.datetime(2024, 3, 5, 6, 47, 8, 123456)
    _write_events(
        os.path.join(tmp_path, "events.parquet"),
        pa.array([dt], pa.timestamp("us")),
    )
    row = _load_events_row(spark, tmp_path)
    assert row["ts_us"] == _US


def test_events_ts_nanos_as_long(spark, tmp_path):
    """Legacy driver format: parquet TIMESTAMP(NANOS) -> bigint nanos."""
    _write_events(
        os.path.join(tmp_path, "events.parquet"),
        pa.array([_US * 1000], pa.timestamp("ns")),
    )
    row = _load_events_row(spark, tmp_path)
    assert row["ts_us"] == _US


def test_events_ts_timestamp_ltz(spark, tmp_path):
    """UTC-adjusted timestamp[us] (reads as LTZ): unix_micros must be
    exact under a non-UTC session timezone — field extraction on LTZ
    would shift by the zone offset."""
    dt = datetime.datetime(
        2024, 3, 5, 6, 47, 8, 123456, tzinfo=datetime.timezone.utc
    )
    _write_events(
        os.path.join(tmp_path, "events.parquet"),
        pa.array([dt], pa.timestamp("us", tz="UTC")),
    )
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        row = _load_events_row(spark, tmp_path)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    assert row["ts_us"] == _US


def test_events_ts_unsupported_dtype_raises(spark, tmp_path):
    _write_events(
        os.path.join(tmp_path, "events.parquet"),
        pa.array(["not-a-ts"], pa.string()),
    )
    with pytest.raises(TypeError, match="events.ts"):
        load(spark, str(tmp_path), "events")


def test_layout_repartition_lever(spark, monkeypatch):
    """The layout-invariance sweep's lever: with the env var set,
    every loaded table is round-robin repartitioned to that count
    (destroying file-order layout); unset, the scan layout is
    untouched (no exchange on the hot path)."""
    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_LAYOUT_REPARTITION", "5")
    assert load(spark, sf, "region").rdd.getNumPartitions() == 5
    assert load(spark, sf, "events").rdd.getNumPartitions() == 5
    monkeypatch.delenv("SPARK_GRAFT_LAYOUT_REPARTITION")
    plan = load(spark, sf, "region")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_spread_scan_gates_on_observed_parallelism(spark):
    """r13 (r12-VERDICT item 8): spread_scan exists for the
    single-row-group bench tables (one scan task); an input that
    already resolves to >= defaultParallelism partitions must pass
    through UNTOUCHED — at 100 TB a many-file table scans wide and
    the extra full-data round-robin exchange is pure cost."""
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.data import (
        spread_scan,
    )

    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(100).coalesce(1)
    wide = spark.range(1000).repartition(par + 2)

    spread = spread_scan(narrow)
    assert spread.rdd.getNumPartitions() == par
    assert "Repartition" in spread._jdf.queryExecution().logical().toString()

    passthrough = spread_scan(wide)
    assert passthrough is wide  # identity: no exchange added
