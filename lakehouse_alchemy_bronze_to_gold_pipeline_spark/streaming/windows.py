"""Event-time windowed streaming aggregations + custom stateful ops.

The reference has NO event-time handling (SURVEY 2.9: no watermark,
no windows — late data is accepted forever and state grows without
bound).  These are the engine extensions that make the medallion
pipeline correct and bounded under late data at scale:

- ``tumbling_agg`` / ``sliding_agg``: watermarked ``F.window``
  aggregations.  State per live window only; the watermark closes
  windows and drops later arrivals deterministically.
- ``session_agg``: ``F.session_window`` — gap-based session windows
  merged incrementally by the state store (the streaming counterpart
  of ``operators.sessionize``'s batch lag/cumsum formulation).
- ``running_totals``: ``applyInPandasWithState`` — arbitrary per-key
  state (here: a monotonically increasing per-key event count +
  value sum) for semantics no built-in stateful operator expresses.

Scale notes: streaming aggregation state is hash-partitioned by the
grouping key across executors; watermarks bound its size.  Skewed
keys skew the state store — pre-bucket hot keys upstream if a single
key's live windows exceed executor memory.
"""

from __future__ import annotations

from typing import Iterator, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def tumbling_agg(
    events: DataFrame,
    ts_col: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    keys: Sequence[str] = (),
) -> DataFrame:
    """Per-window (and optional key) count + value sum with bounded
    state.  Works on both batch and streaming DataFrames (same plan;
    batch just has no state)."""
    w = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        w.groupBy(F.window(ts_col, window), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(
    events: DataFrame,
    ts_col: str,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "30 minutes",
    keys: Sequence[str] = (),
) -> DataFrame:
    """Overlapping (hopping) windows: each event lands in
    window/slide windows — state multiplies accordingly, which is the
    cost knob to watch at scale."""
    w = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        w.groupBy(F.window(ts_col, window, slide), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys,
            "n_events",
        )
    )


def session_agg(
    events: DataFrame,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    keys: Sequence[str] = ("user_id",),
) -> DataFrame:
    """Gap-based session windows (merged by the state store as events
    arrive; a session closes when the watermark passes its end)."""
    w = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        w.groupBy(F.session_window(ts_col, gap), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *keys,
            "n_events",
        )
    )


#: output schema of running_totals
RUNNING_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_total", LongType()),
        StructField("batch_rows", LongType()),
    ]
)

#: state: one long counter per key
_STATE_SCHEMA = StructType([StructField("n", LongType())])


def running_totals(events: DataFrame, key_col: str) -> DataFrame:
    """Custom stateful operator: per-key lifetime event count carried
    in the state store across micro-batches (``applyInPandasWithState``
    — Arrow-batched, grouped state, no timeout).  The built-in
    aggregations cannot express 'emit the running total once per
    batch per key' in append-like fashion."""

    def update(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = sum(len(p) for p in pdfs)
        (n,) = state.get if state.exists else (0,)
        n += rows
        state.update((n,))
        yield pd.DataFrame(
            {"key": [key[0]], "n_total": [n], "batch_rows": [rows]}
        )

    return (
        events.select(F.col(key_col).cast("string").alias("key"))
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
