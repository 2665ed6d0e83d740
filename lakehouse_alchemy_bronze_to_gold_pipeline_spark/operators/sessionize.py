"""Gap-based sessionization (engine extension; SURVEY 2.5 notes the
reference has no window functions — this is the canonical windowed
operator a lakehouse events table needs).

Classic two-window formulation, all JVM-side:

1. ``lag(ts)`` per user -> boundary flag when the gap exceeds
   ``gap_seconds`` (or first event);
2. running ``sum`` of boundary flags -> session ordinal per user.

Scale: both windows share ONE hash partitioning on ``user_col`` —
Catalyst reuses the exchange, so the whole operator costs a single
shuffle.  State is bounded by partition (no driver collection).  For
*streaming* sessionization use ``F.session_window`` in
``streaming.windows`` instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = None,
    seconds_col: str | None = None,
) -> DataFrame:
    """Assign ``session_id`` (per-user ordinal, from 1) to each row.

    ``order_tiebreak``: unique column to make ordering total when two
    events share a timestamp (always pass one for reproducibility).
    ``seconds_col``: optional integer-seconds column used for gap
    arithmetic when ``ts_col`` is not a TimestampType (e.g. bigint
    microseconds); ordering still follows ``ts_col``.
    """
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    sec = F.col(seconds_col) if seconds_col else F.col(ts_col).cast("long")
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap = sec - F.lag(sec).over(w)
    boundary = F.when(prev_ts.isNull() | (gap > gap_seconds), 1).otherwise(0)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("__boundary", boundary).withColumn(
        "session_id", F.sum("__boundary").over(running).cast("bigint")
    ).drop("__boundary")


def session_stats(
    df: DataFrame, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Aggregate sessionized rows to one row per session."""
    return df.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )
