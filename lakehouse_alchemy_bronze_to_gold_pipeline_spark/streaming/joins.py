"""Stream-stream joins (engine extension; the reference only does
stream-static — SURVEY 2.9).

A watermarked stream-stream inner join is THE attribution primitive
(click ⋈ impression within a delay bound).  Both sides buffer rows in
the state store; the time-range condition + watermarks let Spark
evict state once no future match is possible — without them state
grows forever, so this wrapper makes both mandatory.

State sizing at scale: per key, Spark keeps left rows for
``max_delay + watermark`` and right rows for ``watermark`` of event
time.  Hot keys multiply that — pre-filter or salt upstream if a
single key's window exceeds executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "10 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join right rows to left rows with the same ``key`` whose
    ``right_ts`` falls in [left_ts, left_ts + max_delay].

    Column names must be disjoint apart from ``key`` (rename before
    calling).  Both inputs must be streaming DataFrames."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    return l.join(r, cond, how).drop(F.col(f"r.{key}"))
