"""Exact deduplication operators (SURVEY A1, T3; SURVEY 4.3-L1).

The reference dedups with a bare ``dropDuplicates(primary_keys)`` on a
*streaming* DataFrame (``silver_transformation.py:84-91``): arbitrary
survivor row, unbounded state.  We provide:

- ``dedup_exact``      batch, arbitrary survivor (parity)
- ``dedup_keep_latest``batch, *deterministic* survivor via window
                       row_number (the formulation SURVEY 2.5 calls for)
- ``dedup_stream``     streaming, watermarked ->
                       ``dropDuplicatesWithinWatermark`` for bounded
                       state (the L1 fix), unbounded only on request

Scale notes: exact dedup is a hash shuffle on the key columns — at
100 TB the win is *map-side partial dedup*, which Spark already does
for ``dropDuplicates`` (partial aggregate before the exchange).  The
window variant sorts within key partitions only (no global sort).
For *near*-duplicate dedup at scale see ``minhash.py`` / ``simhash.py``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _present_keys(df: DataFrame, keys: Sequence[str]) -> list[str]:
    """The reference skips dedup keys absent from the flattened schema
    (``silver_transformation.py:84-91``, graceful-degradation D3)."""
    return [k for k in keys if k in df.columns]


def dedup_exact(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Batch ``dropDuplicates`` on whichever keys exist (parity A1)."""
    present = _present_keys(df, keys)
    if not present:
        return df
    return df.dropDuplicates(present)


def dedup_keep_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Deterministic dedup: keep the max-``order_by`` row per key.

    ``row_number() == 1`` over ``partitionBy(keys).orderBy(desc)`` —
    deterministic where the reference's survivor is arbitrary.
    ``tiebreak`` columns break exact order_by ties (always pass one for
    reproducible results, e.g. a unique id).
    """
    present = _present_keys(df, keys)
    if not present:
        return df
    ordering = [F.col(order_by).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(*present).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_stream(
    df: DataFrame,
    keys: Sequence[str],
    event_time_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming dedup with bounded state.

    With an event-time column: ``withWatermark`` +
    ``dropDuplicatesWithinWatermark`` — state for a key is dropped once
    the watermark passes, so state size is O(keys-per-watermark-window)
    instead of O(all keys ever) (fixes SURVEY 4.3-L1).

    Without one (parity mode): the reference's unbounded
    ``dropDuplicates`` — correct, but state grows forever; only for
    bounded backfills.
    """
    present = _present_keys(df, keys)
    if not present:
        return df
    if event_time_col is None:
        return df.dropDuplicates(present)
    return df.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        present
    )
