"""Banded range join — equi-join two relations on a bounded time
band (engine extension; Spark has no native band-join operator, and
the naive theta-join plan is a broadcast nested loop that reads the
whole right side per left row).

``band_join(l, r, ...)`` pairs each left row with right rows whose
timestamp falls in ``(left_ts + lower, left_ts + upper]``.

Implementation (the classic bucketed interval join):

1. choose bucket width ``w = upper - lower``;
2. right rows land in bucket ``floor(ts / w)`` (one row each);
3. each left row can only match right rows in the two buckets
   ``floor((ts + lower) / w)`` and ``floor((ts + upper) / w)`` —
   explode left to those (<= 2 distinct) bucket ids;
4. hash equi-join on (keys..., bucket) — a normal shuffle join that
   AQE can re-plan and skew-split — then apply the exact band
   predicate as a post-filter.

Cost: one shuffle per side on (keys, bucket); left is duplicated at
most 2x.  Scales with the number of *matching* pairs, not |L| x |R|
— the property a nested-loop plan loses at 100 TB.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
    keys: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Rows (left.*, right.*) where right_ts - left_ts in (lower, upper]
    and all ``keys`` match (keys must exist on both sides with the
    same names).  Timestamps are integers (e.g. epoch micros).

    INNER only: the exact band predicate is applied as a post-join
    filter, so outer modes would first emit NULL-extended rows for
    unmatched left rows (then drop them — silently inner) and would
    duplicate survivors across the 2x bucket explode.  Outer band
    semantics need the predicate folded into the join condition plus
    explode-dedup; raise rather than return wrong rows."""
    if how != "inner":
        raise ValueError(
            f"band_join implements inner semantics only, got how={how!r}; "
            "wrap the result in a left join against the original left "
            "relation if outer behavior is needed"
        )
    if upper <= lower:
        raise ValueError("band upper bound must exceed lower bound")
    w = upper - lower

    lo_bucket = F.floor((F.col(left_ts) + lower) / w)
    hi_bucket = F.floor((F.col(left_ts) + upper) / w)
    l = left.withColumn(
        "__band_bucket",
        F.explode(F.array_distinct(F.array(lo_bucket, hi_bucket))),
    )
    r = right.withColumn("__band_bucket", F.floor(F.col(right_ts) / w))

    on = [*keys, "__band_bucket"]
    delta = F.col(right_ts) - F.col(left_ts)
    return (
        l.join(r, on, how)
        .filter((delta > lower) & (delta <= upper))
        .drop("__band_bucket")
    )
