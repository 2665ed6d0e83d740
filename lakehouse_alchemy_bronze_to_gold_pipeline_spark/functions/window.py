"""Window-spec helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def const_bucket(col: Column | str) -> Column:
    """A constant-valued but NON-FOLDABLE partition bucket for
    deliberately-global windows over relations that are bounded by
    construction (digit domains, calendar-day grains, top-k cuts,
    k-bucket digests — every use site states its bound).

    ``hash(col) % 1`` is 0 for every row (``hash`` never returns
    null), so the window still evaluates in one partition over the
    whole relation — results identical to an empty partition spec —
    but the spec is non-empty, which (a) retires WindowExec's
    single-partition warning where the single partition is the point
    and the size is provably bounded (r10 verdict task 6), and
    (b) marks the global window as DELIBERATE at the call site:
    ``tools/window_partition_audit.py`` (pinned by
    ``tests/test_window_partition.py``) now flags any empty-spec
    window in a registry query as a scale defect.

    A foldable literal would not work: Catalyst folds constant
    partition keys out of the spec, and WindowExec sees an empty
    spec again by execution time (measured — the warning persists
    under ``partitionBy(lit(0))``).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.hash(c) % F.lit(1)
