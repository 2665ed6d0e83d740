"""One-pass table profiling: per-column null/distinct/min/max.

The DQ engine's companion: before writing rules you need the shape of
the data.  All statistics for all columns are computed in ONE
aggregate pass (a single job over the table — at 100 TB you cannot
afford a pass per column), then unpivoted to one row per column with
``stack`` (plan-time expansion, no shuffle beyond the aggregate's).

``exact_distinct=False`` (default) uses HLL ``approx_count_distinct``
— mergeable sketch state, O(1) per column; exact mode is provided for
oracle-verifiable results on small data.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact_distinct: bool = False,
    casts: Mapping[str, str] | None = None,
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) —
    min/max stringified so heterogeneous column types stack into one
    relation.

    ``casts`` maps column name -> SQL type applied to min/max BEFORE
    the string cast.  Floating-point columns should be pinned to a
    decimal type here (e.g. ``{"price": "decimal(18,2)"}``) so the
    textual min/max is engine-canonical — raw double-to-string
    formatting differs across engines.
    """
    cols = list(cols or df.columns)
    casts = dict(casts or {})
    distinct = F.countDistinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        # the cast shapes only the textual min/max; null and distinct
        # counts always run on the raw column
        mcol = col.cast(casts[c]) if c in casts else col
        aggs += [
            # SUM over zero rows is NULL, not 0: coalesce keeps the
            # neutral element on empty input
            F.coalesce(F.sum(col.isNull().cast("bigint")), F.lit(0)).alias(
                f"__nulls_{c}"
            ),
            distinct(col).alias(f"__dist_{c}"),
            F.min(mcol).cast("string").alias(f"__min_{c}"),
            F.max(mcol).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)

    stack_args = []
    for c in cols:
        stack_args += [
            f"'{c}'", f"`__nulls_{c}`", f"`__dist_{c}`",
            f"`__min_{c}`", f"`__max_{c}`",
        ]
    stacked = one.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) AS "
            "(column, n_nulls, n_distinct, min_value, max_value)"
        ),
    )
    return stacked.select(
        "column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
    )
