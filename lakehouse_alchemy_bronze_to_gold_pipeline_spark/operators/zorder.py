"""Z-order (Morton) clustering key — the multi-dimensional file
layout behind ``OPTIMIZE ... ZORDER BY`` (reference
gold_transformation.py:85,160), built from public Spark expressions.

Lexicographic ``repartitionByRange(a, b)`` clusters ONLY the leading
column: a predicate on ``b`` still touches every file.  Interleaving
the bit planes of per-column bucket indices gives every participating
column ~|bits|/k of the key's locality, so file-level min/max pruning
works on each dimension — the property that cuts a 100 TB scan with a
two-column predicate to the files owning that (a, b) rectangle.

Two bucketing strategies, same interleave:

- ``zorder_key`` — equi-WIDTH from a one-job global min/max: two
  narrow aggregates, no sort.  Heavily skewed columns concentrate in
  few buckets and weaken their dimension's pruning.
- ``zorder_key_equidepth`` — equi-DEPTH from one
  ``approx_percentile`` sketch aggregate (mergeable GK summaries —
  one pass at any scale): every bucket owns ~1/2^bits of the ROWS
  regardless of the value distribution, which is what Delta's own
  ZORDER does via range ids.  The per-row bucket lookup is a
  count-of-boundaries-below fold over a literal boundary array
  (2^bits comparisons/row) — negligible against the rewrite's IO.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(bucket_cols: list[Column], bits: int) -> Column:
    """Morton-interleave the low ``bits`` of each bucket index."""
    k = len(bucket_cols)
    key = F.lit(0).cast("bigint")
    for j, bucket in enumerate(bucket_cols):
        for i in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket, i).bitwiseAND(F.lit(1)),
                    i * k + j,
                )
            )
    return key


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 12
) -> tuple[DataFrame, str]:
    """Attach a Morton key column interleaving ``bits`` bucket bits
    per column; returns (df_with_key, key_col_name).

    One driver-collected min/max aggregate sizes the buckets; the key
    itself is a pure bigint expression (shift/and/or), fully
    codegen'd.  ``bits * len(cols)`` must stay < 63.
    """
    k = len(cols)
    if k * bits >= 63:
        raise ValueError(f"{k} cols x {bits} bits overflows a bigint key")
    stats = df.agg(
        *[F.min(c).alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).first()
    n_buckets = 1 << bits
    buckets = []
    for j, c in enumerate(cols):
        # empty relation / all-null column: no spread to cluster by —
        # a constant key degrades gracefully to a plain rewrite
        mn = float(stats[f"mn_{j}"]) if stats[f"mn_{j}"] is not None else 0.0
        mx = float(stats[f"mx_{j}"]) if stats[f"mx_{j}"] is not None else 0.0
        span = (mx - mn) or 1.0
        buckets.append(
            F.least(
                F.greatest(
                    F.floor(
                        (F.col(c).cast("double") - F.lit(mn))
                        / F.lit(span)
                        * n_buckets
                    ),
                    F.lit(0),
                ),
                F.lit(n_buckets - 1),
            ).cast("bigint")
        )
    name = "__zorder_key"
    return df.withColumn(name, _interleave(buckets, bits)), name


def zorder_key_equidepth(
    df: DataFrame, cols: list[str], bits: int = 8
) -> tuple[DataFrame, str]:
    """Equi-depth Morton key: bucket boundaries are the
    ``2^bits - 1`` approx-percentile cuts of each column, so every
    bucket holds ~equal ROW counts however skewed the values —
    skew-proof file sizing AND per-dimension pruning.

    One sketch aggregate (driver-collected boundary literals), then a
    pure expression: bucket(x) = #boundaries <= x via a fold over the
    literal array.  ``bits`` defaults lower than the equi-width key
    because lookup cost is linear in 2^bits.
    """
    k = len(cols)
    if k * bits >= 63:
        raise ValueError(f"{k} cols x {bits} bits overflows a bigint key")
    n_buckets = 1 << bits
    pcts = [i / n_buckets for i in range(1, n_buckets)]
    stats = df.agg(
        *[
            F.percentile_approx(
                F.col(c).cast("double"), F.lit(pcts), F.lit(10_000)
            ).alias(f"b_{i}")
            for i, c in enumerate(cols)
        ]
    ).first()
    buckets = []
    for j, c in enumerate(cols):
        bs = stats[f"b_{j}"]
        if bs is None:  # empty relation: constant key
            buckets.append(F.lit(0).cast("bigint"))
            continue
        bounds = F.lit([float(b) for b in bs])
        buckets.append(
            F.size(
                F.filter(bounds, lambda b: b <= F.col(c).cast("double"))
            ).cast("bigint")
        )
    name = "__zorder_key"
    return df.withColumn(name, _interleave(buckets, bits)), name
