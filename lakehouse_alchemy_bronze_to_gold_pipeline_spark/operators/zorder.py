"""Z-order (Morton) clustering key — the multi-dimensional file
layout behind ``OPTIMIZE ... ZORDER BY`` (reference
gold_transformation.py:85,160), built from public Spark expressions.

Lexicographic ``repartitionByRange(a, b)`` clusters ONLY the leading
column: a predicate on ``b`` still touches every file.  Interleaving
the bit planes of per-column bucket indices gives every participating
column ~|bits|/k of the key's locality, so file-level min/max pruning
works on each dimension — the property that cuts a 100 TB scan with a
two-column predicate to the files owning that (a, b) rectangle.

Bucketing here is equi-WIDTH from a one-job global min/max: two
narrow aggregates, no sort.  Heavily skewed columns concentrate in
few buckets and weaken their dimension's pruning; the upgrade path is
equi-depth bucket boundaries from ``approx_percentile`` (same
interleave, one extra sketch aggregate) — Delta's own ZORDER uses
range ids, i.e. equi-depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    key = F.lit(0).cast("bigint")
    for j, c in enumerate(cols):
        # empty relation / all-null column: no spread to cluster by —
        # a constant key degrades gracefully to a plain rewrite
        mn = float(stats[f"mn_{j}"]) if stats[f"mn_{j}"] is not None else 0.0
        mx = float(stats[f"mx_{j}"]) if stats[f"mx_{j}"] is not None else 0.0
        span = (mx - mn) or 1.0
        bucket = F.least(
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
        for i in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket, i).bitwiseAND(F.lit(1)),
                    i * k + j,
                )
            )
    name = "__zorder_key"
    return df.withColumn(name, key), name
