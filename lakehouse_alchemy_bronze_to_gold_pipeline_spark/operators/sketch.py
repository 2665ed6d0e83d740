"""Bounded-memory heavy hitters (Misra-Gries / SpaceSaving family) —
the sketch answer to "top terms over 100 TB" when even the per-group
term dimension no longer fits an executor (exact
``vocab_top_terms``-style groupBy still shuffles EVERY distinct term).

Two-level mergeable shape, the only one that scales:

1. per-partition summaries of <= ``capacity`` counters via an
   Arrow-batched ``mapInPandas`` (the one place Python is justified:
   Spark has no bounded-counter aggregate, and the batch-compress
   loop is dict arithmetic over value_counts, not per-row work);
2. ONE groupBy over the tiny summary relation (|partitions| x
   capacity rows) sums lower-bound counters; top-k by summed bound.

Guarantee (Misra-Gries, public literature): a partition summary's
counter underestimates that partition's true count by at most
(batch rows)/(capacity+1) total compression debt; summed over
partitions, any value with true global count > n/(capacity+1) SURVIVES
in the merged summary and ``est <= true <= est + n/(capacity+1)``.
``capacity`` trades memory for that error band — it is the ONLY
memory knob, independent of the number of distinct terms.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_compress(counters: dict, cap: int) -> None:
    """Keep <= cap counters by subtracting the (cap+1)-th largest
    count from all (classic batch Misra-Gries decrement)."""
    if len(counters) <= cap:
        return
    counts = sorted(counters.values(), reverse=True)
    d = counts[cap]
    for k in list(counters):
        c = counters[k] - d
        if c > 0:
            counters[k] = c
        else:
            del counters[k]


def heavy_hitters(
    df: DataFrame, col: str, k: int = 20, capacity: int = 256
) -> DataFrame:
    """(value, est) — top-``k`` values by merged Misra-Gries lower
    bound.  ``est`` never exceeds the true count; a value whose true
    count exceeds rows/(capacity+1) cannot be missed."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            _mg_compress(counters, capacity)
        if counters:
            yield pd.DataFrame(
                {"value": list(counters), "est": list(counters.values())}
            )

    summaries = df.select(col).mapInPandas(
        summarize, schema="value string, est long"
    )
    return (
        summaries.groupBy("value")
        .agg(F.sum("est").alias("est"))
        .orderBy(F.col("est").desc(), "value")
        .limit(k)
    )
