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


# --------------------------------------------------------------- CMS


def cms_cells(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch build: (row, cell, cnt) — ``depth * width``
    cells TOTAL, independent of item cardinality.

    The complement to Misra-Gries above: MG answers "which values are
    heavy", CMS answers "how often does value X occur" for ANY probe
    with a one-sided error (never underestimates; overestimate
    bounded by e*n/width at e^-depth probability — Cormode &
    Muthukrishnan, public literature).  The build is one explode to
    ``depth`` hashed rows + ONE groupBy over the fixed cell grid —
    map-side combine collapses each partition to <= depth*width
    partial rows, so the exchange is bounded no matter the corpus.

    Hash rows use the repo's md5 idiom (``md5(r ':' item)`` top 52
    bits mod width) so a DuckDB oracle replays build + probe
    value-for-value — unlike xxhash64 or a library sketch.
    """
    r = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r")
    rows = df.select(F.col(item_col).alias("__item"), r)
    cell = F.expr(
        "CAST(conv(substring(md5(concat(CAST(r AS STRING), ':', "
        "CAST(__item AS STRING))), 1, 13), 16, 10) AS BIGINT)"
        f" % {width}"
    )
    return (
        rows.select("r", cell.alias("cell"))
        .groupBy("r", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    probes: DataFrame,
    cells: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point estimates for probe items: min over the ``depth`` hashed
    cells.  The cell grid is <= depth*width rows — broadcast to the
    probe side; the min collapses in one small groupBy."""
    r = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r")
    p = probes.select(F.col(item_col).alias("__item"), r)
    cell = F.expr(
        "CAST(conv(substring(md5(concat(CAST(r AS STRING), ':', "
        "CAST(__item AS STRING))), 1, 13), 16, 10) AS BIGINT)"
        f" % {width}"
    )
    joined = p.select("__item", "r", cell.alias("cell")).join(
        F.broadcast(cells), ["r", "cell"], "left"
    )
    return (
        joined.groupBy("__item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
        .select(F.col("__item").alias(item_col), "cms_est")
    )
