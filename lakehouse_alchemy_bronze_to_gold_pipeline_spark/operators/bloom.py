"""Bloom-filter semi-join reduction (runtime filter).

The classic 100 TB join optimization: build a compact bit-array
membership sketch of the SMALL side's join keys, broadcast it, and
prune the BIG side *before* its shuffle — a probe row whose key
cannot be in the build side never pays exchange or join cost.  Spark
itself does this opaquely when `spark.sql.optimizer.runtimeFilter
.bloomFilter.enabled` kicks in; this operator is the explicit,
deterministic, engine-portable form (the knob can't be steered per
join, and its internal hash is not reproducible cross-engine).

Determinism: bit positions come from md5 — ``h_i(x) = md5(i ':' x)``
top 52 bits mod m — the repo's standard cross-engine hash idiom, so
a DuckDB oracle replays build + probe value-for-value (no such
oracle is possible over xxhash64 or Spark's internal bloom).  Words
are 32-bit (packed in BIGINT cells): DuckDB raises on ``1::BIGINT <<
63``, so 64-bit packing is not portable.

Scale contract: the filter itself is O(m) bits INDEPENDENT of build
cardinality (size m to ~10-14 bits/key for ~1% false positives);
the driver transfer is the ``m/32``-long word list (bounded, like
ivf/kmeans centroids) and the probe is one narrow scan — no shuffle,
no join.  False positives only cost a wasted probe row downstream;
false negatives are impossible (property-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_prune"]


def _positions_sql(key_sql: str, i: int, m_bits: int) -> str:
    """SQL text for hash position i of a key expression (md5-based,
    value-identical in DuckDB — see module docstring)."""
    return (
        f"CAST(conv(substring(md5(concat('{i}', ':', "
        f"CAST({key_sql} AS STRING))), 1, 13), 16, 10) AS BIGINT)"
        f" % {m_bits}"
    )


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 1 << 13, k: int = 5
) -> list[int]:
    """Build the filter: returns the dense ``m_bits/32`` word list.

    One narrow pass + one groupBy over at most ``m/32`` distinct
    words (bounded cells, like a count-min sketch) + a bounded
    driver collect — the build side is typically the dimension /
    filtered side of the join, but even a huge build side only ever
    produces ``m/32`` aggregate rows.
    """
    if m_bits % 32:
        raise ValueError("m_bits must be a multiple of 32")
    # NULL keys hash to NULL positions -> a word=NULL aggregate row
    # that would TypeError into the dense list; NULL never equals
    # anything in an equi-join, so dropping it here is semantics-
    # preserving (bloom_prune likewise passes no NULL-key probes:
    # its conjunction over NULL positions is NULL, i.e. filtered)
    df = df.filter(F.col(key_col).isNotNull())
    pos = F.explode(
        F.array(
            *[
                F.expr(_positions_sql(key_col, i, m_bits))
                for i in range(k)
            ]
        )
    ).alias("p")
    words = (
        df.select(pos)
        .select(
            F.expr("p DIV 32").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))"
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    dense = [0] * (m_bits // 32)
    for r in words:
        dense[r["word"]] = r["bits"]
    return dense


def bloom_prune(
    df: DataFrame,
    key_col: str,
    words: list[int],
    m_bits: int,
    k: int = 5,
) -> DataFrame:
    """Filter ``df`` to rows whose key *may* be in the build set."""
    probed = df.withColumn(
        "__bloomw", F.array(*[F.lit(w) for w in words])
    )
    cond = F.lit(True)
    for i in range(k):
        p = _positions_sql(key_col, i, m_bits)
        cond = cond & (
            F.expr(
                f"element_at(__bloomw, CAST(({p}) DIV 32 AS INT) + 1)"
                f" & shiftleft(CAST(1 AS BIGINT), "
                f"CAST(({p}) % 32 AS INT))"
            )
            != 0
        )
    return probed.filter(cond).drop("__bloomw")
