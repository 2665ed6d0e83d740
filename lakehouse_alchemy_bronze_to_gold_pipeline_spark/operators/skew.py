"""Skew-mitigation utilities: salted join and two-phase distinct.

AQE's skew-join handling splits oversized SHUFFLE partitions, which
covers sort-merge joins; these helpers cover the cases AQE cannot:

- ``salted_join``: replicate the small side ``n_salts`` times and
  scatter the big side's hot keys across salts deterministically.
  Use when one join key dominates (power-law user ids) and the small
  side is too big to broadcast outright but fine to replicate n x.
- ``two_phase_distinct``: COUNT(DISTINCT x) per key as an explicit
  two-shuffle pipeline — the first shuffle is on (key, x) so a hot
  key's values spread over the whole cluster instead of one reducer;
  the second aggregates small per-key partial counts.  (Catalyst
  expands distinct aggregates similarly; the explicit form composes
  with extra aggregates and makes the shuffle shape visible/tunable.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side salted.

    The big side's salt derives from a hash of the whole row (its
    columns concatenated) so replicated hot-key rows spread evenly
    and deterministically; each small-side row is exploded to every
    salt value.  Shuffle keys become (key, salt): a key that used to
    land on one reducer now lands on ``n_salts``.

    Join modes that preserve the BIG side's grain (inner, left outer,
    left semi/anti) are exact: each big row carries one salt, so it
    meets exactly one replica of each matching small row.  Right/full
    outer are rejected — an unmatched small-side row has ``n_salts``
    replicas and every one would surface as a NULL-extended output
    row (n_salts x duplication)."""
    allowed = {"inner", "left", "leftouter", "left_outer",
               "semi", "left_semi", "leftsemi", "anti", "left_anti",
               "leftanti", "cross"}
    if how.lower().replace("_", "") not in {
        a.replace("_", "") for a in allowed
    }:
        raise ValueError(
            f"salted_join supports big-side-grain joins only "
            f"(inner/left/semi/anti), got how={how!r}: right/full outer "
            "would emit each unmatched small row n_salts times"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("__salt", salt.cast("int"))
    s = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    return b.join(s, [key, "__salt"], how).drop("__salt")


def two_phase_distinct(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
) -> DataFrame:
    """count(distinct value_col) per keys as dedup-then-count."""
    return (
        df.select(*keys, value_col)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(f"n_distinct_{value_col}"))
    )
