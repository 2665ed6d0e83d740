"""Alternating least squares matrix factorization (collaborative
filtering) — the classic recommendation/embedding operator over an
interaction matrix (Koren, Bell & Volinsky, "Matrix Factorization
Techniques for Recommender Systems", IEEE Computer 2009; Zhou et
al., "Large-Scale Parallel Collaborative Filtering for the Netflix
Prize", AAIM 2008).  Engine extension: the reference pipeline stores
sales interactions but never factorizes them.

Two paths, same contract as the kmeans/IVF family:

* :func:`als_train` — the production float path, rank k.  Each half
  step joins the ratings relation with the OTHER side's current
  factors and solves one k x k ridge system per entity in a grouped
  Arrow batch (``applyInPandas``).  Deterministic by construction:
  groups are sorted by partner id before accumulation, so the normal
  equations are built in a fixed order regardless of partitioning —
  the layout-invariance contract the rest of the engine holds.
* :func:`rank1_half_step_int` — the EXACT fixed-point rank-1 half
  step (scale ``S``, all-positive lattice), the SQL-expressible unit
  the oracle-backed certification query unrolls (queries/recsys.py).

Scale (the Netflix-paper layout): ratings stay partitioned by the
grouping side's key; the partner factor table is |entities| x k
doubles — broadcast-sized for dims, shuffle-joined otherwise; each
iteration is two shuffles (join + groupBy), independent of k.  Per
group the solve is O(n_i k^2 + k^3) with n_i the entity's degree —
never materializing the dense matrix.  The loss readout is one
narrow pass reduced to a scalar.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["init_factors", "als_train", "rank1_half_step_int"]

#: fixed-point scale for the integer rank-1 path (see
#: queries/recsys.py for the overflow budget at each SF)
S = 100


def init_factors(df: DataFrame, key: str, k: int, tag: str) -> DataFrame:
    """Deterministic factor init in (0, 1]^k: component j of key x is
    md5('tag:j:x') scaled — no RNG state (the repo's standard idiom),
    so re-runs, retries and re-shards start identically."""
    comps = [
        (
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(f"{tag}:{j}:"),
                                F.col(key).cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                + 1
            )
            / F.lit(4294967296.0)
        ).cast("double")
        for j in range(k)
    ]
    return df.select(key).distinct().select(
        F.col(key), F.array(*comps).alias("f")
    )


def _solve_side(
    ratings: DataFrame,
    own_key: str,
    partner_key: str,
    partner_factors: DataFrame,
    k: int,
    lam: float,
) -> DataFrame:
    """One ALS half step: re-fit every `own_key` entity's factor
    against the partner side's CURRENT factors.

    Ridge follows the Netflix-paper weighted-lambda convention
    (lambda scaled by the entity's degree), which keeps regularization
    strength independent of popularity."""
    joined = ratings.join(
        partner_factors.withColumnRenamed("f", "pf"), partner_key
    ).select(own_key, partner_key, "r", "pf")

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        # fixed accumulation order regardless of physical layout
        pdf = pdf.sort_values(partner_key)
        V = np.vstack(pdf["pf"].to_numpy())
        r = pdf["r"].to_numpy(dtype=np.float64)
        A = V.T @ V + lam * len(pdf) * np.eye(k)
        f = np.linalg.solve(A, V.T @ r)
        return pd.DataFrame(
            {own_key: [pdf[own_key].iloc[0]], "f": [f.tolist()]}
        )

    return joined.groupBy(own_key).applyInPandas(
        fit, schema=f"{own_key} bigint, f array<double>"
    )


def _loss(
    ratings: DataFrame, uf: DataFrame, vf: DataFrame, ukey: str, vkey: str
) -> float:
    """Sum of squared residuals over observed cells — one narrow pass
    to a scalar (JVM-side dot product, no Python)."""
    dot = F.aggregate(
        F.zip_with("uf", "vf", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        ratings.join(uf.withColumnRenamed("f", "uf"), ukey)
        .join(vf.withColumnRenamed("f", "vf"), vkey)
        .select(F.pow(F.col("r") - dot, 2).alias("sq"))
        .agg(F.sum("sq"))
        .collect()[0][0]
    )


def als_train(
    ratings: DataFrame,
    ukey: str,
    vkey: str,
    k: int = 8,
    iters: int = 3,
    lam: float = 0.1,
) -> tuple[DataFrame, DataFrame, list[float]]:
    """Run `iters` full ALS iterations over ``ratings(ukey, vkey,
    r)``; returns (user_factors, item_factors, per-iteration loss).

    The loss list is the certification hook: ridge ALS is a block
    coordinate descent on a convex-per-block objective, so the
    PENALIZED loss is non-increasing; the raw losses returned here
    decrease monotonically in practice and are pinned by
    tests/test_als.py.  Each factor table is localCheckpointed per
    iteration — the lineage cut every iterative operator in this
    repo applies (pagerank/kmeans precedent)."""
    if lam <= 0:
        # lam > 0 keeps A = V^T V + lam*n*I positive definite for
        # every entity group; a rank-deficient group (all-equal
        # partner factors, degree < k) would make lam=0 singular and
        # np.linalg.solve raise mid-stage (r9 ADVICE).
        raise ValueError(f"als_train requires lam > 0, got {lam}")
    ratings = ratings.persist()
    try:
        vf = init_factors(ratings, vkey, k, "als").localCheckpoint()
        uf = None
        losses: list[float] = []
        for _ in range(iters):
            uf = _solve_side(
                ratings, ukey, vkey, vf, k, lam
            ).localCheckpoint()
            vf = _solve_side(
                ratings, vkey, ukey, uf, k, lam
            ).localCheckpoint()
            losses.append(_loss(ratings, uf, vf, ukey, vkey))
        return uf, vf, losses
    finally:
        # the factor tables are localCheckpointed (materialized), so
        # the cached ratings blocks are not needed past return —
        # leaving them cached leaks executor memory for the session
        # (r9 ADVICE)
        ratings.unpersist()


def rank1_half_step_int(
    ratings: DataFrame,
    own_key: str,
    partner_key: str,
    partner: DataFrame,
    partner_col: str,
    out_col: str,
    lam_s2: int = S * S,
) -> DataFrame:
    """EXACT fixed-point rank-1 half step on the all-positive lattice:

        f_own = (S * sum(q * f_partner)) DIV (sum(f_partner^2) + lam*S^2)

    with every quantity a positive BIGINT (ratings q >= 1, factors
    >= 1), so integer division is identical floor/trunc in every
    engine and the result is independent of row order and partition
    layout — the certification-grade twin of :func:`als_train` that
    queries/recsys.py unrolls into a DuckDB oracle.

    The partner factor table is |entities| x 1 BIGINTs — broadcast
    it: the factor tables arrive as localCheckpointed RDDs whose
    size stats Catalyst cannot see, so without the hint every half
    step sort-merge-joins, shuffling AND sorting the data-scale
    ratings relation twice before the aggregate's own exchange
    (measured plan at sf0.1: 3 exchanges + 2 sorts -> 1 exchange).
    One shuffle per half step, on the SOLVING side's key, is the
    Netflix-paper layout.  At a tier where a factor side outgrows
    broadcast (~100M+ entities x 16 B), drop the hint and pre-
    partition both sides by the partner key instead — the operator's
    join/agg shape is unchanged."""
    return (
        ratings.join(F.broadcast(partner), partner_key)
        .groupBy(own_key)
        .agg(
            F.sum(F.col("q") * F.col(partner_col)).alias("d"),
            F.sum(F.col(partner_col) * F.col(partner_col)).alias("a"),
        )
        .select(
            own_key,
            F.expr(f"(CAST({S} AS BIGINT) * d) DIV (a + {int(lam_s2)})")
            .cast("bigint")
            .alias(out_col),
        )
    )
