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

__all__ = [
    "init_factors",
    "als_train",
    "rank1_half_step_int",
    "rank2_half_step_int",
]

#: fixed-point scale for the integer rank-1 path (see
#: queries/recsys.py for the overflow budget at each SF)
S = 100

#: Broadcast ceiling for a factor table, in rows (~16 B/row rank-1:
#: one key + one factor).  Below it the half step broadcasts the
#: partner factors (one shuffle per half step, the Netflix-paper
#: layout); at or above it the hint is DROPPED and the join degrades
#: to the pre-partitioned shuffle join the docstring prescribes
#: instead of erroring with a broadcast/driver OOM (r10 ADVICE: the
#: documented ~100M-entity tier is now a runtime guard, not prose).
BROADCAST_FACTOR_ROWS_MAX = 100_000_000

#: Max iterations fused into ONE loss-ledger aggregate job (r12
#: ADVICE): each fused iteration chains two gated factor broadcasts
#: into the same plan, so total simultaneous broadcast memory scales
#: with the chunk length, not the full training run.  8 iterations =
#: at most 16 live broadcasts per job — comfortably bounded — while
#: every current caller (iters <= 3) still runs a single fused job.
_FUSED_LOSS_CHUNK_ITERS = 8


def _maybe_broadcast(factors: DataFrame, rows: int | None) -> DataFrame:
    """Apply the broadcast hint only when the factor table is known
    (or assumed by the caller) to sit under the row ceiling; callers
    pass the count of a localCheckpointed factor table (a cheap count
    of an |entities|-row materialized RDD, taken once per side, never
    per iteration)."""
    if rows is not None and rows >= BROADCAST_FACTOR_ROWS_MAX:
        return factors
    return F.broadcast(factors)


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
    partner_rows: int | None = None,
) -> DataFrame:
    """One ALS half step: re-fit every `own_key` entity's factor
    against the partner side's CURRENT factors.

    Ridge follows the Netflix-paper weighted-lambda convention
    (lambda scaled by the entity's degree), which keeps regularization
    strength independent of popularity.

    Execution shape (r12): ONE relational groupBy packs each entity's
    observations into a ``sort_array``-ordered struct list (sorted by
    the unique-in-group partner key — the fixed accumulation order
    that makes the float solve layout-invariant), then ONE Arrow
    batch evaluates every entity's k x k ridge solve in a vectorized
    pandas UDF.  The previous ``applyInPandas``-per-entity form paid
    ~3 ms of per-group pandas dispatch (measured: a 2,000-entity half
    step cost 5+ s, dispatch-bound); batching the solves drops that
    to one UDF invocation per Arrow batch while computing the SAME
    np.linalg.solve over the SAME sorted normal equations —
    bit-identical factors (pinned by
    tests/test_als.py::test_float_half_step_replicates_numpy_exactly).

    ``partner_rows`` (when the caller knows it — ``als_train`` counts
    each side once) gates a broadcast hint on the partner factor
    table: localCheckpointed factors expose no stats, so without the
    hint every half step sort-merge-joins, shuffling AND sorting the
    data-scale ratings twice before the groupBy's own exchange (the
    same plan defect the fixed-point path fixed in r10); with it each
    half step is ONE exchange on the solving side's key — the
    Netflix-paper layout.  Past ``BROADCAST_FACTOR_ROWS_MAX`` the
    hint is dropped and the join degrades to the shuffle join."""
    pf = partner_factors.withColumnRenamed("f", "pf")
    if partner_rows is not None:
        pf = _maybe_broadcast(pf, partner_rows)
    joined = ratings.join(pf, partner_key).select(
        own_key, partner_key, "r", "pf"
    )
    packed = joined.groupBy(own_key).agg(
        F.sort_array(
            F.collect_list(F.struct(partner_key, "r", "pf"))
        ).alias("obs")
    )

    @F.pandas_udf("array<double>")
    def solve(obs: pd.Series) -> pd.Series:
        eye = lam * np.eye(k)
        out = []
        for o in obs:
            V = np.vstack([row["pf"] for row in o])
            r = np.fromiter(
                (row["r"] for row in o), dtype=np.float64, count=len(o)
            )
            A = V.T @ V + len(o) * eye
            out.append(np.linalg.solve(A, V.T @ r))
        return pd.Series(out)

    return packed.select(own_key, solve("obs").alias("f"))


def _losses_fused(
    ratings: DataFrame,
    hist: list[tuple[DataFrame, DataFrame]],
    ukey: str,
    vkey: str,
    u_rows: int | None = None,
    v_rows: int | None = None,
) -> list[float]:
    """EVERY iteration's sum of squared residuals in ONE narrow pass
    over the ratings (r12; the ``q_als_rank1_fixed`` fused-ledger
    layout): each iteration's factor tables chain-(gated-)broadcast
    onto the same scan and all residual sums reduce in a single
    aggregate — one job and one ratings scan where the per-iteration
    form paid one of each per iteration.  Per-row arithmetic is
    unchanged (JVM-side dot product, no Python); only the reduction's
    combine order can move, which is the documented last-ulp loss
    jitter (tests/test_als.py: losses compare at 1e-9 relative, and
    the readout rounding margins sit >= 5 orders above it).

    The chain is CHUNKED at ``_FUSED_LOSS_CHUNK_ITERS`` iterations per
    aggregate job (r12 ADVICE): one fused plan holds 2 x iters factor
    broadcasts simultaneously, so an unbounded chain's broadcast
    memory scales with training length where the old per-iteration
    loss held at most two at a time.  Each iteration's residual sum
    is its own column either way, so chunking moves no arithmetic."""
    if not hist:
        # als_train(iters=0): agg() with zero expressions raises in
        # PySpark; the per-iteration form returned [] here (r12 ADVICE)
        return []
    losses: list[float] = []
    for lo in range(0, len(hist), _FUSED_LOSS_CHUNK_ITERS):
        chunk = hist[lo:lo + _FUSED_LOSS_CHUNK_ITERS]
        joined = ratings
        for it, (uf, vf) in enumerate(chunk, start=1):
            ut = uf.withColumnRenamed("f", f"uf{it}")
            vt = vf.withColumnRenamed("f", f"vf{it}")
            if u_rows is not None:
                ut = _maybe_broadcast(ut, u_rows)
            if v_rows is not None:
                vt = _maybe_broadcast(vt, v_rows)
            joined = joined.join(ut, ukey).join(vt, vkey)
        sq = [
            F.pow(
                F.col("r")
                - F.aggregate(
                    F.zip_with(f"uf{it}", f"vf{it}", lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                2,
            )
            for it in range(1, len(chunk) + 1)
        ]
        row = joined.agg(
            *[
                F.sum(sq[it - 1]).alias(f"loss{it}")
                for it in range(1, len(chunk) + 1)
            ]
        ).collect()[0]
        losses.extend(row[f"loss{it}"] for it in range(1, len(chunk) + 1))
    return losses


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
        # entity counts, once per side: the broadcast gate for every
        # half step and loss pass (the key sets never change)
        n_v = vf.count()
        n_u: int | None = None
        uf = None
        hist: list[tuple[DataFrame, DataFrame]] = []
        for _ in range(iters):
            uf = _solve_side(
                ratings, ukey, vkey, vf, k, lam, partner_rows=n_v
            ).localCheckpoint()
            if n_u is None:
                n_u = uf.count()
            vf = _solve_side(
                ratings, vkey, ukey, uf, k, lam, partner_rows=n_u
            ).localCheckpoint()
            hist.append((uf, vf))
        # every factor table is checkpointed, so the deferred fused
        # loss pass reads materialized |entities|-row relations — one
        # ratings scan for the whole ledger instead of one per
        # iteration (r12; see _losses_fused)
        losses = _losses_fused(
            ratings, hist, ukey, vkey, u_rows=n_u, v_rows=n_v
        )
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
    partner_rows: int | None = None,
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
    broadcast (``partner_rows >= BROADCAST_FACTOR_ROWS_MAX``, ~100M
    entities x 16 B), the hint is dropped at runtime and the join
    degrades to the pre-partitioned shuffle join — same join/agg
    shape, no driver OOM (r10 ADVICE)."""
    # lam_s2 > 0 keeps the denominator strictly positive even for a
    # degenerate entity (r11 ADVICE, symmetric with the rank-2 step):
    # with lam_s2 = 0 a zero accumulator would make the engines
    # diverge silently — Spark non-ANSI x DIV 0 yields NULL while
    # DuckDB errors.  Misuse must fail loudly at construction.
    if int(lam_s2) <= 0:
        raise ValueError(
            f"rank1_half_step_int requires lam_s2 > 0, got {lam_s2}"
        )
    return (
        ratings.join(_maybe_broadcast(partner, partner_rows), partner_key)
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


#: box-projection ceiling for the rank-2 fixed-point lattice — the
#: overflow budget in queries/recsys.py is derived for this value
F2_MAX = 150


def _floordiv_sql(n: str, d: str) -> str:
    """Exact mathematical floor division of BIGINT ``n`` by POSITIVE
    BIGINT ``d`` as a SQL expression valid in both Spark (`DIV`) and
    — with `//` substituted — DuckDB: the numerator is first adjusted
    down to the nearest exact multiple of ``d`` via the mathematical
    mod ``((n % d) + d) % d`` (both engines' native ``%`` is C-style,
    dividend-signed), after which integer division is exact and
    identical regardless of whether the engine's native operator
    truncates (both do) or floors.  Rank-2 Cramer numerators can be
    NEGATIVE, unlike the all-positive rank-1 lattice where floor ==
    trunc made native `DIV`/`//` agree; the explicit form makes
    portability self-evident.  (Defense-in-depth rather than strictly
    load-bearing: the box projection clamps every negative raw to 1
    regardless of rounding convention, and positive raws divide
    identically — but a future caller without the clamp must not
    inherit a latent convention mismatch.)"""
    return f"(({n}) - (((({n}) % ({d})) + ({d})) % ({d}))) DIV ({d})"


def rank2_half_step_int(
    ratings: DataFrame,
    own_key: str,
    partner_key: str,
    partner: DataFrame,
    p1: str,
    p2: str,
    o1: str,
    o2: str,
    lam_s2: int = S * S,
    partner_rows: int | None = None,
) -> DataFrame:
    """EXACT fixed-point rank-2 half step: per own-side entity, solve
    the 2x2 ridge normal equations by Cramer's rule entirely in
    BIGINT arithmetic, then project onto the box ``[1, F2_MAX]``
    (box-constrained ALS — the projected block-coordinate variant of
    the Netflix-paper solver; the projection keeps the lattice
    bounded and strictly positive across iterations, which is what
    makes every downstream product fit the documented BIGINT budget):

        a11 = sum(p1^2)  a12 = sum(p1*p2)  a22 = sum(p2^2)
        b1  = sum(q*p1)  b2  = sum(q*p2)   L = lam_s2
        det = (a11+L)*(a22+L) - a12^2      >= L^2 > 0  (Cauchy-Schwarz
                                            + L>0: A is positive
                                            definite, never singular)
        raw_j = floordiv(S * (b_j*(a_kk+L) - b_k*a12), det)
        f_j   = clamp(raw_j, 1, F2_MAX)

    ``floordiv`` is the explicit exact-multiple form
    (:func:`_floordiv_sql`) so the possibly-negative numerators
    divide identically in Spark and the DuckDB oracle.  All sums are
    exact integer addition — commutative, so the result is
    independent of row order and partition layout, the same
    certification contract as :func:`rank1_half_step_int`.

    Overflow budget (documented for queries/recsys.py, deg <= 1e4,
    q <= 100, factors <= F2_MAX = 150): a-terms <= 2.25e8,
    b-terms <= 1.5e8, |numerator| <= S * 2 * 1.5e8 * 2.25e8 = 6.8e18
    < 2^63-1 (margin 1.35x), det <= 5.1e16.  Same plan shape as the
    rank-1 step: one (gated) broadcast join + one groupBy exchanged
    on the solving side's key."""
    # positive-definiteness (det >= L^2 > 0, hence never a division
    # by zero) REQUIRES lam_s2 > 0: with lam_s2 = 0 and a
    # rank-deficient partner matrix (an entity with one rating)
    # det = 0 and the engines diverge silently — Spark non-ANSI
    # integer division by zero yields NULL (GREATEST/LEAST then skip
    # it, silently pinning the factor) while DuckDB errors.  Misuse
    # fails loudly instead (r11 ADVICE).
    if int(lam_s2) <= 0:
        raise ValueError(
            f"rank2_half_step_int requires lam_s2 > 0, got {lam_s2}"
        )
    L = int(lam_s2)
    n1 = f"(CAST({S} AS BIGINT) * (b1*(a22+{L}) - b2*a12))"
    n2 = f"(CAST({S} AS BIGINT) * (b2*(a11+{L}) - b1*a12))"
    det = f"((a11+{L})*(a22+{L}) - a12*a12)"
    return (
        ratings.join(_maybe_broadcast(partner, partner_rows), partner_key)
        .groupBy(own_key)
        .agg(
            F.sum(F.col(p1) * F.col(p1)).alias("a11"),
            F.sum(F.col(p1) * F.col(p2)).alias("a12"),
            F.sum(F.col(p2) * F.col(p2)).alias("a22"),
            F.sum(F.col("q") * F.col(p1)).alias("b1"),
            F.sum(F.col("q") * F.col(p2)).alias("b2"),
        )
        .select(
            own_key,
            F.expr(
                f"GREATEST(CAST(1 AS BIGINT), LEAST(CAST({F2_MAX} AS "
                f"BIGINT), {_floordiv_sql(n1, det)}))"
            ).cast("bigint").alias(o1),
            F.expr(
                f"GREATEST(CAST(1 AS BIGINT), LEAST(CAST({F2_MAX} AS "
                f"BIGINT), {_floordiv_sql(n2, det)}))"
            ).cast("bigint").alias(o2),
        )
    )
