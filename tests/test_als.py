"""ALS matrix factorization (operators/als.py + queries/recsys.py):
fixed-point oracle replay, monotone descent, synthetic recovery, and
partition-layout invariance."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.als import (
    S,
    als_train,
    init_factors,
)
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.recsys import (
    SQL_ALS_RANK1_FIXED,
    q_als_rank1_fixed,
)

SF = "/root/testdata/sf0.001"


# ----------------------------------------- fixed-point oracle replay


@pytest.fixture(scope="module")
def fixed(spark):
    return (
        q_als_rank1_fixed(spark, SF)
        .toPandas()
        .sort_values("iter")
        .reset_index(drop=True)
    )


def test_fixed_point_matches_duckdb(fixed):
    """The registry-grade hash-equality check, run in-test until the
    entry takes its r10 driver-window slot (see queries/recsys.py):
    six unrolled half steps + three loss ledgers, value-for-value."""
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    odf = (
        con.execute(SQL_ALS_RANK1_FIXED)
        .fetchdf()
        .sort_values("iter")
        .reset_index(drop=True)
    )
    cols = sorted(fixed.columns)
    assert cols == sorted(odf.columns)
    assert (
        fixed[cols].astype("int64").equals(odf[cols].astype("int64"))
    )


def test_fixed_point_loss_monotone(fixed):
    losses = fixed["loss_s2"].tolist()
    assert losses == sorted(losses, reverse=True)
    assert losses[0] > losses[-1]  # strictly improved overall


def test_fixed_point_is_layout_invariant(spark, fixed, monkeypatch):
    """All-positive integer lattice: a hostile physical layout must
    reproduce every BIGINT exactly (the engine-wide sweep lever,
    queries/data.py:_layout)."""
    monkeypatch.setenv("SPARK_GRAFT_LAYOUT_REPARTITION", "7")
    again = (
        q_als_rank1_fixed(spark, SF)
        .toPandas()
        .sort_values("iter")
        .reset_index(drop=True)
    )
    assert fixed.equals(again)


# ------------------------------------------------- float rank-k path


def _synthetic(spark, n_u=40, n_v=30, k=2, noise=0.0):
    """Ratings from a planted rank-k model r = <u*, v*> with
    md5-deterministic positive factors (values in [k/4, k], well away
    from zero)."""
    u = init_factors(
        spark.range(n_u).select(F.col("id").alias("c")), "c", k, "tu"
    ).withColumnRenamed("f", "fu")
    v = init_factors(
        spark.range(n_v).select(F.col("id").alias("p")), "p", k, "tv"
    ).withColumnRenamed("f", "fv")
    dot = F.aggregate(
        F.zip_with("fu", "fv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        u.crossJoin(v)
        .select("c", "p", (dot + F.lit(0.25)).alias("r"))
    )


def test_float_als_monotone_and_beats_baseline(spark):
    r = _synthetic(spark).persist()
    uf, vf, losses = als_train(r, "c", "p", k=2, iters=3, lam=0.05)
    assert losses == sorted(losses, reverse=True)
    mean = r.agg(F.avg("r")).collect()[0][0]
    baseline = (
        r.select(F.pow(F.col("r") - F.lit(mean), 2).alias("s"))
        .agg(F.sum("s"))
        .collect()[0][0]
    )
    assert losses[-1] < 0.5 * baseline


def test_losses_fused_empty_hist_and_chunking(spark, monkeypatch):
    """r12 ADVICE pair: (a) iters=0 must return [] instead of raising
    from a zero-expression agg; (b) the chunked fused chain (bounded
    simultaneous broadcasts) computes each iteration's loss in its own
    column, so chunk size must not change any value."""
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators import (
        als as als_mod,
    )

    r = _synthetic(spark).persist()
    assert als_mod._losses_fused(r, [], "c", "p") == []
    uf0, vf0, fused = als_train(r, "c", "p", k=2, iters=3, lam=0.05)
    # per-iteration chunks (chunk=1 == the pre-r12 one-job-per-iter
    # layout) must reproduce the single fused job's values exactly:
    # each loss is its own sum either way
    monkeypatch.setattr(als_mod, "_FUSED_LOSS_CHUNK_ITERS", 1)
    _, _, per_iter = als_train(r, "c", "p", k=2, iters=3, lam=0.05)
    assert len(fused) == len(per_iter) == 3
    for a, b in zip(fused, per_iter):
        assert abs(a - b) <= 1e-9 * abs(a)


def test_float_als_recovers_planted_rank2(spark):
    """With the data exactly rank-2 (+constant ~ rank-3) and lambda
    tiny, three ALS iterations at k=3 must drive relative SSE to
    noise level — the exact-recovery certificate (FD precedent)."""
    r = _synthetic(spark, k=2).persist()
    total = r.select(F.pow("r", 2).alias("s")).agg(F.sum("s")).collect()[
        0
    ][0]
    _, _, losses = als_train(r, "c", "p", k=3, iters=3, lam=1e-6)
    assert losses[-1] / total < 1e-3


def test_float_als_layout_invariance(spark):
    """Sorted in-group accumulation makes the Arrow solves exact
    functions of the group CONTENT: repartitioning the ratings must
    reproduce bit-identical factors."""
    r = _synthetic(spark).persist()
    uf1, _, l1 = als_train(r.repartition(2), "c", "p", k=2, iters=2)
    uf2, _, l2 = als_train(r.repartition(7, "p"), "c", "p", k=2, iters=2)
    f1 = {row["c"]: row["f"] for row in uf1.collect()}
    f2 = {row["c"]: row["f"] for row in uf2.collect()}
    assert f1 == f2  # bit-identical factors
    # the DIAGNOSTIC loss scalar is a distributed double reduction —
    # order-sensitive in the last ulp (it never feeds the factors)
    for a, b in zip(l1, l2):
        assert abs(a - b) <= 1e-9 * abs(a)


def test_init_factors_deterministic_and_in_range(spark):
    df = spark.range(100).select(F.col("id").alias("c"))
    a = init_factors(df, "c", 4, "t").collect()
    b = init_factors(df, "c", 4, "t").collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    for row in a:
        assert len(row["f"]) == 4
        assert all(0.0 < x <= 1.0 for x in row["f"])
    # a different tag draws different values
    c = {r["c"]: r["f"] for r in init_factors(df, "c", 4, "t2").collect()}
    assert any(c[row["c"]] != row["f"] for row in a)


def test_fixed_point_factors_stay_in_overflow_budget(spark):
    """The docstring's self-stabilization bound f <= q_max*sqrt(deg)/2
    is the overflow budget's load-bearing claim — measure it on real
    data."""
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.als import (
        rank1_half_step_int,
    )
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.recsys import (
        _ratings,
    )

    r = _ratings(spark, SF).persist()
    deg = r.groupBy("c").count().agg(F.max("count")).collect()[0][0]
    v = r.select("p").distinct().select(
        "p", F.lit(S).cast("bigint").alias("v")
    )
    u = rank1_half_step_int(r, "c", "p", v, "v", "u")
    max_u = u.agg(F.max("u")).collect()[0][0]
    assert max_u <= 100 * (deg**0.5) / 2 * S  # q_max * sqrt(deg)/2, scaled
    assert u.agg(F.min("u")).collect()[0][0] >= 0


def test_recommend_fixed_matches_duckdb(spark):
    """The second r10-queued entry: top-25 unseen recommendations
    from the final factors, value-for-value against DuckDB."""
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.recsys import (
        SQL_ALS_RECOMMEND_FIXED,
        q_als_recommend_fixed,
    )

    sdf = q_als_recommend_fixed(spark, SF).toPandas()
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    odf = con.execute(SQL_ALS_RECOMMEND_FIXED).fetchdf()
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values(cols).reset_index(drop=True).astype("int64")
    b = odf[cols].sort_values(cols).reset_index(drop=True).astype("int64")
    assert len(a) == 25
    assert a.equals(b)


def test_recommend_fixed_excludes_purchases(spark):
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.recsys import (
        _ratings,
        q_als_recommend_fixed,
    )

    recs = q_als_recommend_fixed(spark, SF)
    seen = _ratings(spark, SF).select("c", "p")
    assert recs.join(seen, ["c", "p"]).count() == 0
    assert recs.filter(F.col("score_s2") <= 0).count() == 0


def test_float_half_step_replicates_numpy_exactly(spark):
    """Pin the Arrow solver against an INDEPENDENT numpy replication:
    collect the same ratings + partner factors, rebuild each user's
    normal equations in the same sorted order, and demand bitwise
    equality — stronger than the semantic recovery test, this proves
    the distributed half step IS the declared linear algebra."""
    import numpy as np

    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.als import (
        _solve_side,
    )

    k, lam = 3, 0.07
    r = _synthetic(spark, n_u=15, n_v=12, k=2).persist()
    vf = init_factors(
        r.select(F.col("p")), "p", k, "pin"
    )
    got = {
        row["c"]: row["f"]
        for row in _solve_side(r, "c", "p", vf, k, lam).collect()
    }

    pf = {row["p"]: np.array(row["f"]) for row in vf.collect()}
    cells = r.collect()
    users = sorted({row["c"] for row in cells})
    for c in users:
        mine = sorted(
            ((row["p"], row["r"]) for row in cells if row["c"] == c)
        )
        V = np.vstack([pf[p] for p, _ in mine])
        rv = np.array([x for _, x in mine], dtype=np.float64)
        A = V.T @ V + lam * len(mine) * np.eye(k)
        want = np.linalg.solve(A, V.T @ rv)
        assert got[c] == want.tolist(), c


# ------------------------------------------------ rank-2 fixed point


@pytest.fixture(scope="module")
def fixed2(spark):
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.recsys import (
        q_als_rank2_fixed,
    )

    return (
        q_als_rank2_fixed(spark, SF)
        .toPandas()
        .sort_values("iter")
        .reset_index(drop=True)
    )


def test_rank2_fixed_matches_duckdb(fixed2):
    """Registry-grade replay of the rank-2 certification query: four
    unrolled Cramer-solved half steps + two loss ledgers,
    value-for-value against DuckDB."""
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.recsys import (
        SQL_ALS_RANK2_FIXED,
    )

    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    odf = (
        con.execute(SQL_ALS_RANK2_FIXED)
        .fetchdf()
        .sort_values("iter")
        .reset_index(drop=True)
    )
    cols = sorted(fixed2.columns)
    assert cols == sorted(odf.columns)
    assert (
        fixed2[cols].astype("int64").equals(odf[cols].astype("int64"))
    )


def test_rank2_fixed_layout_invariant(spark, fixed2, monkeypatch):
    """Exact integer sums are commutative: a hostile physical layout
    must reproduce every BIGINT of the rank-2 ledger."""
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.recsys import (
        q_als_rank2_fixed,
    )

    monkeypatch.setenv("SPARK_GRAFT_LAYOUT_REPARTITION", "7")
    again = (
        q_als_rank2_fixed(spark, SF)
        .toPandas()
        .sort_values("iter")
        .reset_index(drop=True)
    )
    assert fixed2.equals(again)


def test_rank2_half_step_replicates_python_exactly(spark):
    """Pin the distributed rank-2 half step against an independent
    pure-python integer replication (Python's `//` floors, the same
    mathematical floor the explicit SQL form implements), on a
    crafted instance whose second Cramer numerator is NEGATIVE —
    correlated partner columns (10,9)/(9,10) with ratings pulling
    component 2 below zero — so the negative-branch arithmetic and
    the box projection are both exercised, not just the all-positive
    lattice the rank-1 tests cover."""
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.als import (
        F2_MAX,
        rank2_half_step_int,
    )

    lam = 1  # tiny ridge so the correlated instance goes negative
    cells = [  # (c, p, q)
        (1, 10, 100), (1, 20, 1),          # the negative-numerator user
        (2, 10, 5), (2, 20, 7), (2, 30, 2),
        (3, 30, 100),
    ]
    factors = {10: (10, 9), 20: (9, 10), 30: (1, 150)}
    r = spark.createDataFrame(cells, "c bigint, p bigint, q bigint")
    vdf = spark.createDataFrame(
        [(p, a, b) for p, (a, b) in factors.items()],
        "p bigint, v1 bigint, v2 bigint",
    )
    got = {
        row["c"]: (row["u1"], row["u2"])
        for row in rank2_half_step_int(
            r, "c", "p", vdf, "v1", "v2", "u1", "u2", lam_s2=lam
        ).collect()
    }

    saw_negative = False
    for c in {c for c, _, _ in cells}:
        mine = [(p, q) for cc, p, q in cells if cc == c]
        a11 = sum(factors[p][0] ** 2 for p, _ in mine)
        a12 = sum(factors[p][0] * factors[p][1] for p, _ in mine)
        a22 = sum(factors[p][1] ** 2 for p, _ in mine)
        b1 = sum(q * factors[p][0] for p, q in mine)
        b2 = sum(q * factors[p][1] for p, q in mine)
        det = (a11 + lam) * (a22 + lam) - a12 * a12
        assert det > 0
        n1 = S * (b1 * (a22 + lam) - b2 * a12)
        n2 = S * (b2 * (a11 + lam) - b1 * a12)
        saw_negative = saw_negative or n1 < 0 or n2 < 0
        want = tuple(
            max(1, min(F2_MAX, n // det)) for n in (n1, n2)
        )
        assert got[c] == want, c
    assert saw_negative  # the crafted instance must hit the branch


def test_rank2_half_step_plan(spark):
    """Same plan gates as the rank-1 step: the aggregation exchanges
    on the SOLVING side's key, with map-side combine, and no
    cartesian anywhere."""
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.als import (
        rank2_half_step_int,
    )
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.recsys import (
        _init2,
        _ratings,
    )

    r = _ratings(spark, SF)
    v = _init2(r)
    plan = _plan(
        spark,
        rank2_half_step_int(r, "c", "p", v, "v1", "v2", "u1", "u2"),
    )
    assert "hashpartitioning(c" in plan
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_broadcast_gate_thresholds(spark):
    """The r10-ADVICE runtime guard: under the row ceiling (or with
    no count supplied) the factor table carries the broadcast hint;
    at/above the ceiling the input is returned UNCHANGED so the join
    degrades to the pre-partitioned shuffle path instead of a driver
    OOM."""
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.als import (
        BROADCAST_FACTOR_ROWS_MAX,
        _maybe_broadcast,
    )

    df = spark.range(4).select(F.col("id").alias("p"))
    assert _maybe_broadcast(df, BROADCAST_FACTOR_ROWS_MAX) is df
    assert _maybe_broadcast(df, BROADCAST_FACTOR_ROWS_MAX + 1) is df
    hinted = _maybe_broadcast(df, BROADCAST_FACTOR_ROWS_MAX - 1)
    assert hinted is not df
    logical = hinted._jdf.queryExecution().logical().toString()
    assert "Hint broadcast" in logical  # Unresolved/ResolvedHint node
    assert _maybe_broadcast(df, None) is not df


# --------------------------------------------------- physical plans
# (r9 verdict task 4: the two scale-killers the docstrings claim are
# avoided, asserted on explain output so a refactor fails CI)


def _plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_half_step_partitions_by_solving_side(spark):
    """Each half step's aggregation exchanges on the SOLVING side's
    key (the Netflix-paper layout): partial+final HashAggregate
    around one hashpartitioning(own_key) exchange — never a
    re-shuffle of the ratings by anything else downstream."""
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.als import (
        rank1_half_step_int,
    )
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.recsys import (
        _ratings,
    )

    r = _ratings(spark, SF)
    v = (
        r.select("p")
        .distinct()
        .select("p", F.lit(3).cast("bigint").alias("v"))
    )
    for own, partner, pcol, out in (("c", "p", "v", "u"),):
        plan = _plan(spark, rank1_half_step_int(r, own, partner, v, pcol, out))
        # the solve-side aggregate partitions by the solving key
        assert f"hashpartitioning({own}" in plan
        # map-side combine: partial + final HashAggregate pair for
        # the solve (the ratings build inside _ratings adds its own)
        assert plan.count("HashAggregate") >= 2
        assert "CartesianProduct" not in plan


def test_recommend_broadcasts_candidates_never_c_times_p(spark):
    """The recommend readout scores |customers| x 64, never |C|x|P|:
    the candidate pool join is a broadcast of the 64-row side (a
    BroadcastNestedLoopJoin over the unconditioned join is the
    expected physical form), the seen-pairs removal is a LeftAnti
    join, and the final top-25 is TakeOrdered, not a global sort."""
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.recsys import (
        q_als_recommend_fixed,
    )

    plan = _plan(spark, q_als_recommend_fixed(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "LeftAnti" in plan
    assert "TakeOrderedAndProject" in plan
    # exactly one broadcast side: the bounded candidate pool
    assert plan.count("BroadcastExchange") >= 1


def test_float_readout_rounding_margins(spark):
    """The als_float_rank2_readout tolerance contract, pinned at the
    driver's certification scale (sf0.01): every released value must
    sit >= 0.02 of a rounding step away from its boundary, >= 5
    orders of magnitude above the measured <= 2e-6 cross-engine float
    disagreement (see the query docstring).  A data regeneration that
    parks a loss or factor sum near a boundary fails HERE before the
    driver's hash check can flip."""
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.recsys import (
        _FLOAT_ITERS,
        _FLOAT_K,
        _FLOAT_LAM,
        _ratings,
    )

    sf = "/root/testdata/sf0.01"
    r = (
        _ratings(spark, sf)
        .withColumn("r", F.col("q").cast("double"))
        .select("c", "p", "r")
    )
    uf, vf, losses = als_train(
        r, "c", "p", k=_FLOAT_K, iters=_FLOAT_ITERS, lam=_FLOAT_LAM
    )
    su = uf.agg(F.sum(F.col("f")[0]), F.sum(F.col("f")[1])).collect()[0]
    sv = vf.agg(F.sum(F.col("f")[0]), F.sum(F.col("f")[1])).collect()[0]

    def margin(x: float) -> float:
        frac = abs(x) - int(abs(x))
        return abs(frac - 0.5)

    released = [ls for ls in losses] + [
        su[0] / 10, su[1] / 10, sv[0] / 10, sv[1] / 10
    ]
    worst = min(margin(x) for x in released)
    assert worst >= 0.02, (
        f"released value within {worst:.4f} of a rounding boundary - "
        f"the float-vs-oracle tolerance contract is eroding: {released}"
    )
    # the ledger the readout releases must still exhibit descent
    assert losses == sorted(losses, reverse=True)
