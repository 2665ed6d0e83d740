"""Differential-privacy release mechanism (operators/dp.py +
queries/privacy.py): noise-table shape, determinism, clipping /
sensitivity structure, and the epsilon ledger."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators import dp
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.privacy import (
    _CLIP_CENTS,
    _TBL_CNT,
    _TBL_SUM,
    q_dp_revenue_release,
)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------- noise table shape


def test_table_matches_closed_form_laplace_quantiles():
    b = 100.0
    t = dp.laplace_noise_table(b)
    assert len(t) == dp.N_BUCKETS
    for i in (0, 1, 77, 128, 200, 255):
        p = (i + 0.5) / dp.N_BUCKETS
        x = b * math.log(2 * p) if p < 0.5 else -b * math.log(2 * (1 - p))
        assert t[i] == round(x)


def test_table_is_antisymmetric_and_monotone():
    """Bucket midpoints pair to p + p' = 1, so the quantized
    mechanism is exactly unbiased: table[i] == -table[255 - i]."""
    for b in (2.0, 1e3, 4e8):
        t = dp.laplace_noise_table(b)
        assert list(t) == sorted(t)
        assert all(t[i] == -t[255 - i] for i in range(256))
        assert sum(t) == 0


def test_table_magnitude_tracks_scale():
    """E|Laplace(b)| = b: the table's mean |noise| must sit near b
    (quantization moves it only slightly)."""
    for b in (2.0, 1e6):
        t = dp.laplace_noise_table(b)
        mean_abs = sum(abs(v) for v in t) / len(t)
        assert 0.9 * b < mean_abs < 1.1 * b
    # tail = inverse CDF at the last midpoint, ~b * ln(256)
    t = dp.laplace_noise_table(1e6)
    assert t[255] == round(1e6 * math.log(256.0))


# ------------------------------------- bucket / lookup cross-engine


def test_spark_noise_equals_python_table_lookup(spark):
    """The Spark column expression replays the pure-Python mechanism
    value-for-value (same md5 byte, same literal table)."""
    import hashlib

    t = dp.laplace_noise_table(1000.0)
    keys = [f"NATION_{i}" for i in range(25)]
    df = spark.createDataFrame([(k,) for k in keys], ["k"]).select(
        "k", dp.noise_value(t, "tag", F.col("k")).alias("noise")
    )
    got = {r["k"]: r["noise"] for r in df.collect()}
    for k in keys:
        b = int(hashlib.md5(f"tag:{k}".encode()).hexdigest()[:2], 16)
        assert got[k] == t[b]


def test_tags_domain_separate(spark):
    """Different release tags draw independent buckets for the same
    key — the sum and count releases must not share noise."""
    t = tuple(range(256))  # identity table -> noise IS the bucket
    df = spark.range(1).select(
        dp.noise_value(t, "dpsum", F.lit("NATION_0")).alias("a"),
        dp.noise_value(t, "dpcnt", F.lit("NATION_0")).alias("b"),
    )
    row = df.collect()[0]
    assert row["a"] != row["b"]


# ------------------------------------------------- the release query


@pytest.fixture(scope="module")
def release(spark):
    return q_dp_revenue_release(spark, SF).toPandas()


def test_release_shape_and_ledger(release):
    assert len(release) == 25  # every nation, always
    assert (release["eps_total_ppm"] == 1_500_000).all()
    assert (
        release["eps_sum_ppm"] + release["eps_count_ppm"]
        == release["eps_total_ppm"]
    ).all()
    assert (release["clip_cents"] == _CLIP_CENTS).all()


def test_release_internal_consistency(release):
    assert (
        release["noisy_sum_cents"]
        == release["audit_exact_sum_cents"] + release["audit_noise_sum_cents"]
    ).all()
    assert (
        release["noisy_count"]
        == release["audit_n_customers"] + release["audit_noise_count"]
    ).all()
    # clipping can only shrink, and does shrink exactly when rows
    # were clipped
    assert (release["audit_exact_sum_cents"] <= release["audit_raw_sum_cents"]).all()
    clipped = release["audit_n_clipped"] > 0
    assert (
        release.loc[clipped, "audit_exact_sum_cents"]
        < release.loc[clipped, "audit_raw_sum_cents"]
    ).all()
    assert (
        release.loc[~clipped, "audit_exact_sum_cents"]
        == release.loc[~clipped, "audit_raw_sum_cents"]
    ).all()


def test_clip_is_active_not_vacuous(release):
    """The bound must bind somewhere: a clip above max(spend) would
    make the stated sensitivity vacuous."""
    assert release["audit_n_clipped"].sum() > 0


def test_mechanism_marker_and_audit_prefix(release):
    """r9 ADVICE: the non-private status must be machine-visible.
    The mechanism marker is in-row, and every column a real release
    could not publish (exact aggregates, exact counts, the
    subtractable noise values) is audit_-prefixed, so a consumer
    selecting the un-prefixed surface gets only the noised values
    plus the calibration ledger."""
    assert (release["mechanism"] == dp.MECHANISM).all()
    released_surface = [
        c for c in release.columns if not c.startswith("audit_")
    ]
    assert sorted(released_surface) == sorted(
        [
            "n_name",
            "noisy_sum_cents",
            "noisy_count",
            "clip_cents",
            "eps_sum_ppm",
            "eps_count_ppm",
            "eps_total_ppm",
            "mechanism",
        ]
    )


def test_release_operator_carries_mechanism(spark):
    """operators/dp.py release() marks its output too."""
    df = spark.createDataFrame([(1, 10), (2, 20)], ["k", "n"])
    out = dp.release(df, "k", [("n", 1, 500_000)]).toPandas()
    assert (out["mechanism"] == dp.MECHANISM).all()


def test_noise_drawn_from_the_declared_tables(release):
    assert set(release["audit_noise_sum_cents"]) <= set(_TBL_SUM)
    assert set(release["audit_noise_count"]) <= set(_TBL_CNT)


def test_release_is_retry_idempotent(spark, release):
    """Second independent run releases the identical table — the
    speculative-execution / stage-retry guarantee the deterministic
    mechanism exists for."""
    again = (
        q_dp_revenue_release(spark, SF)
        .toPandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    first = release.sort_values("n_name").reset_index(drop=True)
    assert first.equals(again)


def test_sensitivity_bound_on_neighboring_dataset(spark):
    """Structural DP check: removing any one customer moves each
    nation's exact clipped sum by at most CLIP and each count by at
    most 1 — the sensitivities the Laplace scales are calibrated to.
    Verified for the single heaviest (worst-case) customer."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    top = (
        orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("s"))
        .orderBy(F.desc("s"))
        .first()["o_custkey"]
    )
    full = q_dp_revenue_release(spark, SF).toPandas().set_index("n_name")

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        for t in ("customer", "nation", "orders"):
            src = spark.read.parquet(f"{SF}/{t}.parquet")
            if t == "customer":
                src = src.filter(F.col("c_custkey") != top)
            if t == "orders":
                src = src.filter(F.col("o_custkey") != top)
            src.write.parquet(os.path.join(td, f"{t}.parquet"))
        neigh = q_dp_revenue_release(spark, td).toPandas().set_index(
            "n_name"
        )
        d_sum = (full["audit_exact_sum_cents"] - neigh["audit_exact_sum_cents"]).abs()
        d_cnt = (full["audit_n_customers"] - neigh["audit_n_customers"]).abs()
        assert d_sum.max() <= _CLIP_CENTS
        assert d_cnt.max() == 1
        # exactly one nation changed at all
        assert (d_cnt > 0).sum() == 1


# ------------------------------------------- the histogram release


@pytest.fixture(scope="module")
def hist_release(spark):
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.privacy import (
        q_dp_histogram_release,
    )

    return q_dp_histogram_release(spark, SF).toPandas()


def test_histogram_full_public_domain(hist_release):
    """Every bucket 0..19 is released exactly once, lo/hi bounds are
    the fixed-width grid — the full PUBLIC domain, independent of
    which buckets the data happens to populate."""
    assert sorted(hist_release["bucket"]) == list(range(20))
    assert (hist_release["lo"] == hist_release["bucket"] * 30_000).all()
    assert (hist_release["hi"] == (hist_release["bucket"] + 1) * 30_000).all()


def test_histogram_parallel_composition_ledger(hist_release):
    """Disjoint buckets -> parallel composition: the whole release
    spends ONE eps (eps_total == eps per bucket, NOT 20x)."""
    assert (hist_release["eps_ppm"] == 500_000).all()
    assert (hist_release["eps_total_ppm"] == 500_000).all()
    assert (hist_release["mechanism"] == dp.MECHANISM).all()


def test_histogram_internal_consistency(hist_release):
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.privacy import (
        _TBL_HIST,
    )

    assert (
        hist_release["released_n_orders"]
        == hist_release["audit_n_orders"] + hist_release["audit_noise"]
    ).all()
    assert set(hist_release["audit_noise"]) <= set(_TBL_HIST)
    # counts reconcile with the raw table
    import pyarrow.parquet as pq

    n_orders = pq.read_table(f"{SF}/orders.parquet").num_rows
    assert hist_release["audit_n_orders"].sum() == n_orders


def test_histogram_empty_buckets_still_released(hist_release, spark):
    """The absence-leak guard: buckets with zero orders must still be
    released, noised — verified both on the real data (sf0.001 has
    empty high buckets) and on a fully EMPTY orders table (all 20
    buckets come out, exact count 0, released == noise)."""
    import os
    import tempfile

    from pyspark.sql import functions as F
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.privacy import (
        q_dp_histogram_release,
    )

    empties = hist_release[hist_release["audit_n_orders"] == 0]
    assert len(empties) > 0, "fixture SF should have empty buckets"
    assert (empties["released_n_orders"] == empties["audit_noise"]).all()

    with tempfile.TemporaryDirectory() as td:
        spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.lit(False)
        ).write.parquet(os.path.join(td, "orders.parquet"))
        out = q_dp_histogram_release(spark, td).toPandas()
        assert sorted(out["bucket"]) == list(range(20))
        assert (out["audit_n_orders"] == 0).all()
        assert (out["released_n_orders"] == out["audit_noise"]).all()
