"""Misra-Gries heavy hitters: the sketch's lower-bound and
no-miss guarantees checked against exact counts."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.sketch import (
    heavy_hitters,
)


def _mk_skewed(spark, n=20_000, seed=11):
    rng = random.Random(seed)
    # zipf-ish: a few hot terms over a long uniform tail
    hot = ["alpha", "beta", "gamma", "delta"]
    weights = [40, 25, 12, 6]
    rows = []
    for _ in range(n):
        if rng.random() < 0.6:
            rows.append(rng.choices(hot, weights)[0])
        else:
            rows.append(f"t{rng.randrange(5000)}")
    return spark.createDataFrame([(w,) for w in rows], "term string")


def test_heavy_hitters_bounds_and_no_miss(spark):
    df = _mk_skewed(spark).repartition(8)
    n = df.count()
    capacity = 256
    got = {r.value: r.est for r in heavy_hitters(df, "term", 10, capacity).collect()}
    exact = {
        r.term: r.n
        for r in df.groupBy("term").agg(F.count("*").alias("n")).collect()
    }
    err = n // (capacity + 1)
    # every term above the guarantee threshold is present
    for term, cnt in exact.items():
        if cnt > err:
            assert term in got, f"missed guaranteed hitter {term}"
    # est is a lower bound within the error band
    for term, est in got.items():
        assert est <= exact[term] <= est + err
    # the true top-4 lead the sketch ranking
    true_top = sorted(exact, key=exact.get, reverse=True)[:4]
    assert list(got)[:4] == sorted(true_top, key=exact.get, reverse=True)


def test_heavy_hitters_small_capacity_still_no_false_over(spark):
    df = _mk_skewed(spark, n=5_000, seed=3).repartition(4)
    exact = {
        r.term: r.n
        for r in df.groupBy("term").agg(F.count("*").alias("n")).collect()
    }
    got = {r.value: r.est for r in heavy_hitters(df, "term", 5, 16).collect()}
    for term, est in got.items():
        assert est <= exact[term]


def test_heavy_hitters_empty(spark):
    df = spark.createDataFrame([], "term string")
    assert heavy_hitters(df, "term").count() == 0
