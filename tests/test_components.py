"""Connected components (operators/components.py): large-star /
small-star contraction vs a driver-side union-find ground truth."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.components import (
    connected_components,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node of the component
    return {x: find(x) for x in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        (r.id, r.component)
        for r in connected_components(df, "src", "dst").collect()
    }
    want = set(_union_find(edges).items())
    assert got == want


def test_two_components_and_selfloop(spark):
    _check(spark, [(1, 2), (2, 3), (10, 11), (5, 5)])


def test_chain_worst_case_diameter(spark):
    # a 60-node path: min-label PROPAGATION would need 60 rounds;
    # star contraction must finish inside the O(log n) budget
    _check(spark, [(i, i + 1) for i in range(60)])


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(25 + 10 * trial)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        _check(spark, edges)


def test_empty_edges(spark):
    df = spark.createDataFrame([], "src bigint, dst bigint")
    out = connected_components(df, "src", "dst")
    assert out.count() == 0
    assert out.columns == ["id", "component"]


def test_star_already_converged(spark):
    # input already a min-rooted star: one round, unchanged
    _check(spark, [(0, i) for i in range(1, 8)])
