"""Distributed PageRank (operators/pagerank.py) vs a dense numpy
power-iteration reference — including the dangling-node case the SQL
oracle (symmetric graph) never exercises."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.pagerank import (
    pagerank,
)


def _reference(edges, n, damping, iters, weights=None):
    """Dense power iteration over node ids 0..n-1."""
    w = np.zeros((n, n))
    for i, (s, d) in enumerate(edges):
        w[s, d] += weights[i] if weights else 1.0
    out = w.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[out == 0].sum()
        contrib = np.zeros(n)
        for s in range(n):
            if out[s]:
                contrib += r[s] * w[s] / out[s]
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return r


def test_pagerank_matches_dense_reference(spark):
    # ring + chord graph, unweighted
    edges = [(i, (i + 1) % 6) for i in range(6)] + [(0, 3), (2, 5)]
    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    got = {r.node: r.rank for r in pagerank(df, iters=8).collect()}
    ref = _reference(edges, 6, 0.85, 8)
    assert set(got) == set(range(6))
    for i in range(6):
        assert abs(got[i] - ref[i]) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-12


def test_pagerank_weighted_and_dangling(spark):
    # node 3 has NO out-edges: its rank must redistribute uniformly
    edges = [(0, 1), (0, 2), (1, 3), (2, 3)]
    weights = [3.0, 1.0, 1.0, 1.0]
    df = spark.createDataFrame(
        [Row(src=s, dst=d, w=w) for (s, d), w in zip(edges, weights)]
    )
    got = {r.node: r.rank for r in pagerank(df, weight="w", iters=6).collect()}
    ref = _reference(edges, 4, 0.85, 6, weights)
    for i in range(4):
        assert abs(got[i] - ref[i]) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-12
    # weighted: node 1 (weight-3 edge) outranks node 2 (weight-1)
    assert got[1] > got[2]


def test_pagerank_empty_raises(spark):
    df = spark.createDataFrame([], schema="src long, dst long")
    with pytest.raises(ValueError, match="empty edge relation"):
        pagerank(df)
