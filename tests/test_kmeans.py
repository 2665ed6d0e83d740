"""Distributed spherical k-means (operators/kmeans.py): planted-blob
recovery, determinism, empty-cluster degeneracy, cohesion floors."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.kmeans import (
    kmeans_assign,
    kmeans_fit,
)

DIM = 8


def _blobs(spark, n_per=20, spread=0.05, seed=5):
    """Three well-separated unit-vector blobs in 8 dims."""
    rng = np.random.default_rng(seed)
    anchors = np.eye(DIM)[:3]
    rows, truth = [], {}
    i = 0
    for b, a in enumerate(anchors):
        for _ in range(n_per):
            v = a + rng.normal(0, spread, DIM)
            rows.append(Row(vec_id=i, embedding=[float(x) for x in v]))
            truth[i] = b
            i += 1
    return spark.createDataFrame(rows), truth


def test_kmeans_recovers_planted_blobs(spark):
    df, truth = _blobs(spark)
    cents = kmeans_fit(df, k=3, iters=10, dim=DIM)
    assert cents.shape == (3, DIM)
    got = {
        r.vec_id: r.cluster for r in kmeans_assign(df, cents).collect()
    }
    # perfect purity: every blob maps to exactly one cluster label
    label_map = {}
    for vid, c in got.items():
        b = truth[vid]
        assert label_map.setdefault(b, c) == c
    assert len(set(label_map.values())) == 3


def test_kmeans_deterministic(spark):
    df, _ = _blobs(spark)
    a = kmeans_fit(df, k=3, iters=5, dim=DIM)
    b = kmeans_fit(df, k=3, iters=5, dim=DIM)
    assert np.allclose(a, b)


def test_kmeans_k_exceeding_natural_clusters(spark):
    # k=5 over 3 blobs: converges without dying on empty clusters,
    # centroids stay unit-norm
    df, _ = _blobs(spark, n_per=10)
    cents = kmeans_fit(df, k=5, iters=6, dim=DIM)
    assert cents.shape == (5, DIM)
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0, atol=1e-6)


def test_kmeans_raises_on_tiny_corpus(spark):
    df = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0] * DIM)]
    )
    with pytest.raises(ValueError, match="fewer than k"):
        kmeans_fit(df, k=3, iters=2, dim=DIM)


def test_kmeans_cohesion_beats_random_assignment(spark):
    df, _ = _blobs(spark, spread=0.15)
    cents = kmeans_fit(df, k=3, iters=8, dim=DIM)
    rows = kmeans_assign(df, cents).collect()
    vecs = {r.vec_id: np.array(r.embedding) for r in rows}
    assign = {r.vec_id: r.cluster for r in rows}

    def cohesion(assignment):
        tot = 0.0
        for vid, c in assignment.items():
            v = vecs[vid] / np.linalg.norm(vecs[vid])
            tot += float(v @ cents[c])
        return tot / len(assignment)

    fitted = cohesion(assign)
    rng = np.random.default_rng(0)
    rand = cohesion({vid: rng.integers(0, 3) for vid in assign})
    # spread=0.15 noise puts in-cluster cosine ~0.94; random
    # assignment lands near the inter-anchor cosine (~0.5-0.7)
    assert fitted > 0.9 and fitted > rand + 0.2
