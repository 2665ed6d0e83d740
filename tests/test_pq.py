"""Product-quantization operator: encode determinism and bounds,
planted-structure recall, pre-encoded/inline parity — the exact
ground-truth checks the fixed-codebook SQL oracle can't express for
the TRAINED path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.pq import (
    pq_encode,
    pq_topk,
    pq_train,
)


@pytest.fixture(scope="module")
def blobs(spark):
    """4 well-separated gaussian blobs of 20 vectors in 16 dims."""
    rng = np.random.default_rng(9)
    centers = rng.standard_normal((4, 16)) * 6.0
    rows = []
    for i in range(80):
        v = centers[i % 4] + rng.standard_normal(16) * 0.3
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v]))
    df = spark.createDataFrame(rows)
    return df, centers


def test_encode_bounds_and_determinism(spark, blobs):
    df, _ = blobs
    books = pq_train(df, m=4, k=8, iters=5, seed=1, dim=16)
    assert books.shape == (4, 8, 4)
    a = {r.vec_id: r.pq_codes for r in pq_encode(df, books).collect()}
    b = {r.vec_id: r.pq_codes for r in pq_encode(df, books).collect()}
    assert a == b
    assert all(0 <= c < 8 for codes in a.values() for c in codes)
    assert all(len(codes) == 4 for codes in a.values())


def test_adc_recall_on_planted_blobs(spark, blobs):
    """Every query's ADC top-5 stays inside its own blob (inter-blob
    distances dwarf quantization error), and the query finds itself
    at rank 1 (its own codes minimize its own lookup table)."""
    df, _ = blobs
    books = pq_train(df, m=4, k=8, iters=5, seed=1, dim=16)
    queries = [
        (r.vec_id, r.embedding)
        for r in df.filter(F.col("vec_id") < 4).collect()
    ]
    out = pq_topk(df, queries, books, k=5).collect()
    assert len(out) == 20
    for r in out:
        assert r.neighbor_id % 4 == r.query_id % 4
        if r.rank == 1:
            # rank-1 may tie with same-code blob-mates; the id
            # tie-break guarantees it is never WORSE than self
            assert r.neighbor_id <= r.query_id


def test_pre_encoded_corpus_parity(spark, blobs):
    df, _ = blobs
    books = pq_train(df, m=4, k=8, iters=5, seed=1, dim=16)
    queries = [(0, df.filter(F.col("vec_id") == 0).first().embedding)]
    inline = pq_topk(df, queries, books, k=5).collect()
    pre = pq_topk(
        pq_encode(df, books), queries, books, k=5, codes_col="pq_codes"
    ).collect()
    assert [tuple(r) for r in inline] == [tuple(r) for r in pre]


def test_train_validates_dims(spark, blobs):
    df, _ = blobs
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(df, m=5, dim=16)
    # corpus smaller than k: codebooks clamp instead of raising
    tiny = df.filter(F.col("vec_id") < 3)
    books = pq_train(tiny, m=4, k=8, iters=2, seed=1, dim=16)
    assert books.shape[0] == 4 and books.shape[1] <= 3


def test_compression_is_lossy_but_ordered(spark, blobs):
    """ADC distance correlates with true distance: the mean ADC
    distance to same-blob neighbors is far below the mean to
    other-blob vectors (the property that makes the compressed scan
    a useful pre-filter before exact rerank)."""
    df, _ = blobs
    books = pq_train(df, m=4, k=8, iters=5, seed=1, dim=16)
    q = df.filter(F.col("vec_id") == 0).first().embedding
    scored = pq_topk(df, [(0, q)], books, k=80).collect()
    same = [r.approx_dist for r in scored if r.neighbor_id % 4 == 0]
    other = [r.approx_dist for r in scored if r.neighbor_id % 4 != 0]
    assert np.mean(same) * 4 < np.mean(other)
