"""Property tests for the bloom-filter semi-join reducer, the
count-min sketch, and the A-ES weighted sample — the invariants the
sketches guarantee by construction, checked empirically:

- bloom: NO false negatives ever; false-positive rate within a
  small multiple of the theoretical (1 - e^{-kn/m})^k;
- CMS: NEVER underestimates; exact when the grid is collision-free;
- A-ES: exactly k rows, reproduced value-for-value by a direct
  hashlib/numpy reference implementation (engine-independence).
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.bloom import (
    bloom_build,
    bloom_prune,
)
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.sketch import (
    cms_cells,
    cms_estimate,
)

M, K = 1 << 12, 5


def test_bloom_no_false_negatives_and_bounded_fpr(spark):
    build = spark.range(0, 300).select(
        (F.col("id") * 7 + 3).alias("key")
    )
    words = bloom_build(build, "key", M, K)
    assert len(words) == M // 32
    # members: every build key must pass
    kept = bloom_prune(build, "key", words, M, K).count()
    assert kept == 300, "bloom false negative: impossible by contract"
    # non-members: fpr within 3x of theory
    probe = spark.range(100_000, 110_000).select(F.col("id").alias("key"))
    fp = bloom_prune(probe, "key", words, M, K).count()
    theory = (1.0 - math.exp(-K * 300 / M)) ** K
    assert fp / 10_000 <= max(3 * theory, 0.01), (fp, theory)


def test_bloom_rejects_unaligned_m(spark):
    with pytest.raises(ValueError):
        bloom_build(spark.range(1), "id", m_bits=100)


def test_cms_never_underestimates(spark):
    # skewed multiplicities: value v occurs (v % 17 + 1) times
    items = spark.range(0, 2_000).select(
        F.explode(
            F.array_repeat(F.col("id"), (F.col("id") % 17 + 1).cast("int"))
        ).alias("item")
    )
    cells = cms_cells(items, "item", depth=4, width=64)
    exact = items.groupBy("item").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(exact, cells, "item", depth=4, width=64)
    bad = (
        exact.join(est, "item")
        .filter(F.col("cms_est") < F.col("exact"))
        .count()
    )
    assert bad == 0, "CMS underestimated — violates the one-sided bound"


def test_cms_exact_when_collision_free(spark):
    # 8 distinct items into a 4x4096 grid: collisions vanishingly
    # unlikely -> estimates equal exact counts
    items = spark.range(0, 8).select(
        F.explode(F.array_repeat(F.col("id"), 5)).alias("item")
    )
    cells = cms_cells(items, "item", depth=4, width=4096)
    exact = items.groupBy("item").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(exact, cells, "item", depth=4, width=4096)
    off = (
        exact.join(est, "item")
        .filter(F.col("cms_est") != F.col("exact"))
        .count()
    )
    assert off == 0


def test_weighted_sample_matches_reference(spark):
    """The Spark A-ES sample equals a direct hashlib reference —
    pins the md5-uniform construction and the key arithmetic."""
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries import (
        SPARK_QUERIES,
    )

    sf = "/root/testdata/sf0.001"
    got = SPARK_QUERIES["weighted_reservoir_sample"](spark, sf).collect()
    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, n_chars FROM '{sf}/documents.parquet'"
    ).fetchall()
    keyed = []
    for doc_id, w in rows:
        h = int(hashlib.md5(f"wrs:{doc_id}".encode()).hexdigest()[:13], 16)
        u = (float(h) + 1.0) / float(1 << 52)
        keyed.append((-math.log(u) / float(w), doc_id))
    keyed.sort()
    want = [doc_id for _, doc_id in keyed[:25]]
    assert [r["doc_id"] for r in got] == want
    assert len(got) == 25


def test_kmv_error_bound(spark):
    """KMV sigma is ~1/sqrt(k-2) (~12.7% at k=64); assert the
    realized per-type error stays inside 4 sigma on the fixture."""
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries import (
        SPARK_QUERIES,
    )

    rows = SPARK_QUERIES["reach_kmv_accuracy"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows, "no event types"
    for r in rows:
        assert r["rel_err"] <= 4 / (64 - 2) ** 0.5, (
            r["event_type"], r["rel_err"],
        )


def test_bloom_build_ignores_null_keys(spark):
    """NULL keys hash to NULL positions; the build must drop them
    (not crash on a word=NULL aggregate row) and the filter must
    behave as if they were never inserted."""
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.bloom import (
        bloom_build as _build,
        bloom_prune as _prune,
    )

    build = spark.createDataFrame(
        [(1,), (2,), (None,)], "k bigint"
    )
    words = _build(build, "k", m_bits=M, k=K)
    probe = spark.createDataFrame([(1,), (99,), (None,)], "k bigint")
    kept = {r["k"] for r in _prune(probe, "k", words, M, K).collect()}
    assert 1 in kept          # no false negative
    assert None not in kept   # NULL probe rows are filtered (equi-join semantics)
