"""Spark 4 Python DataSource: the deterministic synthetic-docs
format — schema, partition planning, reproducibility, and feeding a
real engine operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.sources.pydatasource import (
    register,
)


def _read(spark, **opts):
    register(spark)
    r = spark.read.format("synthetic_docs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_synthetic_docs_schema_and_counts(spark):
    df = _read(spark, rows=257, partitions=4, seed=3)
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert df.count() == 257
    assert df.select("doc_id").distinct().count() == 257
    # generation is spread over the planned partitions, not the driver
    assert df.rdd.getNumPartitions() == 4


def test_synthetic_docs_deterministic(spark):
    a = {r["doc_id"]: r["text"] for r in _read(spark, rows=50, seed=9).collect()}
    b = {r["doc_id"]: r["text"] for r in _read(spark, rows=50, seed=9, partitions=7).collect()}
    assert a == b, "same seed must render identical docs at any partitioning"
    c = {r["doc_id"]: r["text"] for r in _read(spark, rows=50, seed=10).collect()}
    assert a != c


def test_synthetic_docs_feed_operators(spark):
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.functions.text import (
        nonempty_tokens,
    )

    df = _read(spark, rows=200, seed=1)
    stats = df.select(
        F.size(nonempty_tokens("text")).alias("n_tok")
    ).agg(F.min("n_tok"), F.max("n_tok")).collect()[0]
    assert 20 <= stats[0] and stats[1] <= 49
