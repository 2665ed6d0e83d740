"""Delta-primary branches of TableIO / merge (SURVEY S4, S6, S8, S12).

This sandbox has no delta-spark, so ``TableIO`` always runs its
parquet fallback; these tests exercise the delta branch — real
``format("delta")`` sinks, ``OPTIMIZE ZORDER``, ``MERGE INTO`` — and
skip cleanly when the package is absent.  They exist so the primary
branch is CI-checked in any delta-equipped environment instead of
shipping as dead code (reference: bronze_ingestion.py:86,
gold_transformation.py:85,160).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.session import has_delta
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.sources.tables import (
    TableIO,
)

pytestmark = pytest.mark.skipif(
    not has_delta(), reason="delta-spark not installed (parquet fallback env)"
)


@pytest.fixture()
def io(spark):
    return TableIO(spark)


def test_delta_is_default_format(spark, io):
    assert io.fmt == "delta"


def test_delta_overwrite_append_roundtrip(spark, io):
    t = "delta_rt_probe"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    base = spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")])
    io.write_overwrite(base, t)
    io.write_append(spark.createDataFrame([Row(k=3, v="c")]), t)
    got = sorted((r.k, r.v) for r in io.read(t).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    # overwriteSchema: evolved schema replaces the old one
    io.write_overwrite(
        spark.createDataFrame([Row(k=1, v="a", extra=0)]), t
    )
    assert "extra" in io.read(t).columns
    spark.sql(f"DROP TABLE {t}")


def test_delta_compact_runs_real_optimize(spark, io):
    t = "delta_compact_probe"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    df = spark.range(2000).select(
        F.pmod(F.col("id") * 2654435761, F.lit(2000)).alias("k"),
        F.col("id").alias("payload"),
    )
    df.repartition(8).write.format("delta").saveAsTable(t)
    expected = sorted((r.k, r.payload) for r in io.read(t).collect())
    io.compact(t, ["k"])  # issues OPTIMIZE t ZORDER BY (k)
    assert sorted((r.k, r.payload) for r in io.read(t).collect()) == expected
    spark.sql(f"DROP TABLE {t}")


def test_delta_merge_tolerates_duplicate_update_keys(spark, io):
    """The documented contract: 'any number of update rows per key'.
    Delta MERGE errors on multiple source matches per target row, so
    upsert_keep_latest must collapse updates keep-latest BEFORE the
    merge — this is the regression test for that collapse."""
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.merge import (
        upsert_keep_latest,
    )

    t = "delta_merge_probe"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    base = spark.createDataFrame(
        [Row(pk=1, val="old", ver=1), Row(pk=2, val="keep", ver=5)]
    )
    upsert_keep_latest(spark, io, t, base, ["pk"], "ver")
    updates = spark.createDataFrame(
        [
            Row(pk=1, val="mid", ver=2),
            Row(pk=1, val="new", ver=3),  # duplicate key in one batch
            Row(pk=2, val="stale", ver=4),  # older than target -> no-op
            Row(pk=3, val="ins", ver=1),
        ]
    )
    upsert_keep_latest(spark, io, t, updates, ["pk"], "ver")
    got = {r.pk: (r.val, r.ver) for r in io.read(t).collect()}
    assert got == {1: ("new", 3), 2: ("keep", 5), 3: ("ins", 1)}
    spark.sql(f"DROP TABLE {t}")


def test_delta_streaming_source_and_sink(spark, io, tmp_path):
    src, dst = "delta_stream_src", "delta_stream_dst"
    for t in (src, dst):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    io.write_overwrite(
        spark.createDataFrame([Row(k=i, v=i * 10) for i in range(5)]), src
    )
    stream = io.read_stream(src).withColumn("doubled", F.col("v") * 2)
    q = io.write_stream(stream, dst, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = sorted(r.doubled for r in io.read(dst).collect())
    assert got == [0, 20, 40, 60, 80]
    for t in (src, dst):
        spark.sql(f"DROP TABLE {t}")
