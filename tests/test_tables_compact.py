"""TableIO.compact (SURVEY S12): the OSS fallback for
``OPTIMIZE ... ZORDER BY`` (reference gold_transformation.py:85,160).

Asserts the two properties the maintenance op must deliver:
content is bit-identical after the rewrite, and rows become
range-clustered by the cluster key — a narrow key-range predicate
touches ~1 file instead of every file (file-level min/max pruning is
exactly what ZORDER buys at scale).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.sources.tables import (
    TableIO,
)


def _files_for(spark, table: str, pred):
    return (
        spark.read.table(table)
        .filter(pred)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )


def test_compact_clusters_and_preserves_content(spark):
    io = TableIO(spark, fmt="parquet")
    table = "compact_probe"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # key deliberately scattered (multiplicative hash) so every file
    # spans the full key range before compaction
    df = spark.range(4000).select(
        F.pmod(F.col("id") * 2654435761, F.lit(4000)).alias("k"),
        F.col("id").alias("payload"),
    )
    df.repartition(8).write.format("parquet").saveAsTable(table)

    before = spark.read.table(table)
    pred = F.col("k") < 500
    assert _files_for(spark, table, pred) == 8  # every file has low keys
    expected = sorted((r.k, r.payload) for r in before.collect())

    io.compact(table, ["k"])

    after = spark.read.table(table)
    assert sorted((r.k, r.payload) for r in after.collect()) == expected
    # range-clustered: the same predicate now touches a single file
    # (one range partition owns keys 0..~500)
    assert _files_for(spark, table, pred) <= 2
    # the tmp swap table is gone
    assert not spark.catalog.tableExists(f"{table}__compact_tmp")
    spark.sql(f"DROP TABLE {table}")


def test_compact_zorder_prunes_every_dimension(spark):
    """Multi-key compact interleaves a Morton key: a narrow predicate
    on EITHER clustered column touches a strict subset of files.
    Lexicographic (x, y) clustering would leave y unpruned — every
    file spans the full y range."""
    io = TableIO(spark, fmt="parquet")
    table = "zorder_probe"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # x and y independent and scattered: no file locality pre-compact
    df = spark.range(8000).select(
        F.pmod(F.col("id") * 2654435761, F.lit(1 << 16)).alias("x"),
        F.pmod(F.col("id") * 40503 + 7, F.lit(1 << 16)).alias("y"),
        F.col("id").alias("payload"),
    )
    df.repartition(8).write.format("parquet").saveAsTable(table)

    px = F.col("x") < (1 << 16) // 8
    py = F.col("y") < (1 << 16) // 8
    assert _files_for(spark, table, px) == 8
    assert _files_for(spark, table, py) == 8
    expected = sorted(
        (r.x, r.y, r.payload) for r in spark.read.table(table).collect()
    )

    io.compact(table, ["x", "y"], n_files=8)

    after = spark.read.table(table)
    assert (
        sorted((r.x, r.y, r.payload) for r in after.collect()) == expected
    )
    assert "__zorder_key" not in after.columns
    # each dimension gets ~half the key's bit planes: a 1/8-range
    # predicate on either column must skip most files
    assert _files_for(spark, table, px) <= 4
    assert _files_for(spark, table, py) <= 4
    spark.sql(f"DROP TABLE {table}")
