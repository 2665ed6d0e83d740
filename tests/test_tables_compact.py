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


def _fresh_table(spark, table: str):
    """Drop the table AND any orphaned managed location (a failed
    earlier run aborts before its DROP, and LOCATION_ALREADY_EXISTS
    would then cascade into unrelated failures)."""
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}__compact_tmp")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for d in (table, f"{table}__compact_tmp"):
        shutil.rmtree(f"{wh}/{d}", ignore_errors=True)


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
    _fresh_table(spark, table)
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
    _fresh_table(spark, table)
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

    io.compact(table, ["x", "y"], n_files=16)

    after = spark.read.table(table)
    assert (
        sorted((r.x, r.y, r.payload) for r in after.collect()) == expected
    )
    assert "__zorder_key" not in after.columns
    # 16 files = the top 4 interleaved bits (y,x,y,x): a 1/8-range
    # predicate zeroes a column's two top bits -> the 4
    # non-contiguous key stripes owning it; each stripe edge can pull
    # in one extra file because sampled range boundaries aren't
    # bit-aligned -> at most half the files (unclustered: all 16;
    # lexicographic (x,y): y would touch all 16)
    assert _files_for(spark, table, px) <= 8
    assert _files_for(spark, table, py) <= 8
    spark.sql(f"DROP TABLE {table}")


def test_compact_zorder_equidepth_balances_skew(spark):
    """On a skewed column, equi-width buckets collapse (90% of rows
    share one bucket -> one giant range partition); equi-depth
    boundaries from approx_percentile keep file sizes balanced AND
    both dimensions prunable."""
    io = TableIO(spark, fmt="parquet")
    table = "zorder_ed_probe"
    _fresh_table(spark, table)
    # x: 90% of rows in [0, 100), 10% spread over [100, 2^16)
    df = spark.range(8000).select(
        F.when(
            F.col("id") % 10 < 9, F.pmod(F.col("id") * 7919, F.lit(100))
        )
        .otherwise(F.pmod(F.col("id") * 2654435761, F.lit(1 << 16)))
        .alias("x"),
        F.pmod(F.col("id") * 40503 + 7, F.lit(1 << 16)).alias("y"),
        F.col("id").alias("payload"),
    )
    df.repartition(8).write.format("parquet").saveAsTable(table)
    expected = sorted(
        (r.x, r.y, r.payload) for r in spark.read.table(table).collect()
    )

    io.compact(table, ["x", "y"], n_files=16, equidepth=True)

    after = spark.read.table(table)
    assert (
        sorted((r.x, r.y, r.payload) for r in after.collect()) == expected
    )
    # balanced files: no file owns the hot-value bulk (perfect
    # balance would be 1/16 of rows per file)
    sizes = [
        r.n
        for r in after.groupBy(F.input_file_name())
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert max(sizes) < 0.2 * sum(sizes)
    # pruning survives the skew: x<10 is ~9% of ROWS (equi-depth
    # bucket < ~23 of 256 -> top two x bits zero -> the 4
    # non-contiguous key stripes owning it, each stripe edge adding
    # up to one boundary-wobble file -> at most half the files;
    # unclustered data would touch all 16
    assert _files_for(spark, table, F.col("x") < 10) <= 8
    assert (
        _files_for(spark, table, F.col("y") < (1 << 16) // 8) <= 8
    )
    spark.sql(f"DROP TABLE {table}")
