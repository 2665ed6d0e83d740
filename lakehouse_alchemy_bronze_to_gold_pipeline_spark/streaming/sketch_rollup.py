"""Continuously maintained count-min sketch (streaming sketch
rollup).

CMS cells are ADDITIVE: the sketch of a union is the cell-wise sum
of the sketches — the property that makes a frequency sketch
maintainable incrementally where the exact per-item groupBy would
have to re-aggregate history every run.  Each micro-batch computes
its own depth x width grid (``operators.sketch.cms_cells``) and sums
it into the stored cells table; the table never exceeds depth*width
rows no matter how much history has streamed through.

This is the streaming twin of ``cms_bigram_accuracy``'s batch build:
the pytest proves two incremental runs produce EXACTLY the cells a
single batch build over the union produces (not approximately —
cell arithmetic is exact integers; only the estimate's collision
error is probabilistic).

At 100 TB/day the pattern holds: per-batch state is the fixed grid,
merge cost is O(depth*width), and the stored sketch answers point
frequency queries over ALL history at any time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketch import cms_cells
from ..sources.tables import TableIO


def merge_cms_batch(
    batch: DataFrame,
    io: TableIO,
    table: str,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> None:
    """Sum one batch's CMS grid into the stored cells table
    (read -> cell-wise add -> tmp-materialize -> overwrite, the same
    self-overwrite-safe dance as the SCD-1 parquet merge)."""
    spark = batch.sparkSession
    cells = cms_cells(batch, item_col, depth, width)
    if spark.catalog.tableExists(table):
        merged = (
            io.read(table)
            .unionByName(cells)
            .groupBy("r", "cell")
            .agg(F.sum("cnt").alias("cnt"))
        )
        tmp = f"{table}__cms_tmp"
        merged.write.format(io.fmt).mode("overwrite").saveAsTable(tmp)
        io.write_overwrite(spark.read.table(tmp), table)
        spark.sql(f"DROP TABLE {tmp}")
        # the overwrite replaced the files a prior read may have
        # listed; inside foreachBatch `batch.sparkSession` is a
        # MICRO-BATCH CLONE, so refresh through the owning session
        # (io.spark) too or outer readers keep the stale file list
        spark.catalog.refreshTable(table)
        io.spark.catalog.refreshTable(table)
    else:
        io.write_overwrite(cells, table)


def streaming_cms(
    stream: DataFrame,
    io: TableIO,
    table: str,
    item_col: str,
    checkpoint: str,
    depth: int = 4,
    width: int = 256,
):
    """Returns a ready writeStream (call ``.start()``) maintaining
    ``table`` as the CMS of every item ever streamed.  Checkpointing
    makes each source file count exactly once across runs."""

    def _merge(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        merge_cms_batch(batch, io, table, item_col, depth, width)

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
