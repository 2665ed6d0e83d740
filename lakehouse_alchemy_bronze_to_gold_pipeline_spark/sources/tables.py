"""Table read/write with managed-format fallback (SURVEY S4-S9, S12).

Every reference sink is ``format("delta")`` (``bronze_ingestion.py:86``
etc.).  delta-spark is optional in this environment, so ``TableIO``
picks ``delta`` when available and falls back to ``parquet`` tables in
the session catalog otherwise.  All call-sites go through this class —
no raw ``format("delta")`` strings anywhere else in the engine.

Scale notes baked in here:

- Partitioned sinks take a *derived date* column, never a raw
  timestamp: ``partitionBy("order_timestamp")`` in the reference
  (``gold_transformation.py:157``) creates one directory per distinct
  timestamp string — pathological at scale (SURVEY 4.3-L2).
- ``compact()`` is the OSS fallback for ``OPTIMIZE ... ZORDER BY``
  (``gold_transformation.py:85,160``): ``repartitionByRange`` on the
  cluster keys + sortWithinPartitions gives the same data-skipping
  locality (min/max pruning on sorted parquet row groups) without
  Delta-only commands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import has_delta


class TableIO:
    """Format-agnostic batch/streaming table I/O."""

    def __init__(self, spark: SparkSession, fmt: str | None = None):
        self.spark = spark
        self.fmt = fmt or ("delta" if has_delta() else "parquet")

    # ---------------------------------------------------------- batch
    def read(self, table: str) -> DataFrame:
        """Batch table scan (SURVEY S5)."""
        return self.spark.read.table(table)

    def write_append(self, df: DataFrame, table: str) -> None:
        """Batch append sink (SURVEY S9 — the DQ issue log pattern)."""
        df.write.format(self.fmt).mode("append").saveAsTable(table)

    def write_overwrite(
        self, df: DataFrame, table: str, partition_by: list[str] | None = None
    ) -> None:
        """Batch overwrite with schema evolution (SURVEY S8)."""
        writer = (
            df.write.format(self.fmt)
            .mode("overwrite")
            .option("overwriteSchema", "true")
        )
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.saveAsTable(table)

    # ------------------------------------------------------ streaming
    def read_stream(self, table: str) -> DataFrame:
        """Streaming table source (SURVEY S4).

        Incremental tailing of a managed table.  With delta this is the
        reference's ``readStream.format("delta").table(t)``
        (``silver_transformation.py:78``); parquet tables do not
        support incremental streaming reads, so the fallback streams
        the table's files (exactly-once via the file-source log).
        """
        if self.fmt == "delta":
            return self.spark.readStream.table(table)
        # parquet fallback: stream the table directory as a file source
        location = self._table_location(table)
        schema = self.spark.read.table(table).schema
        return (
            self.spark.readStream.format("parquet").schema(schema).load(location)
        )

    def write_stream(
        self,
        df: DataFrame,
        table: str,
        checkpoint: str,
        partition_by: list[str] | None = None,
        available_now: bool = True,
    ):
        """Streaming append sink (SURVEY S6-S7).

        Uses ``trigger(availableNow=True)`` — the modern replacement
        for the reference's deprecated ``trigger(once=True)``
        (SURVEY 4.3-L9): availableNow respects source rate limits and
        splits a large backlog into multiple micro-batches instead of
        one unbounded batch.
        """
        writer = (
            df.writeStream.format(self.fmt)
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
        )
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.toTable(table)

    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        buckets: int,
        bucket_cols: list[str],
        sort_cols: list[str] | None = None,
    ) -> None:
        """Bucketed (hash-clustered) table write — the co-location
        primitive: two tables bucketed on the same keys with the same
        bucket count join WITHOUT a shuffle (each task reads matching
        bucket files from both sides).  At 100 TB this converts the
        recurring fact ⋈ fact shuffle into a one-time write-side
        cost.  Bucket count is fixed at write time: pick it for the
        TARGET cluster's parallelism, not the writer's."""
        writer = (
            df.write.format(self.fmt)
            .mode("overwrite")
            .bucketBy(buckets, *bucket_cols)
        )
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        writer.saveAsTable(table)

    # ---------------------------------------------------- maintenance
    def compact(
        self,
        table: str,
        cluster_by: list[str],
        n_files: int | None = None,
        equidepth: bool = False,
    ) -> None:
        """``OPTIMIZE t ZORDER BY (cols)`` (SURVEY S12) or fallback.

        Delta path issues the real command.  Parquet path rewrites the
        table clustered on the keys: ONE key -> range-partitioned +
        sorted (lexicographic is optimal for a single dimension);
        SEVERAL keys -> a Morton/Z-order interleave key
        (``operators.zorder``), so file-level min/max pruning works on
        EVERY clustered column, not just the leading one — the
        property ZORDER buys at scale.
        """
        if self.fmt == "delta":
            cols = ", ".join(cluster_by)
            self.spark.sql(f"OPTIMIZE {table} ZORDER BY ({cols})")
            return
        # snapshot FIRST, cluster LAST: a table cannot overwrite
        # itself, so a tmp copy is unavoidable — but the clustered
        # write must be the FINAL one.  (Clustering into tmp and then
        # copying tmp -> table re-packs the carefully ranged files by
        # SIZE, interleaving key ranges and silently undoing the
        # layout the rewrite just paid for.)
        tmp = f"{table}__compact_tmp"
        self.spark.read.table(table).write.format(self.fmt).mode(
            "overwrite"
        ).saveAsTable(tmp)
        df = self.spark.read.table(tmp)
        if len(cluster_by) > 1:
            from ..operators.zorder import zorder_key, zorder_key_equidepth

            mk = zorder_key_equidepth if equidepth else zorder_key
            df, key = mk(df, cluster_by)
            parts = [F.col(key)]
        else:
            key = None
            parts = [F.col(c) for c in cluster_by]
        rewritten = (
            df.repartitionByRange(n_files, *parts)
            if n_files
            else df.repartitionByRange(*parts)
        )
        rewritten = rewritten.sortWithinPartitions(*parts)
        if key:
            rewritten = rewritten.drop(key)
        rewritten.write.format(self.fmt).mode("overwrite").saveAsTable(
            table
        )
        self.spark.sql(f"DROP TABLE {tmp}")

    def _table_location(self, table: str) -> str:
        row = (
            self.spark.sql(f"DESCRIBE TABLE EXTENDED {table}")
            .filter(F.col("col_name") == "Location")
            .select("data_type")
            .first()
        )
        if row is None:
            raise ValueError(f"cannot resolve location of table {table!r}")
        return row[0]
