"""JSON ingestion sources (SURVEY S1-S3).

The reference infers a schema from a *batch* read of the landing
directory, then applies that frozen schema to the *streaming* read
(``bronze_ingestion.py:34-42`` / ``:65-70``) because streaming file
sources require an explicit schema.  We keep that infer-once design —
per-batch inference would re-list and re-sample the directory every
micro-batch, which at 100 TB is a correctness *and* cost hazard
(late files could silently widen the schema mid-stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def infer_json_schema(
    spark: SparkSession, path: str, multi_line: bool = True
) -> StructType:
    """Infer a frozen StructType from a batch sample of a JSON dir.

    Mirrors ``infer_schema_from_batch`` (``bronze_ingestion.py:34-42``)
    including its raise-on-empty contract: a schema-less source must
    fail loudly, not start an empty-schema stream.
    """
    df = (
        spark.read.format("json")
        .option("multiLine", str(multi_line).lower())
        .load(path)
    )
    if not df.schema.fields:
        raise ValueError(f"no schema could be inferred from {path!r} (empty dir?)")
    return df.schema


def read_json_batch(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    multi_line: bool = True,
) -> DataFrame:
    """Batch JSON scan (SURVEY S1)."""
    reader = spark.read.format("json").option("multiLine", str(multi_line).lower())
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_json_stream(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    multi_line: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming JSON file source with frozen schema (SURVEY S2).

    ``max_files_per_trigger`` bounds micro-batch size — on a large
    backlog (the 100 TB re-ingest case) unbounded availableNow batches
    are replaced by rate-limited ones so a single micro-batch never
    exceeds executor memory.
    """
    if schema is None:
        schema = infer_json_schema(spark, path, multi_line)
    reader = (
        spark.readStream.format("json")
        .schema(schema)
        .option("multiLine", str(multi_line).lower())
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def with_ingest_metadata(
    df: DataFrame, ts_col: str = "bronze_ingest_ts", file_col: str = "ingest_file"
) -> DataFrame:
    """Wrap the record in a ``payload`` struct + lineage columns.

    Reference: ``bronze_ingestion.py:73-79`` — ``payload`` struct wrap
    (P1), hidden ``_metadata.file_path`` capture (S3), audit timestamp
    (P6).  ``_metadata`` is OSS Spark >= 3.3, not Databricks-only.
    """
    data_cols = [c for c in df.columns if c != "_metadata"]
    return df.select(
        F.struct(*[F.col(c) for c in data_cols]).alias("payload"),
        F.col("_metadata.file_path").alias(file_col),
    ).withColumn(ts_col, F.current_timestamp())
