"""Delimited-text (CSV/TSV) ingestion sources — source-format breadth
beyond the reference's JSON landing zone (bronze_ingestion.py:34-42),
with the same infer-once design: schema is frozen from a batch sample
and applied to the streaming read, because per-micro-batch inference
re-lists and re-samples the directory and can silently widen the
schema mid-stream at scale.

CSV-specific hazards handled here rather than at call sites:

- ``header`` consumed per file (a streaming source sees many files);
- ``mode=FAILFAST`` by default — a malformed row in a 100 TB ingest
  should stop the pipeline, not silently null-fill (PERMISSIVE is the
  Spark default and the classic silent-corruption trap);
- explicit ``delimiter`` so TSV is the same code path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def infer_csv_schema(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    header: bool = True,
) -> StructType:
    """Frozen StructType from a batch sample; raises on empty source
    (a schema-less source must fail loudly, not start an empty-schema
    stream — same contract as ``infer_json_schema``)."""
    try:
        df = (
            spark.read.format("csv")
            .option("header", str(header).lower())
            .option("inferSchema", "true")
            .option("delimiter", delimiter)
            .load(path)
        )
        fields = df.schema.fields
    except Exception as e:  # Spark raises its own error on empty dirs
        raise ValueError(
            f"no schema could be inferred from {path!r} (empty dir?)"
        ) from e
    if not fields:
        raise ValueError(f"no schema could be inferred from {path!r} (empty dir?)")
    return df.schema


def read_csv_batch(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    delimiter: str = ",",
    header: bool = True,
    mode: str = "FAILFAST",
) -> DataFrame:
    """Batch delimited scan with frozen-or-inferred schema."""
    reader = (
        spark.read.format("csv")
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", mode)
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.load(path)


def read_csv_stream(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    delimiter: str = ",",
    header: bool = True,
    mode: str = "FAILFAST",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming delimited file source with frozen schema;
    ``max_files_per_trigger`` rate-limits backlog micro-batches (same
    rationale as ``read_json_stream``)."""
    if schema is None:
        schema = infer_csv_schema(spark, path, delimiter, header)
    reader = (
        spark.readStream.format("csv")
        .schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", mode)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)
