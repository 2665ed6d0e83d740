"""File-level zone maps (min/max data skipping).

The other half of clustering: ``TableIO.compact`` lays rows out so
each file covers a narrow key range; a zone map RECORDS that range
per file so point/range reads can skip files without opening them —
the Delta/Iceberg file-statistics pattern (and the classic zone-map
idea from Netezza/MonetDB, public literature), built here from
nothing but ``_metadata.file_path`` and a parquet side table.

Contract: the map is derived FROM the data (one aggregate scan), so
it can always be rebuilt; ``pruned_read`` is correctness-equal to a
plain filter (files outside [lo, hi] cannot contain matching rows —
min/max bounds are conservative) and the test asserts both equality
and that fewer files are actually read.

Scale: building costs one scan with a per-file groupBy (map-side
combinable — |files| rows out); reads cost one tiny map lookup plus
a parquet scan over ONLY the surviving files.  On 100 TB with a
clustered layout this is the difference between touching 4 files
and 4 000.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_zone_map(
    spark: SparkSession, table_path: str, cols: list[str]
) -> DataFrame:
    """(file_path, <col>_min, <col>_max ...) — one row per data file."""
    df = spark.read.parquet(table_path)
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return (
        df.select(F.col("_metadata.file_path").alias("file_path"), *cols)
        .groupBy("file_path")
        .agg(*aggs)
    )


def write_zone_map(
    spark: SparkSession, table_path: str, cols: list[str]
) -> str:
    """Materialize the map next to the data (``_zonemap`` dir);
    returns its path.  Rebuild after any rewrite (compact does a
    full rewrite, so rebuild-after-compact is the workflow)."""
    zm_path = os.path.join(table_path.rstrip("/"), "_zonemap")
    build_zone_map(spark, table_path, cols).write.mode(
        "overwrite"
    ).parquet(zm_path)
    return zm_path


def pruned_read(
    spark: SparkSession,
    table_path: str,
    col: str,
    lo,
    hi,
) -> tuple[DataFrame, int, int]:
    """Range read via the zone map: returns (df already filtered to
    [lo, hi], n_files_total, n_files_read).  Files whose [min, max]
    envelope misses the range are never opened; the residual filter
    keeps correctness exact inside surviving files."""
    zm_path = os.path.join(table_path.rstrip("/"), "_zonemap")
    zm = spark.read.parquet(zm_path)
    total = zm.count()
    keep = [
        r["file_path"]
        for r in zm.filter(
            (F.col(f"{col}_max") >= F.lit(lo))
            & (F.col(f"{col}_min") <= F.lit(hi))
        ).collect()
    ]
    if not keep:
        empty = spark.read.parquet(table_path).filter(F.lit(False))
        return empty, total, 0
    df = spark.read.parquet(*keep).filter(
        (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    )
    return df, total, len(keep)
