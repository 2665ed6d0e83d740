"""Test-table loaders for the driver's synthetic parquet tables."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ntz_epoch_us(col: str) -> F.Column:
    """Microseconds since epoch of a TIMESTAMP_NTZ column, computed
    timezone-independently (``unix_micros`` requires LTZ and a cast
    would shift by the session timezone — which the driver controls,
    not us).  Field extraction on NTZ is tz-free."""
    return F.expr(
        f"unix_date(cast({col} as date)) * 86400000000"
        f" + hour({col}) * 3600000000"
        f" + minute({col}) * 60000000"
        f" + second({col}) * 1000000"
    ).cast("bigint")


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one synthetic table; column pruning + predicate pushdown
    happen at the parquet scan because callers select/filter on the
    returned (lazy) DataFrame.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's
    TimestampType (microsecond) cannot represent: we read it via the
    ``nanosAsLong`` legacy conf and expose ``ts_us`` (bigint
    microseconds since epoch).  DuckDB truncates the same column to
    microseconds on read, so integer-microsecond arithmetic is the
    exact cross-engine representation (oracles use ``epoch_us(ts)``).
    """
    if table not in TABLES:
        raise ValueError(f"unknown table {table!r}")
    path = os.path.join(sf_dir, f"{table}.parquet")
    if table == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.select(
            "event_id",
            F.expr("ts DIV 1000").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    return spark.read.parquet(path)
