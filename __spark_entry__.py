"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``: flagship star-schema fact build at sf0.001.
``queries()``:    every implemented operator from SURVEY.md section 2
                  plus the LLM-pipeline extensions (BASELINE.json).
``oracle_sql()``: DuckDB-equivalent SQL per query; omitted only for
                  ops that are genuinely not SQL-expressible
                  (probabilistic LSH candidate generation, pandas-UDF
                  feature extraction) — those get rows-only checks.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries import (  # noqa: E402
    ORACLE_SQL,
    SPARK_QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return SPARK_QUERIES["fact_sales"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    return dict(ORACLE_SQL)
