"""The plans package: plan facts + anti-pattern linting."""

from __future__ import annotations

from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.plans import lint, report
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries import SPARK_QUERIES

SF = "/root/testdata/sf0.001"


def test_fact_sales_reports_clean(spark):
    df = SPARK_QUERIES["fact_sales"](spark, SF)
    r = report(df)
    assert r["cartesian_products"] == 0
    assert r["broadcast_joins"] == 3
    assert r["shuffles"] == 0
    assert r["pushed_filters"] >= 1
    assert lint(df) == []


def test_lint_flags_cartesian(spark):
    a = spark.createDataFrame([Row(x=1), Row(x=2)])
    b = spark.createDataFrame([Row(y=1), Row(y=2)])
    findings = lint(a.crossJoin(b))
    assert any(f.startswith("cartesian") for f in findings)


def test_lint_flags_unpartitioned_window(spark):
    df = spark.createDataFrame([Row(x=i) for i in range(5)])
    w = Window.orderBy("x")
    bad = df.withColumn("rn", F.row_number().over(w))
    findings = lint(bad)
    assert any(f.startswith("unpartitioned-window") for f in findings)
    # and the documented opt-out for bounded-by-construction inputs
    assert lint(bad, allow_unpartitioned_window=True) == []


def test_lint_clean_on_partitioned_window(spark):
    df = spark.createDataFrame([Row(k=i % 2, x=i) for i in range(6)])
    w = Window.partitionBy("k").orderBy("x")
    ok = df.withColumn("rn", F.row_number().over(w))
    assert lint(ok) == []
