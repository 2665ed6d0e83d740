"""The spark.sql surface: registered views over the synthetic tables
answer ANSI SQL identically to the DataFrame-API query twins."""

from __future__ import annotations

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries import SPARK_QUERIES
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.data import (
    register_views,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_sql_view_matches_dataframe_pricing(spark):
    register_views(spark, SF)
    sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= CAST('1998-09-02 00:00:00' AS TIMESTAMP_NTZ)
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )
    api = (
        SPARK_QUERIES["pricing_summary"](spark, SF)
        .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
        .orderBy("l_returnflag", "l_linestatus")
    )
    assert _rows(sql) == _rows(api)


def test_sql_view_events_ts_normalized(spark):
    register_views(spark, SF)
    row = spark.sql(
        "SELECT COUNT(*) AS n, MIN(ts_us) AS lo FROM events"
    ).collect()[0]
    assert row.n > 0 and row.lo > 0  # bigint micros regardless of dtype


def test_sql_join_star_shape(spark):
    register_views(spark, SF)
    got = spark.sql(
        """
        SELECT r_name, COUNT(*) AS n_cust
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
        """
    ).collect()
    assert sum(r.n_cust for r in got) == spark.table("customer").count()
