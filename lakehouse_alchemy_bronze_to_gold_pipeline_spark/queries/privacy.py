"""Differential-privacy release queries — the privacy layer over
gold aggregates (engine extension; mechanism in ``operators/dp.py``).

Numeric policy (the ``mlaudit`` precedent): every released value is
an exact BIGINT — cents, counts, ppm epsilon ledger entries — and
the Laplace inverse-CDF noise is a shared 256-literal table, so the
DuckDB twin hashes bit-for-bit at full precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dp
from .data import load

#: per-customer contribution bound, cents ($4M ~ p90 of per-customer
#: lifetime spend at every tested SF: clipping is demonstrably ACTIVE
#: — a bound above max() would make the sensitivity claim vacuous)
_CLIP_CENTS = 400_000_000
#: budget split: eps = 1.0 for the sum release, 0.5 for the count
#: release; sequential composition totals 1.5 (ppm ledger in-row)
_EPS_SUM_PPM = 1_000_000
_EPS_CNT_PPM = 500_000
#: Laplace scales b = sensitivity / eps: add/remove one customer
#: moves a clipped nation sum by <= CLIP and a nation count by <= 1
_TBL_SUM = dp.laplace_noise_table(_CLIP_CENTS / (_EPS_SUM_PPM / 1e6))
_TBL_CNT = dp.laplace_noise_table(1.0 / (_EPS_CNT_PPM / 1e6))

#: per-row exact cents idiom shared with mlaudit (decimal-rounds the
#: double price BEFORE scaling so both engines agree bit-for-bit)
_CENTS = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"


def q_dp_revenue_release(spark: SparkSession, sf: str) -> DataFrame:
    """Per-nation customer-spend release under (1.5)-DP: per-customer
    lifetime spend exactly aggregated in cents, clipped at $4M, summed
    per nation, then Laplace-noised (b = clip/eps); the customer COUNT
    per nation is released beside it from a second budget slice.  The
    row carries the full audit ledger — raw vs clipped exact sums (the
    clipping bias is visible, not hidden), the noise actually added,
    and the ppm epsilon accounting — the form a data-governance
    reviewer signs off on.

    Mechanism determinism (retry-idempotence at 1000 executors) and
    the quantized-Laplace honesty caveat: ``operators/dp.py``.

    Scale: one groupBy over orders to customer grain, one narrow
    clip projection, one groupBy to nation grain (25 rows), one
    broadcast join for names, O(groups) literal noise lookups —
    exactly the two shuffles the non-private query already pays."""
    spend = (
        load(spark, sf, "orders")
        .select(F.col("o_custkey"), F.expr(_CENTS).alias("cents"))
        .groupBy("o_custkey")
        .agg(F.sum("cents").cast("bigint").alias("cents"))
    )
    # population = ALL customers (zero-order customers contribute 0
    # but are real units of the count release)
    units = (
        load(spark, sf, "customer")
        .select("c_custkey", "c_nationkey")
        .join(spend, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_nationkey",
            F.coalesce(F.col("cents"), F.lit(0)).alias("cents"),
        )
    )
    agg = units.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(F.when(F.col("cents") > _CLIP_CENTS, 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped"),
        F.sum("cents").cast("bigint").alias("raw_sum_cents"),
        F.sum(F.least(F.col("cents"), F.lit(_CLIP_CENTS)))
        .cast("bigint")
        .alias("exact_sum_cents"),
    )
    named = agg.join(
        F.broadcast(
            load(spark, sf, "nation").select("n_nationkey", "n_name")
        ),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    noise_sum = dp.noise_value(_TBL_SUM, "dpsum", F.col("n_name"))
    noise_cnt = dp.noise_value(_TBL_CNT, "dpcnt", F.col("n_name"))
    return (
        named.select(
            "n_name",
            "n_customers",
            "n_clipped",
            "raw_sum_cents",
            "exact_sum_cents",
            noise_sum.alias("noise_sum_cents"),
            (F.col("exact_sum_cents") + noise_sum)
            .cast("bigint")
            .alias("noisy_sum_cents"),
            noise_cnt.alias("noise_count"),
            (F.col("n_customers") + noise_cnt)
            .cast("bigint")
            .alias("noisy_count"),
            F.lit(_CLIP_CENTS).cast("bigint").alias("clip_cents"),
            F.lit(_EPS_SUM_PPM).cast("bigint").alias("eps_sum_ppm"),
            F.lit(_EPS_CNT_PPM).cast("bigint").alias("eps_count_ppm"),
            F.lit(_EPS_SUM_PPM + _EPS_CNT_PPM)
            .cast("bigint")
            .alias("eps_total_ppm"),
        )
        .orderBy("n_name")
    )


SQL_DP_REVENUE_RELEASE = f"""
WITH spend AS (
  SELECT o_custkey, CAST(SUM({_CENTS}) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
units AS (
  SELECT c.c_nationkey, COALESCE(s.cents, 0) AS cents
  FROM customer c LEFT JOIN spend s ON c.c_custkey = s.o_custkey
),
agg AS (
  SELECT c_nationkey,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(CASE WHEN cents > {_CLIP_CENTS} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_clipped,
         CAST(SUM(cents) AS BIGINT) AS raw_sum_cents,
         CAST(SUM(LEAST(cents, {_CLIP_CENTS})) AS BIGINT)
           AS exact_sum_cents
  FROM units GROUP BY c_nationkey
)
SELECT n.n_name, a.n_customers, a.n_clipped, a.raw_sum_cents,
       a.exact_sum_cents,
       {dp.noise_value_sql(_TBL_SUM, 'dpsum', 'n.n_name')}
         AS noise_sum_cents,
       CAST(a.exact_sum_cents
            + {dp.noise_value_sql(_TBL_SUM, 'dpsum', 'n.n_name')}
            AS BIGINT) AS noisy_sum_cents,
       {dp.noise_value_sql(_TBL_CNT, 'dpcnt', 'n.n_name')}
         AS noise_count,
       CAST(a.n_customers
            + {dp.noise_value_sql(_TBL_CNT, 'dpcnt', 'n.n_name')}
            AS BIGINT) AS noisy_count,
       CAST({_CLIP_CENTS} AS BIGINT) AS clip_cents,
       CAST({_EPS_SUM_PPM} AS BIGINT) AS eps_sum_ppm,
       CAST({_EPS_CNT_PPM} AS BIGINT) AS eps_count_ppm,
       CAST({_EPS_SUM_PPM + _EPS_CNT_PPM} AS BIGINT) AS eps_total_ppm
FROM agg a JOIN nation n ON a.c_nationkey = n.n_nationkey
ORDER BY n.n_name
"""


SPARK_QUERIES = {
    "dp_revenue_release": q_dp_revenue_release,
}

ORACLE_SQL = {
    "dp_revenue_release": SQL_DP_REVENUE_RELEASE,
}
