"""lakehouse_alchemy_bronze_to_gold_pipeline_spark
=================================================

A brand-new, PySpark-native analytics engine with the query and
data-processing capabilities of the reference repo
``sergitkeshelashvili/Lakehouse_Alchemy_Bronze_to_Gold_Pipeline``
(a Databricks-hosted medallion Bronze->Silver->Gold lakehouse pipeline),
re-expressed Spark-first for OSS PySpark and generalized from the
reference's hard-coded, 3-entity pipeline into a reusable, configurable
engine designed for 100 TB scale.

Layout (see SURVEY.md section 7 for the operator -> module mapping):

- ``session``     SparkSession builder (local + cluster profiles, AQE on)
- ``catalog``     warehouse/database/path management (replaces Unity
                  ``CREATE CATALOG / VOLUME`` DDL with portable dirs)
- ``sources``     batch+streaming JSON ingestion, table read/write with
                  format fallback (delta if importable, else parquet)
- ``operators``   relational/dataflow operators: recursive flatten,
                  dedup (exact / minhash-LSH / simhash / jaccard),
                  star-schema builders, data-quality rule engine,
                  similarity search, sessionization
- ``functions``   scalar/column function library: text analysis,
                  vector math, json helpers — all JVM-side
                  ``pyspark.sql.functions`` compositions (UDF-free
                  unless genuinely impossible)
- ``streaming``   medallion pipeline orchestration: availableNow
                  triggers, checkpoints, inter-layer barriers
- ``plans``       plan-inspection utilities (pushdown / broadcast /
                  codegen asserts used by tests and benchmarks)

Design rules (enforced throughout):

1. DataFrame/SQL only — no RDDs; Catalyst + Tungsten pick physical plans.
2. Broadcast small dimensions; pre-aggregate before shuffles; AQE for
   skew; partition by *derived dates*, never raw timestamps
   (fixes reference landmine SURVEY 4.3-L2).
3. Python stays at plan-construction time; row-level work is JVM
   built-ins, or Arrow-batched pandas UDFs where unavoidable.
"""

__version__ = "0.1.0"
