"""End-to-end medallion pipeline: JSON fixtures -> bronze -> silver,
then an incremental file -> second availableNow run -> checkpointed
dedup across runs (the reference's initial + ``*_new`` fixture flow,
SURVEY section 5)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.catalog import Lakehouse
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.quality import (
    email_rule,
    null_pk_rule,
)
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.sources.json_source import (
    infer_json_schema,
)
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.streaming.pipeline import (
    EntityConfig,
    MedallionPipeline,
)

CUSTOMERS = [
    {"customer_id": 1, "name": "Ada", "email": "ada@ex.com",
     "address": {"city": "oslo", "country": "no"}},
    {"customer_id": 2, "name": "Bo", "email": "not-an-email",
     "address": {"city": "bergen", "country": "no"}},
]
CUSTOMERS_NEW = [
    {"customer_id": 1, "name": "Ada", "email": "ada@ex.com",
     "address": {"city": "oslo", "country": "no"}},  # dup of id 1
    {"customer_id": 3, "name": "Cy", "email": "cy@ex.com",
     "address": {"city": "tromso", "country": "no"}},
]


def write_json(dirpath: str, name: str, records) -> None:
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        json.dump(records, f)


@pytest.fixture()
def pipeline(spark, tmp_path):
    src = str(tmp_path / "src" / "customers")
    write_json(src, "customers.json", CUSTOMERS)
    lh = Lakehouse(spark, str(tmp_path / "wh"), prefix=f"t{os.getpid()}")
    cfg = EntityConfig(
        name="customers",
        source_dir=src,
        primary_keys=["customer_id"],
        quality_rules=[null_pk_rule(["customer_id"]), email_rule("email")],
    )
    pipe = MedallionPipeline(spark, lh, [cfg])
    yield pipe, src, lh
    for layer in ("bronze", "silver", "quality"):
        spark.sql(f"DROP DATABASE IF EXISTS {lh.prefix}_{layer} CASCADE")


def test_bronze_silver_incremental_dedup(spark, pipeline):
    pipe, src, lh = pipeline

    pipe.run_bronze_silver(["customers"])
    bronze = spark.read.table(lh.table("bronze", "customers"))
    assert bronze.count() == 2
    assert set(bronze.columns) == {"payload", "ingest_file", "bronze_ingest_ts"}
    assert bronze.select("ingest_file").first()[0].endswith("customers.json")

    silver = spark.read.table(lh.table("silver", "customers"))
    # struct flattened with prefix naming, dedup keys intact
    assert "address_city" in silver.columns
    assert silver.count() == 2

    # incremental: add *_new file, re-run -> only new rows processed,
    # checkpointed dedup drops the re-sent customer_id=1
    write_json(src, "customers_new.json", CUSTOMERS_NEW)
    pipe.run_bronze_silver(["customers"])
    bronze2 = spark.read.table(lh.table("bronze", "customers"))
    assert bronze2.count() == 4  # bronze is raw append (no dedup)
    silver2 = spark.read.table(lh.table("silver", "customers"))
    ids = sorted(r[0] for r in silver2.select("customer_id").collect())
    assert ids == [1, 2, 3]  # state store deduped id=1 across runs


def test_quality_layer_end_to_end(spark, pipeline):
    pipe, src, lh = pipeline
    pipe.run_bronze_silver(["customers"])
    counts = {r.rule: r.n_violations for r in
              pipe.run_quality("customers", "silver").collect()}
    assert counts["null_pk[customer_id]"] == 0
    assert counts["email[email]"] == 1
    issues = spark.read.table(lh.table("quality", "quality_issues"))
    bad = issues.filter(F.col("rule").startswith("email")).collect()
    assert len(bad) == 1 and bad[0].customer_id == 2


def test_infer_schema_raises_on_empty(spark, tmp_path):
    empty = str(tmp_path / "empty")
    os.makedirs(empty, exist_ok=True)
    with pytest.raises(Exception):
        infer_json_schema(spark, empty)
