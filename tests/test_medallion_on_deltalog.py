"""Capstone integration #2: the REFERENCE's medallion architecture
end-to-end on the from-scratch Delta-protocol path — streaming JSON
→ Bronze DeltaLogTable → (CDC stream) → flattened+deduped Silver →
star-schema Gold with an OPTIMIZE ZORDER maintenance pass — i.e.
bronze_ingestion.py → silver_transformation.py →
gold_transformation.py re-expressed over `sources/deltalog.py` +
`sources/delta_stream.py`, with exactly-once hops and protocol time
travel at every layer.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.dedup import (
    dedup_keep_latest,
)
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.flatten import (
    flatten,
)
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.sources.delta_stream import (
    register,
)
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.sources.deltalog import (
    DeltaLogTable,
)


def _write_json(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / "batch.json", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_medallion_bronze_silver_gold_on_delta_protocol(spark, tmp_path):
    register(spark)

    # ---- raw zone: two entities of nested JSON (orders carry a
    # nested customer struct + line-item array, like the reference's)
    _write_json(tmp_path / "raw" / "orders", [
        {"order_id": "O1", "customer": {"id": 1, "city": "rome"},
         "items": [{"sku": "P1", "qty": 2, "price": 10.0},
                   {"sku": "P2", "qty": 1, "price": 5.0}],
         "ts": "2023-08-01T10:00:00Z"},
        {"order_id": "O1", "customer": {"id": 1, "city": "rome"},
         "items": [{"sku": "P1", "qty": 2, "price": 10.0}],
         "ts": "2023-08-01T11:00:00Z"},       # later duplicate wins
        {"order_id": "O2", "customer": {"id": 2, "city": "oslo"},
         "items": [{"sku": "P2", "qty": 3, "price": 5.0}],
         "ts": "2023-08-02T09:00:00Z"},
    ])

    # ---- Bronze: batch-infer the JSON, wrap payload lineage-style,
    # land in a protocol table (bronze_ingestion.py:73-83 shape)
    raw = spark.read.json(str(tmp_path / "raw" / "orders"))
    bronze_tbl = DeltaLogTable(spark, str(tmp_path / "bronze_orders"))
    bronze_tbl.write(
        raw.withColumn("bronze_ingest_ts", F.current_timestamp()),
        "append",
    )
    assert bronze_tbl.read().count() == 3

    # ---- Silver: CDC-stream the bronze table, flatten + dedup by
    # (order_id, keep latest ts), land exactly-once in silver
    silver_tbl = DeltaLogTable(spark, str(tmp_path / "silver_orders"))

    def to_silver(batch, batch_id):
        flat = flatten(batch.drop("bronze_ingest_ts"))
        deduped = dedup_keep_latest(
            flat, keys=["order_id"], order_by="ts",
            tiebreak=["items_sku"],
        )
        silver_tbl.write_batch_exactly_once(
            deduped, "silver-orders", batch_id
        )

    q = (
        spark.readStream.format("delta_log_cdc")
        .option("path", bronze_tbl.path)
        .load()
        .writeStream.foreachBatch(to_silver)
        .option("checkpointLocation", str(tmp_path / "silver_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    silver = silver_tbl.read()
    # flattened columns exist, array exploded to line grain, duplicate
    # order collapsed keep-latest (O1 keeps the 11:00 single-item row)
    assert "customer_city" in silver.columns
    rows = {(r["order_id"], r["items_sku"]) for r in silver.collect()}
    assert rows == {("O1", "P1"), ("O2", "P2")}

    # ---- Gold: star fact at line grain + a dim, OPTIMIZE ZORDER
    fact = silver.select(
        "order_id",
        F.col("customer_id").alias("customer_key"),
        F.col("items_sku").alias("part_key"),
        (F.col("items_qty") * F.col("items_price")).alias("line_total"),
    )
    gold_tbl = DeltaLogTable(spark, str(tmp_path / "gold_fact"))
    gold_tbl.write(fact, "append")
    gold_tbl.optimize(n_files=1, zorder_by=["customer_key"])
    got = gold_tbl.read().orderBy("order_id").collect()
    assert [(r["order_id"], r["line_total"]) for r in got] == [
        ("O1", 20.0), ("O2", 15.0),
    ]
    assert gold_tbl.history()[-1]["operation"] == "OPTIMIZE"

    # ---- incremental day 2: new bronze commit flows through the SAME
    # silver checkpoint; already-seen orders don't duplicate
    _write_json(tmp_path / "raw" / "orders2", [
        {"order_id": "O3", "customer": {"id": 1, "city": "rome"},
         "items": [{"sku": "P3", "qty": 1, "price": 7.0}],
         "ts": "2023-08-03T08:00:00Z"},
    ])
    day2 = spark.read.json(str(tmp_path / "raw" / "orders2"))
    bronze_tbl.write(
        day2.withColumn("bronze_ingest_ts", F.current_timestamp()),
        "append",
    )
    q2 = (
        spark.readStream.format("delta_log_cdc")
        .option("path", bronze_tbl.path)
        .load()
        .writeStream.foreachBatch(to_silver)
        .option("checkpointLocation", str(tmp_path / "silver_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert {r["order_id"] for r in silver_tbl.read().collect()} == {
        "O1", "O2", "O3",
    }
    # protocol time travel: silver v0 predates day 2
    assert {r["order_id"] for r in silver_tbl.read(0).collect()} == {
        "O1", "O2",
    }
