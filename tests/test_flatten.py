"""Flatten operator: reference-parity semantics (SURVEY P3, L3, L4).

The grain assertions mirror the reference's orders fixture shape
(2 items x 2 metadata entries -> 4 rows per order) without copying its
data: any record with two arrays-of-struct must cross-product under
parity flattening (silver_transformation.py:31-52)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.flatten import flatten


@pytest.fixture(scope="module")
def orders_like(spark):
    return spark.createDataFrame(
        [
            Row(
                order_id="A1",
                customer=Row(cid=7, loc=Row(city="Oslo", zip="0150")),
                items=[
                    Row(item_id="i1", qty=2, price=10.0),
                    Row(item_id="i2", qty=1, price=5.0),
                ],
                meta=[Row(key="src", value="web"), Row(key="tier", value="gold")],
            ),
            Row(
                order_id="A2",
                customer=Row(cid=8, loc=Row(city="Bergen", zip="5003")),
                items=[Row(item_id="i3", qty=4, price=2.5)],
                meta=[],  # L4: inner explode drops this order entirely
            ),
        ]
    )


def test_struct_flatten_prefix_naming(spark, orders_like):
    out = flatten(orders_like)
    # nested struct -> parent_child, recursively
    assert "customer_cid" in out.columns
    assert "customer_loc_city" in out.columns
    assert "items_item_id" in out.columns
    assert not any("." in c for c in out.columns)


def test_parity_cross_product_grain_and_inner_drop(spark, orders_like):
    out = flatten(orders_like)
    rows = out.collect()
    # L3: 2 items x 2 meta = 4 rows for A1; L4: A2 (empty meta) dropped
    assert len(rows) == 4
    assert {r.order_id for r in rows} == {"A1"}


def test_outer_explode_preserves_rows(spark, orders_like):
    out = flatten(orders_like, outer=True)
    by_id = {r.order_id for r in out.collect()}
    assert by_id == {"A1", "A2"}
    a2 = [r for r in out.collect() if r.order_id == "A2"]
    assert len(a2) == 1 and a2[0].meta_key is None


def test_explode_targets_limits_grain(spark, orders_like):
    out = flatten(orders_like, explode_targets={"items"})
    a1 = [r for r in out.collect() if r.order_id == "A1"]
    assert len(a1) == 2  # only items exploded; meta stays an array
    assert isinstance(a1[0].meta, list)


def test_flatten_is_pure_projection(spark, orders_like):
    """No exchange in the plan: flatten must stay narrow (scale
    guarantee — it can never become the shuffle bottleneck)."""
    plan = flatten(orders_like)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_already_flat_is_identity(spark):
    df = spark.createDataFrame([Row(a=1, b="x")])
    assert flatten(df).collect() == df.collect()
