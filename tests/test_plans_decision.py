"""Physical-plan pins for the decision-support batch
(queries/decision.py): the properties that keep the classic TPC-H
shapes fast at 100 TB — disjunction splitting + pushdown, partitioned
windows, semi-join builds, aggregate-before-join, column pruning —
asserted on ``explain`` output so a refactor that silently degrades
the plan fails CI."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

#: session plan cache — see tests/test_plans.py
_CACHE = None


@pytest.fixture(autouse=True)
def _bind_plan_cache(registry_plans):
    global _CACHE
    _CACHE = registry_plans
    yield


def _formatted(spark, name: str) -> str:
    return _CACHE.formatted(name)


def test_min_cost_supplier_pushdown_and_partitioned_window(spark):
    plan = _formatted(spark, "min_cost_supplier")
    # part predicates reach the part scan
    assert "EqualTo(p_type,LARGE)" in plan
    assert "LessThanOrEqual(p_size,15)" in plan
    assert "EqualTo(r_name,EUROPE)" in plan
    # the correlated-min decorrelation is a PART-PARTITIONED window
    # (a global window would serialize the whole candidate set)
    assert "windowspecdefinition(p_partkey" in plan
    assert "CartesianProduct" not in plan


def test_bracket_disjunction_splits_to_both_scans(spark):
    plan = _formatted(spark, "bracket_disjunction_revenue")
    # Catalyst splits the three-bracket disjunction into a
    # quantity-only OR pushed to the lineitem scan and a
    # brand/size-only OR pushed to the part scan — the predicate
    # never waits for the join
    assert "Or(Or(And(GreaterThanOrEqual(l_quantity,1.0)" in plan
    assert "Or(Or(And(EqualTo(p_brand,Brand#12)" in plan
    assert "CartesianProduct" not in plan


def test_market_share_semijoin_and_pushdown(spark):
    plan = _formatted(spark, "nation_market_share")
    # the ASIA customer restriction is a build-side semi join, never
    # a distinct + inner join
    assert "LeftSemi" in plan
    # PROMO and the order-date range prune at their scans
    assert "EqualTo(p_type,PROMO)" in plan
    assert "GreaterThanOrEqual(o_orderdate,1999-01-01T00:00" in plan


def test_large_order_customers_aggregates_before_join(spark):
    plan = _formatted(spark, "large_order_customers")
    # the HAVING relation aggregates lineitem FIRST (reading only the
    # two needed columns), then joins the small qualifying set
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan
    assert "CartesianProduct" not in plan


def test_shipping_delay_buckets_narrow_scan_single_agg(spark):
    plan = _formatted(spark, "shipping_delay_buckets")
    # conditional counts: one partial+final aggregate pair, and the
    # lineitem scan carries only the join key and ship date
    assert "ReadSchema: struct<l_orderkey:bigint,l_shipdate:timestamp_ntz>" in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("HashAggregate") == 2
    assert "CartesianProduct" not in plan


def test_excess_share_suppliers_year_ranges_pushed(spark):
    plan = _formatted(spark, "excess_share_suppliers")
    # each grain's ship-date window prunes at its own scan
    assert "GreaterThanOrEqual(l_shipdate,2000-01-01T00:00" in plan
    assert "GreaterThanOrEqual(l_shipdate,1999-01-01T00:00" in plan
    assert "CartesianProduct" not in plan
