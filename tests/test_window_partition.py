"""tools/window_partition_audit.py gate (r10 verdict task 6): no
registry query may plan a Window with an EMPTY partition spec.  Every
deliberately-global window partitions by ``const_bucket`` (constant
value, non-foldable — functions/window.py), so (a) the WindowExec
single-partition warning is retired across the sweep and (b) a NEW
query that adds a genuinely unbounded global window fails here
instead of shipping a 100 TB scale defect."""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.functions.window import (
    const_bucket,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_no_empty_partition_windows_in_registry(registry_plans):
    """Same invariant the standalone tool audits, run in-process over
    the session plan cache (r13, suite wall time): the subprocess
    form rebuilt all 208 query DataFrames in its own Spark session —
    the third full registry build of the suite.  The walker is
    imported FROM the tool, so the checked logic stays the tool's."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "window_partition_audit_under_test",
        os.path.join(ROOT, "tools", "window_partition_audit.py"),
    )
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries import (
        SPARK_QUERIES,
    )

    offenders = {}
    for name in SPARK_QUERIES:
        hits = tool.global_windows(registry_plans.df(name))
        if hits:
            offenders[name] = hits
    assert offenders == {}, offenders


def test_const_bucket_is_constant_and_not_folded(spark):
    """const_bucket must (a) evaluate to the same value for every row
    — one partition, results identical to a global window — and
    (b) SURVIVE optimization: if Catalyst ever learns to fold
    hash(col) % 1, the partition spec goes empty again and the
    warning (and this test) come back."""
    df = spark.range(9)
    w = Window.partitionBy(const_bucket("id")).orderBy("id")
    got = sorted(
        (r["id"], r["rn"])
        for r in df.select(
            "id", F.row_number().over(w).alias("rn")
        ).collect()
    )
    assert got == [(i, i + 1) for i in range(9)]  # one global ordering
    plan = (
        df.select(F.row_number().over(w).alias("rn"))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "windowspecdefinition(" in plan
    # the partition expression survives into the optimized plan
    assert "hash(" in plan
