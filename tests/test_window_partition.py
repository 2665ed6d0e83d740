"""tools/window_partition_audit.py gate (r10 verdict task 6): no
registry query may plan a Window with an EMPTY partition spec.  Every
deliberately-global window partitions by ``const_bucket`` (constant
value, non-foldable — functions/window.py), so (a) the WindowExec
single-partition warning is retired across the sweep and (b) a NEW
query that adds a genuinely unbounded global window fails here
instead of shipping a 100 TB scale defect."""

from __future__ import annotations

import os
import subprocess
import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.functions.window import (
    const_bucket,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_no_empty_partition_windows_in_registry():
    out = subprocess.run(
        [sys.executable, "tools/window_partition_audit.py"],
        cwd=ROOT,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert out.returncode == 0, out.stderr[-800:]
    assert "0 with empty-partition Window nodes" in out.stdout, (
        out.stdout[-1200:]
    )


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
