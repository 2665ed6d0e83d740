"""Plan facts + linting over ``explain('formatted')`` output.

Text-level inspection is deliberate: the formatted explain is a
STABLE public surface (it is what humans read and what the plan
gates in tests/ assert on), while Catalyst's internal node classes
are not.  Everything here is pure string analysis — no execution.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted(df: DataFrame) -> str:
    """The formatted explain string (tree + node details)."""
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def ops(plan: str) -> list[str]:
    """Operator names from the tree section."""
    tree = plan.split("\n\n")[0]
    # children print as ``+- Name ...``; the root prints bare
    # (``Name [qualifiers] (n)``, e.g. ``CartesianProduct Inner (3)``)
    return re.findall(r"[+:]- \*?\s*([A-Za-z]+)", tree) + re.findall(
        r"^([A-Za-z]+)[^\n]*\(\d+\)$", tree, re.M
    )


def shuffles(plan: str) -> int:
    """Shuffle exchanges (broadcast exchanges excluded)."""
    return plan.count("Arguments: hashpartitioning") + plan.count(
        "Arguments: rangepartitioning"
    )


def unpartitioned_windows(plan: str) -> int:
    """Window nodes with no PARTITION BY — single-task funnels.
    A Window node's detail block prints ``Arguments: [exprs],
    [partSpec], [orderSpec]`` with EMPTY specs dropped; a two-group
    form is unpartitioned only when the second group is an ORDER
    spec (always carries a sort direction)."""
    n = 0
    for m in re.finditer(
        r"^\(\d+\) Window[\s\S]*?Arguments: (.*)$", plan, re.M
    ):
        groups = re.findall(r"\[[^\[\]]*\]", m.group(1))
        if len(groups) == 2 and (
            "ASC NULLS" in groups[1] or "DESC NULLS" in groups[1]
        ):
            n += 1
    return n


def report(df: DataFrame) -> dict:
    """Structured plan facts for dashboards/CI."""
    plan = formatted(df)
    o = ops(plan)
    return {
        "shuffles": shuffles(plan),
        "broadcast_joins": o.count("BroadcastHashJoin"),
        "sort_merge_joins": o.count("SortMergeJoin"),
        "cartesian_products": o.count("CartesianProduct")
        + o.count("BroadcastNestedLoopJoin"),
        "scans": o.count("Scan"),
        "arrow_passes": o.count("ArrowEvalPython")
        + o.count("MapInPandas")
        + o.count("FlatMapGroupsInPandas"),
        "windows": o.count("Window"),
        "unpartitioned_windows": unpartitioned_windows(plan),
        "pushed_filters": plan.count("PushedFilters: ["),
        "in_memory_scans": plan.split("\n\n")[0].count("InMemoryTableScan"),
    }


#: finding codes -> human explanation (kept short; the lint caller
#: decides severity/policy)
_RULES = {
    "cartesian": "cartesian/nested-loop join: O(|L|*|R|) — bucket, "
    "band, or broadcast an equi-key instead",
    "unpartitioned-window": "window with no PARTITION BY moves the "
    "whole relation to ONE task",
    "many-shuffles": "plan has an unusually deep shuffle chain — "
    "look for repeated repartitioning or non-colocated joins",
}


def lint(
    df: DataFrame,
    allow_unpartitioned_window: bool = False,
    max_shuffles: int = 8,
) -> list[str]:
    """Anti-pattern findings (empty list = clean).  The checks are
    the 100 TB failure modes the test-suite gates query-by-query,
    exposed as a reusable pre-flight."""
    plan = formatted(df)
    o = ops(plan)
    findings = []
    if "CartesianProduct" in o or "BroadcastNestedLoopJoin" in o:
        findings.append(f"cartesian: {_RULES['cartesian']}")
    if not allow_unpartitioned_window and unpartitioned_windows(plan):
        findings.append(
            f"unpartitioned-window: {_RULES['unpartitioned-window']}"
        )
    if shuffles(plan) > max_shuffles:
        findings.append(
            f"many-shuffles ({shuffles(plan)} > {max_shuffles}): "
            f"{_RULES['many-shuffles']}"
        )
    return findings
