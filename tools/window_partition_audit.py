"""Find every registry query whose plan contains a Window node with
an EMPTY partition spec (the WindowExec single-partition warning
source, r10 verdict task 6).

Every such window in this repo is deliberately global over a
relation bounded by construction (digit domains, calendar days,
band spines, k-row digests) — this audit exists so that claim is
checked against the actual plans instead of asserted per-site, and
so new queries cannot silently add an UNBOUNDED global window.

Usage:  python tools/window_partition_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries import (  # noqa: E402
    SPARK_QUERIES,
)
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.session import (  # noqa: E402
    get_spark,
)


def global_windows(df) -> list[str]:
    """Window nodes with empty partitionSpec in the ANALYZED logical
    plan (pre-optimization, so foldable partition keys that Catalyst
    would eliminate still count as partitioned-by-constant)."""
    out = []
    stack = [df._jdf.queryExecution().analyzed()]
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() == "Window":
            if node.partitionSpec().isEmpty():
                exprs = node.windowExpressions()
                out.append(
                    ", ".join(
                        exprs.apply(i).name() for i in range(exprs.length())
                    )
                )
        ch = node.children()
        for i in range(ch.length()):
            stack.append(ch.apply(i))
        # subqueries (scalar subquery plans) are not walked: none of
        # the registry queries nest windows inside subqueries
    return out


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark(
        "window_partition_audit",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    hits: dict[str, list[str]] = {}
    errs: dict[str, str] = {}
    for name, fn in SPARK_QUERIES.items():
        try:
            gw = global_windows(fn(spark, sf))
        except Exception as exc:  # plan-time failure: surface, move on
            errs[name] = repr(exc)
            continue
        if gw:
            hits[name] = gw
    print(f"{len(SPARK_QUERIES)} queries; "
          f"{len(hits)} with empty-partition Window nodes")
    for name, cols in sorted(hits.items()):
        print(f"  {name}: {cols}")
    for name, err in errs.items():
        print(f"  ERROR {name}: {err}")
    spark.stop()
    # r11 ADVICE: empty-partition Window hits are exactly the scale
    # defect this tool exists to catch — standalone/CI use of the
    # exit code must fail on them, not only on plan-time errors (the
    # detailed stdout listing stays the diagnostic message).
    return 1 if errs or hits else 0


if __name__ == "__main__":
    raise SystemExit(main())
