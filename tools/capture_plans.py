"""Capture .explain("formatted") for every registered query.

Usage: python tools/capture_plans.py <out_dir> [sf_dir] [name ...]

Writes <out_dir>/<query>.txt per query.  Planning only — no query is
executed through a sink — but note that a few query builders run
bounded eager jobs internally (ALS iterations, k-means updates, FD
partials), so a full capture does execute those stages once.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries import (  # noqa: E402
    SPARK_QUERIES,
)
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or list(SPARK_QUERIES)
    os.makedirs(out_dir, exist_ok=True)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "capture_plans",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    for name in names:
        path = os.path.join(out_dir, f"{name}.txt")
        try:
            df = SPARK_QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            plan = "PLAN CAPTURE FAILED\n" + traceback.format_exc()
        with open(path, "w") as fh:
            fh.write(plan)
        spark.catalog.clearCache()
        print(name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
