"""SF-scaling probe: time headline queries at sf0.001 / sf0.01 /
sf0.1 in ONE warm session and print the wall-time ratios against the
10x data-growth steps.

The point is evidence, not a benchmark: a query whose cost is
dominated by distributed data passes should scale ~linearly in SF
(ratio ~10 per step, less where fixed per-query overhead dominates
the small SFs); a super-linear ratio flags a shape that would melt
at 100 TB (quadratic candidate growth, per-row interpreter costs,
driver funnels).  Run after code changes that touch the headline
paths; commit the table to BENCH_NOTES when it moves.

Usage: python tools/scaling_probe.py [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries import (  # noqa: E402
    SPARK_QUERIES,
)
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.session import (  # noqa: E402
    get_spark,
)

HEADLINE = [
    "fact_sales",
    "minhash_neardup_md5",
    "dedup_clusters",
    "tfidf_top_terms",
    "embedding_top_pairs_lsh",
    "brand_pagerank",
    "bloom_semijoin_prune",
    "cms_bigram_accuracy",
    "sole_late_supplier",
]
SFS = ["sf0.001", "sf0.01", "sf0.1"]


def main() -> None:
    names = sys.argv[1:] or HEADLINE
    spark = get_spark(
        "scaling_probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # warm: run everything once at the smallest SF so per-plan codegen
    # is compiled before any timed run
    for n in names:
        SPARK_QUERIES[n](spark, f"/root/testdata/{SFS[0]}").write.format(
            "noop"
        ).mode("overwrite").save()
        spark.catalog.clearCache()

    rows = []
    for n in names:
        t = {}
        for sf in SFS:
            t0 = time.time()
            SPARK_QUERIES[n](spark, f"/root/testdata/{sf}").write.format(
                "noop"
            ).mode("overwrite").save()
            t[sf] = time.time() - t0
            spark.catalog.clearCache()
        r1 = t[SFS[1]] / t[SFS[0]]
        r2 = t[SFS[2]] / t[SFS[1]]
        rows.append((n, t[SFS[0]], t[SFS[1]], t[SFS[2]], r1, r2))

    print(f"{'query':28s} {'sf.001':>7s} {'sf.01':>7s} {'sf.1':>7s} "
          f"{'x10^1':>6s} {'x10^2':>6s}")
    for n, a, b, c, r1, r2 in rows:
        print(f"{n:28s} {a:7.2f} {b:7.2f} {c:7.2f} {r1:6.1f} {r2:6.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
