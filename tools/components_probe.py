"""Job-count / wall-time probe for the r12 components.py changes
(r12-VERDICT item 9): measures, on a representative dedup-shaped
graph, the per-round Spark JOB count and wall time of the committed
``connected_components`` (count-gated broadcast of the per-node min
relation + one cached count per checkpointed edge set) against the
r11 layout reconstructed inline (no broadcast gate, both edge sets
re-counted every round by the fixpoint test).

The two variants compute the SAME components (asserted); only job
count and join strategy move.  Results go in OPTIMIZATION_r{N}.md.

Usage:  python tools/components_probe.py [n_clusters] [chain_len]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.components import (  # noqa: E402
    _edge_sets_equal,
    _large_star,
    _small_star,
    connected_components,
)
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.session import (  # noqa: E402
    get_spark,
)


def _graph(spark, n_clusters: int, chain_len: int):
    """Dedup-shaped graph: many small chains (near-dup clusters are
    tiny relative to the corpus; chains are the worst case for
    min-propagation depth)."""
    base = spark.range(n_clusters).select(
        (F.col("id") * 1000).alias("root")
    )
    hops = spark.range(chain_len - 1).select(F.col("id").alias("h"))
    return base.crossJoin(hops).select(
        (F.col("root") + F.col("h")).alias("src"),
        (F.col("root") + F.col("h") + 1).alias("dst"),
    )


def _old_components(edges, src="src", dst="dst", max_iter=30):
    """The r11 loop: no broadcast gate (n_e=None -> SMJ per round on
    stats-less checkpointed inputs) and a fixpoint test that counts
    BOTH sides every round."""
    e0 = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e0.select(F.col("u").alias("id"))
        .union(e0.select(F.col("v").alias("id")))
        .distinct()
    )
    e = e0.filter(F.col("u") != F.col("v"))
    if e.isEmpty():
        return nodes.select("id", F.col("id").alias("component"))
    for _ in range(max_iter):
        nxt = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # r11 fixpoint: re-count both sides each round
        if _edge_sets_equal(e, e.count(), nxt.count(), nxt):
            e = nxt
            break
        e = nxt
    else:
        raise RuntimeError("no convergence")
    stars = (
        e.select(F.col("u").alias("id"), F.col("v").alias("component"))
        .union(e.select(F.col("v").alias("id"), F.col("v").alias("component")))
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )
    return nodes.join(stars, "id", "left").select(
        "id", F.coalesce("component", "id").alias("component")
    )


def _run(spark, tag: str, fn, edges):
    sc = spark.sparkContext
    sc.setJobGroup(tag, tag, interruptOnCancel=False)
    t0 = time.time()
    out = {
        (r["id"], r["component"]) for r in fn(edges).collect()
    }
    wall = time.time() - t0
    sc.setJobGroup("idle", "idle")
    jobs = len(sc.statusTracker().getJobIdsForGroup(tag))
    return out, jobs, round(wall, 2)


def main() -> None:
    n_clusters = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(
        "components_probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    edges = _graph(spark, n_clusters, chain_len).persist()
    n = edges.count()
    print(f"graph: {n} edges, {n_clusters} chains of length {chain_len}")
    for rep in range(2):
        old, jobs_old, wall_old = _run(spark, f"old{rep}", _old_components, edges)
        new, jobs_new, wall_new = _run(
            spark, f"new{rep}", connected_components, edges
        )
        assert old == new, "variants disagree"
        print(
            f"rep{rep}: old jobs={jobs_old} wall={wall_old}s | "
            f"new jobs={jobs_new} wall={wall_new}s (identical output, "
            f"{len(new)} labeled nodes)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
