"""k-core decomposition by iterative peeling (engine extension; the
reference has no graph operators — SURVEY 2.x graph family, next to
``pagerank``/``walks``/LPA/triangles).

The k-core of an undirected graph is the maximal subgraph where
every node has degree >= k — the standard density primitive for
community seeding and spam/bot subgraph mining on co-occurrence
graphs.  Batch peeling: drop all nodes with degree < k, re-compute
degrees, repeat; the fixpoint is the core.

Scale: each round is ONE degree aggregate plus TWO semi-joins, all
hash-partitioned on the node key — O(rounds) shuffles total, the
``pagerank`` cost model.  Each round's edge relation is a lazy
``localCheckpoint`` (the ``pagerank`` lineage-truncation cadence) so
round r+1 reads materialized blocks instead of recomputing the whole
chain — at corpus scale the surviving edge set only shrinks, so peak
storage is the input edge list.  Rounds are FIXED (caller-chosen), not
converged-by-driver-loop: a bounded unrolled plan that a SQL oracle
replays exactly; peeling a graph with max degree D needs at most D
rounds but real cascades settle in a handful (profile it first with
``kcore_profile``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _peel_rounds(
    edges: DataFrame, k: int, rounds: int
) -> list[DataFrame]:
    """Edge relations after each peel round (round i at index i).
    ``edges`` must be SYMMETRIC (both directions present) and
    self-loop-free; degrees are then plain src-side counts."""
    out = []
    cur = edges.select("src", "dst")
    for _ in range(rounds):
        keep = (
            cur.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("src")
        )
        # lazy localCheckpoint: the first computation materializes
        # the round and truncates lineage, so round r+1 (and every
        # profile branch) reads stored blocks instead of recomputing
        # the whole peel chain — an O(R^2) blowup otherwise.  Blocks
        # free with the DataFrame; no caller-side unpersist contract.
        nxt = (
            cur.join(keep, "src", "left_semi")
            .join(
                keep.withColumnRenamed("src", "dst"), "dst", "left_semi"
            )
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
        out.append(nxt)
        cur = nxt
    return out


def kcore(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """Nodes of the k-core approximation after ``rounds`` peels, with
    their degree inside the surviving subgraph.  Exact once the peel
    has converged (survivor counts stop changing — see
    ``kcore_profile``)."""
    final = _peel_rounds(edges, k, rounds)[-1]
    return final.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("core_deg")
    )


def kcore_profile(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """Peel trajectory: one row per round with the surviving node and
    edge counts — the convergence diagnostic (and the certifiable
    readout: counts are exact integers)."""
    rels = _peel_rounds(edges, k, rounds)
    parts = [
        r.agg(
            F.lit(i + 1).cast("bigint").alias("round"),
            F.countDistinct("src").cast("bigint").alias("n_nodes"),
            F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        )
        for i, r in enumerate(rels)
    ]
    prof = parts[0]
    for p in parts[1:]:
        prof = prof.unionByName(p)
    return prof
