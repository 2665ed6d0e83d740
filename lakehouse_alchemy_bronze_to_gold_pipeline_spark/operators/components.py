"""Connected components over a pair/edge relation — the clustering
step that turns near-duplicate PAIRS (MinHash/SimHash/embedding LSH
output) into duplicate GROUPS so a corpus can keep one canonical
document per group.  North-star extension (SURVEY §8.3): every
production dedup pipeline ends with exactly this reduction.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public
literature).  Both operations are one groupBy + one equi-join over the
edge relation; the edge set contracts toward min-rooted star forests
in O(log n) rounds INDEPENDENT of graph diameter — the property that
matters at 100 TB, where a naive min-label propagation pays one full
shuffle per hop of the longest duplicate chain.

Scale notes:
- per-iteration state is the (shrinking) edge list itself — no
  driver-side structures; each round is shuffle ∝ |E|;
- lineage is truncated every round with an eager ``localCheckpoint``
  (iterative plans otherwise stack exchanges and overwhelm the
  optimizer); on a real cluster this would be ``checkpoint`` to
  durable storage so executor loss cannot orphan the chain;
- convergence is an edge-set fixpoint test (count + anti-join) — two
  cheap jobs on the contracted relation;
- duplicate clusters are tiny relative to the corpus, so the edge
  relation entering round 2+ is orders of magnitude smaller than the
  document table: the dominant cost stays the pair-mining stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to m = min(N(u) ∪ {u}).

    Input/output edges are canonical (u > v).  Output stays canonical:
    emitted (v, m) has v > u's min, and v == m rows are dropped.
    """
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("u", "mn").alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect every smaller neighbor of u (and u itself) to the
    minimum small neighbor.  Canonical (u > v) in and out."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    j = e.join(mins, "u")
    return (
        j.select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _edge_sets_equal(a: DataFrame, b: DataFrame) -> bool:
    # both relations are distinct + canonical, so equal counts plus an
    # empty one-sided difference proves set equality
    if a.count() != b.count():
        return False
    return a.exceptAll(b).isEmpty()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``, where
    ``component`` is the MINIMUM node id of the node's connected
    component — the natural canonical-document choice for dedup.

    Raises ``RuntimeError`` if the star contraction has not reached a
    fixpoint after ``max_iter`` rounds (paper bound is O(log n); 30
    rounds covers any realistic graph — hitting it means the input is
    pathological, not that more iterations would help silently).
    """
    # Checkpoint the canonicalized edges FIRST (self-loops included),
    # then derive BOTH the node set and the working edge set from the
    # checkpoint: ``nodes`` is consumed after the iteration, and if it
    # referenced the original ``edges`` plan the whole upstream
    # pipeline (for dedup: the full MinHash candidate+verify stage)
    # would be evaluated a second time at final materialization.
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
        if _edge_sets_equal(e, nxt):
            e = nxt
            break
        e = nxt
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )

    # fixpoint is a min-rooted star forest: u -> root edges; roots
    # label themselves; nodes that only appeared in self-loops are
    # singleton components.  The groupBy is a safety net (star
    # property makes labels unique already) and keeps output distinct.
    stars = (
        e.select(F.col("u").alias("id"), F.col("v").alias("component"))
        .union(e.select(F.col("v").alias("id"), F.col("v").alias("component")))
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )
    return nodes.join(stars, "id", "left").select(
        "id", F.coalesce("component", "id").alias("component")
    )
