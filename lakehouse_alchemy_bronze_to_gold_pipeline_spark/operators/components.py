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

#: Broadcast ceiling for a star round's per-node min relation, in
#: EDGE rows of the round's input (|mins| <= 2|e|; a mins row is two
#: BIGINTs, ~16 B framed).  The working edge relations here are
#: checkpointed RDDs with NO Catalyst stats, so without the hint
#: every star round sort-merge-joins — shuffling AND sorting both
#: sides.  Under the ceiling the join side stays un-shuffled (the ALS
#: ``BROADCAST_FACTOR_ROWS_MAX`` gating idiom); past it the round
#: degrades to the shuffle join instead of OOMing.  Dedup-pair graphs
#: sit far under it by construction (clusters are tiny relative to
#: the corpus — see module docstring); a pathological billion-edge
#: graph takes the shuffle path.
#:
#: 4M edges (r12 ADVICE; was 20M): |mins| can reach 2 x n_e rows
#: (~8M at the ceiling, ~128 MB framed), and a broadcast hash
#: relation's real driver/executor footprint runs several times the
#: framed bytes — the old 20M bound risked OOM just under the ceiling
#: instead of degrading to the shuffle join.
BROADCAST_MINS_EDGE_ROWS_MAX = 4_000_000


def _large_star(e: DataFrame, n_e: int | None = None) -> DataFrame:
    """Connect every strictly-larger neighbor of u to m = min(N(u) ∪ {u}).

    Input/output edges are canonical (u > v).  Output stays canonical:
    emitted (v, m) has v > u's min, and v == m rows are dropped.

    ``n_e`` (the caller's cached edge count) gates a broadcast of the
    per-node min relation: same rows either way, only the join
    strategy moves.
    """
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("u", "mn").alias("m"))
    if n_e is not None and n_e < BROADCAST_MINS_EDGE_ROWS_MAX:
        mins = F.broadcast(mins)
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame, n_e: int | None = None) -> DataFrame:
    """Connect every smaller neighbor of u (and u itself) to the
    minimum small neighbor.  Canonical (u > v) in and out.  ``n_e``
    gates the min-relation broadcast exactly as in
    :func:`_large_star`."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    bmins = mins
    if n_e is not None and n_e < BROADCAST_MINS_EDGE_ROWS_MAX:
        bmins = F.broadcast(mins)
    j = e.join(bmins, "u")
    return (
        j.select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _edge_sets_equal(a: DataFrame, n_a: int, n_b: int, b: DataFrame) -> bool:
    # both relations are distinct + canonical, so equal counts plus an
    # empty one-sided difference proves set equality.  Counts arrive
    # cached from the caller (each checkpointed edge set is counted
    # exactly once, when it is created) so the test costs one job on
    # count mismatch — zero — and one exceptAll job otherwise.
    if n_a != n_b:
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

    # one count per checkpointed edge set, cached across the round
    # boundary: it feeds BOTH the broadcast gate (|mins| <= 2|e|,
    # large-star output <= 2|e| — the x2 factors sit inside the
    # ceiling's margin) and the fixpoint test, which previously
    # re-counted both sides every round.
    n_e = e.count()
    for _ in range(max_iter):
        nxt = _small_star(_large_star(e, n_e), n_e).localCheckpoint(
            eager=True
        )
        n_nxt = nxt.count()
        if _edge_sets_equal(e, n_e, n_nxt, nxt):
            e = nxt
            break
        e, n_e = nxt, n_nxt
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
