"""Deterministic random walks over an edge relation — the corpus
generator for DeepWalk/node2vec-style graph embeddings (walk
sequences are sentences; the skip-gram step is the downstream
trainer's job).

"Random" is md5-derived: at step s of walk w standing on node v, the
next neighbor index is ``md5(w:s:v) mod out_degree(v)`` — a pure
function of position, so walks are reproducible across engines,
reruns, and layouts (the same determinism-for-verification trade as
the md5 hash sampling and the Carter-Wegman MinHash family; swap the
digest for xxhash64 when no oracle is needed).

Execution model: neighbors are ranked ONCE per source (row_number
over dst), then each step is one equi-join of the walk frontier
against that ranked relation on (node, picked_rank) — L steps = L
joins over a co-keyed relation, never a per-row loop; the frontier
carries the sequence as a running string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _pick(walk_id, step: int, node) -> F.Column:
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", walk_id.cast("string"), F.lit(str(step)), node
                ).cast("binary")
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("bigint")
    return h


def deterministic_walks(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_walks: int = 4,
    length: int = 8,
) -> DataFrame:
    """(walk_id, start, seq) — ``n_walks`` walks of ``length`` steps
    from EVERY node with out-edges; ``seq`` is the '>'-joined node
    sequence including the start.  Walks stop early only at sinks
    (nodes without out-edges), which keeps the join an inner one."""
    ranked = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nxt"))
        .distinct()
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("node").orderBy("nxt")
            ),
        )
    )
    ranked = ranked.persist()
    deg = ranked.groupBy("node").agg(F.max("rn").alias("deg")).persist()

    starts = deg.select("node").crossJoin(
        F.broadcast(
            edges.sparkSession.range(n_walks).select(
                F.col("id").alias("w")
            )
        )
    )
    frontier = starts.select(
        F.concat_ws("#", "node", "w").alias("walk_id"),
        F.col("node").alias("start"),
        F.col("node").alias("cur"),
        F.col("node").alias("seq"),
    )
    for step in range(length):
        # degree first, THEN an equi-join on (node, picked rank): the
        # frontier never fans out by avg-degree before filtering
        with_deg = frontier.join(
            deg.select(F.col("node").alias("cur"), "deg"), "cur"
        )
        pick_rank = (
            _pick(F.col("walk_id"), step, F.col("cur")) % F.col("deg") + 1
        ).cast("int")
        stepped = with_deg.withColumn("pr", pick_rank)
        frontier = (
            stepped.join(
                ranked,
                (stepped["cur"] == ranked["node"])
                & (stepped["pr"] == ranked["rn"]),
            )
            .select(
                "walk_id",
                "start",
                F.col("nxt").alias("cur"),
                F.concat_ws(">", "seq", "nxt").alias("seq"),
            )
        )
        if (step + 1) % 4 == 0:
            frontier = frontier.localCheckpoint(eager=False)
    return frontier.select("walk_id", "start", "seq")
