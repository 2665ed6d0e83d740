"""Embedding similarity search (north-star extension).

Two paths:

- ``topk_bruteforce``: exact one-vs-corpus cosine top-k. The query
  vector rides into the plan as a literal array (broadcast by value);
  scoring is a narrow pass over the corpus + a top-k sort that Spark
  executes as per-partition top-k + driver merge (``Limit`` after
  ``Sort`` -> TakeOrderedAndProject — no full global sort).
- ``knn_join``: small-queries x big-corpus exact knn via broadcast
  nested-loop + window top-k per query.
- ``lsh_topk``: random-hyperplane LSH bucketing (signed projections ->
  bit signature), candidates = signature-prefix buckets, exact rerank
  inside buckets.  The 100 TB path: corpus hashed once (narrow), the
  join shuffles only bucket keys, rerank touches ~corpus/2^bits rows
  per query.

Hyperplanes are generated from a seeded ``numpy`` RNG on the driver
(plan-time constants — deterministic, no data-dependent randomness).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double_array, cosine, literal_vector


def topk_bruteforce(
    corpus: DataFrame,
    query_vec,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k of ``query_vec`` (python sequence) vs corpus."""
    v = as_double_array(vec_col)
    q = literal_vector(query_vec)
    scored = corpus.select(
        F.col(id_col), cosine(v, q).alias("cos_raw")
    )
    return (
        scored.orderBy(F.col("cos_raw").desc(), F.col(id_col))
        .limit(k)
        .select(F.col(id_col), F.round("cos_raw", 6).alias("cosine_sim"))
    )


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact k-nn for each query row: broadcast the (small) query side
    against the corpus, window top-k per query."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double_array(vec_col).alias("qv"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("cv")
    )
    scored = q.crossJoin(c).withColumn(
        "cos_raw", cosine(F.col("qv"), F.col("cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_raw", 6).alias("cosine_sim"),
            "rank",
        )
    )


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float | None = 0.5,
) -> DataFrame:
    """Exact embedding near-dup pairs: (id_a, id_b, cosine >= t);
    ``threshold=None`` returns every pair scored (for top-k callers).

    Vectors are L2-normalized BEFORE the self-join so per-pair work
    is a single dot product.  Brute-force O(n^2/2) — the correctness
    baseline; at 100 TB swap the crossJoin for an LSH-bucketed join
    (``lsh_topk``'s bucketing) and keep this verify predicate."""
    v = as_double_array(vec_col)
    norm = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    unit = df.select(
        F.col(id_col), F.transform(v, lambda x: x / norm).alias("uv")
    )
    # the scoring loop is compute-bound and the probe side inherits
    # the upstream split count (one small file locally -> one task):
    # spread it across every core; the build side broadcasts anyway
    a = unit.repartition(
        df.sparkSession.sparkContext.defaultParallelism, id_col
    ).select(F.col(id_col).alias("id_a"), F.col("uv").alias("ua"))
    b = unit.select(F.col(id_col).alias("id_b"), F.col("uv").alias("ub"))
    dot = F.aggregate(
        F.zip_with(F.col("ua"), F.col("ub"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_sim", F.round(dot, 4))
    )
    if threshold is not None:
        pairs = pairs.filter(F.col("cosine_sim") >= threshold)
    return pairs.select("id_a", "id_b", "cosine_sim")


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def signature_col(vec: F.Column, planes: np.ndarray) -> F.Column:
    """Sign-bit signature: bit i = (vec . plane_i) >= 0."""
    bits = []
    for i, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(vec, literal_vector(plane), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(
            F.when(d >= 0, F.shiftleft(F.lit(1).cast("bigint"), i)).otherwise(
                F.lit(0).cast("bigint")
            )
        )
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_bits: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate knn: candidates share the full LSH signature bucket;
    exact cosine rerank within buckets.  Recall < 1 by construction —
    verify against ``knn_join`` in tests, not a SQL oracle."""
    planes = _hyperplanes(dim, n_bits, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(vec_col).alias("cv"),
    ).withColumn("sig", signature_col(F.col("cv"), planes))
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double_array(vec_col).alias("qv"),
        ).withColumn("sig", signature_col(F.col("qv"), planes))
    )
    scored = q.join(c, "sig").withColumn(
        "cos_raw", cosine(F.col("qv"), F.col("cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_raw", 6).alias("cosine_sim"),
            "rank",
        )
    )
