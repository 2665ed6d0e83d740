"""Distributed spherical k-means over an embedding column — the
corpus-scale clustering primitive (semantic dedup buckets, corpus
cartography, IVF list training at full-data quality).

Execution model (the classic Spark pattern, one pass per iteration):

- centroids live on the DRIVER as k×d plan-time constants (bounded:
  k·d doubles, e.g. 256×64 ≈ 130 KB — the same legitimacy class as
  the seeded hyperplanes in ``similarity`` / the IVF sample);
- ASSIGN is a narrow per-row argmax of k dot products — an unrolled
  expression, no shuffle, no Python;
- UPDATE is ONE groupBy(cluster) aggregation with per-dimension
  ``avg`` columns — partial aggregation collapses map-side to at most
  |partitions|·k rows, and only k×(d+1) numbers return to the driver;
- empty clusters keep their previous centroid (standard Lloyd
  degeneracy handling), vectors renormalize each round (spherical
  k-means == cosine objective).

Compared to ``ivf._kmeans`` (numpy on a bounded driver sample, O(1)
cost, graceful quality), this trains on the FULL corpus with
O(iters) distributed passes — use it when centroid quality matters
more than training cost.  Deterministic given the seed: hash-ordered
seeded init, and every reduce is an exact per-dimension mean.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double_array, literal_vector


def _assign_expr(vec: F.Column, centroids: np.ndarray) -> F.Column:
    """Cluster id of the centroid with the largest dot product."""
    scored = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(vec, literal_vector(c), lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("dot"),
                F.lit(i).alias("cluster"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.element_at(F.reverse(F.array_sort(scored)), 1)["cluster"]


def _unit(vec: F.Column) -> F.Column:
    norm = F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return F.transform(vec, lambda x: x / F.greatest(norm, F.lit(1e-12)))


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 10,
    dim: int = 64,
    seed: int = 42,
) -> np.ndarray:
    """Train k unit-norm centroids on the full corpus.  Returns a
    (k, dim) ndarray usable as plan-time constants (``kmeans_assign``,
    IVF list heads, semantic-dedup bucket keys)."""
    v = _unit(as_double_array(vec_col))
    x = df.select(F.col(id_col).alias("__id"), v.alias("__v")).persist()

    # seeded, layout-independent init: the k smallest xxhash64(id)
    # rows (per-partition top-k + driver merge — no global sort)
    init = (
        x.select("__v", F.xxhash64(F.col("__id"), F.lit(seed)).alias("__h"))
        .orderBy("__h")
        .limit(k)
        .select("__v")
        .collect()
    )
    centroids = np.array([r[0] for r in init])
    if len(centroids) < k:
        raise ValueError(f"corpus has fewer than k={k} vectors")

    dim_avgs = [
        F.avg(F.element_at("__v", i + 1)).alias(f"m{i}") for i in range(dim)
    ]
    for _ in range(iters):
        stats = (
            x.withColumn("__c", _assign_expr(F.col("__v"), centroids))
            .groupBy("__c")
            .agg(F.count("*").alias("n"), *dim_avgs)
            .collect()  # k rows × (dim+2) — bounded, by design
        )
        new = centroids.copy()  # empty clusters keep their centroid
        for r in stats:
            m = np.array([r[f"m{i}"] for i in range(dim)])
            new[r["__c"]] = m / max(float(np.linalg.norm(m)), 1e-12)
        if np.allclose(new, centroids, atol=1e-9):
            centroids = new
            break
        centroids = new
    x.unpersist()
    return centroids


def kmeans_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Add the nearest-centroid id — a narrow per-row pass."""
    v = _unit(as_double_array(vec_col))
    return df.withColumn(
        cluster_col, _assign_expr(v, centroids).cast("bigint")
    )
