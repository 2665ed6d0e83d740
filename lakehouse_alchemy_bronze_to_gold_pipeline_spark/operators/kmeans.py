"""Distributed spherical k-means over an embedding column — the
corpus-scale clustering primitive (semantic dedup buckets, corpus
cartography, IVF list training at full-data quality).

Execution model (the classic Spark pattern, one pass per iteration):

- centroids live on the DRIVER as k×d plan-time constants (bounded:
  k·d doubles, e.g. 256×64 ≈ 130 KB — the same legitimacy class as
  the seeded hyperplanes in ``similarity`` / the IVF sample);
- ASSIGN is a narrow per-row argmax of k dot products, computed as
  ONE Arrow-batched numpy matmul (``argmax(X @ C.T)``) — no shuffle,
  BLAS instead of interpreted expression evaluation (the
  ``band_signatures_udf`` rationale at similarity.py applies
  verbatim: a k×d literal expression tree is rebuilt per element by
  the HOF interpreter, and measured 3× slower than every other query
  in the registry);
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
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double_array


def _assign_udf(centroids: np.ndarray):
    """Arrow-vectorized nearest-centroid assign: ``array<double>``
    vector -> cluster id via ``argmax(X @ C.T)``, one BLAS matmul per
    batch.  Normalizing the input rows is unnecessary for the ARGMAX
    (a positive per-row scale divides every dot product equally), so
    raw vectors assign identically to their spherical projections.
    Centroids are captured in the closure — k·d doubles shipped once
    per stage, same bounded-constant class as the LSH hyperplanes."""
    ct = np.ascontiguousarray(centroids.T, dtype=np.float64)  # (d, k)

    @F.pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        return pd.Series(np.argmax(m @ ct, axis=1).astype("int32"))

    return assign


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
    allow_fewer: bool = False,
) -> np.ndarray:
    """Train k unit-norm centroids on the full corpus.  Returns a
    (k, dim) ndarray usable as plan-time constants (``kmeans_assign``,
    IVF list heads, semantic-dedup bucket keys).  ``allow_fewer``
    degrades k to the corpus size instead of raising when the corpus
    holds fewer than k vectors (the IVF train="full" contract,
    matching the sample path's clamp)."""
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
        if not allow_fewer:
            raise ValueError(f"corpus has fewer than k={k} vectors")
        if len(centroids) == 0:
            raise ValueError("cannot fit k-means on an empty corpus")

    dim_avgs = [
        F.avg(F.element_at("__v", i + 1)).alias(f"m{i}") for i in range(dim)
    ]
    for _ in range(iters):
        stats = (
            x.withColumn("__c", _assign_udf(centroids)(F.col("__v")))
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
    """Add the nearest-centroid id — a narrow per-row pass.  The
    argmax is scale-invariant, so raw vectors go straight into the
    matmul (no per-row normalization pass)."""
    return df.withColumn(
        cluster_col,
        _assign_udf(centroids)(as_double_array(vec_col)).cast("bigint"),
    )
