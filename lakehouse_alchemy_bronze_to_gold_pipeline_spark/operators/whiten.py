"""Embedding whitening (ZCA) — the decorrelation/conditioning pass
retrieval and dedup pipelines run before cosine thresholds are
comparable across corpora (PCA/ZCA whitening of sentence embeddings).

Execution model, the bounded-driver-linear-algebra pattern shared
with ``kmeans`` (k×(d+2) scalars) and ``ivf`` (capped sample):

1. one ``mapInPandas`` pass emits PER-PARTITION sufficient stats
   (n, Σx, Σxxᵀ) — at most |partitions| rows of d²+d+1 doubles
   (d=64 → 33 KB each), the mergeable-moment formulation;
2. the driver reduces them, forms the covariance, and takes a d×d
   ``eigh`` — O(d³) on d=64 is microseconds, NOT a scale term;
3. the whitening matrix ships back as a closure constant into one
   Arrow ``pandas_udf`` matmul — a narrow per-row pass, no shuffle.

Eigenvalues below ``eps`` are clamped (degenerate/constant dims
whiten to zero instead of exploding).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double_array


def covariance_stats(
    df: DataFrame, vec_col: str = "embedding"
) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean (d,), cov (d, d)) via one distributed pass of
    per-partition moment partials + a bounded driver reduce."""

    src = df.select(as_double_array(vec_col).alias("__v"))

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        ss = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["__v"]]
            )
            n += len(x)
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            ss = x.T @ x if ss is None else ss + x.T @ x
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "s": [s.tolist()],
                    "ss": [ss.reshape(-1).tolist()],
                }
            )

    rows = src.mapInPandas(
        partials, "n bigint, s array<double>, ss array<double>"
    ).collect()
    if not rows:
        raise ValueError("covariance over an empty relation")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.asarray(r["ss"]) for r in rows], axis=0)
    d = len(s)
    mean = s / n
    cov = ss.reshape(d, d) / n - np.outer(mean, mean)
    return n, mean, cov


def zca_matrix(cov: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """Symmetric (ZCA) whitening matrix U diag(1/√(λ+eps)) Uᵀ."""
    lam, u = np.linalg.eigh(cov)
    return (u * (1.0 / np.sqrt(np.maximum(lam, 0.0) + eps))) @ u.T


def whiten(
    df: DataFrame,
    mean: np.ndarray,
    w: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "whitened",
) -> DataFrame:
    """Apply (x - mean) @ Wᵀ as one Arrow batch matmul per batch."""
    mu = np.asarray(mean, dtype=np.float64)
    wt = np.asarray(w, dtype=np.float64).T.copy()

    @F.pandas_udf("array<double>")
    def apply(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        out = (x - mu) @ wt
        return pd.Series(list(out))

    return df.withColumn(out_col, apply(as_double_array(vec_col)))
