"""Frequent Directions — the mergeable matrix sketch (Liberty 2013;
Ghashami, Liberty, Phillips, Woodruff 2016, all public literature):
an ell x d matrix B such that AᵀA − BᵀB is positive semi-definite
and ‖AᵀA − BᵀB‖₂ ≤ ‖A‖_F² / ell, maintained in one streaming pass.

This is the 100 TB spectral-analysis path: the exact Gram/covariance
pass (``operators/whiten.covariance_stats``) ships d² doubles per
partition, which is fine at d=64 but O(d²) in the embedding width;
FD ships ell·d per partition (ell ≪ d possible) and — unlike a
sampled Gram — carries a DETERMINISTIC spectral error bound, so
downstream PCA/whitening decisions made on the sketch are certified
by construction.  The engine pairing: ``embedding_covariance_stats``
(exact, oracle-green) is the small-sf accuracy twin; this operator
is the scale form.

Execution model (the bounded-driver-linear-algebra pattern shared
with kmeans/ivf/whiten):

1. one ``mapInPandas`` pass runs the classic 2ell-buffer FD loop per
   partition (numpy SVD on a (2ell, d) buffer — microseconds), and
   emits ONE row per partition: the partition sketch (ell·d doubles),
   its input squared-Frobenius mass, and its row count;
2. the driver merges the |partitions| sketches by concatenate +
   re-shrink (FD is a mergeable summary: the ‖A‖_F²/ell bound
   survives arbitrary merge trees — GLPW16 Thm. 3.1);
3. nothing data-scale is ever collected: the reduce is
   |partitions| x (ell·d + 2) scalars by construction.

Reference parity anchor: the reference repo has no spectral sketch;
this extends its gold-layer aggregate family (gold_transformation.py)
with the training-data-pipeline operator set the engine targets.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions.vectors import as_double_array


def _shrink(buf: np.ndarray, ell: int) -> np.ndarray:
    """One FD shrink: SVD the buffer, subtract sigma_ell² from every
    squared singular value, return the top-(ell) directions (rows
    past ell are exactly zero after the shrink)."""
    _, s, vt = np.linalg.svd(buf, full_matrices=False)
    if len(s) <= ell:
        # rank already fits: exact re-expression in <= ell rows
        # (no shrink, no error added)
        return s[:, None] * vt
    delta = s[ell - 1] ** 2
    s2 = np.sqrt(np.maximum(s**2 - delta, 0.0))
    return (s2[:ell, None] * vt[:ell])


def _fd_stream(rows: Iterator[np.ndarray], ell: int, d: int):
    """Classic 2ell-buffer FD over a stream of (m, d) blocks.
    Returns (B (ell, d), frob_sq, n).

    The buffer is a FIXED (2ell, d) array filled in slices: each
    incoming block is consumed (2ell - fill)-rows at a time, and a
    full buffer is shrunk in place.  This performs the exact same
    sequence of shrink operations as the textbook split/concatenate
    loop (so results are bitwise identical) without re-copying the
    block tail on every step — the naive vstack form is O(B²/ell)
    memcpy in the Arrow batch size."""
    buf = np.zeros((2 * ell, d))
    fill = 0  # rows [0, fill) are live
    mass = 0.0
    n = 0
    for x in rows:
        if x.size == 0:
            continue
        mass += float((x * x).sum())
        n += len(x)
        i = 0
        while i < len(x):
            take = min(2 * ell - fill, len(x) - i)
            buf[fill : fill + take] = x[i : i + take]
            fill += take
            i += take
            if fill == 2 * ell:
                head = _shrink(buf, ell)
                buf[: len(head)] = head
                buf[len(head) :] = 0.0
                fill = len(head)
    live = buf[:fill]
    if fill > ell:
        live = _shrink(live, ell)
    out = np.zeros((ell, d))
    out[: len(live)] = live
    return out, mass, n


def fd_partials(
    df: DataFrame, vec_col: str, ell: int, d: int
) -> DataFrame:
    """Per-partition FD sketches: ONE output row per non-empty
    partition — (sketch ell*d doubles row-major, frob_sq, n)."""
    src = df.select(as_double_array(vec_col).alias("__v"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def blocks():
            for pdf in batches:
                if len(pdf):
                    yield np.asarray(
                        [np.asarray(v, dtype=np.float64) for v in pdf["__v"]]
                    )

        b, mass, n = _fd_stream(blocks(), ell, d)
        if n:
            yield pd.DataFrame(
                {
                    "sketch": [b.reshape(-1).tolist()],
                    "frob_sq": [mass],
                    "n": [n],
                }
            )

    return src.mapInPandas(
        run, "sketch array<double>, frob_sq double, n bigint"
    )


def frequent_directions(
    df: DataFrame, vec_col: str = "embedding", ell: int = 16, d: int = 64
) -> tuple[np.ndarray, float, int]:
    """Full distributed FD: partition pass + bounded driver merge.
    Returns (B (ell, d), frob_sq, n) with the FD guarantee
    0 ⪯ AᵀA − BᵀB ⪯ (frob_sq / ell)·I."""
    parts = fd_partials(df, vec_col, ell, d).collect()  # |partitions| rows
    if not parts:
        return np.zeros((ell, d)), 0.0, 0
    stacked = np.vstack(
        [np.asarray(r["sketch"]).reshape(ell, d) for r in parts]
    )
    merged, _, _ = _fd_stream(iter([stacked]), ell, d)
    return (
        merged,
        float(sum(r["frob_sq"] for r in parts)),
        int(sum(r["n"] for r in parts)),
    )


def fd_merge(sketches: list[np.ndarray], ell: int) -> np.ndarray:
    """Merge pre-built FD sketches (concatenate + shrink) — the
    associativity surface the property tests exercise."""
    if not sketches:
        raise ValueError("nothing to merge")
    d = sketches[0].shape[1]
    merged, _, _ = _fd_stream(iter([np.vstack(sketches)]), ell, d)
    return merged
