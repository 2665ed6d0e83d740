"""Product quantization (PQ) — compressed-domain approximate nearest
neighbor, the memory half of the standard IVF-PQ stack (Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011).

A d-dim vector splits into ``m`` subvectors; each subvector is
replaced by the index of its nearest centroid in a per-subspace
codebook of ``k`` entries.  Storage drops from ``d`` floats to ``m``
small ints (64 floats -> 8 bytes at m=8, k<=256), and query-time
asymmetric distance computation (ADC) scores a candidate as the sum
of ``m`` table lookups instead of a d-term dot product.

Execution model, Spark-first:

- TRAIN is per-subspace k-means on a bounded, seeded, hash-ordered
  driver sample (the ``ivf`` train="sample" legitimacy class: O(1)
  cost, layout-independent) — codebooks are (m, k, d/m) plan-time
  constants;
- ENCODE is a narrow per-row pass: ONE Arrow-batched numpy distance
  argmin per subspace per batch (the ``band_signatures_udf``
  rationale — an m*k*sub literal expression tree would be rebuilt
  per element by the HOF interpreter);
- ADC SCORING stays in whole-stage codegen: the per-query lookup
  table is an ``m x k`` literal array-of-arrays (m*k doubles, the
  same bounded-constant class as LSH hyperplanes) and the score is
  ``aggregate(zip_with(codes, lut, (c, row) -> row[c+1]))`` — built-in
  expressions over an 8-element array, no Python in the loop.

At 100 TB the corpus stores ONLY (id, codes) — a ~30x narrower scan
than raw embeddings — queries broadcast with their LUTs, and the
top-k cut is a TakeOrdered, never a global sort.  Recall comes from
composing with IVF (probe lists first) and an exact rerank of the
ADC top candidates; both stages exist in this repo (``operators.ivf``,
``similarity.knn_join``) and compose by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double_array


def _kmeans_np(x: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Plain Lloyd on a driver-resident sample (one subspace)."""
    rng = np.random.default_rng(seed)
    k = min(k, len(x))
    cents = x[rng.choice(len(x), size=k, replace=False)]
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return cents


def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 16,
    iters: int = 8,
    seed: int = 42,
    train_sample: int = 10_000,
    dim: int | None = None,
) -> np.ndarray:
    """Fit per-subspace codebooks on a bounded seeded sample.
    Returns (m, k, dim//m) float64 — plan-time constants.  The sample
    is hash-ordered (TakeOrdered on xxhash64(id, seed)) so a sorted
    or clustered corpus layout cannot bias the codebooks — the same
    construction, for the same reason, as ``ivf.ivf_topk``'s
    train="sample" path."""
    if dim is None:
        dim = len(df.select(as_double_array(vec_col)).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sample = np.array(
        [
            r[0]
            for r in df.select(
                as_double_array(vec_col).alias("__v"),
                F.xxhash64(F.col(id_col), F.lit(seed)).alias("__h"),
            )
            .orderBy("__h")
            .limit(train_sample)
            .select("__v")
            .collect()
        ]
    )
    sub = dim // m
    return np.stack(
        [
            _kmeans_np(
                np.ascontiguousarray(sample[:, s * sub : (s + 1) * sub]),
                k,
                iters,
                seed + s,
            )
            for s in range(m)
        ]
    )


def pq_encode_udf(codebooks: np.ndarray):
    """Arrow-vectorized encoder: ``array<double>`` vector ->
    ``array<int>`` of m codes, one numpy argmin per subspace per
    batch.  Ties (exactly equal subspace distances) take the SMALLER
    code — np.argmin's first-minimum rule, which the SQL oracle pins
    with an ``ORDER BY dist, code`` rank."""
    m, k, sub = codebooks.shape
    cb = np.ascontiguousarray(codebooks)

    @F.pandas_udf("array<int>")
    def encode(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        n = len(x)
        xs = x.reshape(n, m, sub)
        # (n, m, k) squared distances per subspace, argmin -> codes
        d2 = ((xs[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=3)
        codes = d2.argmin(axis=2).astype("int32")
        return pd.Series(list(codes))

    return encode


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """Attach the m-byte PQ code column — the compressed corpus
    representation (store THIS, drop the raw vectors)."""
    return df.withColumn(
        codes_col, pq_encode_udf(codebooks)(as_double_array(vec_col))
    )


def _adc_score(codes_col: str, lut: np.ndarray):
    """Built-in-expression ADC score: sum over subspaces of the
    query's precomputed squared-distance table entry at the stored
    code.  ``lut`` is (m, k) float64; the literal is m*k doubles —
    bounded, and evaluated inside codegen (an 8-element zip_with,
    not a k*d HOF tree)."""
    lut_lit = F.array(
        *[F.array(*[F.lit(float(v)) for v in row]) for row in lut]
    )
    picked = F.zip_with(
        F.col(codes_col),
        lut_lit,
        lambda c, row: F.element_at(row, c + F.lit(1)),
    )
    return F.aggregate(picked, F.lit(0.0), lambda acc, x: acc + x)


def pq_topk(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    codebooks: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k: for each (query_id, vector) in
    ``queries`` (a small driver-side list — the one-vs-corpus shape),
    rank the corpus by summed subspace table lookups.  Returns
    (query_id, neighbor_id, approx_dist, rank), distances rounded to
    6 dp, rank ties broken by neighbor id.

    If ``codes_col`` is given the corpus is assumed pre-encoded
    (the compressed-storage deployment); otherwise codes are computed
    inline with the Arrow encoder."""
    m, kk, sub = codebooks.shape
    if codes_col is None:
        corpus = pq_encode(corpus, codebooks, vec_col, "__codes")
        codes_col = "__codes"
    # ONE corpus scan (and one encode pass) for ALL queries: each row
    # emits an array of (query_id, score) structs — a query-side
    # union would re-execute the scan+encode subtree per query
    per_query = []
    for qid, qvec in queries:
        q = np.asarray(qvec, dtype=np.float64).reshape(m, sub)
        lut = ((q[:, None, :] - codebooks) ** 2).sum(axis=2)  # (m, k)
        per_query.append(
            F.struct(
                F.lit(int(qid)).cast("bigint").alias("query_id"),
                _adc_score(codes_col, lut).alias("__d"),
            )
        )
    scored = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.explode(F.array(*per_query)).alias("__q"),
    ).select("__q.query_id", "neighbor_id", "__q.__d")
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy("__d", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("__d", 6).alias("approx_dist"),
            F.col("rank").cast("bigint").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


def pq_topk_refined(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    codebooks: np.ndarray,
    k: int = 5,
    refine_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str | None = None,
) -> DataFrame:
    """PQ with a REFINE stage (the standard ADC+rerank deployment):
    the compressed-domain scan shortlists ``k * refine_factor``
    candidates per query, then ONLY those rows' raw vectors are
    fetched and reranked by exact squared distance — quantization
    error stops costing recall while the full corpus still never
    leaves the compressed representation.  Returns
    (query_id, neighbor_id, exact_dist, rank)."""
    shortlist = pq_topk(
        corpus, queries, codebooks, k=k * refine_factor,
        id_col=id_col, vec_col=vec_col, codes_col=codes_col,
    ).select("query_id", "neighbor_id")
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(vec_col).alias("__cv"),
    )
    joined = shortlist.join(vecs, "neighbor_id")
    expr = None
    for qid, qvec in queries:
        lit = F.array(*[F.lit(float(x)) for x in qvec])
        d = F.aggregate(
            F.zip_with(F.col("__cv"), lit, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        expr = (
            F.when(F.col("query_id") == int(qid), d)
            if expr is None
            else expr.when(F.col("query_id") == int(qid), d)
        )
    from pyspark.sql import Window

    scored = joined.withColumn("__d", expr)
    w = Window.partitionBy("query_id").orderBy("__d", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("__d", 6).alias("exact_dist"),
            F.col("rank").cast("bigint").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )
