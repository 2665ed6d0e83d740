"""MinHash + LSH near-duplicate detection (north-star extension;
SURVEY section 7 step 8 — the scale path for fuzzy dedup at 100 TB).

Pipeline (all JVM-side; deterministic given the data):

1. shingle: distinct word n-grams per document
   (``functions.text.word_shingles`` — no explode, grain preserved),
   materialized BEHIND an exchange (see below);
2. signature: ``sig[i] = min over shingles of xxhash64(shingle, i)``
   — one sequence+transform+array_min expression over the
   materialized shingle column;
3. banding: split the signature into ``n_bands`` bands of ``band_rows``
   hashes; hash each band -> (band_idx, band_hash) bucket key;
4. candidate pairs: ONE groupBy shuffle on the bucket key, pairs
   generated inside each (width-capped) bucket list;
5. verify: exact Jaccard on the shingle sets of candidates, filter by
   threshold.

Why the exchange in step 1 matters: Catalyst's CollapseProject merges
adjacent projections, inlining the (expensive) shingle expression into
the signature's outer lambda — which then re-evaluates
tokenize+distinct+shingle ``n_hashes`` times per row (measured ~13x
slowdown).  ``aggregate``-based single-pass folds avoid that but
janino-compile a far bigger method and interpret slower per element.
Repartitioning the *(id, shingles)* relation inserts a pipeline
breaker that materializes the array exactly once — and doubles as the
compute-balancing step: the signature stage is CPU-bound, so it must
be spread across all cores even when the upstream scan produced few
splits (one small file locally; a coalesced upstream on a cluster).

Scale notes: bucket-key skew is the failure mode (a boilerplate shingle
set shared by millions of docs -> quadratic bucket). ``max_bucket``
caps bucket width — oversized buckets are dropped and surfaced in a
side output, mirroring how production near-dup pipelines guard the
LSH join.  Probability a true pair with Jaccard j collides in >=1 of
b bands of r rows: 1 - (1 - j^r)^b (tune b, r to the threshold).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import jaccard, nonempty_tokens, word_shingles

def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 64,
    shingle_n: int = 2,
    balance: bool = True,
) -> DataFrame:
    """(id, shingles, sig) — sig is array<bigint> of length n_hashes.

    ``balance`` repartitions the shingled relation on ``id_col`` to
    the default parallelism: a pipeline breaker that (a) materializes
    the shingle array so the signature lambda reads a column instead
    of re-deriving it per hash index, and (b) spreads the CPU-bound
    hashing across all cores.  Disable only when the input is already
    well-split AND shingles are materialized (e.g. a cached relation).
    """
    toks = nonempty_tokens(text_col)
    shingles = word_shingles(toks, shingle_n)
    out = df.select(F.col(id_col), shingles.alias("shingles")).filter(
        F.size("shingles") > 0
    )
    if balance:
        out = out.repartition(
            df.sparkSession.sparkContext.defaultParallelism, id_col
        )
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.array_min(
            F.transform(F.col("shingles"), lambda s: F.xxhash64(s, i))
        ),
    )
    return out.withColumn("sig", sig)


def band_buckets(
    sigs: DataFrame,
    id_col: str,
    n_bands: int = 16,
    band_rows: int = 4,
) -> DataFrame:
    """(id, band_idx, band_hash) — one row per band per document.
    The materializable LSH index relation: persisted as a table it
    lets NEW documents find near-dup candidates among ALL previously
    seen documents with one equi-join on (band_idx, band_hash) —
    see ``streaming.incremental_dedup``."""
    return sigs.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.struct(
                    b.alias("band_idx"),
                    F.xxhash64(
                        F.slice(F.col("sig"), b * band_rows + 1, band_rows)
                    ).alias("band_hash"),
                ),
            )
        ).alias("bucket"),
    ).select(id_col, "bucket.band_idx", "bucket.band_hash")


def pairs_from_buckets(
    banded: DataFrame,
    id_col: str,
    keys: list[str],
    max_bucket: int = 200,
) -> DataFrame:
    """Distinct candidate (id_a < id_b) pairs sharing >=1 bucket, for
    ANY banded relation ``(id, *keys)`` — the hash-family-agnostic
    pair generator both LSH families share (xxhash band_buckets keys
    on (band_idx, band_hash); the md5 oracle family on a single
    string ``bucket``).

    Buckets are built with ONE groupBy shuffle of (bucket, id) and
    pairs are generated inside each bucket list — no self-join (which
    would shuffle the banded relation twice) and no window pass for
    the skew guard (the bucket-width cap is a size filter on the
    grouped list).  ``collect_list`` per bucket is safe BECAUSE of the
    cap: state per bucket is <= max_bucket ids."""
    buckets = (
        banded.groupBy(*keys)
        .agg(F.collect_list(id_col).alias("ids"))
        # skew guard: drop pathological buckets instead of quadratic
        # pair blowup; singleton buckets generate nothing
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda a, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size("ids")),
                lambda b: F.struct(
                    F.least(a, b).alias("id_a"),
                    F.greatest(a, b).alias("id_b"),
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str,
    n_bands: int = 16,
    band_rows: int = 4,
    max_bucket: int = 200,
) -> DataFrame:
    """Distinct candidate (id_a < id_b) pairs sharing >=1 LSH bucket
    (xxhash family): band the signatures, then generate pairs inside
    each width-capped bucket (``pairs_from_buckets``)."""
    banded = band_buckets(sigs, id_col, n_bands, band_rows)
    return pairs_from_buckets(
        banded, id_col, ["band_idx", "band_hash"], max_bucket
    )


#: Carter-Wegman field: p = 2^31 - 1 (prime).  Base shingle hash x
#: and per-index parameters a_i, b_i all live in [0, p); a_i*x + b_i
#: < 2^62 — no int64 overflow — and the mod WRAPS for every i, which
#: is what makes the 64 derived hashes behave independently (a
#: non-wrapping linear family h1 + i*h2 keeps the same argmin shingle
#: for every i: near-constant signatures, quadratic candidate
#: blowup — measured 1261 candidate pairs vs the expected ~28).
CW_PRIME = 2147483647


def _cw_signature_udf(n_hashes: int):
    """Arrow-vectorized Carter-Wegman signatures: array<bigint> of
    per-shingle base hashes -> array<bigint> of ``n_hashes`` minima
    of (a_i*x + b_i) mod p.  Exact int64 arithmetic — bit-identical
    to the JVM/DuckDB expression form, just evaluated as one numpy
    grid per row instead of n_hashes*|shingles| interpreted lambdas.
    """
    idx = np.arange(1, n_hashes + 1, dtype=np.int64)
    a = (1103515245 * idx + 12345) % CW_PRIME
    b = (69069 * idx + 1) % CW_PRIME

    @F.pandas_udf("array<bigint>")
    def sigs(hx: pd.Series) -> pd.Series:
        out = []
        for v in hx:
            x = np.asarray(v, dtype=np.int64)
            grid = (a[:, None] * x[None, :] + b[:, None]) % CW_PRIME
            out.append(grid.min(axis=1))
        return pd.Series(out)

    return sigs


def md5_minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 64,
    shingle_n: int = 2,
    balance: bool = True,
) -> DataFrame:
    """(id, shingles, sig) under the cross-engine-reproducible
    md5-seeded Carter-Wegman family (NOT persisted — callers that fan
    the relation out persist/checkpoint it themselves).

    Hash family: ``sig_i = min over shingles of (a_i * x + b_i) mod
    (2^31-1)`` with x the shingle md5's top 52 bits folded into the
    field and a_i = (1103515245*(i+1) + 12345) mod p, b_i =
    (69069*(i+1) + 1) mod p (LCG-spread per-index constants, computed
    arithmetically so no literal-array rebuild cost in the HOF
    interpreter).  Same engine-agnostic determinism as hashing
    md5(i||shingle) per (i, shingle) — DuckDB reproduces the integer
    arithmetic exactly — at 1/64th the digest cost."""
    toks = nonempty_tokens(text_col)
    shingles = word_shingles(toks, shingle_n)
    xcol = F.transform(
        shingles,
        lambda s: F.conv(F.substring(F.md5(s.cast("binary")), 1, 13), 16, 10)
        .cast("bigint")
        % F.lit(CW_PRIME),
    )
    sh = df.select(
        F.col(id_col), shingles.alias("shingles"), xcol.alias("hx")
    ).filter(F.size("shingles") > 0)
    if balance:
        sh = sh.repartition(
            df.sparkSession.sparkContext.defaultParallelism, id_col
        )
    # signatures via ONE Arrow batch matmul-style pass: the
    # (n_hashes x |shingles|) affine grid is pure int64 numpy — the
    # interpreted-HOF form of the same arithmetic costs ~40M lambda
    # evaluations at sf0.1 (measured 3.5 s; this path ~1 s), and
    # integer results are bit-identical to the SQL oracle's, so the
    # Arrow hop loses no verifiability (unlike float kernels)
    return sh.withColumn(
        "sig", _cw_signature_udf(n_hashes)(F.col("hx"))
    ).drop("hx")


def md5_band_buckets(
    sigs: DataFrame,
    id_col: str,
    n_bands: int = 16,
    band_rows: int = 4,
) -> DataFrame:
    """(id, bucket) — the md5 family's banded relation: one STRING
    bucket key per band per document ('band_idx:sig,sig,...'), the
    plain-concatenation form a SQL oracle reproduces verbatim.  The
    materializable LSH index relation of the md5 family (xxhash twin:
    ``band_buckets``)."""
    bucket = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_bands - 1)),
            lambda b: F.concat(
                b.cast("string"),
                F.lit(":"),
                F.array_join(
                    F.transform(
                        F.slice(F.col("sig"), b * band_rows + 1, band_rows),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                ),
            ),
        )
    )
    return sigs.select(F.col(id_col), bucket.alias("bucket"))


def md5_signatures_and_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 64,
    shingle_n: int = 2,
    n_bands: int = 16,
    max_bucket: int = 200,
    balance: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """The cross-engine-reproducible MinHash core: returns
    (sigs, pairs) where sigs = (id, shingles, sig) is persisted and
    pairs = distinct candidate (id_a < id_b) from the capped band
    buckets.  Shared by the near-dup query and the sketch-accuracy
    report so both run the IDENTICAL pipeline the DuckDB oracle
    reproduces.  Composition of :func:`md5_minhash_signatures`,
    :func:`md5_band_buckets` and :func:`pairs_from_buckets` — the
    same units the incremental near-dup gate chains per micro-batch
    (streaming/incremental_dedup.py)."""
    band_rows = n_hashes // n_bands
    sigs = md5_minhash_signatures(
        df, id_col, text_col, n_hashes, shingle_n, balance
    ).persist()
    banded = md5_band_buckets(sigs, id_col, n_bands, band_rows)
    pairs = pairs_from_buckets(banded, id_col, ["bucket"], max_bucket)
    return sigs, pairs


def minhash_near_duplicates_md5(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    n_hashes: int = 64,
    shingle_n: int = 2,
    n_bands: int = 16,
    max_bucket: int = 200,
    balance: bool = True,
) -> DataFrame:
    """Cross-engine-reproducible MinHash near-dup pairs.

    Same pipeline as ``minhash_near_duplicates`` but the hash family
    is md5-seeded Carter-Wegman (``md5_signatures_and_pairs``) and
    band bucket keys are plain string concatenations — every step is
    value-identical in any engine with md5 + int64 arithmetic (the
    DuckDB oracle reproduces the whole pipeline), which upgrades
    fuzzy dedup from a rows-only check to a value-checked query at
    essentially fast-path cost (one digest per shingle + one Arrow
    integer kernel); the xxhash64 family remains for symmetry and
    engine-internal use.
    """
    sigs, pairs = md5_signatures_and_pairs(
        df, id_col, text_col, n_hashes, shingle_n, n_bands, max_bucket,
        balance,
    )
    shl = sigs.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    shr = sigs.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        pairs.join(shl, "id_a")
        .join(shr, "id_b")
        .withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_accuracy_md5(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 64,
    shingle_n: int = 2,
    n_bands: int = 16,
    max_bucket: int = 200,
    balance: bool = True,
) -> DataFrame:
    """Sketch-accuracy report over every LSH candidate pair: the
    signature-agreement MinHash ESTIMATE of Jaccard next to the exact
    shingle-set Jaccard and their absolute error — the calibration
    readout that justifies (n_hashes, bands) before a 100 TB dedup
    run spends its budget trusting the sketch.  E[est] = J and
    Var = J(1-J)/n_hashes; the report is the empirical check."""
    sigs, pairs = md5_signatures_and_pairs(
        df, id_col, text_col, n_hashes, shingle_n, n_bands, max_bucket,
        balance,
    )
    left = sigs.select(
        F.col(id_col).alias("id_a"),
        F.col("shingles").alias("sh_a"),
        F.col("sig").alias("sig_a"),
    )
    right = sigs.select(
        F.col(id_col).alias("id_b"),
        F.col("shingles").alias("sh_b"),
        F.col("sig").alias("sig_b"),
    )
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda b: b,
        )
    )
    est = F.round(agree.cast("double") / F.lit(float(n_hashes)), 6)
    exact = F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6)
    return (
        pairs.join(left, "id_a")
        .join(right, "id_b")
        .select(
            "id_a",
            "id_b",
            est.alias("est_jaccard"),
            exact.alias("jaccard"),
            F.round(F.abs(est - exact), 6).alias("abs_err"),
        )
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    n_hashes: int = 64,
    shingle_n: int = 2,
    n_bands: int = 16,
    balance: bool = True,
) -> DataFrame:
    """Verified near-dup pairs: (id_a, id_b, jaccard >= threshold).

    ``balance`` is forwarded to ``minhash_signatures`` (see there).
    """
    band_rows = n_hashes // n_bands
    # The signature relation feeds three consumers (banding + both
    # sides of the verify join); without materialization Catalyst
    # inlines the large signature expression into every branch and
    # recomputes it per consumer.  Persist once — at cluster scale
    # this would be a checkpoint/table write instead.
    sigs = minhash_signatures(
        df, id_col, text_col, n_hashes, shingle_n, balance=balance
    ).persist()
    pairs = lsh_candidate_pairs(sigs, id_col, n_bands, band_rows)
    shl = sigs.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    shr = sigs.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    verified = (
        pairs.join(shl, "id_a")
        .join(shr, "id_b")
        .withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")
