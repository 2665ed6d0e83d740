"""SimHash fingerprinting + Hamming-banded near-dup pairs.

SimHash maps a token multiset to a 64-bit fingerprint whose Hamming
distance approximates cosine distance of the token vectors — the
complementary scheme to MinHash (which approximates Jaccard).

Implementation is one codegen'd SQL expression per document: per-token
64-bit hashes are computed once into an array, then for each bit
position the +1/-1 contributions are folded and the sign becomes the
bit.  No shuffle until pair generation.  (Built with ``F.expr`` —
bit-shift SQL functions accept column bit counts that the Python
wrappers do not.)

Pair generation uses the pigeonhole banding trick: two fingerprints
within Hamming distance d must agree exactly on at least one of d+1
disjoint bit-chunks; join on (chunk_idx, chunk_value), then verify with
``bit_count(xor)``.  Same single-shuffle shape as MinHash LSH.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import nonempty_tokens

#: fold tokens' hash bits -> signed sums -> 64-bit fingerprint
_FP_EXPR = """
aggregate(
  sequence(0, 63),
  cast(0 as bigint),
  (acc, i) -> acc + IF(
     aggregate(
       thash,
       cast(0 as bigint),
       (a, h) -> a + IF((shiftright(h, i) & 1L) = 1L, 1L, -1L)
     ) > 0,
     shiftleft(1L, i),
     0L
  )
)
"""


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash: bigint) — deterministic 64-bit fingerprint."""
    toks = nonempty_tokens(text_col)
    out = df.select(F.col(id_col), toks.alias("toks")).filter(F.size("toks") > 0)
    out = out.withColumn(
        "thash", F.transform(F.col("toks"), lambda t: F.xxhash64(t))
    )
    return out.withColumn("simhash", F.expr(_FP_EXPR)).select(id_col, "simhash")


def simhash_near_duplicates(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """(id_a, id_b, hamming <= max_hamming) via chunk banding."""
    n_chunks = max_hamming + 1
    chunk_bits = 64 // n_chunks
    mask = (1 << chunk_bits) - 1
    fps = simhash(df, id_col, text_col)
    chunk_expr = (
        f"explode(transform(sequence(0, {n_chunks - 1}), "
        f"i -> struct(i as chunk_idx, "
        f"shiftrightunsigned(simhash, i * {chunk_bits}) & "
        f"cast({mask} as bigint) as chunk_val)))"
    )
    chunks = fps.select(
        F.col(id_col), F.col("simhash"), F.expr(chunk_expr).alias("c")
    ).select(id_col, "simhash", "c.chunk_idx", "c.chunk_val")

    left = chunks.select(
        F.col(id_col).alias("id_a"),
        F.col("simhash").alias("fp_a"),
        "chunk_idx",
        "chunk_val",
    )
    right = chunks.select(
        F.col(id_col).alias("id_b"),
        F.col("simhash").alias("fp_b"),
        "chunk_idx",
        "chunk_val",
    )
    pairs = (
        left.join(right, ["chunk_idx", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "fp_a", "fp_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        pairs.withColumn("hamming", hamming.cast("bigint"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
