"""SimHash fingerprinting + Hamming-banded near-dup pairs.

SimHash maps a token multiset to a 64-bit fingerprint whose Hamming
distance approximates cosine distance of the token vectors — the
complementary scheme to MinHash (which approximates Jaccard).

Implementation is one SQL expression per document, structured as a
SINGLE pass over the per-token hash array: ``aggregate`` carries a
64-slot bit-sum accumulator updated per token (``zip_with``), and the
finish lambda packs the signs into the 64-bit fingerprint.  The
aggregate *input* (token hashes) is evaluated exactly once per row —
a per-bit outer loop would re-evaluate the tokenize+hash pipeline 64
times per row once CollapseProject inlines it.  No shuffle until pair
generation.  (Built with ``F.expr`` — bit-shift SQL functions accept
column bit counts that the Python wrappers do not.)

Pair generation uses the pigeonhole banding trick: two fingerprints
within Hamming distance d must agree exactly on at least one of d+1
disjoint bit-chunks; join on (chunk_idx, chunk_value), then verify with
``bit_count(xor)``.  Same single-shuffle shape as MinHash LSH.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import nonempty_tokens

#: one pass over thash: per-token bit contributions -> 64 signed sums
#: (zip_with), then the finish lambda packs signs into the fingerprint
_FP_EXPR = """
aggregate(
  thash,
  array_repeat(cast(0 as bigint), 64),
  (acc, h) -> zip_with(
    acc, sequence(0, 63),
    (s, i) -> s + IF((shiftright(h, i) & 1L) = 1L, 1L, -1L)
  ),
  bits -> aggregate(
    zip_with(bits, sequence(0, 63),
             (s, i) -> IF(s > 0, shiftleft(1L, i), 0L)),
    cast(0 as bigint),
    (a, x) -> a + x
  )
)
"""


def simhash(
    df: DataFrame, id_col: str, text_col: str, balance: bool = True
) -> DataFrame:
    """(id, simhash: bigint) — deterministic 64-bit fingerprint.

    ``balance`` spreads the compute-bound fingerprint stage across all
    cores when the upstream scan produced few splits (see
    ``minhash.minhash_near_duplicates``)."""
    if balance:
        df = df.repartition(
            df.sparkSession.sparkContext.defaultParallelism, id_col
        )
    toks = nonempty_tokens(text_col)
    out = df.select(F.col(id_col), toks.alias("toks")).filter(F.size("toks") > 0)
    out = out.withColumn(
        "thash", F.transform(F.col("toks"), lambda t: F.xxhash64(t))
    )
    return out.withColumn("simhash", F.expr(_FP_EXPR)).select(id_col, "simhash")


#: hex digits with bit 3/2/1/0 set — shared by both engines' oracles
_HEX_MASKS = ("89abcdef", "4567cdef", "2367abef", "13579bdf")

#: bit i = sign of the per-token +-1 fold of bit i of md5(token),
#: where bit i lives in hex digit i/4 (mask i%4).  thash_hex must be
#: a materialized array<string> column of md5 hex digests.
_BITS_EXPR = f"""
array_join(
  transform(sequence(0, 63), i ->
    IF(aggregate(
         thash_hex,
         0,
         (acc, h) -> acc + IF(contains(
             element_at(array({', '.join(repr(m) for m in _HEX_MASKS)}),
                        CAST(i % 4 AS INT) + 1),
             substr(h, CAST(i / 4 AS INT) + 1, 1)), 1, -1)
       ) > 0, '1', '0')),
  '')
"""


def simhash_bits_md5(
    df: DataFrame, id_col: str, text_col: str, balance: bool = True
) -> DataFrame:
    """(id, bits) — SimHash as a 64-char '0'/'1' string built from
    md5 hex digits: every step (tokenize, md5, hex-digit bit test,
    sign fold) is engine-agnostic, so a SQL oracle can reproduce the
    fingerprint byte-for-byte (unlike the xxhash64 ``simhash``).
    The md5 array is materialized behind the balancing exchange so
    the 64-bit outer loop reads a column instead of re-hashing."""
    toks = nonempty_tokens(text_col)
    out = (
        df.select(F.col(id_col), toks.alias("toks"))
        .filter(F.size("toks") > 0)
        .withColumn(
            "thash_hex", F.transform(F.col("toks"), lambda t: F.md5(t.cast("binary")))
        )
        .select(F.col(id_col), "thash_hex")
    )
    if balance:
        out = out.repartition(
            df.sparkSession.sparkContext.defaultParallelism, id_col
        )
    return out.select(F.col(id_col), F.expr(_BITS_EXPR).alias("bits"))


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
