"""Byte-pair-encoding tokenizer training + application on Spark.

The real thing, not the pretokenizer regex (``functions.text.
bpe_ish_tokens``): iterative merge learning exactly as BPE trainers
do it — count adjacent symbol pairs over the CURRENT segmentation,
merge the most frequent pair everywhere, repeat — and a greedy-left
apply that reproduces the trained segmentation on any corpus.

Execution model:

- training runs on the WORD-FREQUENCY relation (vocabulary-sized —
  the corpus compresses into (word, count) once, the same leverage
  every BPE trainer uses);
- each round is ONE pair-count aggregation over that relation plus a
  1-row argmax ``collect`` (the bounded-driver class: n_merges
  scalars total) and a narrow per-row fold applying the merge;
- the segmentation column is re-materialized per round via
  ``localCheckpoint`` lineage truncation every few rounds (an
  iterative plan, like pagerank/components).

Greedy-left apply semantics (merge consumes the leftmost eligible
pair first; a merged token can immediately pair with the NEXT
symbol) match the reference python implementation in tests exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chars_expr(word: Column) -> Column:
    """UTF-8 character array of a word (the round-0 segmentation)."""
    return F.filter(F.split(word, ""), lambda c: c != "")


def merge_fold(tokens: Column, a: str, b: str) -> Column:
    """Greedy-left application of ONE merge (a, b) -> a+b over a
    token array: a single O(n) ``aggregate`` fold per row."""
    ab = a + b
    return F.aggregate(
        tokens,
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, F.size(acc)) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _pair_counts(seg: DataFrame) -> DataFrame:
    pair = F.zip_with(
        F.slice("toks", 1, F.size("toks") - 1),
        F.slice("toks", 2, F.size("toks") - 1),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )
    return (
        seg.filter(F.size("toks") >= 2)
        .select(F.explode(pair).alias("p"), "cnt")
        .groupBy("p.a", "p.b")
        .agg(F.sum("cnt").alias("weight"))
    )


def bpe_train(
    words: DataFrame,
    n_merges: int = 8,
    word_col: str = "w",
    count_col: str = "cnt",
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` merges from a (word, count) relation.
    Returns [(a, b, weight)] in training order; ties break to the
    lexicographically smallest pair (deterministic across engines,
    layouts, and reruns)."""
    seg = words.select(
        chars_expr(F.col(word_col)).alias("toks"),
        F.col(count_col).alias("cnt"),
    )
    merges: list[tuple[str, str, int]] = []
    for i in range(n_merges):
        top = (
            _pair_counts(seg)
            .orderBy(F.col("weight").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, weight = top[0]["a"], top[0]["b"], int(top[0]["weight"])
        merges.append((a, b, weight))
        seg = seg.select(merge_fold(F.col("toks"), a, b).alias("toks"), "cnt")
        if (i + 1) % 4 == 0:  # truncate the growing fold lineage
            seg = seg.localCheckpoint(eager=False)
    return merges


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    word_col: str = "w",
    out_col: str = "toks",
) -> DataFrame:
    """Segment ``word_col`` with a trained merge list: chars, then
    one greedy-left fold per merge IN TRAINING ORDER — the exact
    apply rule of BPE tokenizers."""
    toks = chars_expr(F.col(word_col))
    for a, b, _ in merges:
        toks = merge_fold(toks, a, b)
    return df.withColumn(out_col, toks)
