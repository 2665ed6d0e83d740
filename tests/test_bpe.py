"""BPE trainer/apply vs a direct python reference implementation."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Row

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.bpe import (
    bpe_apply,
    bpe_train,
)


def _ref_train(words: dict[str, int], n_merges: int):
    segs = {w: list(w) for w in words}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for w, toks in segs.items():
            for x, y in zip(toks, toks[1:]):
                counts[(x, y)] += words[w]
        if not counts:
            break
        # max weight, ties to lexicographically smallest pair
        (a, b), weight = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((a, b, weight))
        for w, toks in segs.items():
            segs[w] = _ref_apply_one(toks, a, b)
    return merges, segs


def _ref_apply_one(toks, a, b):
    out = []
    for x in toks:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def test_bpe_train_matches_reference(spark):
    words = {
        "lower": 6, "lowest": 3, "newer": 8, "newest": 5,
        "wider": 2, "new": 10, "low": 7,
    }
    df = spark.createDataFrame(
        [Row(w=w, cnt=c) for w, c in words.items()]
    )
    got = bpe_train(df, n_merges=6)
    ref_merges, ref_segs = _ref_train(words, 6)
    assert got == ref_merges
    applied = {
        r.w: list(r.toks)
        for r in bpe_apply(df, got).collect()
    }
    assert applied == ref_segs


def test_bpe_apply_greedy_left_edge_cases(spark):
    df = spark.createDataFrame(
        [Row(w="aaa"), Row(w="aab"), Row(w="abab"), Row(w="bab")]
    )
    out = {r.w: list(r.toks) for r in
           bpe_apply(df, [("a", "a", 0)]).collect()}
    assert out["aaa"] == ["aa", "a"]
    assert out["aab"] == ["aa", "b"]
    out2 = {r.w: list(r.toks) for r in
            bpe_apply(df, [("a", "b", 0)]).collect()}
    assert out2["abab"] == ["ab", "ab"]
    assert out2["bab"] == ["b", "ab"]
    # chained merges: (a,b) then (ab,ab)
    out3 = {r.w: list(r.toks) for r in
            bpe_apply(df, [("a", "b", 0), ("ab", "ab", 0)]).collect()}
    assert out3["abab"] == ["abab"]
