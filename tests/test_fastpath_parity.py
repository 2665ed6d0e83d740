"""Cross-family parity for the probabilistic fast paths (xxhash64)
against their oracle-checked md5 twins, on the driver's real sf0.01
tables.

The md5 variants are value-checked cell-for-cell against DuckDB
(CORRECTNESS `minhash_neardup_md5`, `simhash_bits_md5`); these tests
close the loop for the xxhash64 production paths, whose hash family
DuckDB cannot reproduce:

- MinHash near-dup: the VERIFIED output (candidates re-checked with
  exact Jaccard) must be the same pair set with the same Jaccard
  values in both families — candidate generation may differ, but
  every truly-similar pair must survive either family's banding at
  these (n_bands, band_rows) settings.
- SimHash: a fingerprint is a deterministic function of the token
  multiset, so docs with identical multisets MUST share a fingerprint
  in both families (refinement invariant).  Distinct-but-similar docs
  may collide in one family and not the other — that is the
  similarity-preserving design, not a bug — so extra collisions are
  checked to involve genuinely similar docs, not partition-equality.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.data import load

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"driver testdata absent: {SF_DIR}"
)


def test_minhash_xxhash_pairset_matches_md5(spark):
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.minhash import (
        minhash_near_duplicates,
        minhash_near_duplicates_md5,
    )

    d = load(spark, SF_DIR, "documents")
    fast = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_near_duplicates(
            d, "doc_id", "text", threshold=0.4, shingle_n=2
        ).collect()
    }
    md5 = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_near_duplicates_md5(
            d, "doc_id", "text", threshold=0.4, shingle_n=2
        ).collect()
    }
    assert fast == md5  # same pairs, same exact-Jaccard values
    assert len(fast) > 0  # non-vacuous: the corpus has near-dups


def _groups(rows, key, val):
    by_fp: dict = {}
    for r in rows:
        by_fp.setdefault(r[val], set()).add(r[key])
    return {frozenset(v) for v in by_fp.values()}


def test_simhash_collisions_consistent_with_similarity(spark):
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.simhash import (
        simhash,
        simhash_bits_md5,
    )

    d = load(spark, SF_DIR, "documents")
    fast_rows = simhash(d, "doc_id", "text").collect()
    md5_rows = simhash_bits_md5(d, "doc_id", "text").collect()
    # both families fingerprint the same set of (non-empty) docs
    assert {r.doc_id for r in fast_rows} == {r.doc_id for r in md5_rows}
    fast = _groups(fast_rows, "doc_id", "simhash")
    md5 = _groups(md5_rows, "doc_id", "bits")

    # ground truth: identical token multisets MUST share a fingerprint
    toks = {
        r.doc_id: tuple(r.key)
        for r in d.select(
            "doc_id",
            F.sort_array(
                F.filter(
                    F.split(F.trim(F.lower("text")), r"\s+"),
                    lambda t: t != "",
                )
            ).alias("key"),
        ).collect()
        if r.key
    }
    truth: dict = {}
    for i, key in toks.items():
        truth.setdefault(key, set()).add(i)
    for group in truth.values():
        assert any(group <= g for g in fast)
        assert any(group <= g for g in md5)

    # collisions beyond identical multisets are allowed only between
    # genuinely similar docs (similarity preservation is the point);
    # token-set Jaccard >= 0.5 keeps dissimilar docs provably apart
    def check_extra(groups):
        for g in groups:
            for a in g:
                for b in g:
                    if a < b and toks[a] != toks[b]:
                        sa, sb = set(toks[a]), set(toks[b])
                        j = len(sa & sb) / len(sa | sb)
                        assert j >= 0.5, (a, b, j)

    check_extra(fast)
    check_extra(md5)
