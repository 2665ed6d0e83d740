"""Hand-verifiable semantics for the corpus-preparation queries
(queries/corpus.py) — the cross-engine oracle covers value parity at
sf0.01; these pin the *semantics* on crafted inputs."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.corpus import (
    q_doc_pack_chunks,
    q_doc_repetition_filter,
    q_domain_mix_sample,
    q_embedding_dim_stats,
    q_filter_attrition_report,
)

SF_SMALL = "/root/testdata/sf0.001"


def _write_documents(spark, tmp_path, rows):
    """Write a documents.parquet a query's ``load`` can read."""
    df = spark.createDataFrame(
        [(i, text, "en", src, len(text)) for i, (src, text) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_pack_chunks_cut_points(spark, tmp_path):
    """Concat-and-chunk: docs of 400/200/600 tokens at ctx=512 → the
    600-token doc starts at cumulative 600 ⇒ chunk 1; first two share
    chunk 0."""
    rows = [
        ("s0", " ".join(["w"] * 400)),
        ("s0", " ".join(["w"] * 200)),
        ("s0", " ".join(["w"] * 600)),
    ]
    sf = _write_documents(spark, tmp_path, rows)
    out = {
        r["chunk_id"]: r
        for r in q_doc_pack_chunks(spark, sf).collect()
    }
    assert set(out) == {0, 1}
    assert out[0]["n_docs"] == 2 and out[0]["chunk_tokens"] == 600
    assert out[0]["first_doc"] == 0 and out[0]["last_doc"] == 1
    assert out[1]["n_docs"] == 1 and out[1]["chunk_tokens"] == 600


def test_repetition_filter_flags_degenerate_doc(spark, tmp_path):
    distinct_text = " ".join(f"t{i}" for i in range(40))
    sf = _write_documents(
        spark, tmp_path, [("s0", "x x x x"), ("s0", distinct_text)]
    )
    out = {r["doc_id"]: r for r in q_doc_repetition_filter(spark, sf).collect()}
    degenerate, clean = out[0], out[1]
    # "x x x x": trigrams ["x x x", "x x x"] -> 1 duplicate of 2
    assert degenerate["n_trigrams"] == 2
    assert degenerate["n_dup_trigrams"] == 1
    assert degenerate["dup_trigram_frac"] == pytest.approx(0.5)
    assert degenerate["top_word_frac"] == pytest.approx(1.0)
    assert degenerate["keep"] == 0
    assert clean["n_dup_trigrams"] == 0
    assert clean["top_word_frac"] == pytest.approx(1 / 40, abs=1e-4)
    assert clean["keep"] == 1


def test_attrition_stages_chain(spark):
    rows = sorted(
        q_filter_attrition_report(spark, SF_SMALL).collect(),
        key=lambda r: r["stage_id"],
    )
    assert [r["stage"] for r in rows] == [
        "ingest", "min_length", "avg_word_len", "distinct_ratio", "stopword",
    ]
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_in"] == prev["n_out"]  # cascade linkage
        assert 0 <= cur["n_out"] <= cur["n_in"]  # monotone attrition
    assert rows[0]["n_in"] == rows[0]["n_out"] > 0


def test_domain_mix_rates_and_budget(spark):
    rows = q_domain_mix_sample(spark, SF_SMALL).collect()
    assert len(rows) > 1
    for r in rows:
        assert 0.0 < r["sample_rate"] <= 1.0
        assert 0 <= r["n_docs_sampled"] <= r["n_docs"]
        assert 0 <= r["tokens_sampled"] <= r["src_tokens"]
    # temperature mixing flattens: smaller sources get HIGHER rates
    by_tokens = sorted(rows, key=lambda r: r["src_tokens"])
    assert by_tokens[0]["sample_rate"] >= by_tokens[-1]["sample_rate"]
    # sampled token total lands near the 25% budget (md5 is uniform)
    total = sum(r["src_tokens"] for r in rows)
    sampled = sum(r["tokens_sampled"] for r in rows)
    assert 0.15 * total < sampled < 0.35 * total


def test_embedding_dim_stats_shape(spark):
    rows = q_embedding_dim_stats(spark, SF_SMALL).collect()
    assert len(rows) == 64
    n = rows[0]["n"]
    for r in rows:
        assert r["n"] == n
        assert r["var_x"] >= 0
        assert r["min_x"] <= r["mean_x"] <= r["max_x"]
