"""SQL-surface Python UDTFs: table functions callable from
spark.sql, parity-checked against the codegen'd engine primitives."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.functions.text import (
    word_shingles,
    nonempty_tokens,
)
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.functions.udtfs import (
    register_udtfs,
)


def test_word_ngrams_sql_surface(spark):
    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM word_ngrams('The quick  brown fox', 2)"
    ).collect()
    assert [(r["pos"], r["ngram"]) for r in rows] == [
        (0, "the quick"), (1, "quick brown"), (2, "brown fox"),
    ]


def test_word_ngrams_lateral_parity_with_shingles(spark):
    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "a b c a b"), (2, "x y")], "doc_id bigint, text string"
    )
    df.createOrReplaceTempView("t_docs")
    via_udtf = spark.sql(
        """SELECT t.doc_id, g.ngram
           FROM t_docs t, LATERAL word_ngrams(t.text, 2) g"""
    )
    # the DISTINCT set per doc must equal the codegen'd shingle set
    got = {
        (r["doc_id"], r["ngram"])
        for r in via_udtf.distinct().collect()
    }
    want = {
        (r["doc_id"], r["s"])
        for r in df.select(
            "doc_id",
            F.explode(word_shingles(nonempty_tokens("text"), 2)).alias("s"),
        ).collect()
    }
    assert got == want


def test_hash_split_bounds(spark):
    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM hash_split_bounds(0.9, 0.05)"
    ).collect()
    assert [r["split"] for r in rows] == ["train", "val", "test"]
    assert abs(rows[2]["lo"] - 0.95) < 1e-12 and rows[2]["hi"] == 1.0
