"""preference_pair_dedup (queries/corpus.py): synthetic end-to-end
coverage of all four hygiene branches (the real documents table only
exercises near-identical + kept), DuckDB replay on the same synthetic
parquet, a partition-accounting property on real data, and plan
gates."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.corpus import (
    SQL_PREFERENCE_PAIR_DEDUP,
    q_preference_pair_dedup,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    """A crafted documents table hitting every hygiene branch:

    pool (en, s): ranks by n_chars DESC pair (1,2)=exact dup,
    (3,4)=near-identical (2-gram Jaccard 4/6), (5,6)=kept, 7=odd tail;
    pool (en, t): a content COPY of (en, s)'s kept pair, so its
    pair_fp repeats and cross-pair dedup drops it ((en,s) sorts
    first)."""
    rows = [
        (1, "alpha beta gamma delta", "en", "s", 100),
        (2, "alpha beta gamma delta", "en", "s", 99),
        (3, "one two three four five six", "en", "s", 80),
        (4, "one two three four five seven", "en", "s", 79),
        (5, "totally different text here", "en", "s", 60),
        (6, "unrelated words entirely elsewhere", "en", "s", 59),
        (7, "odd tail document", "en", "s", 10),
        (8, "totally different text here", "en", "t", 60),
        (9, "unrelated words entirely elsewhere", "en", "t", 59),
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf["n_chars"] = pdf["n_chars"].astype("int64")
    d = tmp_path_factory.mktemp("prefpairs")
    pdf.to_parquet(d / "documents.parquet")
    return str(d)


def test_all_branches_fire_with_expected_values(spark, synth_dir):
    got = {
        (r["lang"], r["source"]): r.asDict()
        for r in q_preference_pair_dedup(spark, synth_dir).collect()
    }
    a = got[("en", "s")]
    assert (
        a["n_pairs"],
        a["n_exact_dup"],
        a["n_near_identical"],
        a["n_dup_pairs"],
        a["n_kept"],
    ) == (3, 1, 1, 0, 1)
    # jacc: 1.0 (exact dup) + 0.666667 (4 shared of 6 shingles) + 0.0
    assert a["sum_jacc_ppm"] == 1000000 + 666667 + 0
    b = got[("en", "t")]
    assert (
        b["n_pairs"],
        b["n_exact_dup"],
        b["n_near_identical"],
        b["n_dup_pairs"],
        b["n_kept"],
    ) == (1, 0, 0, 1, 0)
    assert b["sum_jacc_ppm"] == 0


def test_synthetic_matches_duckdb(spark, synth_dir):
    """The oracle agrees on the crafted corner cases too — not only
    on the driver's organic data where two branches never fire."""
    sdf = (
        q_preference_pair_dedup(spark, synth_dir)
        .toPandas()
        .sort_values(["lang", "source"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{synth_dir}/documents.parquet'"
    )
    odf = (
        con.execute(SQL_PREFERENCE_PAIR_DEDUP)
        .fetchdf()
        .sort_values(["lang", "source"])
        .reset_index(drop=True)
    )
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    for c in cols:
        assert sdf[c].tolist() == odf[c].tolist(), c


def test_counts_partition_pairs_on_real_data(spark):
    """Precedence classes are mutually exclusive and exhaustive:
    every pool row satisfies n_pairs = exact + near + dup + kept."""
    df = q_preference_pair_dedup(spark, SF)
    bad = df.filter(
        F.col("n_pairs")
        != F.col("n_exact_dup")
        + F.col("n_near_identical")
        + F.col("n_dup_pairs")
        + F.col("n_kept")
    )
    assert bad.count() == 0
    assert df.agg(F.sum("n_pairs")).collect()[0][0] > 0


def test_plan_shape(spark):
    """Both windows are PARTITIONED (pool key / pair fingerprint) —
    never a global single-partition sort — and nothing cartesian."""
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = (
        q_preference_pair_dedup(spark, SF)
        ._jdf.queryExecution()
        .explainString(mode)
    )
    assert "hashpartitioning(lang" in plan
    assert "hashpartitioning(pair_fp" in plan
    assert "CartesianProduct" not in plan
