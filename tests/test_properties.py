"""Property-based tests (hypothesis): engine operators vs naive
in-Python reference implementations on adversarial small inputs.
One shared SparkSession; deadlines disabled (JVM warmup skews the
first example)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.asof import asof_join
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.rangejoin import (
    band_join,
)

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ts_strategy = st.integers(min_value=0, max_value=50)
key_strategy = st.integers(min_value=0, max_value=2)


@settings(**SETTINGS)
@given(
    left=st.lists(st.tuples(key_strategy, ts_strategy), min_size=1, max_size=8),
    right=st.lists(st.tuples(key_strategy, ts_strategy), min_size=0, max_size=8),
)
def test_asof_join_matches_naive(spark, left, right):
    ldf = spark.createDataFrame(
        [Row(eid=i, k=k, ts=t) for i, (k, t) in enumerate(left)]
    )
    rdf = spark.createDataFrame(
        [Row(k=k, rts=t, val=i) for i, (k, t) in enumerate(right)],
        schema="k bigint, rts bigint, val bigint",
    )
    got = {
        r.eid: r.val
        for r in asof_join(
            ldf, rdf, "k", "k", "ts", "rts", ["val"], tiebreak="val"
        ).collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [
            (rt, v) for j, (rk, rt) in enumerate(right)
            if rk == k and rt <= t
            for v in [j]
        ]
        expected = max(cands)[1] if cands else None
        assert got[i] == expected, (i, k, t, cands)


@settings(**SETTINGS)
@given(
    left=st.lists(ts_strategy, min_size=1, max_size=8),
    right=st.lists(ts_strategy, min_size=0, max_size=8),
    lower=st.integers(min_value=-10, max_value=10),
    width=st.integers(min_value=1, max_value=15),
)
def test_band_join_matches_naive(spark, left, right, lower, width):
    upper = lower + width
    ldf = spark.createDataFrame([Row(ida=i, ta=t) for i, t in enumerate(left)])
    rdf = spark.createDataFrame(
        [Row(idb=i, tb=t) for i, t in enumerate(right)],
        schema="idb bigint, tb bigint",
    )
    got = sorted(
        (r.ida, r.idb)
        for r in band_join(ldf, rdf, "ta", "tb", lower, upper).collect()
    )
    expected = sorted(
        (i, j)
        for i, ta in enumerate(left)
        for j, tb in enumerate(right)
        if lower < tb - ta <= upper
    )
    assert got == expected


@settings(**SETTINGS)
@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=3), min_size=0, max_size=8
    ),
    n=st.integers(min_value=1, max_value=3),
)
def test_word_shingles_matches_naive(spark, words, n):
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.functions.text import (
        word_shingles,
    )

    text = " ".join(words)
    df = spark.createDataFrame([Row(t=text)])
    toks = F.filter(F.split(F.trim(F.col("t")), r"\s+"), lambda x: x != "")
    got = df.select(word_shingles(toks, n).alias("s")).first()[0]
    expected = list(
        dict.fromkeys(
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        )
    )
    assert got == expected


def test_upsert_keep_latest_parquet_fallback(spark, tmp_path):
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.merge import (
        upsert_keep_latest,
    )
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.sources.tables import (
        TableIO,
    )

    io = TableIO(spark, fmt="parquet")
    table = "upsert_test_tbl"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    base = spark.createDataFrame(
        [Row(pk=1, v="a", ver=1), Row(pk=2, v="b", ver=1)]
    )
    upsert_keep_latest(spark, io, table, base, ["pk"], "ver")
    upd = spark.createDataFrame(
        [Row(pk=2, v="b2", ver=2),   # newer -> wins
         Row(pk=3, v="c", ver=1),    # new key -> insert
         Row(pk=1, v="a_stale", ver=0)]  # older -> loses
    )
    upsert_keep_latest(spark, io, table, upd, ["pk"], "ver")
    got = {r.pk: (r.v, r.ver) for r in spark.read.table(table).collect()}
    assert got == {1: ("a", 1), 2: ("b2", 2), 3: ("c", 1)}
    spark.sql(f"DROP TABLE {table}")
