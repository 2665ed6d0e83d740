"""Invariants for ``reach_hll_relational`` (the oracle-backed HLL
register twin): the pure-string leading-zero rank must agree with
integer bit arithmetic on every md5 window, and the raw estimate must
land inside the standard HLL error envelope on real data."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries import SPARK_QUERIES

SF = "/root/testdata/sf0.01"


def _rank_reference(h8: str) -> int:
    """1 + leading zeros of the 32-bit window, via bit_length."""
    v = int(h8, 16)
    return 33 if v == 0 else 33 - v.bit_length()


def test_string_rank_matches_bit_arithmetic(spark):
    # the exact expression the query uses, evaluated over ids chosen
    # to cover 0-7 leading-zero hex chars (md5 prefixes found offline)
    ids = list(range(4000)) + [0x7FFFFFFF, 2**40, 2**62]
    df = spark.createDataFrame([(i,) for i in ids], "user_id long")
    rest = F.expr(
        "trim(LEADING '0' FROM substring(md5(cast(user_id as string)), 2, 8))"
    )
    first = F.substring(rest, 1, 1)
    sub = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rank = F.when(F.length(rest) == 0, F.lit(33)).otherwise(
        (F.lit(8) - F.length(rest)) * 4 + sub + 1
    )
    rows = df.select("user_id", rank.alias("rank")).collect()
    for r in rows:
        h8 = hashlib.md5(str(r["user_id"]).encode()).hexdigest()[1:9]
        assert r["rank"] == _rank_reference(h8), (r["user_id"], h8)
    # the sample covers more than the no-leading-zero case
    assert {r["rank"] for r in rows} > {1, 2, 3, 4}


def test_raw_estimate_inside_error_envelope(spark):
    out = SPARK_QUERIES["reach_hll_relational"](spark, SF).collect()
    assert out, "no event types"
    for row in out:
        assert row["m"] == 16
        # scaled harmonic denominator is consistent with its parts:
        # at most m registers, each term <= 2^32, zeros add 2^33 each
        assert 0 <= row["zero_registers"] <= 16
        assert row["harmonic_den_scaled"] >= 16  # m terms of >= 1
        # raw HLL one-sigma error is 1.04/sqrt(m) = 26%; allow 3 sigma
        rel = abs(row["hll_raw_estimate"] - row["true_distinct"]) / max(
            row["true_distinct"], 1
        )
        assert rel < 0.78, (row["event_type"], rel)
