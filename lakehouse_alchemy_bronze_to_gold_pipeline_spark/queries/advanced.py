"""Breadth batch 5: multi-predicate EXISTS/NOT-EXISTS decorrelation
(TPC-H Q21 shape), asymmetric containment over MinHash candidate
pairs, Zipf-law corpus fit, tokenizer fertility, sampled kNN-graph
hubness, and DAU/WAU stickiness.

Same numeric policy as ``core.py``: exact decimal money sums, exact
bigint counts, ratios of exact integers rounded at the edge, and the
ordered-fold idiom (``F.aggregate`` == DuckDB ``list_reduce``) for
any sum whose accumulation order could otherwise drift cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .data import load

# ---------------------------------------------------------------------
# Q21-shape: EXISTS + NOT EXISTS decorrelated into one grouped pass
# ---------------------------------------------------------------------


def q_sole_late_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Suppliers who were the ONLY late shipper on a multi-supplier
    order (TPC-H Q21 shape: correlated EXISTS on another supplier +
    NOT EXISTS on another late supplier).

    Spark-first decorrelation: instead of two correlated subqueries,
    ONE groupBy(order, supplier) collapses lineitems to a per-order
    supplier roster with a late flag, then a groupBy(order) derives
    (n_supps, n_late) — the two EXISTS conditions become plain column
    predicates on a join-back.  Both aggregates and the join share
    the l_orderkey key, so AQE coalesces them onto one exchange
    lineage; supplier is a broadcast dim.  100 TB: nothing here
    materializes more than the per-(order, supplier) roster — no
    correlated re-scan per outer row, which is what the textbook
    nested form would cost."""
    o = load(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    s = load(spark, sf, "supplier").select("s_suppkey", "s_name")
    late = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 180))
            .cast("int")
            .alias("is_late"),
        )
    )
    roster = late.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("late")
    )
    per_order = roster.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supps"),
        F.sum("late").alias("n_late"),
    )
    waiters = (
        roster.filter(F.col("late") == 1)
        .join(
            per_order.filter(
                (F.col("n_supps") > 1) & (F.col("n_late") == 1)
            ),
            "l_orderkey",
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return (
        waiters.join(s, waiters["l_suppkey"] == s["s_suppkey"])
        .select(F.col("s_name").alias("supplier_name"), "numwait")
        .orderBy(F.col("numwait").desc(), "supplier_name")
        .limit(20)
    )


SQL_SOLE_LATE_SUPPLIER = """
WITH roster AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 180 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_orderkey, l_suppkey
), per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_supps, SUM(late) AS n_late
  FROM roster GROUP BY l_orderkey
)
SELECT s_name AS supplier_name, COUNT(*) AS numwait
FROM roster
JOIN per_order USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE roster.late = 1 AND n_supps > 1 AND n_late = 1
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, supplier_name
LIMIT 20
"""


# ---------------------------------------------------------------------
# asymmetric containment over the MinHash candidate pairs
# ---------------------------------------------------------------------


def q_pair_containment(spark: SparkSession, sf: str) -> DataFrame:
    """Containment classification of MinHash candidate pairs:
    C(A→B) = |shingles(A) ∩ shingles(B)| / |shingles(A)| next to
    symmetric Jaccard.  Jaccard alone misses subset duplication (a
    doc quoting another scores low-J but high-C) — the distinction
    that routes boilerplate/quote removal differently from full
    near-dup collapse (Broder's containment sketch, applied exactly
    on the LSH-bounded candidate set).

    Scale: identical pipeline to ``minhash_neardup_md5`` (the DuckDB
    oracle replays it value-for-value) — candidate generation is
    banded LSH with the bucket cap, so the exact set arithmetic runs
    only on candidate pairs, never all-pairs."""
    from ..operators.minhash import md5_signatures_and_pairs

    d = load(spark, sf, "documents")
    sigs, pairs = md5_signatures_and_pairs(d, "doc_id", "text")
    sh_a = sigs.select(
        F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a")
    )
    sh_b = sigs.select(
        F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    na, nb = F.size("sh_a"), F.size("sh_b")
    scored = (
        pairs.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                inter.cast("double") / (na + nb - inter), 6
            ).alias("jaccard"),
            F.round(inter.cast("double") / na, 6).alias("cont_a"),
            F.round(inter.cast("double") / nb, 6).alias("cont_b"),
        )
    )
    rel = (
        F.when(F.col("jaccard") >= 0.5, F.lit("near_dup"))
        .when(
            F.greatest("cont_a", "cont_b") >= 0.8, F.lit("contains")
        )
        .otherwise(F.lit("overlap"))
    )
    return (
        scored.filter(F.greatest("cont_a", "cont_b") >= 0.3)
        .select("id_a", "id_b", "jaccard", "cont_a", "cont_b",
                rel.alias("relation"))
    )


def _sql_pair_containment() -> str:
    from .llm_ops import _minhash_md5_oracle_sql

    tail = """
SELECT id_a, id_b, jaccard, cont_a, cont_b,
       CASE WHEN jaccard >= 0.5 THEN 'near_dup'
            WHEN GREATEST(cont_a, cont_b) >= 0.8 THEN 'contains'
            ELSE 'overlap' END AS relation
FROM (
  SELECT id_a, id_b,
         ROUND(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
               / (len(sa.shingles) + len(sb.shingles)
                  - len(list_intersect(sa.shingles, sb.shingles))), 6)
           AS jaccard,
         ROUND(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
               / len(sa.shingles), 6) AS cont_a,
         ROUND(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
               / len(sb.shingles), 6) AS cont_b
  FROM cand
  JOIN sigt sa ON sa.doc_id = id_a
  JOIN sigt sb ON sb.doc_id = id_b
)
WHERE GREATEST(cont_a, cont_b) >= 0.3
"""
    return _minhash_md5_oracle_sql(tail=tail)


# ---------------------------------------------------------------------
# Zipf-law fit over the term-frequency relation
# ---------------------------------------------------------------------

_ZIPF_TOP = 150


def q_zipf_fit_report(spark: SparkSession, sf: str) -> DataFrame:
    """Zipf-law fit of the corpus term distribution: OLS of
    ln(count) on ln(rank) over the top terms — alpha (the negated
    slope) near 1 is the natural-language signature; a flat or
    broken fit flags templated/synthetic text before it poisons a
    training mix.

    Determinism: ranks use (count DESC, term) total order; the four
    OLS sums run as SEQUENTIAL ``F.aggregate`` folds over ONE sorted
    array (struct sort_array gives the rank order), matching DuckDB
    ``list_reduce`` term-for-term — no engine-ordered double
    accumulation (the ``nation_revenue_trend`` lesson).  Scale: the
    term groupBy is the only shuffle; TakeOrdered cuts to
    ``_ZIPF_TOP`` rows before the single-row fold."""
    d = load(spark, sf, "documents")
    from ..functions.text import nonempty_tokens

    counts = (
        d.select(F.explode(nonempty_tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "term")
        .limit(_ZIPF_TOP)
    )
    # one sorted array of counts in rank order: sort key (-c, term)
    arr = counts.agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct((-F.col("c")).alias("negc"),
                                        F.col("term"),
                                        F.col("c")))
            ),
            lambda s: s["c"],
        ).alias("cs")
    )
    n = F.size("cs").cast("double")
    idx = F.sequence(F.lit(1), F.size("cs"))

    def _fold(vals):
        return F.aggregate(
            vals, F.lit(0.0), lambda acc, x: acc + x
        )

    xs = F.transform(idx, lambda i: F.log(i.cast("double")))
    ys = F.transform(F.col("cs"), lambda c: F.log(c.cast("double")))
    folded = arr.select(
        n.alias("n"),
        _fold(xs).alias("sx"),
        _fold(ys).alias("sy"),
        _fold(F.transform(xs, lambda x: x * x)).alias("sxx"),
        _fold(F.transform(ys, lambda y: y * y)).alias("syy"),
        _fold(F.zip_with(xs, ys, lambda x, y: x * y)).alias("sxy"),
    )
    sxx_c = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    syy_c = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    sxy_c = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    slope = sxy_c / sxx_c
    return folded.select(
        F.col("n").cast("bigint").alias("n_terms"),
        F.round(-slope, 6).alias("zipf_alpha"),
        F.round(
            F.col("sy") / F.col("n") - slope * F.col("sx") / F.col("n"), 6
        ).alias("intercept_ln"),
        F.round(sxy_c * sxy_c / (sxx_c * syy_c), 6).alias("r2"),
    )


SQL_ZIPF_FIT_REPORT = f"""
WITH terms AS (
  SELECT t AS term
  FROM documents,
       UNNEST(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                          x -> x != '')) AS u(t)
), counts AS (
  SELECT term, COUNT(*) AS c FROM terms GROUP BY term
), top AS (
  SELECT term, c FROM counts ORDER BY c DESC, term LIMIT {_ZIPF_TOP}
), arr AS (
  SELECT list(c ORDER BY c DESC, term) AS cs FROM top
), folded AS (
  SELECT len(cs)::DOUBLE AS n,
         list_reduce(list_prepend(0.0, list_transform(range(1, len(cs)+1),
           i -> ln(i::DOUBLE))), (a, x) -> a + x) AS sx,
         list_reduce(list_prepend(0.0, list_transform(cs,
           c -> ln(c::DOUBLE))), (a, x) -> a + x) AS sy,
         list_reduce(list_prepend(0.0, list_transform(range(1, len(cs)+1),
           i -> ln(i::DOUBLE) * ln(i::DOUBLE))), (a, x) -> a + x) AS sxx,
         list_reduce(list_prepend(0.0, list_transform(cs,
           c -> ln(c::DOUBLE) * ln(c::DOUBLE))), (a, x) -> a + x) AS syy,
         list_reduce(list_prepend(0.0, list_transform(range(1, len(cs)+1),
           i -> ln(i::DOUBLE) * ln(cs[i]::DOUBLE))), (a, x) -> a + x) AS sxy
  FROM arr
)
SELECT CAST(n AS BIGINT) AS n_terms,
       ROUND(-((sxy - sx*sy/n) / (sxx - sx*sx/n)), 6) AS zipf_alpha,
       ROUND(sy/n - ((sxy - sx*sy/n) / (sxx - sx*sx/n)) * sx/n, 6)
         AS intercept_ln,
       ROUND((sxy - sx*sy/n) * (sxy - sx*sy/n)
             / ((sxx - sx*sx/n) * (syy - sy*sy/n)), 6) AS r2
FROM folded
"""


# ---------------------------------------------------------------------
# tokenizer fertility per language
# ---------------------------------------------------------------------


def q_tokenizer_fertility(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish subword tokens per
    whitespace word, and characters per subword token — the
    cost-model numbers that decide context budgets and per-language
    sampling before a tokenizer is even trained (fertility >> 1
    flags scripts the pretokenizer fragments).

    All per-group sums are exact bigints; ratios divide at the edge.
    One narrow regex pass + one tiny groupBy — at 100 TB this is a
    single scan."""
    from ..functions.text import bpe_ish_tokens, nonempty_tokens

    d = load(spark, sf, "documents")
    per_doc = d.select(
        "lang",
        F.size(nonempty_tokens("text")).cast("bigint").alias("words"),
        F.size(bpe_ish_tokens("text")).cast("bigint").alias("bpe"),
        F.length("text").cast("bigint").alias("chars"),
    )
    g = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("words").alias("n_words"),
        F.sum("bpe").alias("n_bpe_tokens"),
        F.sum("chars").alias("n_chars"),
    )
    return g.select(
        "lang",
        "n_docs",
        "n_words",
        "n_bpe_tokens",
        F.round(
            F.col("n_bpe_tokens").cast("double") / F.col("n_words"), 6
        ).alias("fertility"),
        F.round(
            F.col("n_chars").cast("double") / F.col("n_bpe_tokens"), 6
        ).alias("chars_per_token"),
    )


def _sql_tokenizer_fertility() -> str:
    from .llm_ops import TX_BPE_PATTERN_SQL

    return f"""
WITH per_doc AS (
  SELECT lang,
         len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x != ''))::BIGINT AS words,
         len(regexp_extract_all(text, '{TX_BPE_PATTERN_SQL}'))::BIGINT
           AS bpe,
         length(text)::BIGINT AS chars
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(words) AS BIGINT) AS n_words,
       CAST(SUM(bpe) AS BIGINT) AS n_bpe_tokens,
       ROUND(CAST(SUM(bpe) AS DOUBLE) / SUM(words), 6) AS fertility,
       ROUND(CAST(SUM(chars) AS DOUBLE) / SUM(bpe), 6)
         AS chars_per_token
FROM per_doc GROUP BY lang
"""


# ---------------------------------------------------------------------
# sampled kNN-graph hubness
# ---------------------------------------------------------------------

_HUB_SAMPLE = 200
_HUB_K = 5


def q_ann_hubness_report(spark: SparkSession, sf: str) -> DataFrame:
    """Hubness profile of the embedding space: in-degree distribution
    of the exact 5-nn graph over a deterministic md5-ordered sample
    of query vectors.  High-hubness spaces (a few vectors appearing
    in everyone's neighbor list) break ANN recall and k-nn label
    scans — this is the diagnostic run before trusting either.

    Sampling is a pseudo-random TOTAL order (md5 of the id string),
    so the estimate is layout-independent and the DuckDB oracle
    reproduces it exactly; work is |sample| x |corpus|, the same
    bounded contract as ``knn_join``."""
    from ..operators.similarity import knn_join

    emb = load(spark, sf, "embeddings")
    queries = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(_HUB_SAMPLE)
    )
    edges = knn_join(queries, emb, k=_HUB_K + 1)
    # k+1 then drop self + re-rank: self is *usually* rank 1 but a
    # planted exact duplicate with a smaller id can outrank it, so
    # both engines re-rank after the self filter identically
    w = Window.partitionBy("query_id").orderBy("rank")
    neigh = (
        edges.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rank2", F.row_number().over(w))
        .filter(F.col("rank2") <= _HUB_K)
    )
    indeg = neigh.groupBy("neighbor_id").agg(
        F.count(F.lit(1)).alias("indeg")
    )
    return (
        indeg.groupBy("indeg")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("indeg")
    )


SQL_ANN_HUBNESS_REPORT = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {_HUB_SAMPLE}
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_sum(list_transform(list_zip(e.embedding::DOUBLE[], q.qv),
                                 x -> x[1] * x[2]))
         / (sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x * x)))
            * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cos_raw
  FROM embeddings e CROSS JOIN q
), ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_raw DESC, neighbor_id) AS rank
  FROM scored
), neigh AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY rank) AS rank2
  FROM ranked
  WHERE rank <= {_HUB_K + 1} AND neighbor_id != query_id
), indeg AS (
  SELECT neighbor_id, COUNT(*) AS indeg
  FROM neigh WHERE rank2 <= {_HUB_K}
  GROUP BY neighbor_id
)
SELECT indeg, COUNT(*) AS n_vectors FROM indeg GROUP BY indeg
ORDER BY indeg
"""


# ---------------------------------------------------------------------
# DAU/WAU stickiness
# ---------------------------------------------------------------------


def q_weekly_stickiness(spark: SparkSession, sf: str) -> DataFrame:
    """Product-analytics stickiness: avg daily distinct users over
    weekly distinct users, per epoch week.  Two exact distinct
    aggregates (day grain collapses first, so the second pass runs
    over |weeks|x|days| rows); the ratio of exact integers divides
    at the edge.  Week/day buckets use integer DIV on tz-free epoch
    micros — no calendar/timezone drift."""
    ev = load(spark, sf, "events").select(
        F.expr("ts_us DIV 604800000000").alias("week"),
        F.expr("ts_us DIV 86400000000").alias("day"),
        "user_id",
    )
    daily = ev.groupBy("week", "day").agg(
        F.countDistinct("user_id").alias("dau")
    )
    weekly_daily = daily.groupBy("week").agg(
        F.sum("dau").alias("sum_dau"), F.count(F.lit(1)).alias("n_days")
    )
    wau = ev.groupBy("week").agg(F.countDistinct("user_id").alias("wau"))
    j = weekly_daily.join(wau, "week")
    return j.select(
        "week",
        "n_days",
        F.round(
            F.col("sum_dau").cast("double") / F.col("n_days"), 6
        ).alias("avg_dau"),
        "wau",
        F.round(
            F.col("sum_dau").cast("double") / F.col("n_days")
            / F.col("wau"),
            6,
        ).alias("stickiness"),
    ).orderBy("week")


SQL_WEEKLY_STICKINESS = """
WITH ev AS (
  SELECT epoch_us(ts) // 604800000000 AS week,
         epoch_us(ts) // 86400000000 AS day, user_id
  FROM events
), daily AS (
  SELECT week, day, COUNT(DISTINCT user_id) AS dau
  FROM ev GROUP BY week, day
), weekly_daily AS (
  SELECT week, SUM(dau) AS sum_dau, COUNT(*) AS n_days
  FROM daily GROUP BY week
), wau AS (
  SELECT week, COUNT(DISTINCT user_id) AS wau FROM ev GROUP BY week
)
SELECT week, n_days,
       ROUND(CAST(sum_dau AS DOUBLE) / n_days, 6) AS avg_dau, wau,
       ROUND(CAST(sum_dau AS DOUBLE) / n_days / wau, 6) AS stickiness
FROM weekly_daily JOIN wau USING (week)
ORDER BY week
"""


SPARK_QUERIES = {
    "sole_late_supplier": q_sole_late_supplier,
    "pair_containment": q_pair_containment,
    "zipf_fit_report": q_zipf_fit_report,
    "tokenizer_fertility": q_tokenizer_fertility,
    "ann_hubness_report_sampled": q_ann_hubness_report,
    "weekly_stickiness": q_weekly_stickiness,
}

ORACLE_SQL = {
    "sole_late_supplier": SQL_SOLE_LATE_SUPPLIER,
    "pair_containment": _sql_pair_containment(),
    "zipf_fit_report": SQL_ZIPF_FIT_REPORT,
    "tokenizer_fertility": _sql_tokenizer_fertility(),
    "ann_hubness_report_sampled": SQL_ANN_HUBNESS_REPORT,
    "weekly_stickiness": SQL_WEEKLY_STICKINESS,
}
