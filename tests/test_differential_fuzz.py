"""Differential fuzzing: hypothesis-generated filter/group/aggregate
fragments executed on BOTH engines (Spark DataFrame API vs DuckDB
SQL) over the same sf0.001 parquet and compared exactly.

This generalizes the per-query oracle gate: instead of certifying N
hand-written queries, it samples the (predicate x grouping x
aggregate x join) fragment space and asserts engine parity on every
sample — the class of cross-engine defect the r5 round caught by
hand (round-half doubles, summation order) gets probed mechanically
on integer-exact fragments where ANY divergence is a real bug.
"""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: (sql predicate, spark column builder) — integer/string-exact only,
#: so any cross-engine mismatch is a genuine defect, never float noise
PREDS = [
    ("l_quantity <= 25", lambda: F.col("l_quantity") <= 25),
    ("l_quantity > 40", lambda: F.col("l_quantity") > 40),
    ("l_returnflag = 'A'", lambda: F.col("l_returnflag") == "A"),
    ("l_linestatus = 'F'", lambda: F.col("l_linestatus") == "F"),
    ("l_partkey % 7 = 3", lambda: F.col("l_partkey") % 7 == 3),
    ("l_orderkey % 2 = 0", lambda: F.col("l_orderkey") % 2 == 0),
    ("l_suppkey % 5 <> 1", lambda: F.col("l_suppkey") % 5 != 1),
]

GROUPS = [
    (),
    ("l_returnflag",),
    ("l_linestatus",),
    ("l_returnflag", "l_linestatus"),
]

_CENTS = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

AGGS = [
    (
        "n_rows",
        lambda: F.count(F.lit(1)).cast("bigint"),
        "COUNT(*)::BIGINT",
    ),
    (
        "sum_cents",
        lambda: F.sum(F.expr(_CENTS)).cast("bigint"),
        f"CAST(SUM({_CENTS}) AS BIGINT)",
    ),
    (
        "max_order",
        lambda: F.max("l_orderkey").cast("bigint"),
        "CAST(MAX(l_orderkey) AS BIGINT)",
    ),
    (
        "min_qty",
        lambda: F.min(F.col("l_quantity").cast("bigint")),
        "MIN(CAST(l_quantity AS BIGINT))",
    ),
    (
        "n_parts",
        lambda: F.countDistinct("l_partkey").cast("bigint"),
        "CAST(COUNT(DISTINCT l_partkey) AS BIGINT)",
    ),
]

JOIN_PREDS = [None, "o_orderstatus = 'F'", "o_custkey % 3 = 0"]


def _duck(sql: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'"
    )
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'"
    )
    try:
        return con.sql(sql).fetchall()
    finally:
        con.close()


@settings(**SETTINGS)
@given(
    pred_ix=st.lists(
        st.sampled_from(range(len(PREDS))), max_size=2, unique=True
    ),
    grp_ix=st.sampled_from(range(len(GROUPS))),
    agg_ix=st.lists(
        st.sampled_from(range(len(AGGS))), min_size=1, max_size=3,
        unique=True,
    ),
    join_ix=st.sampled_from(range(len(JOIN_PREDS))),
)
def test_fragment_parity(spark, pred_ix, grp_ix, agg_ix, join_ix):
    preds = [PREDS[i] for i in sorted(pred_ix)]
    keys = GROUPS[grp_ix]
    aggs = [AGGS[i] for i in sorted(agg_ix)]
    join_pred = JOIN_PREDS[join_ix]

    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    if join_pred is not None:
        o = spark.read.parquet(f"{SF}/orders.parquet").where(join_pred)
        df = df.join(
            F.broadcast(o.select("o_orderkey")),
            df.l_orderkey == F.col("o_orderkey"),
        )
    for _sql, col in preds:
        df = df.where(col())
    spark_aggs = [fn().alias(name) for name, fn, _ in aggs]
    got = (
        df.groupBy(*keys).agg(*spark_aggs)
        if keys
        else df.agg(*spark_aggs)
    ).collect()

    where = " AND ".join(p for p, _ in preds) or "TRUE"
    select_aggs = ", ".join(f"{sql} AS {name}" for name, _, sql in aggs)
    select = ", ".join(list(keys) + [select_aggs])
    src = (
        "lineitem JOIN (SELECT o_orderkey FROM orders WHERE "
        f"{join_pred}) USING (o_orderkey)".replace(
            "USING (o_orderkey)", "ON l_orderkey = o_orderkey"
        )
        if join_pred is not None
        else "lineitem"
    )
    sql = f"SELECT {select} FROM {src} WHERE {where}"
    if keys:
        sql += " GROUP BY " + ", ".join(keys)
    want = _duck(sql)

    cols = list(keys) + [name for name, _, _ in aggs]
    got_t = sorted(tuple(r[c] for c in cols) for r in got)
    want_t = sorted(tuple(r) for r in want)
    assert got_t == want_t, f"fragment diverged\nSQL: {sql}"


# ---------------------------------------------------------- windows

#: the synthetic lineitem has DUPLICATE (orderkey, linenumber) pairs,
#: so window fragments run over a derived base relation where that
#: pair is made unique by construction (groupBy + MIN) — otherwise
#: lag/lead over order-key ties is legitimately nondeterministic and
#: a mismatch would not be a bug (found by this very test's first run)
_BASE_SQL = """
  SELECT l_orderkey, l_linenumber,
         MIN(l_partkey) AS pk, MIN(l_suppkey) AS sk,
         CAST(MIN(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
         MIN(l_returnflag) AS rf, MIN(l_linestatus) AS ls
  FROM lineitem GROUP BY 1, 2
"""

WPREDS = [
    ("qty <= 25", lambda: F.col("qty") <= 25),
    ("rf = 'A'", lambda: F.col("rf") == "A"),
    ("pk % 7 = 3", lambda: F.col("pk") % 7 == 3),
    ("sk % 5 <> 1", lambda: F.col("sk") % 5 != 1),
]

WIN_FUNCS = [
    (
        "rn",
        lambda w: F.row_number().over(w).cast("bigint"),
        "row_number() OVER w",
    ),
    (
        "run_qty",
        lambda w: F.sum("qty").over(w).cast("bigint"),
        "CAST(SUM(qty) OVER w AS BIGINT)",
    ),
    (
        "prev_part",
        lambda w: F.lag("pk", 1).over(w).cast("bigint"),
        "lag(pk, 1) OVER w",
    ),
    (
        "next_supp",
        lambda w: F.lead("sk", 1).over(w).cast("bigint"),
        "lead(sk, 1) OVER w",
    ),
]

WIN_PARTS = [("rf",), ("ls",), ("rf", "ls")]


@settings(**SETTINGS)
@given(
    part_ix=st.sampled_from(range(len(WIN_PARTS))),
    fn_ix=st.lists(
        st.sampled_from(range(len(WIN_FUNCS))), min_size=1, max_size=2,
        unique=True,
    ),
    pred_ix=st.lists(
        st.sampled_from(range(len(WPREDS))), max_size=1, unique=True
    ),
)
def test_window_fragment_parity(spark, part_ix, fn_ix, pred_ix):
    from pyspark.sql import Window

    parts = WIN_PARTS[part_ix]
    fns = [WIN_FUNCS[i] for i in sorted(fn_ix)]
    preds = [WPREDS[i] for i in pred_ix]

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.min("l_partkey").alias("pk"),
        F.min("l_suppkey").alias("sk"),
        F.min(F.col("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("qty"),
        F.min("l_returnflag").alias("rf"),
        F.min("l_linestatus").alias("ls"),
    )
    for _sql, col in preds:
        df = df.where(col())
    w = Window.partitionBy(*parts).orderBy("l_orderkey", "l_linenumber")
    got = df.select(
        "l_orderkey",
        "l_linenumber",
        *[fn(w).alias(name) for name, fn, _ in fns],
    ).collect()

    where = " AND ".join(p for p, _ in preds) or "TRUE"
    over = (
        f"(PARTITION BY {', '.join(parts)} "
        "ORDER BY l_orderkey, l_linenumber)"
    )
    sel = ", ".join(
        f"{sql.replace('OVER w', 'OVER ' + over)} AS {name}"
        for name, _, sql in fns
    )
    want = _duck(
        f"WITH base AS ({_BASE_SQL}) "
        f"SELECT l_orderkey, l_linenumber, {sel} "
        f"FROM base WHERE {where}"
    )

    cols = ["l_orderkey", "l_linenumber"] + [n for n, _, _ in fns]
    key = lambda t: tuple(-1 if v is None else v for v in t)  # noqa: E731
    got_t = sorted((tuple(r[c] for c in cols) for r in got), key=key)
    want_t = sorted((tuple(r) for r in want), key=key)
    diff = [(a, b) for a, b in zip(got_t, want_t) if a != b][:5]
    assert got_t == want_t, (
        f"window fragment diverged: {over} {sel}\nfirst diffs "
        f"(spark, duckdb): {diff}"
    )


# ------------------------------------------------- set operations

_SIDES = [
    ("l_returnflag = 'A'", lambda df: df.where(F.col("l_returnflag") == "A")),
    ("l_quantity > 30", lambda df: df.where(F.col("l_quantity") > 30)),
    ("l_suppkey % 4 = 1", lambda df: df.where(F.col("l_suppkey") % 4 == 1)),
    ("l_shipdate >= DATE '1996-01-01'",
     lambda df: df.where(F.col("l_shipdate") >= "1996-01-01")),
]


@settings(**SETTINGS)
@given(
    op_ix=st.sampled_from(range(3)),
    a_ix=st.sampled_from(range(len(_SIDES))),
    b_ix=st.sampled_from(range(len(_SIDES))),
)
def test_setop_parity(spark, op_ix, a_ix, b_ix):
    """UNION / INTERSECT / EXCEPT fragments over projected key sets:
    SQL set operators are DISTINCT semantics, so the Spark side pairs
    union/intersect/subtract with the matching distinct-preserving
    API calls — any row-set divergence is a real engine-parity bug
    (keys are integers, no float noise possible)."""
    sql_op = ["UNION", "INTERSECT", "EXCEPT"][op_ix]
    a_sql, a_fn = _SIDES[a_ix]
    b_sql, b_fn = _SIDES[b_ix]

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    a = a_fn(li).select("l_orderkey", "l_partkey")
    b = b_fn(li).select("l_orderkey", "l_partkey")
    if sql_op == "UNION":
        got_df = a.union(b).distinct()
    elif sql_op == "INTERSECT":
        got_df = a.intersect(b)
    else:
        got_df = a.subtract(b)
    got = sorted((r[0], r[1]) for r in got_df.collect())

    sql = (
        f"SELECT l_orderkey, l_partkey FROM lineitem WHERE {a_sql} "
        f"{sql_op} "
        f"SELECT l_orderkey, l_partkey FROM lineitem WHERE {b_sql}"
    )
    want = sorted(_duck(sql))
    assert got == want, sql


# ----------------------------------------- rollup / cube / gsets

_GDIMS = ["l_returnflag", "l_linestatus", "l_partkey % 5"]
_GALIAS = ["rf", "ls", "pk5"]


@settings(**SETTINGS)
@given(
    mode=st.sampled_from(["ROLLUP", "CUBE"]),
    dim_ix=st.lists(
        st.sampled_from(range(len(_GDIMS))), min_size=1, max_size=3,
        unique=True,
    ),
    agg_ix=st.lists(
        st.sampled_from(range(len(AGGS))), min_size=1, max_size=2,
        unique=True,
    ),
)
def test_rollup_cube_parity(spark, mode, dim_ix, agg_ix):
    """ROLLUP / CUBE fragments: the multi-grain aggregate lattice —
    every grouping-set combination including the grand total, with
    NULL grouping placeholders — compared value-for-value on
    integer-exact aggregates.  A wrong grouping-id expansion or a
    NULL-vs-value collision in the placeholder rows diverges here."""
    dims = [(_GDIMS[i], _GALIAS[i]) for i in sorted(dim_ix)]
    aggs = [AGGS[i] for i in sorted(agg_ix)]

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    proj = li.select(
        *[F.expr(d).alias(a) for d, a in dims],
        "l_extendedprice", "l_orderkey", "l_quantity", "l_partkey",
        "l_suppkey",
    )
    names = [a for _, a in dims]
    grouped = (
        proj.rollup(*names) if mode == "ROLLUP" else proj.cube(*names)
    )
    got_df = grouped.agg(*[fn().alias(name) for name, fn, _ in aggs])
    got = got_df.collect()

    sel_dims = ", ".join(f"{d} AS {a}" for d, a in dims)
    sel_aggs = ", ".join(f"{sql} AS {name}" for name, _, sql in aggs)
    sql = (
        f"SELECT {', '.join(names)}, {sel_aggs} "
        f"FROM (SELECT {sel_dims}, l_extendedprice, l_orderkey, "
        f"l_quantity, l_partkey, l_suppkey FROM lineitem) "
        f"GROUP BY {mode} ({', '.join(names)})"
    )
    want = _duck(sql)

    cols = names + [name for name, _, _ in aggs]
    key = lambda t: tuple(  # noqa: E731
        (v is None, v) for v in t
    )
    got_t = sorted((tuple(r[c] for c in cols) for r in got), key=key)
    want_t = sorted((tuple(r) for r in want), key=key)
    assert got_t == want_t, f"{mode} fragment diverged\nSQL: {sql}"


# ------------------------------------------------------ join types

#: (duckdb join keyword, spark how) — every join family the engine
#: exposes, probed over the same orders⋈lineitem pair
_JTYPES = [
    ("JOIN", "inner"),
    ("LEFT JOIN", "left"),
    ("RIGHT JOIN", "right"),
    ("FULL JOIN", "full"),
    ("SEMI JOIN", "left_semi"),
    ("ANTI JOIN", "left_anti"),
]

#: (duckdb on-clause, spark condition builder) — the natural FK key
#: and a deliberately many-to-many residue key (multi-match rows per
#: key probe duplicate-expansion parity)
_JKEYS = [
    (
        "l.l_orderkey = o.o_orderkey",
        lambda li, o: li["l_orderkey"] == o["o_orderkey"],
    ),
    (
        "l.l_orderkey % 97 = o.o_orderkey % 97",
        lambda li, o: li["l_orderkey"] % 97 == o["o_orderkey"] % 97,
    ),
]

_LPREDS = [None, "l_quantity <= 10", "l_partkey % 3 = 0"]
_OPREDS = [None, "o_orderstatus = 'F'", "o_custkey % 2 = 1"]


@settings(**SETTINGS)
@given(
    jt_ix=st.sampled_from(range(len(_JTYPES))),
    key_ix=st.sampled_from(range(len(_JKEYS))),
    lp_ix=st.sampled_from(range(len(_LPREDS))),
    op_ix=st.sampled_from(range(len(_OPREDS))),
)
def test_join_type_parity(spark, jt_ix, key_ix, lp_ix, op_ix):
    """(join type x key shape x side predicates) over orders⋈lineitem:
    inner/left/right/full/semi/anti, FK key and many-to-many residue
    key, predicates applied PRE-join on each side so outer-join null
    semantics are unambiguous.  Readout is integer-exact aggregates
    with NULL-coalescing sentinels so outer-null rows count
    distinctly — any divergence is a join-semantics bug."""
    duck_kw, spark_how = _JTYPES[jt_ix]
    on_sql, on_fn = _JKEYS[key_ix]
    lp, op = _LPREDS[lp_ix], _OPREDS[op_ix]

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    if lp:
        li = li.where(lp)
    if op:
        o = o.where(op)
    joined = li.join(o, on_fn(li, o), spark_how)
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(
            F.coalesce(F.col("l_quantity").cast("bigint"), F.lit(-7))
        ).cast("bigint").alias("sum_l"),
    ]
    sel = [
        "COUNT(*)::BIGINT AS n_rows",
        "CAST(SUM(COALESCE(CAST(l_quantity AS BIGINT), -7)) AS BIGINT)"
        " AS sum_l",
    ]
    if spark_how not in ("left_semi", "left_anti"):
        aggs.append(
            F.sum(F.coalesce(F.col("o_custkey"), F.lit(-13)))
            .cast("bigint")
            .alias("sum_o")
        )
        sel.append(
            "CAST(SUM(COALESCE(o_custkey, -13)) AS BIGINT) AS sum_o"
        )
    got = tuple(joined.agg(*aggs).collect()[0])

    lsrc = f"(SELECT * FROM lineitem WHERE {lp or 'TRUE'}) l"
    osrc = f"(SELECT * FROM orders WHERE {op or 'TRUE'}) o"
    sql = (
        f"SELECT {', '.join(sel)} FROM {lsrc} {duck_kw} {osrc} "
        f"ON {on_sql}"
    )
    want = _duck(sql)[0]
    assert got == want, f"join fragment diverged\nSQL: {sql}"


# ---------------------------------------------------- window frames

#: (duckdb order+frame clause, spark frame builder) — ROWS frames
#: order on the unique (orderkey, linenumber) pair so offsets are
#: deterministic; RANGE frames order on the single numeric qty where
#: tied peers enter the frame together in both engines by definition
_FRAMES = [
    (
        "ORDER BY l_orderkey, l_linenumber "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        lambda W, p: W.partitionBy(*p)
        .orderBy("l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow),
    ),
    (
        "ORDER BY l_orderkey, l_linenumber "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
        lambda W, p: W.partitionBy(*p)
        .orderBy("l_orderkey", "l_linenumber")
        .rowsBetween(-2, 0),
    ),
    (
        "ORDER BY l_orderkey, l_linenumber "
        "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
        lambda W, p: W.partitionBy(*p)
        .orderBy("l_orderkey", "l_linenumber")
        .rowsBetween(-1, 1),
    ),
    (
        "ORDER BY l_orderkey, l_linenumber "
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
        lambda W, p: W.partitionBy(*p)
        .orderBy("l_orderkey", "l_linenumber")
        .rowsBetween(W.currentRow, W.unboundedFollowing),
    ),
    (
        "ORDER BY qty "
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        lambda W, p: W.partitionBy(*p)
        .orderBy("qty")
        .rangeBetween(W.unboundedPreceding, W.currentRow),
    ),
    (
        "ORDER BY qty RANGE BETWEEN 5 PRECEDING AND CURRENT ROW",
        lambda W, p: W.partitionBy(*p).orderBy("qty").rangeBetween(-5, 0),
    ),
    (
        "ORDER BY qty RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING",
        lambda W, p: W.partitionBy(*p).orderBy("qty").rangeBetween(-3, 3),
    ),
]

_FRAME_FUNCS = [
    (
        "fsum",
        lambda w: F.sum("qty").over(w).cast("bigint"),
        "CAST(SUM(qty) OVER w AS BIGINT)",
    ),
    (
        "fcnt",
        lambda w: F.count(F.lit(1)).over(w).cast("bigint"),
        "CAST(COUNT(*) OVER w AS BIGINT)",
    ),
    (
        "fmin",
        lambda w: F.min("pk").over(w).cast("bigint"),
        "CAST(MIN(pk) OVER w AS BIGINT)",
    ),
    (
        "fmax",
        lambda w: F.max("sk").over(w).cast("bigint"),
        "CAST(MAX(sk) OVER w AS BIGINT)",
    ),
]


@settings(**SETTINGS)
@given(
    frame_ix=st.sampled_from(range(len(_FRAMES))),
    part_ix=st.sampled_from(range(len(WIN_PARTS))),
    fn_ix=st.lists(
        st.sampled_from(range(len(_FRAME_FUNCS))),
        min_size=1,
        max_size=2,
        unique=True,
    ),
)
def test_window_frame_parity(spark, frame_ix, part_ix, fn_ix):
    """(frame x partition x aggregate) over the deduped base
    relation: ROWS offsets on a total order, RANGE offsets on a
    numeric key where peers are frame-mates by definition — the
    frame-boundary arithmetic (inclusive bounds, peer groups,
    unbounded ends) checked value-for-value on integer columns."""
    from pyspark.sql import Window

    frame_sql, frame_fn = _FRAMES[frame_ix]
    parts = WIN_PARTS[part_ix]
    fns = [_FRAME_FUNCS[i] for i in sorted(fn_ix)]

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.min("l_partkey").alias("pk"),
        F.min("l_suppkey").alias("sk"),
        F.min(F.col("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("qty"),
        F.min("l_returnflag").alias("rf"),
        F.min("l_linestatus").alias("ls"),
    )
    w = frame_fn(Window, parts)
    got = df.select(
        "l_orderkey",
        "l_linenumber",
        *[fn(w).alias(name) for name, fn, _ in fns],
    ).collect()

    over = f"(PARTITION BY {', '.join(parts)} {frame_sql})"
    sel = ", ".join(
        f"{sql.replace('OVER w', 'OVER ' + over)} AS {name}"
        for name, _, sql in fns
    )
    want = _duck(
        f"WITH base AS ({_BASE_SQL}) "
        f"SELECT l_orderkey, l_linenumber, {sel} FROM base"
    )

    cols = ["l_orderkey", "l_linenumber"] + [n for n, _, _ in fns]
    got_t = sorted(tuple(r[c] for c in cols) for r in got)
    want_t = sorted(tuple(r) for r in want)
    diff = [(a, b) for a, b in zip(got_t, want_t) if a != b][:5]
    assert got_t == want_t, (
        f"frame fragment diverged: {over} {sel}\nfirst diffs "
        f"(spark, duckdb): {diff}"
    )


# ------------------------------------------- having + top-k order

_HAVINGS = [
    ("COUNT(*) > 50", lambda: F.count(F.lit(1)) > 50),
    ("SUM(CAST(l_quantity AS BIGINT)) > 500",
     lambda: F.sum(F.col("l_quantity").cast("bigint")) > 500),
    ("COUNT(DISTINCT l_suppkey) >= 3",
     lambda: F.countDistinct("l_suppkey") >= 3),
]


@settings(**SETTINGS)
@given(
    mod=st.sampled_from([7, 13, 29, 97]),
    hav_ix=st.sampled_from(range(len(_HAVINGS))),
    k=st.sampled_from([1, 5, 20]),
)
def test_having_topk_parity(spark, mod, hav_ix, k):
    """Grouped aggregate -> HAVING -> total-order top-k: the rank is
    made TOTAL (sum DESC, group key ASC) so LIMIT is deterministic in
    both engines; all values integer-exact."""
    hav_sql, _ = _HAVINGS[hav_ix]
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    # the HAVING predicate references aggregate expressions, so the
    # Spark side filters computed columns after the aggregation
    agg = li.groupBy((F.col("l_partkey") % mod).alias("grp")).agg(
        F.sum(F.expr(_CENTS)).cast("bigint").alias("cents"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("sq"),
        F.countDistinct("l_suppkey").cast("bigint").alias("nds"),
    )
    hav_col = [
        F.col("n") > 50,
        F.col("sq") > 500,
        F.col("nds") >= 3,
    ][hav_ix]
    got = [
        (r.grp, r.cents, r.n)
        for r in agg.where(hav_col)
        .orderBy(F.desc("cents"), "grp")
        .select("grp", "cents", "n")
        .limit(k)
        .collect()
    ]
    sql = f"""
    SELECT l_partkey % {mod} AS grp,
           CAST(SUM({_CENTS}) AS BIGINT) AS cents,
           COUNT(*)::BIGINT AS n
    FROM lineitem
    GROUP BY 1
    HAVING {hav_sql}
    ORDER BY cents DESC, grp
    LIMIT {k}
    """
    want = [tuple(r) for r in _duck(sql)]
    assert got == want, sql


# --------------------------------------------------------------- flatten
# Nested-data dimension: the engine's recursive schema flattener
# (operators.flatten — the reference's signature operator,
# silver_transformation.py:31-52) vs a DuckDB UNNEST twin built by
# MIRRORING the flattener's pass loop as chained CTEs: each pass
# expands every struct ("s"."p" AS s_p) and unnests every targeted
# array-of-struct (comma-join UNNEST = inner explode; LEFT JOIN
# UNNEST ON true = explode_outer).  Covers both L3/L4 parity
# semantics (cross-product grain, inner-explode row drop) and the
# fixed modes (explode_targets, outer=True).

from pyspark.sql.types import (  # noqa: E402
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: id + null-able struct (with inner struct) + two arrays-of-struct
#: (items carries a NESTED array, exercising multi-pass explode) +
#: an array<int> that must pass through unexploded.
_FLAT_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("s", StructType([
        StructField("p", IntegerType()),
        StructField("t", StructType([StructField("r", IntegerType())])),
    ])),
    StructField("items", ArrayType(StructType([
        StructField("a", IntegerType()),
        StructField("tags", ArrayType(
            StructType([StructField("g", IntegerType())])
        )),
    ]))),
    StructField("meta", ArrayType(StructType([
        StructField("k", StringType()),
    ]))),
    StructField("nums", ArrayType(IntegerType())),
])


def _flat_rows(shape):
    """Deterministic values from the hypothesis-sampled SHAPE list of
    (items_len|None, meta_len|None, tags_len, s_null) — hypothesis
    explores structure (lengths, nulls), not values."""
    rows = []
    for i, (ilen, mlen, tlen, s_null) in enumerate(shape):
        s = None if s_null else (i * 7, (i * 11,))
        items = None if ilen is None else [
            (i * 100 + j,
             [(i * 1000 + j * 10 + t,) for t in range(tlen)])
            for j in range(ilen)
        ]
        meta = None if mlen is None else [(f"k{i}_{j}",) for j in range(mlen)]
        rows.append((i, s, items, meta, [i, i + 1]))
    return rows


def _duck_flatten_sql(src, sep, outer, targets):
    """Chained-CTE DuckDB twin of operators.flatten: one CTE per
    engine pass (struct expansion select, then one UNNEST join per
    exploded array), driven by the same plan-time schema walk."""
    fields = list(_FLAT_SCHEMA.fields)
    ctes = [f"c0 AS (SELECT * FROM read_parquet('{src}/*.parquet'))"]
    prev, n = "c0", 0
    for _ in range(32):
        structs = [f.name for f in fields
                   if isinstance(f.dataType, StructType)]
        arrays = [f.name for f in fields
                  if isinstance(f.dataType, ArrayType)
                  and isinstance(f.dataType.elementType, StructType)
                  and (targets is None or f.name in targets)]
        if not structs and not arrays:
            break
        if structs:
            cols, nf = [], []
            for f in fields:
                if f.name in structs:
                    for ch in f.dataType.fields:
                        cols.append(
                            f'"{f.name}"."{ch.name}" AS '
                            f'"{f.name}{sep}{ch.name}"'
                        )
                        nf.append(StructField(
                            f"{f.name}{sep}{ch.name}", ch.dataType
                        ))
                else:
                    cols.append(f'"{f.name}"')
                    nf.append(f)
            n += 1
            ctes.append(
                f"c{n} AS (SELECT {', '.join(cols)} FROM {prev})"
            )
            prev, fields = f"c{n}", nf
        for name in arrays:
            if name not in [f.name for f in fields]:
                continue  # renamed by the struct expansion above
            elem = next(
                f for f in fields if f.name == name
            ).dataType.elementType
            others = ", ".join(
                f'"{f.name}"' for f in fields if f.name != name
            )
            join = (
                f'LEFT JOIN UNNEST({prev}."{name}") AS __u(__e) ON true'
                if outer
                else f', UNNEST({prev}."{name}") AS __u(__e)'
            )
            n += 1
            ctes.append(
                f'c{n} AS (SELECT {others}, __u.__e AS "{name}" '
                f"FROM {prev} {join})"
            )
            prev = f"c{n}"
            fields = [
                StructField(name, elem) if f.name == name else f
                for f in fields
            ]
    return ",\n".join(ctes), prev, fields


@settings(**SETTINGS)
@given(
    shape=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 3)),   # items len
            st.one_of(st.none(), st.integers(0, 2)),   # meta len
            st.integers(0, 2),                         # tags len
            st.booleans(),                             # s is NULL
        ),
        min_size=1, max_size=6,
    ),
    outer=st.booleans(),
    targets_ix=st.sampled_from(range(3)),
)
def test_flatten_parity(spark, tmp_path_factory, shape, outer, targets_ix):
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.flatten import (  # noqa: E501
        flatten,
    )

    targets = [None, {"items"}, set()][targets_ix]
    src = str(tmp_path_factory.mktemp("flatfuzz"))
    df = spark.createDataFrame(_flat_rows(shape), _FLAT_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(src)

    got_df = flatten(
        spark.read.parquet(src), outer=outer, explode_targets=targets
    )
    ctes, prev, fields = _duck_flatten_sql(src, "_", outer, targets)
    # identical flattened schemas (names AND order) first
    assert got_df.columns == [f.name for f in fields]

    # comparable projection: scalars and array<int> compare directly;
    # any remaining array-of-struct (an un-targeted array) compares
    # by cardinality (NULL -> -1) on both sides
    sel_spark, sel_sql = [], []
    for f in fields:
        if isinstance(f.dataType, ArrayType) and isinstance(
            f.dataType.elementType, StructType
        ):
            sel_spark.append(
                F.coalesce(F.size(f'`{f.name}`'), F.lit(-1))
                .alias(f.name)
            )
            sel_sql.append(
                f'COALESCE(LEN("{f.name}"), -1) AS "{f.name}"'
            )
        else:
            sel_spark.append(F.col(f"`{f.name}`"))
            sel_sql.append(f'"{f.name}"')

    def canon(v):
        return tuple(tuple(x) if isinstance(x, list) else x for x in v)

    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    got = sorted(
        (canon(tuple(r)) for r in got_df.select(*sel_spark).collect()),
        key=key,
    )
    sql = f"WITH {ctes} SELECT {', '.join(sel_sql)} FROM {prev}"
    con = duckdb.connect()
    try:
        want = sorted((canon(r) for r in con.sql(sql).fetchall()), key=key)
    finally:
        con.close()
    assert got == want, (outer, targets, sql)


# ---------------------------------------------------------------------
# dimension 10: as-of join vs DuckDB's native ASOF LEFT JOIN
# ---------------------------------------------------------------------
#
# The engine's asof_join (operators/asof.py — the single-shuffle
# union+window formulation) against DuckDB's built-in ASOF JOIN on
# hypothesis-generated (key, ts) streams: random left probes, random
# right states with UNIQUE (key, ts) (the tiebreak-free contract both
# engines define identically), including empty sides, keys with no
# right history, and exact ts collisions (backward semantics include
# right_ts == left_ts).  Integer-exact throughout, so any divergence
# is a real defect in the window formulation, not float noise.

_ASOF_SCHEMA_L = "lid INT, k INT, ts INT"
_ASOF_SCHEMA_R = "k INT, ts INT, val INT"


@settings(**SETTINGS)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20)),
        min_size=0, max_size=12,
    ),
    right=st.lists(
        st.tuples(
            st.integers(0, 3), st.integers(0, 20), st.integers(-5, 5)
        ),
        min_size=0, max_size=12,
        unique_by=lambda t: (t[0], t[1]),
    ),
)
def test_asof_join_parity(spark, left, right):
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.asof import asof_join

    import pandas as pd

    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)], _ASOF_SCHEMA_L
    )
    rdf = spark.createDataFrame(list(right), _ASOF_SCHEMA_R)
    got = sorted(
        tuple(r)
        for r in asof_join(
            ldf, rdf, "k", "k", "ts", "ts", ["val"]
        ).collect()
    )

    lpd = pd.DataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)],
        columns=["lid", "k", "ts"],
    ).astype("int32")
    rpd = pd.DataFrame(
        list(right), columns=["k", "ts", "val"]
    ).astype("int32")
    con = duckdb.connect()
    try:
        con.register("l", lpd)
        con.register("r", rpd)
        want = sorted(
            tuple(r)
            for r in con.sql(
                "SELECT l.lid, l.k, l.ts, r.val, r.ts AS asof_ts "
                "FROM l ASOF LEFT JOIN r "
                "ON l.k = r.k AND l.ts >= r.ts"
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want, (left, right)


# ---------------------------------------------------------------------
# dimension 11: banded range join vs DuckDB's native non-equi join
# ---------------------------------------------------------------------
#
# The engine's band_join (operators/rangejoin.py — bucketed interval
# join: explode left to <= 2 bucket ids, hash equi-join, exact band
# post-filter) against DuckDB evaluating the band predicate directly.
# Random probe/state streams with optional key columns, bands of
# random width/offset (including negative lower bounds and
# bucket-boundary-straddling matches).  Integer-exact.


@settings(**SETTINGS)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)),
        min_size=0, max_size=10,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 9)),
        min_size=0, max_size=10,
    ),
    lower=st.integers(-10, 5),
    width=st.integers(1, 12),
    keyed=st.booleans(),
)
def test_band_join_parity(spark, left, right, lower, width, keyed):
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.rangejoin import band_join

    import pandas as pd

    upper = lower + width
    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)],
        "lid INT, k INT, lts INT",
    )
    rdf = spark.createDataFrame(
        list(right), "k INT, rts INT, val INT"
    )
    keys = ["k"] if keyed else []
    got = sorted(
        (r["lid"], r["rts"], r["val"])
        for r in band_join(
            ldf, rdf, "lts", "rts", lower, upper, keys=keys
        ).collect()
    )

    lpd = pd.DataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)],
        columns=["lid", "k", "lts"],
    ).astype("int32")
    rpd = pd.DataFrame(
        list(right), columns=["k", "rts", "val"]
    ).astype("int32")
    con = duckdb.connect()
    try:
        con.register("l", lpd)
        con.register("r", rpd)
        keycond = "AND l.k = r.k " if keyed else ""
        want = sorted(
            tuple(r)
            for r in con.sql(
                f"SELECT l.lid, r.rts, r.val FROM l JOIN r ON "
                f"r.rts - l.lts > {lower} AND r.rts - l.lts <= {upper} "
                f"{keycond}"
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want, (lower, upper, keyed, left, right)


# ---------------------------------------------------------------------
# dimension 12: batch sessionize vs a DuckDB lag/cumsum twin
# ---------------------------------------------------------------------
#
# Gap-based sessionization (operators/sessionize.py) against the SQL
# formulation written independently in DuckDB (lag -> boundary flag
# -> running sum), on random event streams with duplicate timestamps
# (the tiebreak column makes ordering total on both engines),
# boundary-exact gaps (gap == gap_seconds stays in-session; the
# engine uses strict >), and single-event users.


@settings(**SETTINGS)
@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 120)),
        min_size=1, max_size=25,
    ),
    gap=st.integers(1, 40),
)
def test_sessionize_parity(spark, events, gap):
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.sessionize import sessionize

    import pandas as pd

    df = spark.createDataFrame(
        [(i, u, ts) for i, (u, ts) in enumerate(events)],
        "eid INT, user_id INT, ts INT",
    )
    got = sorted(
        (r["eid"], r["session_id"])
        for r in sessionize(
            df, gap_seconds=gap, order_tiebreak="eid"
        ).collect()
    )

    pdf = pd.DataFrame(
        [(i, u, ts) for i, (u, ts) in enumerate(events)],
        columns=["eid", "user_id", "ts"],
    ).astype("int64")
    con = duckdb.connect()
    try:
        con.register("e", pdf)
        want = sorted(
            tuple(r)
            for r in con.sql(f"""
                WITH lagged AS (
                  SELECT eid, user_id, ts,
                         CASE WHEN lag(ts) OVER w IS NULL
                                OR ts - lag(ts) OVER w > {gap}
                              THEN 1 ELSE 0 END AS boundary
                  FROM e
                  WINDOW w AS (PARTITION BY user_id ORDER BY ts, eid)
                )
                SELECT eid,
                       SUM(boundary) OVER (
                         PARTITION BY user_id ORDER BY ts, eid
                         ROWS UNBOUNDED PRECEDING) AS session_id
                FROM lagged
            """).fetchall()
        )
    finally:
        con.close()
    assert got == want, (gap, events)


# ---------------------------------------------------------------------
# dimension 13: DP noise mechanism vs a pure-Python replay, across the
# (scale, tag) parameter space
# ---------------------------------------------------------------------
#
# The registry query certifies ONE (clip, eps) point; this dimension
# samples the mechanism space: for random Laplace scales and tags,
# the Spark literal-table lookup and the DuckDB SQL twin must both
# replay the pure-Python inverse-CDF mechanism value-for-value.


@settings(**SETTINGS)
@given(
    b_scale=st.one_of(
        st.integers(1, 50), st.integers(10**3, 10**9)
    ),
    tag=st.sampled_from(["dpsum", "dpcnt", "x", "release:v2"]),
    keys=st.lists(
        st.integers(0, 10**6), min_size=1, max_size=8, unique=True
    ),
)
def test_dp_noise_parity(spark, b_scale, tag, keys):
    import hashlib

    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators import dp

    t = dp.laplace_noise_table(float(b_scale))
    # pure-Python reference
    want = {
        k: t[int(hashlib.md5(f"{tag}:{k}".encode()).hexdigest()[:2], 16)]
        for k in keys
    }
    # Spark
    sdf = spark.createDataFrame([(k,) for k in keys], "k BIGINT").select(
        "k", dp.noise_value(t, tag, F.col("k")).alias("noise")
    )
    got_spark = {r["k"]: r["noise"] for r in sdf.collect()}
    assert got_spark == want, (b_scale, tag)
    # DuckDB
    con = duckdb.connect()
    try:
        vals = ", ".join(f"({k})" for k in keys)
        got_duck = dict(
            con.sql(
                f"SELECT k, {dp.noise_value_sql(t, tag, 'k')} "
                f"FROM (VALUES {vals}) t(k)"
            ).fetchall()
        )
    finally:
        con.close()
    assert got_duck == want, (b_scale, tag)


# ---------------------------------------------------------------------
# dimension 14: fixed-point ALS half step vs an independent integer
# simulation, on random sparse rating matrices
# ---------------------------------------------------------------------
#
# Proves the distributed half step (join + groupBy + DIV) computes
# the declared lattice function on ANY matrix shape — including
# entities with a single partner, ratings at the cap, and factor
# values at both lattice ends — against plain-Python integer math
# (floor division on positives == Spark DIV == DuckDB //).


@settings(**SETTINGS)
@given(
    cells=st.dictionaries(
        st.tuples(st.integers(0, 6), st.integers(0, 9)),
        st.integers(1, 100),
        min_size=1,
        max_size=30,
    ),
    factors=st.dictionaries(
        st.integers(0, 9), st.integers(0, 10_000), min_size=10,
        max_size=10,
    ),
    lam_s2=st.integers(1, 10**6),
)
def test_als_half_step_parity(spark, cells, factors, lam_s2):
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.als import (
        S,
        rank1_half_step_int,
    )

    r = spark.createDataFrame(
        [(c, p, q) for (c, p), q in cells.items()],
        "c BIGINT, p BIGINT, q BIGINT",
    )
    v = spark.createDataFrame(
        list(factors.items()), "p BIGINT, v BIGINT"
    )
    got = {
        row["c"]: row["u"]
        for row in rank1_half_step_int(
            r, "c", "p", v, "v", "u", lam_s2
        ).collect()
    }
    want = {}
    for c in {c for (c, _) in cells}:
        d = sum(q * factors[p] for (cc, p), q in cells.items() if cc == c)
        a = sum(
            factors[p] * factors[p]
            for (cc, p), _ in cells.items()
            if cc == c
        )
        want[c] = (S * d) // (a + lam_s2)
    assert got == want, (cells, factors, lam_s2)


# ---------------------------------------------------------------------
# dimension 15: the generic DP readout (dp.release) vs a pure-Python
# replay, across random spec lists and aggregate tables
# ---------------------------------------------------------------------
#
# dp.release is the piece streaming rollups publish through; this
# samples (table, specs) space: released values, per-column noise,
# and the sequential-composition ledger must all replay exactly.


@settings(**SETTINGS)
@given(
    rows=st.dictionaries(
        st.integers(0, 10**9), st.integers(-10**9, 10**9),
        min_size=1, max_size=10,
    ),
    specs=st.lists(
        st.tuples(
            st.sampled_from(["m0", "m1", "m2"]),
            st.integers(1, 10**6),          # sensitivity
            st.sampled_from([250_000, 500_000, 1_000_000, 2_000_000]),
        ),
        min_size=1, max_size=3, unique_by=lambda s: s[0],
    ),
)
def test_dp_release_parity(spark, rows, specs):
    import hashlib

    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators import dp

    cols = sorted({name for name, _, _ in specs})
    df = spark.createDataFrame(
        [(k,) + tuple(v for _ in cols) for k, v in rows.items()],
        "k bigint, " + ", ".join(f"{c} bigint" for c in cols),
    )
    out = {
        r["k"]: r.asDict()
        for r in dp.release(
            df, "k", [(n, s, e) for n, s, e in specs if n in cols]
        ).collect()
    }
    eps_total = sum(e for n, _, e in specs if n in cols)
    for k, v in rows.items():
        got = out[k]
        assert got["eps_total_ppm"] == eps_total
        for name, sens, eps in specs:
            if name not in cols:
                continue
            t = dp.laplace_noise_table(sens / (eps / 1e6))
            b = int(
                hashlib.md5(f"dp:{name}:{k}".encode()).hexdigest()[:2],
                16,
            )
            assert got[f"{name}_noise"] == t[b]
            assert got[f"{name}_released"] == v + t[b]
