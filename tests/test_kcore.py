"""k-core peeling: planted clique + pendant chain, cascade order,
and the empty-collapse fixpoint."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.kcore import (
    kcore,
    kcore_profile,
)


def _sym(spark, pairs):
    both = list(pairs) + [(b, a) for a, b in pairs]
    return spark.createDataFrame(
        sorted(set(both)), "src bigint, dst bigint"
    )


def _clique_plus_chain(spark):
    """K6 on nodes 0-5 (degree 5 inside) plus a pendant chain
    5-10-11-12: chain nodes have degree <= 2 and peel away at k=3,
    one hop per round from the free end."""
    clique = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    chain = [(5, 10), (10, 11), (11, 12)]
    return _sym(spark, clique + chain)


def test_kcore_finds_planted_clique(spark):
    edges = _clique_plus_chain(spark)
    core = {r.node: r.core_deg for r in kcore(edges, 3, 6).collect()}
    # the 3-core is exactly the K6; every member has degree 5 in it
    assert core == {i: 5 for i in range(6)}


def test_kcore_profile_converges_and_cascades(spark):
    edges = _clique_plus_chain(spark)
    prof = {
        r.round: (r.n_nodes, r.n_edges)
        for r in kcore_profile(edges, 3, 6).collect()
    }
    # chain degrees are 2,2,1 < 3: the whole chain drops in round 1,
    # leaving exactly the K6 (30 directed edges); later rounds hold
    assert prof[1] == (6, 30)
    assert prof[6] == (6, 30)

    # a genuine multi-round CASCADE: path 20-21-22 attached to the
    # clique via 20-0 and 20-1 gives node 20 degree 3 — it survives
    # round 1 only because 21 does not (21: deg 2, 22: deg 1), then
    # falls to degree 2 and peels in round 2
    extra = _sym(spark, [(i, j) for i in range(6) for j in range(i + 1, 6)]
                 + [(20, 0), (20, 1), (20, 21), (21, 22)])
    prof2 = {
        r.round: r.n_nodes for r in kcore_profile(extra, 3, 4).collect()
    }
    assert prof2 == {1: 7, 2: 6, 3: 6, 4: 6}


def test_kcore_collapse_to_empty(spark):
    # a cycle has uniform degree 2: k=3 wipes it out in one round
    cycle = [(i, (i + 1) % 5) for i in range(5)]
    edges = _sym(spark, cycle)
    prof = {r.round: r.n_nodes for r in kcore_profile(edges, 3, 3).collect()}
    assert prof == {1: 0, 2: 0, 3: 0}
    assert kcore(edges, 3, 3).count() == 0


# ------------------------------------------------ differential fuzz

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    raw=st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)),
        min_size=3,
        max_size=36,
    ),
    k=st.integers(2, 4),
)
def test_kcore_matches_python_reference_peel(spark, raw, k):
    """Differential fuzz (the test_differential_fuzz pattern applied
    to the iterative operator): hypothesis-generated random graphs,
    the SAME fixed number of peel rounds executed by a pure-python
    reference and by the distributed operator — parity must be exact
    whether or not the peel has converged, since both run the
    identical round count."""
    edges = {(a, b) for a, b in raw if a != b}
    sym = sorted(edges | {(b, a) for a, b in edges})
    if not sym:
        return
    rounds = 5
    cur = set(sym)
    for _ in range(rounds):
        deg = Counter(s for s, _ in cur)
        keep = {x for x, c in deg.items() if c >= k}
        cur = {(s, d) for s, d in cur if s in keep and d in keep}
    ref = dict(Counter(s for s, _ in cur))

    df = spark.createDataFrame(sym, "src bigint, dst bigint")
    got = {r.node: r.core_deg for r in kcore(df, k, rounds).collect()}
    assert got == ref, (sorted(sym), k)
