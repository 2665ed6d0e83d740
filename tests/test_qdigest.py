"""q-digest operator invariants (operators/sketch.py): sigma=1
identity, interval decoding, the frozen-node < 2*sigma property, the
size bound, the rank-error guarantee on seeded random data, and the
merge algebra (union of digests + one more compress pass)."""

from __future__ import annotations

import random

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.sketch import (
    qdigest_compress,
    qdigest_intervals,
)

BITS = 8
U = 1 << BITS


def _leaves(spark, counts: dict, sigma: int):
    rows = [(U + b, int(c), int(sigma)) for b, c in counts.items()]
    return spark.createDataFrame(rows, "id bigint, cnt bigint, sigma bigint")


def _exact_cum(counts: dict) -> dict:
    cum, run = {}, 0
    for b in range(U):
        run += counts.get(b, 0)
        cum[b] = run
    return cum


def _digest_rank_errors(nodes, counts: dict, quantiles) -> list[int]:
    """Realized rank error of the digest's quantile answers vs the
    exact histogram (same suffix-of-cumsum rule as the query)."""
    n = sum(counts.values())
    cum = _exact_cum(counts)
    ordered = sorted(nodes, key=lambda r: (r.hi, r.id))
    errs = []
    for q in quantiles:
        target = int(q * n) + 1
        run, est = 0, None
        for r in ordered:
            run += r.cnt
            if run >= target:
                est = r.hi
                break
        assert est is not None
        n_le = cum[min(est, U - 1)]
        n_lt = cum[est - 1] if est > 0 else 0
        errs.append(max(0, target - n_le, n_lt + 1 - target))
    return errs


def test_sigma_one_is_exact_histogram(spark):
    counts = {0: 3, 5: 1, 200: 7, 255: 2}
    d = qdigest_compress(_leaves(spark, counts, 1), BITS).collect()
    assert {r.id - U: r.cnt for r in d} == counts


def test_interval_decoding(spark):
    rows = spark.createDataFrame(
        [(1, 1, 1), (2, 1, 1), (3, 1, 1), (U + 17, 1, 1)],
        "id bigint, cnt bigint, sigma bigint",
    )
    got = {
        r.id: (r.lvl, r.lo, r.hi)
        for r in qdigest_intervals(rows, BITS).collect()
    }
    assert got[1] == (0, 0, U - 1)  # root spans the universe
    assert got[2] == (1, 0, U // 2 - 1)
    assert got[3] == (1, U // 2, U - 1)
    assert got[U + 17] == (BITS, 17, 17)  # leaf is a point


def test_size_frozen_and_rank_bounds(spark):
    rng = random.Random(7)
    counts = {b: rng.randint(1, 50) for b in range(U)}
    n = sum(counts.values())
    sigma = max(1, n // 32)
    d = qdigest_intervals(
        qdigest_compress(_leaves(spark, counts, sigma), BITS), BITS
    ).collect()
    assert sum(r.cnt for r in d) == n  # mass conservation
    assert len(d) <= n // sigma + BITS + 1  # size bound
    for r in d:  # frozen internal nodes absorbed two light children
        if r.lvl < BITS:
            assert r.cnt < 2 * sigma, (r.id, r.cnt)
    errs = _digest_rank_errors(d, counts, (0.01, 0.25, 0.5, 0.75, 0.99))
    assert max(errs) <= 2 * sigma * BITS
    # and the compression is non-trivial (far fewer nodes than leaves)
    assert len(d) < len(counts) // 2


def test_merge_is_one_more_compress_pass(spark):
    rng = random.Random(11)
    a = {b: rng.randint(1, 30) for b in range(0, U, 2)}
    b = {k: rng.randint(1, 30) for k in range(0, U, 3)}
    n = sum(a.values()) + sum(b.values())
    sigma = max(1, n // 64)
    da = qdigest_compress(_leaves(spark, a, sigma), BITS)
    db = qdigest_compress(_leaves(spark, b, sigma), BITS)
    merged = qdigest_intervals(
        qdigest_compress(da.unionByName(db), BITS), BITS
    ).collect()
    assert sum(r.cnt for r in merged) == n
    combined = {
        k: a.get(k, 0) + b.get(k, 0) for k in set(a) | set(b)
    }
    errs = _digest_rank_errors(merged, combined, (0.1, 0.5, 0.9))
    # each input digest carries <= 2*sigma*BITS uncertainty and the
    # merge pass adds its own <= 2*sigma*BITS
    assert max(errs) <= 6 * sigma * BITS


def test_grouped_digests_are_independent(spark):
    """keys= builds one digest per group: a group's digest must be
    byte-identical to the digest of that group's data built alone."""
    rng = random.Random(5)
    a = {b: rng.randint(1, 20) for b in range(0, U, 2)}
    b = {k: rng.randint(1, 20) for k in range(1, U, 5)}
    sigma_a = max(1, sum(a.values()) // 16)
    sigma_b = max(1, sum(b.values()) // 16)

    def rows(counts, grp, sigma):
        return [
            (grp, U + k, int(c), int(sigma)) for k, c in counts.items()
        ]

    both = spark.createDataFrame(
        rows(a, "A", sigma_a) + rows(b, "B", sigma_b),
        "grp string, id bigint, cnt bigint, sigma bigint",
    )
    grouped = {
        ("A" if r.grp == "A" else "B", r.id): r.cnt
        for r in qdigest_compress(both, BITS, keys=("grp",)).collect()
    }
    for grp, counts, sigma in (("A", a, sigma_a), ("B", b, sigma_b)):
        solo = spark.createDataFrame(
            [(U + k, int(c), int(sigma)) for k, c in counts.items()],
            "id bigint, cnt bigint, sigma bigint",
        )
        want = {
            r.id: r.cnt for r in qdigest_compress(solo, BITS).collect()
        }
        got = {
            i: c for (g, i), c in grouped.items() if g == grp
        }
        assert got == want, grp
