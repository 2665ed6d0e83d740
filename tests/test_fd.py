"""Frequent Directions matrix sketch (operators/fd.py): the
deterministic spectral guarantee, mergeability, and the registry
readout — the certified-approximation test pattern the sketch family
uses (KMV/CMS/q-digest accuracy suites), lifted to linear algebra."""

from __future__ import annotations

import numpy as np
import pytest

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.fd import (
    _fd_stream,
    fd_merge,
    frequent_directions,
)

SF = "/root/testdata/sf0.001"


def _gram(x: np.ndarray) -> np.ndarray:
    return x.T @ x


def _max_eig_gap(g: np.ndarray, b: np.ndarray) -> float:
    """lambda_max(G - B'B) — the quantity FD bounds by ||A||_F^2/ell."""
    return float(np.linalg.eigvalsh(g - b.T @ b).max())


# ---------------------------------------------------------------- numpy core


def test_fd_stream_bound_random():
    """On adversarially shaped random data the spectral gap respects
    ||A||_F^2 / ell, and B'B never overshoots G (PSD direction)."""
    rng = np.random.default_rng(7)
    # anisotropic: a few dominant directions + noise floor
    x = rng.normal(size=(400, 32)) * np.linspace(5, 0.1, 32)
    ell = 8
    b, mass, n = _fd_stream(iter([x[:150], x[150:151], x[151:]]), ell, 32)
    assert n == 400
    assert mass == pytest.approx(float((x * x).sum()), rel=1e-12)
    g = _gram(x)
    gap = _max_eig_gap(g, b)
    assert gap <= mass / ell + 1e-9 * mass
    # PSD direction: G - B'B >= 0 (up to fp noise)
    assert float(np.linalg.eigvalsh(g - b.T @ b).min()) >= -1e-6 * mass


def test_fd_stream_exact_when_rank_fits():
    """Inputs spanning <= ell dimensions are recovered EXACTLY:
    every shrink sees sigma_ell = 0, so no error is ever added."""
    rng = np.random.default_rng(11)
    basis = rng.normal(size=(5, 24))
    x = rng.normal(size=(300, 5)) @ basis
    b, mass, n = _fd_stream(iter([x]), 16, 24)
    assert np.allclose(b.T @ b, _gram(x), atol=1e-8 * mass)


def test_fd_merge_keeps_bound():
    """Merging per-chunk sketches (concatenate + shrink) keeps the
    SAME ||A||_F^2/ell guarantee vs the combined Gram — FD's
    mergeability, the property the distributed pass relies on."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(600, 16)) * np.linspace(3, 0.2, 16)
    ell = 6
    chunks = np.array_split(x, 4)
    sks = [_fd_stream(iter([c]), ell, 16)[0] for c in chunks]
    merged = fd_merge(sks, ell)
    mass = float((x * x).sum())
    assert _max_eig_gap(_gram(x), merged) <= mass / ell + 1e-9 * mass


def test_fd_stream_empty():
    b, mass, n = _fd_stream(iter([]), 4, 8)
    assert n == 0 and mass == 0.0 and not b.any()


# ----------------------------------------------------------- distributed path


def test_frequent_directions_bound_on_embeddings(spark):
    """The full distributed pass (mapInPandas partials + driver
    merge) honors the bound against the exact Gram of the sf0.001
    embeddings table, at two partitionings (partition composition
    changes the sketch, never the guarantee)."""
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.data import load

    e = load(spark, SF, "embeddings")
    x = np.asarray(
        [np.asarray(r["embedding"], dtype=np.float64) for r in
         e.select("embedding").collect()]
    )
    g = _gram(x)
    mass = float((x * x).sum())
    for parts in (1, 7):
        b, frob_sq, n = frequent_directions(
            e.repartition(parts), "embedding", ell=16, d=64
        )
        assert n == len(x)
        assert frob_sq == pytest.approx(mass, rel=1e-9)
        assert _max_eig_gap(g, b) <= frob_sq / 16 + 1e-9 * frob_sq


def test_fd_profile_query(spark):
    """Registry readout: top components ordered, all within the FD
    bound, exact >= estimate (the PSD direction) on every row."""
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries import SPARK_QUERIES

    rows = SPARK_QUERIES["embedding_fd_profile"](spark, SF).collect()
    assert [r["component"] for r in rows] == list(range(8))
    for r in rows:
        assert r["within_bound"]
        assert r["gap"] >= -1e-4
        assert r["gap"] <= r["fd_bound"] + 1e-4


# -------------------------------------------------------------- property
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 10_000),
    cuts=st.lists(st.integers(1, 199), max_size=4, unique=True),
    nested=st.booleans(),
)
def test_fd_bound_under_any_merge_tree(seed, cuts, nested):
    """FD mergeability as a property: for ANY split of the stream
    into chunks and EITHER merge shape (flat concat-of-all vs
    left-deep pairwise), the merged sketch keeps the ||A||_F^2/ell
    guarantee vs the whole-stream Gram — the invariant the
    distributed pass and the streaming maintainer both rely on.
    (Pure numpy: no Spark fixture, so shrinking is cheap.)"""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(200, 12)) * np.linspace(4, 0.1, 12)
    ell = 5
    bounds = sorted(set(cuts)) + [200]
    chunks, lo = [], 0
    for hi in bounds:
        if hi > lo:
            chunks.append(x[lo:hi])
            lo = hi
    sks = [_fd_stream(iter([c]), ell, 12)[0] for c in chunks]
    if nested:
        merged = sks[0]
        for s in sks[1:]:
            merged = fd_merge([merged, s], ell)
    else:
        merged = fd_merge(sks, ell)
    mass = float((x * x).sum())
    gap = _max_eig_gap(_gram(x), merged)
    assert gap <= mass / ell + 1e-9 * mass
    # PSD direction holds through every merge shape too
    assert float(
        np.linalg.eigvalsh(_gram(x) - merged.T @ merged).min()
    ) >= -1e-6 * mass
