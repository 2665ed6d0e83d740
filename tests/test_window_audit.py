"""Smoke test for tools/window_audit.py (mirrors the delta_inspect
smoke): the audit must run against the real repo state, report the
registry size, and confirm that EVERY never-driver-certified entry
sits inside the driver's 50-entry window — the registry-ordering
invariant queries/__init__.py maintains each round."""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_window_audit_smoke():
    out = subprocess.run(
        [sys.executable, "tools/window_audit.py"],
        cwd=ROOT,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    text = out.stdout
    assert "registry entries" in text
    assert "never driver-certified" in text
    # healthy states: every never-certified entry inside the window
    # ("window OK"), or every slot spent on a never-certified or
    # latest-round-certified entry ("window PACKED" — the state a
    # post-close driver artifact produces).  A WARNING means a
    # STALE-certified entry occupies a slot a never-certified one
    # needs: that is the only rotation defect, and it cannot be
    # produced by a CORRECTNESS file landing after the builder's
    # close (those rows are latest-round by definition).
    assert ("window OK" in text) or ("window PACKED" in text), text[-800:]


def test_staged_queries_never_strand_outside_the_window():
    """The r9 insertion rule, pinned: a staged query module (built
    this round but deliberately NOT registered, e.g. queries/recsys
    awaiting its r10 slot) must be either absent from the registry or
    INSIDE the first 50 — the registered-but-stranded middle state is
    the rotation defect the slot-budget policy exists to prevent."""
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries import (
        SPARK_QUERIES,
    )
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries import (
        recsys,
    )

    window = list(SPARK_QUERIES)[:50]
    for name in recsys.SPARK_QUERIES:
        if name in SPARK_QUERIES:
            assert name in window, (
                f"{name} is registered but outside the 50-entry driver "
                f"window — never-certified entries must lead the window"
            )
        else:
            # staged: its oracle must exist so r10 registration is a
            # two-line import, and the in-test DuckDB replay
            # (tests/test_als.py) is its certification until then
            assert name in recsys.ORACLE_SQL
