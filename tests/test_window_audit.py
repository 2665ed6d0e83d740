"""Smoke test for tools/window_audit.py (mirrors the delta_inspect
smoke): the audit must run against the real repo state, report the
registry size, and — because the continuation queries deliberately
sit BEHIND the mandated round-6 window — flag them as outside-window
rather than silently passing."""

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
    # the continuation additions have no driver row yet and sit
    # behind the mandated window by design — the audit must say so
    # explicitly (this is the r7 rotation's work list)
    assert "never driver-certified" in text
    for name in ("min_cost_supplier", "reach_hll_relational"):
        assert name in text, f"{name} missing from audit output"
