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
    # the continuation additions (still never-certified until the
    # round-6 driver run) must sit INSIDE the 50-entry window
    for name in ("min_cost_supplier", "reach_hll_relational"):
        assert name in text, f"{name} missing from audit output"
    # healthy states: every never-certified entry inside the window
    # ("window OK"), or more never-certified entries than slots with
    # every slot spent on one ("window PACKED") — a WARNING means a
    # certified entry occupies a slot a never-certified one needs
    assert ("window OK" in text) or ("window PACKED" in text), text[-500:]
