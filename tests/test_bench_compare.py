"""Unit tests for tools/bench_compare.py: series grouping by
fingerprint, within-series min-merge, and delta classification."""

from __future__ import annotations

import importlib.util
import json
import os

_spec = importlib.util.spec_from_file_location(
    "bench_compare",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "bench_compare.py",
    ),
)
bc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bc)


def _detail(path, fingerprint, this_run):
    with open(path, "w") as fh:
        json.dump({"fingerprint": fingerprint, "this_run": this_run}, fh)


def test_load_series_min_merges_within_fingerprint(tmp_path):
    _detail(tmp_path / "BENCH_DETAIL_a.json", "fp1", {"q1": 2.0, "q2": 1.0})
    _detail(tmp_path / "BENCH_DETAIL_b.json", "fp1", {"q1": 1.5, "q2": 3.0})
    _detail(tmp_path / "BENCH_DETAIL_c.json", "fp2", {"q1": 9.9})
    series = bc.load_series(str(tmp_path))
    assert set(series) == {"fp1", "fp2"}
    # per-query MIN across same-fingerprint runs, never across series
    assert series["fp1"]["queries"] == {"q1": 1.5, "q2": 1.0}
    assert series["fp2"]["queries"] == {"q1": 9.9}
    assert len(series["fp1"]["files"]) == 2


def test_compare_classifies_deltas():
    old = {"q1": 1.0, "q2": 5.0, "gone": 2.0}
    new = {"q1": 2.0, "q2": 4.0, "fresh": 0.7}
    rep = bc.compare(old, new, threshold=0.5)
    assert rep["common"] == 2
    assert list(rep["regressions"]) == ["q1"]
    assert rep["regressions"]["q1"]["delta"] == 1.0
    assert list(rep["improvements"]) == ["q2"]
    assert rep["added"] == {"fresh": 0.7}
    assert rep["removed"] == ["gone"]
    # sub-threshold deltas are neither regressions nor improvements
    rep2 = bc.compare({"q": 1.0}, {"q": 1.3}, threshold=0.5)
    assert not rep2["regressions"] and not rep2["improvements"]


def test_compare_totals_cover_common_only():
    rep = bc.compare({"a": 1.0, "b": 2.0}, {"a": 1.5, "c": 9.0}, 0.5)
    assert rep["old_total"] == 1.0
    assert rep["new_total"] == 1.5
