"""Compare two bench fingerprint series per query and flag real
regressions.

Every round closes with a hand-computed "rX vs rY per-query" table in
BENCH_NOTES (r5: judge recomputed it; r6: builder recomputed it).
This tool mechanizes that: it groups ``bench_out/BENCH_DETAIL_*.json``
files by source fingerprint, min-merges per-query times within each
series (the documented protocol — min-of-several removes box-noise
spikes that land on whichever heavy query they overlap), and prints
the per-query delta between the two most recent series (or two
fingerprints given on the command line).

Usage:
    python tools/bench_compare.py                    # latest two series
    python tools/bench_compare.py FP_OLD FP_NEW      # explicit series
    python tools/bench_compare.py --threshold=0.5    # regression floor

Exit status is 0 always — this is a reporting tool; the bench gate is
the committed BENCH_r{N}.json, not this comparison (a new heavy query
is an intentional "regression" in total time).
"""

from __future__ import annotations

import glob
import json
import os
import sys


def load_series(out_dir: str) -> dict[str, dict]:
    """fingerprint -> {"queries": min-merged times, "files": [...],
    "latest": mtime of the newest contributing detail file}."""
    series: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(out_dir, "BENCH_DETAIL_*.json"))):
        try:
            with open(path) as fh:
                d = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        fp = d.get("fingerprint", "unknown")
        qs = d.get("this_run") or d.get("queries") or {}
        ent = series.setdefault(
            fp, {"queries": {}, "files": [], "latest": 0.0}
        )
        for name, sec in qs.items():
            if isinstance(sec, (int, float)):
                ent["queries"][name] = min(
                    ent["queries"].get(name, float("inf")), sec
                )
        ent["files"].append(path)
        ent["latest"] = max(ent["latest"], os.path.getmtime(path))
    return series


def compare(
    old: dict[str, float], new: dict[str, float], threshold: float
) -> dict:
    common = sorted(set(old) & set(new))
    deltas = {q: round(new[q] - old[q], 3) for q in common}
    return {
        "common": len(common),
        "old_total": round(sum(old[q] for q in common), 1),
        "new_total": round(sum(new[q] for q in common), 1),
        "regressions": {
            q: {"old": old[q], "new": new[q], "delta": d}
            for q, d in sorted(
                deltas.items(), key=lambda kv: -kv[1]
            )
            if d > threshold
        },
        "improvements": {
            q: {"old": old[q], "new": new[q], "delta": d}
            for q, d in sorted(deltas.items(), key=lambda kv: kv[1])
            if d < -threshold
        },
        "added": {
            q: new[q] for q in sorted(set(new) - set(old))
        },
        "removed": sorted(set(old) - set(new)),
    }


def main() -> int:
    threshold = next(
        (
            float(a.split("=", 1)[1])
            for a in sys.argv[1:]
            if a.startswith("--threshold=")
        ),
        0.5,
    )
    fps = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_out",
    )
    series = load_series(out_dir)
    if len(series) < 2:
        print(f"need >=2 fingerprint series in {out_dir}, "
              f"found {len(series)}")
        return 0
    if len(fps) == 2:
        try:
            old_fp, new_fp = fps
            old, new = series[old_fp], series[new_fp]
        except KeyError as e:
            print(f"unknown fingerprint {e}; have: {sorted(series)}")
            return 0
    else:
        ordered = sorted(series.items(), key=lambda kv: kv[1]["latest"])
        (old_fp, old), (new_fp, new) = ordered[-2], ordered[-1]
    rep = compare(old["queries"], new["queries"], threshold)
    rep["old_fingerprint"] = old_fp
    rep["new_fingerprint"] = new_fp
    rep["old_runs"] = len(old["files"])
    rep["new_runs"] = len(new["files"])
    print(json.dumps(rep, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
