"""Compare two bench detail files (or a detail file against a prior
round's truncated BENCH_r{N}.json tail) per query.

Usage:
  python tools/bench_compare.py OLD.json NEW.json [--md]

Accepts either the bench_out/BENCH_DETAIL_*.json format ({"queries":
{...}}) or a driver BENCH_r{N}.json whose "tail" field embeds a
(possibly truncated) per-query JSON — recoverable pairs are parsed
out with a regex.  Timing on this box is noisy (external CPU
contention): prefer comparing MIN-of-several-runs per side.
"""

from __future__ import annotations

import json
import re
import sys


def load_times(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    if "queries" in d and isinstance(d["queries"], dict):
        return {k: float(v) for k, v in d["queries"].items()}
    if "tail" in d:
        return {
            k: float(v)
            for k, v in re.findall(r'"([a-z0-9_]+)": ([0-9.]+)', d["tail"])
        }
    raise SystemExit(f"{path}: unrecognized bench format")


def merge_min(paths: list[str]) -> dict[str, float]:
    out: dict[str, float] = {}
    for p in paths:
        for k, v in load_times(p).items():
            out[k] = min(out.get(k, v), v)
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--md"]
    md = "--md" in sys.argv
    # OLD may be several files joined by ',' -> min across runs; same NEW
    old = merge_min(args[0].split(","))
    new = merge_min(args[1].split(","))
    common = sorted(set(old) & set(new), key=lambda k: old[k] - new[k])
    t_old = sum(old[k] for k in common)
    t_new = sum(new[k] for k in common)
    if md:
        print(f"| query | old s | new s | delta |")
        print(f"|---|---|---|---|")
        for k in common:
            print(f"| {k} | {old[k]:.2f} | {new[k]:.2f} | "
                  f"{new[k]-old[k]:+.2f} |")
        print(f"| **total ({len(common)} common)** | **{t_old:.1f}** | "
              f"**{t_new:.1f}** | **{t_new-t_old:+.1f}** |")
    else:
        for k in common:
            print(f"{new[k]-old[k]:+7.2f}  {old[k]:7.2f} -> {new[k]:7.2f}  {k}")
        print(f"common {len(common)}: old {t_old:.1f}s new {t_new:.1f}s")
    extra = sorted(set(new) - set(old), key=lambda k: -new[k])
    if extra:
        print(f"new-only: {[(k, new[k]) for k in extra]}")


if __name__ == "__main__":
    main()
