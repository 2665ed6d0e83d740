"""Inspect a Delta-protocol table's transaction log (no Spark, no
delta-spark): per-version operation, action counts, live-file and
byte totals, txn watermarks, checkpoint placement, and stats
coverage — the at-a-glance health view before pointing a job at a
table.

Usage:  python tools/delta_inspect.py /path/to/table
"""

from __future__ import annotations

import json
import os
import sys


def main(path: str) -> int:
    log = os.path.join(os.path.abspath(path.rstrip("/")), "_delta_log")
    if not os.path.isdir(log):
        print(f"no _delta_log under {path}")
        return 1
    jsons = sorted(
        int(f[:-5]) for f in os.listdir(log)
        if f.endswith(".json") and f[:-5].isdigit()
    )
    cps = sorted(
        int(f.split(".")[0]) for f in os.listdir(log)
        if f.endswith(".checkpoint.parquet") and f.split(".")[0].isdigit()
    )
    live: dict[str, dict] = {}
    txns: dict[str, int] = {}
    print(f"{'ver':>5}  {'op':<10} {'adds':>5} {'rm':>4}  notes")
    for v in jsons:
        op, n_add, n_rm, notes = "?", 0, 0, []
        with open(os.path.join(log, f"{v:020d}.json")) as fh:
            for line in fh:
                a = json.loads(line)
                if "commitInfo" in a:
                    op = a["commitInfo"].get("operation", "?")
                elif "metaData" in a:
                    notes.append("metaData")
                elif "add" in a:
                    n_add += 1
                    live[a["add"]["path"]] = a["add"]
                elif "remove" in a:
                    n_rm += 1
                    live.pop(a["remove"]["path"], None)
                elif "txn" in a:
                    t = a["txn"]
                    txns[t["appId"]] = max(
                        txns.get(t["appId"], -1), int(t["version"])
                    )
                    notes.append(f"txn {t['appId']}={t['version']}")
        if v in cps:
            notes.append("CHECKPOINT")
        print(f"{v:>5}  {op:<10} {n_add:>5} {n_rm:>4}  {'; '.join(notes)}")
    n_stats = sum(1 for a in live.values() if a.get("stats"))
    size = sum(int(a.get("size", 0)) for a in live.values())
    print(f"\nlive files: {len(live)} ({size:,} bytes), "
          f"{n_stats} with stats")
    if cps:
        print(f"checkpoints: {cps} (JSON head starts at "
              f"{jsons[0] if jsons else '<none>'})")
    for app, wm in sorted(txns.items()):
        print(f"txn watermark: {app} -> {wm}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "."))
