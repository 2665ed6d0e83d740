"""Spot-check host cleanliness before a timed bench run.

Prints the single-thread and saturating canary readings using the
EXACT probes bench.py records (imported, not reimplemented), plus a
go/no-go against the round's observed clean floors.  r9 lesson: on
this box the 1-thread probe misses multi-core steal entirely — only
bench when BOTH probes read clean, because under the cap-8 sliding
merge a mediocre run can age a diverse clean run out of the series
and RAISE the committed figure.

Usage:  python tools/spot_canary.py [n_procs]
"""

from __future__ import annotations

import importlib.util
import os
import sys

#: observed clean floors on this box (r11 series; update per round —
#: r11's cleanest readings: st 0.1251 bench-recorded, mt 0.1337
#: spot / 0.1463 bench-recorded)
ST_CLEAN = 0.125
MT_CLEAN = 0.146


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else (os.cpu_count() or 8)
    spec = importlib.util.spec_from_file_location(
        "benchmod",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench.py",
        ),
    )
    bench = importlib.util.module_from_spec(spec)
    # register BEFORE exec: Pool task pickling resolves workers'
    # _canary_loop by module name, which must be importable-by-cache
    sys.modules["benchmod"] = bench
    spec.loader.exec_module(bench)
    st = bench._canary()
    mt, mt_degraded = bench._canary_mt(n)
    if mt_degraded:
        print(f"WARNING: mt probe degraded to 1-thread ({mt_degraded})")
    verdict = (
        "CLEAN — bench now"
        if st <= 1.15 * ST_CLEAN and mt <= 1.15 * MT_CLEAN
        else "HOT — wait (a run now may age a clean run out of the merge)"
    )
    print(f"st {st}  (clean floor {ST_CLEAN})")
    print(f"mt {mt}  (clean floor {MT_CLEAN}, n={n})")
    print(verdict)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
