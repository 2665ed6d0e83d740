"""Driver-window audit: which registry queries have a driver
correctness row from which round, and which have NEVER been
independently certified — the input for reordering the registry's
50-entry priority window each round (see queries/__init__.py).

Usage:  python tools/window_audit.py
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, ".")

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries import (  # noqa: E402
    SPARK_QUERIES,
)


def main() -> None:
    last_round: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(path.split("_r")[1].split(".")[0])
        try:
            keys = json.load(open(path)).keys()
        except Exception as exc:  # partial/corrupt round file
            print(f"warn: skipping {path}: {exc!r}", file=sys.stderr)
            continue
        for k in keys:
            last_round[k] = max(last_round.get(k, 0), rnd)

    never = [n for n in SPARK_QUERIES if n not in last_round]
    print(f"{len(SPARK_QUERIES)} registry entries; "
          f"{len(never)} never driver-certified")
    if never:
        print("\nnever certified (should lead the registry):")
        for n in never:
            print(f"  {n}")
    print("\nlast-certified round per remaining entry:")
    for n in SPARK_QUERIES:
        if n in last_round:
            print(f"  r{last_round[n]}  {n}")
    window = list(SPARK_QUERIES)[:50]
    overflow = [n for n in never if n not in window]
    #: deliberate re-certifications of CHANGED queries occupy window
    #: slots even though they have prior driver rows
    recerts = {"gap_fill_interpolate"}
    wasted = [
        n for n in window if n in last_round and n not in recerts
    ]
    if overflow and wasted:
        print(f"\nWARNING: {len(overflow)} never-certified entries "
              f"are OUTSIDE the 50-entry driver window while "
              f"{len(wasted)} already-certified entries occupy slots "
              f"(displace these): {wasted}\noverflow: {overflow}")
    elif overflow:
        print(f"\nwindow PACKED: every slot is never-certified or a "
              f"mandated re-cert; {len(overflow)} never-certified "
              f"entries queue beyond the boundary as the next "
              f"round's head: {overflow}")
    else:
        print("\nwindow OK: every never-certified entry is inside "
              "the first 50")


if __name__ == "__main__":
    main()
