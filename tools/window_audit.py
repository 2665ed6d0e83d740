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
    ORACLE_SQL,
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

    # r13 (r12-VERDICT item 4): only ORACLE-BACKED entries are
    # eligible for window slots — the driver returns err=no_oracle
    # (nothing checked, slot wasted) for the rest, so they neither
    # count as "never certified" nor rotate into the window.
    eligible = [n for n in SPARK_QUERIES if n in ORACLE_SQL]
    n_no_oracle = len(SPARK_QUERIES) - len(eligible)
    never = [n for n in eligible if n not in last_round]
    print(f"{len(SPARK_QUERIES)} registry entries "
          f"({n_no_oracle} no-oracle, window-ineligible); "
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
    no_oracle_in_window = [n for n in window if n not in ORACLE_SQL]
    if no_oracle_in_window:
        print(f"\nWARNING: {len(no_oracle_in_window)} no-oracle "
              f"entries occupy driver window slots the driver cannot "
              f"verify (err=no_oracle, wasted slots): "
              f"{no_oracle_in_window}")
    overflow = [n for n in never if n not in window]
    max_round = max(last_round.values(), default=0)
    #: a window slot is only WASTED if its occupant was certified in
    #: a round BEFORE the newest artifact — an entry whose only row
    #: is the latest round was a never-certified entry the driver
    #: just consumed (the artifact lands in the tree after the
    #: builder's close, so this state must read as healthy), and the
    #: stale-rotation occupants are deliberate re-certifications the
    #: moment no never-certified entry is stranded outside.
    stale_in_window = [
        n for n in window
        if n in last_round and last_round[n] < max_round
    ]
    if overflow and stale_in_window:
        print(f"\nWARNING: {len(overflow)} never-certified entries "
              f"are OUTSIDE the 50-entry driver window while "
              f"{len(stale_in_window)} stale-certified entries occupy "
              f"slots (displace these): {stale_in_window}\n"
              f"overflow: {overflow}")
    elif overflow:
        fresh_in_window = [
            n for n in window
            if n in last_round and last_round[n] == max_round
        ]
        print(f"\nwindow PACKED: every slot is never-certified or "
              f"freshly r{max_round}-certified; {len(overflow)} "
              f"never-certified entries queue beyond the boundary as "
              f"the next round's head: {overflow}")
        if fresh_in_window:
            # A post-close artifact makes this state healthy, but a
            # rotation AUTHOR editing _PRIORITY right now should still
            # see the displacement option: freshly-certified occupants
            # can yield their slots to the overflow immediately.
            print(f"note: {len(fresh_in_window)} slots hold "
                  f"r{max_round}-certified entries; if you are "
                  f"authoring the next rotation, displace these to "
                  f"admit the overflow now: {fresh_in_window}")
    else:
        print("\nwindow OK: every never-certified entry is inside "
              "the first 50")


if __name__ == "__main__":
    main()
