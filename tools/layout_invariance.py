"""Partition-layout invariance sweep — the strongest in-sandbox proxy
for multi-node correctness (r8 verdict task 2).

Re-runs the oracle correctness gate under a DELIBERATELY different
physical layout: ``spark.sql.shuffle.partitions`` set to a small
prime (default 7 vs the default sweep's 32) and every table scan
round-robin repartitioned (``SPARK_GRAFT_LAYOUT_REPARTITION`` lever
in ``queries/data.py:_layout``), which destroys file-order row-to-
partition assignment everywhere.  The DuckDB oracle is layout-free,
so an oracle-backed query that still hash-matches under this layout
is certified independent of physical data placement — exactly the
property a 1000-executor cluster needs and local[32] cannot
otherwise witness.  A mismatch HERE with a green default-layout
sweep is a layout-sensitivity bug (engine-ordered double
accumulation, implicit first-row dependence): fix with the
``_fixed``/exact-statistics pattern, never by pinning layout.

Rows-only entries (no SQL form) execute under the same perturbed
layout and report row counts — the driver's weaker check — since
their values may legitimately vary with the merge tree (trained
k-means, FD shrink order, sampled reports).

Usage:
  python tools/layout_invariance.py [sf_dir] [query ...] \
      [--shuffle=7] [--repartition=7] [--md=NOTES.md]
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

sys.path.insert(0, ".")


def _opt(name: str, default: int) -> int:
    for a in sys.argv[1:]:
        if a.startswith(f"--{name}="):
            return int(a.split("=", 1)[1])
    return default


def main() -> int:
    shuffle = _opt("shuffle", 7)
    repart = _opt("repartition", 7)
    # set BEFORE any query runs; queries/data.py reads it per load
    os.environ["SPARK_GRAFT_LAYOUT_REPARTITION"] = str(repart)

    spec = importlib.util.spec_from_file_location(
        "cc_for_layout",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "check_correctness.py"),
    )
    cc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cc)

    import duckdb

    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.data import (
        TABLES,
    )
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.session import (
        get_spark,
    )

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    md_out = next(
        (a.split("=", 1)[1] for a in sys.argv[1:]
         if a.startswith("--md=")),
        None,
    )
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    qs, oracles = cc.queries(), cc.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    spark = get_spark(
        "layout_invariance",
        shuffle_partitions=shuffle,
        extra_conf={"spark.sql.session.timeZone": "America/New_York"},
    )
    print(
        f"-- layout: shuffle.partitions={shuffle}, every scan "
        f".repartition({repart}) --"
    )
    failures: list[str] = []
    n_oracle = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error under layout: {e}")
            failures.append(name)
            continue
        finally:
            spark.catalog.clearCache()
        if name not in oracles:
            n_rows_only += 1
            print(f"ok?   {name}: rows-only under layout "
                  f"({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        n_oracle += 1
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures.append(name)
            continue
        s, o = cc.canon(sdf), cc.canon(odf)
        problems = []
        if len(s) != len(o):
            problems.append(f"rows {len(s)} vs {len(o)}")
        if list(s.columns) != list(o.columns):
            problems.append(
                f"cols {list(s.columns)} vs {list(o.columns)}"
            )
        elif cc.table_hash(s) != cc.table_hash(o):
            problems.append("value-hash mismatch under layout")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"PASS  {name} ({len(s)} rows, {time.time()-t0:.1f}s)")
    spark.stop()
    verdict = (
        "all layout-invariant"
        if not failures
        else f"{len(failures)} LAYOUT-SENSITIVE: {failures}"
    )
    print(f"\n{verdict}")
    if md_out:
        with open(md_out, "w") as fh:
            fh.write(
                f"`python tools/layout_invariance.py {sf_dir} "
                f"--shuffle={shuffle} --repartition={repart}`: every\n"
                f"scan round-robin repartitioned to {repart}, shuffle\n"
                f"partitions {shuffle} — {n_oracle} oracle-backed "
                f"entries hash-compared\nagainst layout-free DuckDB, "
                f"{n_rows_only} rows-only entries executed:\n"
                f"**{verdict}**\n"
            )
        print(f"summary written to {md_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
