"""Local mirror of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compares row count,
schema (column names), and an order-insensitive value hash (columns
sorted by name, rows sorted, values stringified with float rounding).

Usage:  python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.data import (  # noqa: E402
    TABLES,
)
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.session import (  # noqa: E402
    get_spark,
)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    import datetime

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if str(s.dtype).startswith("datetime64"):
            df[c] = s.dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        elif s.dtype == object:
            df[c] = s.map(
                lambda v: v.hex()
                if isinstance(v, bytes)
                else v.isoformat()
                if isinstance(v, (datetime.date, datetime.datetime))
                else v
            )
    return df


def cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        # FULL precision (shortest round-trip repr): the r5 driver
        # red cell (gap_fill_interpolate, 77 cells off by 1 ulp) was
        # invisible to the old %.6g canon — six SIGNIFICANT digits on
        # ~6-digit revenues hid everything after the decimal point.
        # Local green must predict driver green, so hash every bit.
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def table_hash(df: pd.DataFrame) -> str:
    rows = sorted(
        "|".join(cell(v) for v in row) for row in df.itertuples(index=False)
    )
    import hashlib

    h = hashlib.md5()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    md_out = next(
        (a.split("=", 1)[1] for a in sys.argv[1:]
         if a.startswith("--md=")),
        None,
    )
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    qs, oracles = queries(), oracle_sql()

    # dtype banner: round 3 lost its bench to a silent upstream change
    # of events.ts's physical type — print every table's schema up
    # front so the next external-data drift is a one-glance diagnosis
    import pyarrow.parquet as pq

    print(f"-- table dtypes @ {sf_dir} --")
    for t in TABLES:
        try:
            sch = pq.read_schema(f"{sf_dir}/{t}.parquet")
            cols = ", ".join(f"{f.name}:{f.type}" for f in sch)
        except Exception as e:
            cols = f"<unreadable: {e}>"
        print(f"  {t}: {cols}")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    # deliberately NON-UTC session: the driver controls its own session
    # timezone, so any query whose result depends on it is a latent
    # correctness bug — this flushes those out locally
    spark = get_spark(
        "check_correctness",
        extra_conf={"spark.sql.session.timeZone": "America/New_York"},
    )
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        finally:
            # queries persist intermediates; don't let 90+ queries
            # accumulate executor storage across one sweep session
            spark.catalog.clearCache()
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(sdf)} rows, "
                  f"{time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures.append(name)
            continue
        s, o = canon(sdf), canon(odf)
        problems = []
        if len(s) != len(o):
            problems.append(f"rows {len(s)} vs {len(o)}")
        if list(s.columns) != list(o.columns):
            problems.append(f"cols {list(s.columns)} vs {list(o.columns)}")
        else:
            # dtype parity: the driver's canonicalizer is stricter than
            # cell() (e.g. float64 2.0 vs int64 2) — surface any
            # engine-type divergence locally rather than at the gate
            dt_s = [str(t) for t in s.dtypes]
            dt_o = [str(t) for t in o.dtypes]
            if dt_s != dt_o:
                mism = [
                    f"{c}: {a} vs {b}"
                    for c, a, b in zip(s.columns, dt_s, dt_o)
                    if a != b
                ]
                problems.append(f"dtypes {mism}")
            if table_hash(s) != table_hash(o):
                problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            if list(s.columns) == list(o.columns) and len(s) == len(o):
                try:
                    ss, oo = s.astype(str), o.astype(str)
                    merged = ss.merge(oo, how="outer", indicator=True)
                    diff = merged[merged["_merge"] != "both"]
                    print(diff.head(6).to_string())
                except Exception as e:  # diff display is best-effort
                    print(f"  (diff unavailable: {e})")
            failures.append(name)
        else:
            print(f"PASS  {name} ({len(s)} rows, {time.time()-t0:.1f}s)")
    spark.stop()
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall green")
    if md_out:
        # counts COMPUTED from the registry at write time (r5 verdict
        # task 9: manual counts drifted the moment a query landed)
        n_q, n_o = len(qs), len(oracles)
        n_ro = n_q - n_o
        with open(md_out, "w") as fh:
            fh.write(
                f"`python tools/check_correctness.py {sf_dir}` over the\n"
                f"full registry ({n_q} entries, {n_o} oracle-backed,\n"
                f"{n_ro} rows-only), FULL-precision float canon "
                f"(shortest-round-trip repr):\n"
                f"**{'all green' if not failures else f'{len(failures)} FAILURES: {failures}'}**\n"
            )
        print(f"summary written to {md_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
