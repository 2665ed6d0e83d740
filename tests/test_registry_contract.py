"""Registry-contract invariants — pure-python pins on the driver
contract surface (`queries/__init__.py` + `__spark_entry__.py`) that
the rotation edits every round and a silent slip would corrupt:

- a duplicated name in ``_PRIORITY`` dedups silently in the dict
  comprehension, SHIFTING the 50-entry driver window by one — every
  entry after the duplicate would be certified against the wrong
  expectation;
- a BENCH_EXCLUDE typo would silently bench the heavy baseline it
  meant to skip (or skip nothing);
- an oracle for a nonexistent query (or a query whose oracle was
  dropped by a refactor) changes the driver's rows-only accounting
  without anyone deciding that.
"""

from __future__ import annotations

import importlib.util
import os

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries import (
    BENCH_EXCLUDE,
    ORACLE_SQL,
    SPARK_QUERIES,
)
import lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries as _qinit

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_priority_has_no_duplicates():
    pri = _qinit._PRIORITY
    seen = set()
    dups = [n for n in pri if n in seen or seen.add(n)]
    assert dups == [], f"duplicate _PRIORITY entries shift the window: {dups}"


def test_registry_is_total_and_callable():
    # every entry callable, every oracle names a real query
    for name, fn in SPARK_QUERIES.items():
        assert callable(fn), name
    missing = sorted(set(ORACLE_SQL) - set(SPARK_QUERIES))
    assert missing == [], f"oracles without queries: {missing}"
    # oracles are non-trivial SQL strings
    for name, sql in ORACLE_SQL.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_bench_exclude_names_real_queries():
    bogus = sorted(BENCH_EXCLUDE - set(SPARK_QUERIES))
    assert bogus == [], f"BENCH_EXCLUDE names unknown queries: {bogus}"
    # exclusion exempts from the BENCH only — never from correctness:
    # every excluded query still has an oracle or is a registry entry
    # the local sweep runs rows-only
    for name in BENCH_EXCLUDE:
        assert name in SPARK_QUERIES


def test_entry_module_mirrors_registry():
    """__spark_entry__ is the file the driver imports BY PATH — its
    queries()/oracle_sql() must expose the same registry, not a stale
    copy."""
    spec = importlib.util.spec_from_file_location(
        "__spark_entry_contract__", os.path.join(ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert set(mod.queries()) == set(SPARK_QUERIES)
    assert set(mod.oracle_sql()) == set(ORACLE_SQL)


def test_window_head_is_never_certified_or_stalest():
    """The first 50 entries are the driver's certification window;
    the registry-order contract (see queries/__init__.py) is that no
    entry OUTSIDE the window is staler than every entry inside it
    could cover — concretely, the window must contain every
    never-certified entry (tools/window_audit.py enforces the full
    policy; this pin just keeps the window size assumption visible)."""
    assert len(SPARK_QUERIES) >= 50
    window = list(SPARK_QUERIES)[:50]
    assert len(window) == len(set(window)) == 50
