from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


class RegistryPlanCache:
    """Session-lifetime lazy cache of registry query DataFrames and
    their formatted explain strings (r13, r12-VERDICT item 3: suite
    wall time).  Three registry-wide sweeps — the plan linter, the
    unpartitioned-window inventory, and the analyzed-plan window
    audit — each rebuilt all 208 query DataFrames, re-running every
    builder's eager bounded jobs (ALS iterations, k-means updates, FD
    partials) three times over; they cost ~10 of the suite's ~25
    minutes.  Through this cache each query builds at most once per
    session and each formatted plan is captured at most once; tests
    that inspect a single query share the same entries."""

    SF = "/root/testdata/sf0.001"

    def __init__(self, spark):
        self._spark = spark
        self._dfs: dict = {}
        self._plans: dict[str, str] = {}

    def df(self, name: str):
        if name not in self._dfs:
            from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries import (
                SPARK_QUERIES,
            )

            self._dfs[name] = SPARK_QUERIES[name](self._spark, self.SF)
        return self._dfs[name]

    def formatted(self, name: str) -> str:
        if name not in self._plans:
            from lakehouse_alchemy_bronze_to_gold_pipeline_spark.plans import (
                formatted,
            )

            self._plans[name] = formatted(self.df(name))
        return self._plans[name]


@pytest.fixture(scope="session")
def registry_plans(spark):
    return RegistryPlanCache(spark)


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "warehouse")
