"""VersionedTable: manifest-based time travel / rollback on parquet
(the portable stand-in for the Delta history this environment can't
run — see sources/versions.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.sources.versions import (
    VersionedTable,
)


def test_versioned_table_time_travel(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    with pytest.raises(FileNotFoundError):
        vt.read()
    v1 = vt.write(spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")]))
    v2 = vt.write(
        spark.createDataFrame([Row(k=3, v="c")]), mode="append"
    )
    v3 = vt.write(spark.createDataFrame([Row(k=9, v="z")]))  # overwrite
    assert (v1, v2, v3) == (1, 2, 3)
    assert vt.read(1).count() == 2
    assert sorted(r.k for r in vt.read(2).collect()) == [1, 2, 3]
    assert [r.k for r in vt.read(3).collect()] == [9]
    # latest == v3
    assert [r.k for r in vt.read().collect()] == [9]
    # rollback to v2 without rewriting data
    v4 = vt.restore(2)
    assert v4 == 4
    assert sorted(r.k for r in vt.read().collect()) == [1, 2, 3]
    ops = [h["op"] for h in vt.history()]
    assert ops == ["overwrite", "append", "overwrite", "restore(v2)"]
    with pytest.raises(FileNotFoundError):
        vt.read(99)


def test_versioned_table_append_is_delta_only(spark, tmp_path):
    import os

    vt = VersionedTable(spark, str(tmp_path / "t2"))
    vt.write(spark.range(100).selectExpr("id AS k"))
    vt.write(spark.range(5).selectExpr("id + 100 AS k"), mode="append")
    # append wrote only the 5-row delta directory
    dirs = vt._manifest(2)["dirs"]
    assert len(dirs) == 2
    assert vt.read(2).count() == 105
    # data dirs are immutable across restore
    before = {d: sorted(os.listdir(d)) for d in dirs}
    vt.restore(1)
    after = {d: sorted(os.listdir(d)) for d in dirs}
    assert before == after


def test_compact_and_vacuum(spark, tmp_path):
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.sources.versions import (
        VersionedTable,
    )

    vt = VersionedTable(spark, str(tmp_path / "vt"))
    vt.write(spark.range(0, 3), "overwrite")           # v1
    vt.write(spark.range(3, 5), "append")              # v2
    vt.write(spark.range(5, 6), "append")              # v3
    assert vt.read().count() == 6

    v4 = vt.compact()                                  # one dir
    m = vt._manifest(v4)
    assert len(m["dirs"]) == 1 and m["op"] == "compact"
    assert sorted(r["id"] for r in vt.read().collect()) == list(range(6))
    # pre-compact versions still travel
    assert vt.read(2).count() == 5

    stats = vt.vacuum(keep_last=1)
    assert stats["dropped_versions"] == 3
    # v1..v3's delta dirs are gone; the compacted dir survives
    assert stats["deleted_dirs"] == 3
    assert vt.read().count() == 6
    import pytest as _pt

    with _pt.raises(FileNotFoundError):
        vt.read(2)


def test_vacuum_keeps_dirs_referenced_by_restores(spark, tmp_path):
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.sources.versions import (
        VersionedTable,
    )

    vt = VersionedTable(spark, str(tmp_path / "vt2"))
    vt.write(spark.range(0, 4), "overwrite")           # v1 -> data/v1
    vt.write(spark.range(9, 10), "overwrite")          # v2 -> data/v2
    vt.restore(1)                                      # v3 -> refs data/v1
    stats = vt.vacuum(keep_last=1)                     # keep only v3
    # data/v1 is referenced by the RETAINED restore manifest: kept
    assert stats["deleted_dirs"] == 1                  # only data/v2
    assert sorted(r["id"] for r in vt.read().collect()) == [0, 1, 2, 3]


def test_changes_between_versions(spark, tmp_path):
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.sources.versions import (
        VersionedTable,
    )

    vt = VersionedTable(spark, str(tmp_path / "vt3"))
    vt.write(spark.range(0, 4).withColumn("v", F.col("id") * 10), "overwrite")
    vt.write(
        spark.createDataFrame(
            [(1, 10), (2, 99), (4, 40)], "id bigint, v bigint"
        ),
        "overwrite",
    )
    ch = {
        r["id"]: r["change"]
        for r in vt.changes(1, 2, keys=("id",)).collect()
    }
    assert ch == {0: "delete", 2: "update", 3: "delete", 4: "insert"}


def test_forget_keys_erases_history(spark, tmp_path):
    import os

    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.sources.versions import (
        VersionedTable,
    )

    vt = VersionedTable(spark, str(tmp_path / "vt4"))
    vt.write(spark.range(0, 5), "overwrite")
    vt.write(spark.range(5, 8), "append")
    stats = vt.forget_keys("id", [2, 6])
    assert sorted(r["id"] for r in vt.read().collect()) == [0, 1, 3, 4, 5, 7]
    # every pre-erasure version (and its data dirs) is gone
    assert vt.versions() == [stats["version"]]
    assert stats["deleted_dirs"] == 2
    data_root = os.path.join(str(tmp_path / "vt4"), "data")
    assert os.listdir(data_root) == [f"v{stats['version']}"]


def test_vacuum_path_spelling_independent(spark, tmp_path):
    """Opening the same table via a differently-spelled path
    (relative vs absolute) must not make referenced data dirs look
    unreferenced — vacuum membership is realpath-normalized."""
    import os

    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.sources.versions import (
        VersionedTable,
    )

    abs_path = str(tmp_path / "vt3")
    vt = VersionedTable(spark, abs_path)
    vt.write(spark.range(0, 4), "overwrite")           # v1
    vt.write(spark.range(4, 6), "append")              # v2

    cwd = os.getcwd()
    os.chdir(str(tmp_path))
    try:
        rel = VersionedTable(spark, os.path.relpath(abs_path))
        stats = rel.vacuum(keep_last=2)                # keeps v1+v2
        assert stats["deleted_dirs"] == 0              # both dirs referenced
        assert rel.read().count() == 6
    finally:
        os.chdir(cwd)
