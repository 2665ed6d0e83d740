"""Streaming CDC over the from-scratch Delta log
(sources/delta_stream.py): incremental tailing with checkpointed
version offsets — the reference's delta readStream hop
(silver_transformation.py:78) on the portable protocol path.
"""

from __future__ import annotations

import pytest

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.sources.delta_stream import (
    register,
)
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.sources.deltalog import (
    DeltaLogTable,
)


def _run_once(spark, src_path, out, ckpt):
    q = (
        spark.readStream.format("delta_log_cdc")
        .option("path", src_path)
        .load()
        .writeStream.foreachBatch(
            lambda b, i: out.extend(
                (r["id"],) for r in b.select("id").collect()
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_incremental_tail_across_commits(spark, tmp_path):
    register(spark)
    t = DeltaLogTable(spark, str(tmp_path / "src"))
    t.write(spark.range(0, 3), "append")          # v0
    out: list = []
    ckpt = str(tmp_path / "ck")
    _run_once(spark, t.path, out, ckpt)
    assert sorted(x[0] for x in out) == [0, 1, 2]

    # two more commits; SAME checkpoint -> only the delta arrives
    t.write(spark.range(3, 5), "append")          # v1
    t.write(spark.range(5, 6), "append")          # v2
    out2: list = []
    _run_once(spark, t.path, out2, ckpt)
    assert sorted(x[0] for x in out2) == [3, 4, 5]

    # nothing new -> empty batch, no error
    out3: list = []
    _run_once(spark, t.path, out3, ckpt)
    assert out3 == []


def test_exactly_once_composed_end_to_end(spark, tmp_path):
    """delta_log_cdc source + write_batch_exactly_once sink: replay
    the WHOLE stream from scratch (fresh checkpoint) into the same
    sink table — txn watermarks drop the duplicates."""
    register(spark)
    src = DeltaLogTable(spark, str(tmp_path / "s2"))
    sink = DeltaLogTable(spark, str(tmp_path / "k2"))
    src.write(spark.range(0, 4), "append")
    for run in range(2):                          # second run replays
        q = (
            spark.readStream.format("delta_log_cdc")
            .option("path", src.path)
            .load()
            .writeStream.foreachBatch(
                lambda b, i: sink.write_batch_exactly_once(
                    b, "cdc-pipe", i
                )
            )
            .option("checkpointLocation", str(tmp_path / f"ck{run}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    assert sorted(r["id"] for r in sink.read().collect()) == [0, 1, 2, 3]


def test_append_only_gate_and_partitioned_gate(spark, tmp_path):
    register(spark)
    t = DeltaLogTable(spark, str(tmp_path / "g"))
    t.write(spark.range(0, 2), "append")
    t.write(spark.range(9, 10), "overwrite")      # remove actions
    with pytest.raises(Exception, match="append-only"):
        q = (
            spark.readStream.format("delta_log_cdc")
            .option("path", t.path)
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "gck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    p = DeltaLogTable(spark, str(tmp_path / "p"))
    p.write(
        spark.createDataFrame([(1, "a")], "id bigint, k string"),
        "append",
        partition_by=["k"],
    )
    with pytest.raises(Exception, match="unpartitioned"):
        spark.readStream.format("delta_log_cdc").option(
            "path", p.path
        ).load().writeStream.format("noop").option(
            "checkpointLocation", str(tmp_path / "pck")
        ).trigger(availableNow=True).start().awaitTermination(120)


def test_starting_version_skips_history(spark, tmp_path):
    register(spark)
    t = DeltaLogTable(spark, str(tmp_path / "sv"))
    t.write(spark.range(0, 3), "append")          # v0 (history)
    t.write(spark.range(3, 5), "append")          # v1
    out: list = []
    q = (
        spark.readStream.format("delta_log_cdc")
        .option("path", t.path)
        .option("starting_version", 1)
        .load()
        .writeStream.foreachBatch(
            lambda b, i: out.extend(
                (r["id"],) for r in b.select("id").collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "svck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(x[0] for x in out) == [3, 4]


def _ext_commit(log, v, actions):
    import json
    import os

    with open(os.path.join(log, f"{v:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _ext_add(rel, lo, hi, n):
    import json

    return {
        "add": {
            "path": rel,
            "partitionValues": {},
            "size": 512,
            "modificationTime": 1700000000000,
            "dataChange": True,
            "stats": json.dumps(
                {
                    "numRecords": n,
                    "minValues": {"id": lo},
                    "maxValues": {"id": hi},
                }
            ),
        }
    }


def test_external_writer_fixture_cdc(spark, tmp_path):
    """CDC over a _delta_log written BY HAND in the shapes an
    external writer (delta-rs) produces — never touched by
    DeltaLogTable.write: commitInfo timestamps deliberately
    NON-MONOTONIC across versions (wall clocks of different writers),
    a checkpoint parquet + _last_checkpoint landing MID-stream, and
    log retention truncating the pre-checkpoint JSON head.  Offsets
    are commit VERSIONS, so replay must be identical regardless of
    the timestamps; the mid-stream checkpoint must not perturb
    offsets, and must carry batch reads + stats skipping after the
    head is gone."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    register(spark)
    path = str(tmp_path / "ext")
    log = os.path.join(path, "_delta_log")
    os.makedirs(log)

    schema_str = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "id",
                    "type": "long",
                    "nullable": True,
                    "metadata": {},
                }
            ],
        }
    )
    proto = {"minReaderVersion": 1, "minWriterVersion": 2}
    meta = {
        "id": "11111111-2222-3333-4444-555555555555",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": schema_str,
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 1700000000000,
    }

    def _data(name, ids):
        pq.write_table(
            pa.table({"id": pa.array(ids, pa.int64())}),
            os.path.join(path, name),
        )

    for i in range(4):
        _data(f"part-{i:05d}.parquet", [2 * i, 2 * i + 1])

    def _ci(ts):
        return {
            "commitInfo": {
                "timestamp": ts,
                "operation": "WRITE",
                "engineInfo": "delta-rs.0.17.0",
            }
        }

    # timestamps: v0 NEWEST, then 1000 < 3000 < 2000 — thoroughly
    # out of order; versions are the only ordering that matters
    _ext_commit(log, 0, [_ci(1700000005000), {"protocol": proto},
                         {"metaData": meta},
                         _ext_add("part-00000.parquet", 0, 1, 2)])
    _ext_commit(log, 1, [_ci(1700000001000),
                         _ext_add("part-00001.parquet", 2, 3, 2)])
    _ext_commit(log, 2, [_ci(1700000003000),
                         _ext_add("part-00002.parquet", 4, 5, 2)])

    # hand-built checkpoint AT v2 (protocol checkpoint schema: one
    # action per row, empty structs stored as null)
    def _nz(obj):
        if isinstance(obj, dict):
            out = {k: _nz(v) for k, v in obj.items()}
            return out or None
        return obj

    cp_rows = [{"protocol": proto}, {"metaData": _nz(meta)}] + [
        {"add": _nz(_ext_add(f"part-{i:05d}.parquet",
                             2 * i, 2 * i + 1, 2)["add"])}
        for i in range(3)
    ]
    cols = ("protocol", "metaData", "txn", "add", "remove")
    pq.write_table(
        pa.Table.from_pylist([{c: r.get(c) for c in cols} for r in cp_rows]),
        os.path.join(log, f"{2:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 2, "size": len(cp_rows)}, fh)

    # one more JSON commit AFTER the checkpoint
    _ext_commit(log, 3, [_ci(1700000002000),
                         _ext_add("part-00003.parquet", 6, 7, 2)])

    # batch read replays checkpoint + tail
    t = DeltaLogTable(spark, path)
    assert sorted(r["id"] for r in t.read().collect()) == list(range(8))

    # CDC from scratch: every add, version order, timestamps ignored
    out: list = []
    ckpt = str(tmp_path / "eck")
    _run_once(spark, path, out, ckpt)
    assert sorted(x[0] for x in out) == list(range(8))

    # identical replay: same checkpoint, nothing new -> empty
    out2: list = []
    _run_once(spark, path, out2, ckpt)
    assert out2 == []

    # log retention drops the pre-checkpoint JSON head; the RESUMED
    # stream (offset v3) continues across the gap untouched
    for v in (0, 1, 2):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    _data("part-00004.parquet", [8, 9])
    _ext_commit(log, 4, [_ci(1700000000500),
                         _ext_add("part-00004.parquet", 8, 9, 2)])
    out3: list = []
    _run_once(spark, path, out3, ckpt)
    assert sorted(x[0] for x in out3) == [8, 9]

    # batch read + stats skipping still work from the checkpoint
    assert sorted(r["id"] for r in t.read().collect()) == list(range(10))
    df, total, read = t.pruned_read("id", 6, 7)
    assert (total, read) == (5, 1)
    assert sorted(r["id"] for r in df.collect()) == [6, 7]

    # a FRESH stream can no longer replay the truncated head
    q = (
        spark.readStream.format("delta_log_cdc")
        .option("path", path)
        .load()
        .writeStream.foreachBatch(lambda b, i: None)
        .option("checkpointLocation", str(tmp_path / "eck_fresh"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="retention"):
        q.awaitTermination(120)


def test_stream_checkpoint_predating_retention_raises(spark, tmp_path):
    """A stream whose checkpoint points before the table's retained
    log must fail with the clear 'predates log retention' error, not
    silently skip data."""
    import os

    register(spark)
    t = DeltaLogTable(spark, str(tmp_path / "ret"))
    t.write(spark.range(0, 2), "append")          # v0
    out: list = []
    ckpt = str(tmp_path / "rck")
    _run_once(spark, t.path, out, ckpt)           # offset now v0
    t.write(spark.range(2, 4), "append")          # v1
    t.write(spark.range(4, 5), "append")          # v2
    t.checkpoint()
    # retention drops v0..v2 JSON; the stream's next range is (0, 2]
    # and commit 1's JSON is gone
    log = os.path.join(t.path, "_delta_log")
    for v in (0, 1, 2):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    t.write(spark.range(5, 6), "append")          # v3
    out2: list = []
    q = (
        spark.readStream.format("delta_log_cdc")
        .option("path", t.path)
        .load()
        .writeStream.foreachBatch(lambda b, i: None)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="retention"):
        q.awaitTermination(120)
