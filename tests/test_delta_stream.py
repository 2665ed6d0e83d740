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
