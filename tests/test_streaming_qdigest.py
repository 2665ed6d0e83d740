"""Streaming q-digest rollup: incremental maintenance across two
checkpointed runs must conserve mass exactly, keep bounded state,
and answer quantiles within the accumulated merge error bound vs the
exact quantiles of everything streamed."""

from __future__ import annotations

import json
import os
import random
import shutil

from pyspark.sql.types import IntegerType, StructField, StructType

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.sketch import (
    qdigest_quantiles,
)
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.sources.tables import (
    TableIO,
)
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.streaming.sketch_rollup import (
    streaming_qdigest,
)

SCHEMA = StructType([StructField("bucket", IntegerType())])
BITS = 8
U = 1 << BITS
SIGMA_FRAC = 64


def _write(dirpath, name, values):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        for v in values:
            f.write(json.dumps({"bucket": int(v)}) + "\n")


def test_streaming_qdigest_two_runs(spark, tmp_path):
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    for t in ("qd_stream_nodes",):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    io = TableIO(spark, fmt="parquet")
    src, cp = str(tmp_path / "src"), str(tmp_path / "cp")

    rng = random.Random(3)
    batch1 = [rng.randint(0, U - 1) for _ in range(4000)]
    batch2 = [min(U - 1, int(abs(rng.gauss(40, 15)))) for _ in range(4000)]

    def run():
        stream = spark.readStream.schema(SCHEMA).json(src)
        q = streaming_qdigest(
            stream, io, "qd_stream_nodes", "bucket", cp,
            bits=BITS, sigma_frac=SIGMA_FRAC,
        ).start()
        q.awaitTermination(120)

    _write(src, "b1.json", batch1)
    run()
    _write(src, "b2.json", batch2)
    run()  # checkpoint: b1 not re-counted

    nodes = io.read("qd_stream_nodes")
    rows = nodes.collect()
    n = len(batch1) + len(batch2)
    # mass conservation is EXACT across merges
    assert sum(r.cnt for r in rows) == n
    # bounded state regardless of history
    assert len(rows) <= SIGMA_FRAC + BITS + 1
    sigma = max(1, n // SIGMA_FRAC)

    got = {
        r.q_pct: r.est_bucket
        for r in qdigest_quantiles(
            nodes, BITS, pcts=(10, 50, 90)
        ).collect()
    }
    import collections

    counts = collections.Counter(batch1 + batch2)
    cum, run_total = {}, 0
    for b in range(U):
        run_total += counts.get(b, 0)
        cum[b] = run_total
    # rank error of each answer vs its target, within the two-pass
    # accumulated bound (2 merge passes, each <= 2*sigma*BITS)
    for q_pct, est in got.items():
        target = (q_pct * n + 99) // 100
        n_le = cum[min(est, U - 1)]
        n_lt = cum[est - 1] if est > 0 else 0
        err = max(0, target - n_le, n_lt + 1 - target)
        assert err <= 2 * 2 * sigma * BITS, (q_pct, est, err)
