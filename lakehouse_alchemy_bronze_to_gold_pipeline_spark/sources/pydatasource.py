"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic-document generator, readable as
``spark.read.format("synthetic_docs")``.

Why an engine needs this: load tests, shuffle/skew rehearsals and
operator demos want N documents NOW, at any scale, without staging
files — and reproducibly, so two runs (or two engines) agree.  The
generator is a pure function of (seed, doc_id): partition i renders
rows [i*rows_pp, (i+1)*rows_pp) with an md5-driven word soup over a
fixed vocabulary, so the SAME options always produce the SAME table
— no files, no RNG state, reshard-independent.

This is also the repo's demonstration of the Spark 4 Python
DataSource extension point itself: schema declaration, option
handling, and partition planning (one ``InputPartition`` per chunk —
Spark schedules them across executors like any scan).  Generation is
Python-side by the API's nature; the contract keeps per-partition
work bounded (``rows_pp``) so the source parallelizes instead of
funneling through the driver.

Register per session with ``register(spark)``; then::

    spark.read.format("synthetic_docs")
        .option("rows", 1000).option("partitions", 8)
        .option("seed", 7).load()
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

#: fixed vocabulary — same register as the driver's synthetic docs
VOCAB = (
    "key agg row scan slow fast table value part hash merge batch "
    "spark line sort window join filter group shuffle broadcast the a"
).split()
LANGS = ("en", "fr", "es", "de")
SOURCES = tuple(f"src{i}" for i in range(8))


def _doc(seed: int, doc_id: int) -> tuple:
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).digest()
    n_words = 20 + h[0] % 30
    words = []
    x = int.from_bytes(h[:8], "big")
    for k in range(n_words):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        words.append(VOCAB[x % len(VOCAB)])
    text = " ".join(words)
    return (
        doc_id,
        text,
        LANGS[h[1] % len(LANGS)],
        SOURCES[h[2] % len(SOURCES)],
        len(text),
    )


class _ChunkPartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 0))

    def partitions(self):
        per = -(-self.rows // self.n_parts)
        return [
            _ChunkPartition(i * per, min((i + 1) * per, self.rows), self.seed)
            for i in range(self.n_parts)
            if i * per < self.rows
        ]

    def read(self, partition: _ChunkPartition):
        for doc_id in range(partition.start, partition.end):
            yield _doc(partition.seed, doc_id)


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return (
            "doc_id bigint, text string, lang string, "
            "source string, n_chars bigint"
        )

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)


def register(spark) -> None:
    """Register the format with a session (idempotent)."""
    spark.dataSource.register(SyntheticDocsDataSource)
