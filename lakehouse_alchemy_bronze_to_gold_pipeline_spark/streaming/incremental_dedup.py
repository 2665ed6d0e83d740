"""Incremental streaming near-duplicate filtering.

The batch MinHash operator answers "which pairs in THIS corpus are
near-dups"; a training-data pipeline needs the incremental question:
"is this NEW document a near-dup of ANYTHING seen so far".  Holding
the whole corpus in streaming state is impossible at 100 TB, so the
accumulated knowledge lives in two ordinary tables:

- ``{name}_sigs``:    (id, shingles)            — verify-side lookup
- ``{name}_buckets``: (id, band_idx, band_hash) — the LSH index

Per micro-batch (``foreachBatch``):

1. signature + bucket the batch docs (the batch-operator expressions);
2. replay guard: drop ids already in ``{name}_sigs`` (a checkpoint
   replay re-presents rows whose state was already committed);
3. within-batch dedup: verified pairs among new docs, smaller id wins;
4. cross-corpus dedup: new buckets equi-join the PERSISTED bucket
   table on (band_idx, band_hash) — the index prunes the corpus to
   colliding docs only — then exact-Jaccard verify against the stored
   shingles; any match drops the new doc (first-writer-wins);
5. append survivors to the output + both state tables.

Scale notes: step 4's join touches only buckets the batch collides
with (at cluster scale the bucket table is partitioned/bucketed by
``band_hash``, so the probe prunes to matching files); per-bucket
width caps bound the candidate blowup exactly like the batch
operator; state grows O(corpus x n_bands) rows of 3 integers, not
O(corpus^2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import jaccard
from ..operators.minhash import band_buckets, minhash_signatures
from ..sources.tables import TableIO


class IncrementalNearDupFilter:
    """First-writer-wins near-dup gate over an append-only doc stream."""

    def __init__(
        self,
        io: TableIO,
        name: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        threshold: float = 0.5,
        n_hashes: int = 64,
        shingle_n: int = 2,
        n_bands: int = 16,
        max_bucket: int = 200,
    ):
        self.io = io
        self.name = name
        self.id_col = id_col
        self.text_col = text_col
        self.threshold = threshold
        self.n_hashes = n_hashes
        self.shingle_n = shingle_n
        self.n_bands = n_bands
        self.band_rows = n_hashes // n_bands
        self.max_bucket = max_bucket

    @property
    def sig_table(self) -> str:
        return f"{self.name}_sigs"

    @property
    def bucket_table(self) -> str:
        return f"{self.name}_buckets"

    # ------------------------------------------------------ batch core
    def dedup_batch(self, batch: DataFrame) -> DataFrame:
        """Return the batch rows that survive the near-dup gate, and
        fold the survivors into the persisted state tables."""
        spark = batch.sparkSession
        idc, txt = self.id_col, self.text_col

        cached = []  # batch-lifetime persists, released before return
        sigs = minhash_signatures(
            batch, idc, txt, self.n_hashes, self.shingle_n
        ).persist()
        cached.append(sigs)
        has_state = spark.catalog.tableExists(self.sig_table)
        if has_state:
            seen = self.io.read(self.sig_table).select(idc)
            sigs = sigs.join(seen, idc, "left_anti").persist()
            cached.append(sigs)

        # ---- within-batch: verified pairs, smaller id wins
        from ..operators.minhash import lsh_candidate_pairs

        pairs = lsh_candidate_pairs(
            sigs, idc, self.n_bands, self.band_rows, self.max_bucket
        )
        shl = sigs.select(F.col(idc).alias("id_a"), F.col("shingles").alias("sh_a"))
        shr = sigs.select(F.col(idc).alias("id_b"), F.col("shingles").alias("sh_b"))
        dup_in_batch = (
            pairs.join(shl, "id_a")
            .join(shr, "id_b")
            .filter(jaccard(F.col("sh_a"), F.col("sh_b")) >= self.threshold)
            .select(F.col("id_b").alias(idc))  # id_a < id_b: larger drops
            .distinct()
        )
        fresh = sigs.join(dup_in_batch, idc, "left_anti").persist()
        cached.append(fresh)

        # ---- cross-corpus: new buckets probe the persisted index
        if has_state:
            new_b = band_buckets(fresh, idc, self.n_bands, self.band_rows)
            old_b = self.io.read(self.bucket_table).select(
                F.col(idc).alias("__old_id"), "band_idx", "band_hash"
            )
            # prune to buckets this batch actually collides with, then
            # cap their width (mirrors the batch operator's skew guard)
            touched = old_b.join(
                new_b.select("band_idx", "band_hash").distinct(),
                ["band_idx", "band_hash"],
            )
            w = Window.partitionBy("band_idx", "band_hash")
            touched = touched.withColumn(
                "__n", F.count(F.lit(1)).over(w)
            ).filter(F.col("__n") <= self.max_bucket)
            cand = (
                new_b.join(touched, ["band_idx", "band_hash"])
                .select(idc, "__old_id")
                .distinct()
            )
            old_sh = self.io.read(self.sig_table).select(
                F.col(idc).alias("__old_id"), F.col("shingles").alias("sh_old")
            )
            dup_vs_corpus = (
                cand.join(fresh.select(idc, "shingles"), idc)
                .join(old_sh, "__old_id")
                .filter(
                    jaccard(F.col("shingles"), F.col("sh_old"))
                    >= self.threshold
                )
                .select(idc)
                .distinct()
            )
            fresh = fresh.join(dup_vs_corpus, idc, "left_anti").persist()
            cached.append(fresh)

        # ---- fold survivors into state.  MATERIALIZE first: the
        # survivor lineage READS the state tables (replay guard,
        # bucket probe, shingle lookup), so appending and then lazily
        # re-evaluating would see the batch's own rows and drop them
        # as self-duplicates.  localCheckpoint cuts the lineage at the
        # computed result (persist() alone only caches best-effort).
        fresh = fresh.localCheckpoint(eager=True)
        # survivors materialize BEFORE the state appends touch the
        # tables their lineage reads (and stay materialized — the
        # caller's append must not re-evaluate against mutated state)
        survivors = batch.join(fresh.select(idc), idc, "left_semi")
        survivors = survivors.localCheckpoint(eager=True)
        self.io.write_append(fresh.select(idc, "shingles"), self.sig_table)
        self.io.write_append(
            band_buckets(fresh, idc, self.n_bands, self.band_rows),
            self.bucket_table,
        )
        self._refresh(self.sig_table)
        self._refresh(self.bucket_table)
        # everything downstream reads the two localCheckpoints; the
        # intermediate caches would otherwise pin executor storage for
        # the stream's lifetime (one leak per micro-batch)
        for df in cached:
            df.unpersist()
        return survivors

    def _refresh(self, table: str) -> None:
        """Invalidate the OWNING session's cached file listing.

        ``foreachBatch`` hands the batch a CLONED session; appends
        through it do not invalidate the parent session's relation
        cache, so a caller that read these tables before the batch
        would keep seeing the stale listing.  Refresh through the
        session ``TableIO`` was built with (the one callers read on).
        """
        try:
            self.io.spark.catalog.refreshTable(table)
        except Exception:
            pass  # table may not exist yet on first batch

    # ------------------------------------------------------- streaming
    def sink(self, stream: DataFrame, out_table: str, checkpoint: str):
        """foreachBatch writer: gate each micro-batch, append the
        survivors.  Exactly-once: the checkpoint replays whole
        batches, and the replay guard makes re-folding idempotent."""

        def run(batch: DataFrame, _batch_id: int) -> None:
            survivors = self.dedup_batch(batch)
            self.io.write_append(survivors, out_table)
            self._refresh(out_table)

        return (
            stream.writeStream.foreachBatch(run)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
        )
