"""From-scratch Delta Lake transaction-log reader/writer (protocol
JSON, no delta-spark dependency).

The reference writes every table as Delta (`bronze_ingestion.py:83`,
`gold_transformation.py:79-85,150-160`); in this environment the
delta-spark package is absent, so `TableIO` falls back to plain
parquet and `VersionedTable` supplies portable time travel.  This
module closes the remaining gap HONESTLY: the Delta *protocol* is a
public, documented format (an ordered `_delta_log/%020d.json` of
`metaData` / `add` / `remove` actions over immutable parquet files —
delta.io PROTOCOL.md), and reading or writing that format needs no
library, only JSON + parquet.

What this gives the engine:

- ``DeltaLogTable.read`` — batch-scan a Delta table WRITTEN BY ANY
  SYSTEM (Databricks, delta-rs, delta-spark) at latest or any
  historical version: replay the log, resolve the live file set,
  read exactly those parquet files (`basePath` keeps hive-style
  partition columns).  File-level time travel identical to
  `VERSION AS OF`.
- ``DeltaLogTable.write`` — a minimal single-writer commit path:
  parquet files into the table dir, then ONE atomic
  `O_CREAT|O_EXCL` log entry with `metaData` (first commit) +
  `add`/`remove` actions, so delta-spark elsewhere can read what we
  wrote.  Optimistic concurrency is the protocol's put-if-absent on
  the next log name — a concurrent writer loses the create race and
  must retry.

Deliberate scope cuts (each raises, never guesses): checkpoint
parquet files are NOT required for correctness (the JSON log is
authoritative; `_last_checkpoint` is only a read optimization) but a
log whose early JSON entries were vacuumed away after checkpointing
cannot be replayed — detected and raised.  Deletion vectors /
column-mapping reader features raise on sight via
`protocol.readerFeatures`.

Scale: the log replay is driver-side metadata work, O(|log| +
|files|) — exactly what every Delta reader does; the data scan
itself stays a fully parallel parquet read with partition pruning on
the hive paths.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

#: reader features this implementation understands (protocol v1/v2
#: tables, plus v3 tables that only list these features)
_SUPPORTED_READER_FEATURES = {"timestampNtz", "vacuumProtocolCheck"}


def _footer_stats(parquet_path: str) -> str:
    """Delta ``add.stats`` JSON (numRecords / minValues / maxValues)
    from the parquet FOOTER — no data read.  Columns whose footer
    lacks statistics (or whose values don't JSON-serialize cleanly)
    are simply omitted; readers treat missing stats conservatively."""
    import datetime

    import pyarrow.parquet as pq

    md = pq.ParquetFile(parquet_path).metadata
    mins: dict = {}
    maxs: dict = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            st = c.statistics
            if st is None or not st.has_min_max:
                continue
            name = c.path_in_schema
            if "." in name:  # nested: out of stats scope
                continue
            lo, hi = st.min, st.max
            if isinstance(lo, bytes):
                try:
                    lo, hi = lo.decode(), hi.decode()
                except UnicodeDecodeError:
                    continue
            if isinstance(lo, (datetime.date, datetime.datetime)):
                lo, hi = lo.isoformat(), hi.isoformat()
            if not isinstance(lo, (int, float, str, bool)):
                continue
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
    return json.dumps(
        {"numRecords": md.num_rows, "minValues": mins, "maxValues": maxs}
    )


class DeltaLogTable:
    """Delta-protocol table rooted at ``path`` (single writer)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path.rstrip("/"))
        self._log = os.path.join(self.path, "_delta_log")

    # ------------------------------------------------------ log scan
    def versions(self) -> list[int]:
        """Commit versions present as JSON entries (ascending)."""
        if not os.path.isdir(self._log):
            return []
        return sorted(
            int(f[:-5])
            for f in os.listdir(self._log)
            if f.endswith(".json") and f[:-5].isdigit()
        )

    def _actions(self, version: int) -> list[dict]:
        name = os.path.join(self._log, f"{version:020d}.json")
        with open(name) as fh:
            return [json.loads(line) for line in fh if line.strip()]

    def _checkpoints(self) -> list[int]:
        """Checkpoint versions present (ascending)."""
        if not os.path.isdir(self._log):
            return []
        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(self._log)
            if f.endswith(".checkpoint.parquet")
            and f.split(".")[0].isdigit()
        )

    def _checkpoint_actions(self, version: int) -> list[dict]:
        """Actions stored in a checkpoint parquet (one action per
        row, exactly one non-null action column — the protocol's
        checkpoint schema)."""
        import pyarrow.parquet as pq

        name = os.path.join(
            self._log, f"{version:020d}.checkpoint.parquet"
        )
        out = []
        for row in pq.read_table(name).to_pylist():
            for key in ("protocol", "metaData", "txn", "add", "remove"):
                if row.get(key) is not None:
                    out.append({key: row[key]})
        return out

    def _replay(self, version: int | None) -> dict:
        """Fold the log up to ``version``: live files, metadata,
        protocol.  Starts from the newest checkpoint <= version when
        one exists (O(|files| + |tail|) instead of O(|log|) — the
        metadata-scale path for long-lived tables), else from JSON
        version 0."""
        vs = self.versions()
        cps = self._checkpoints()
        if not vs and not cps:
            raise FileNotFoundError(
                f"no Delta log at {self._log} (not a Delta table?)"
            )
        latest = max(vs[-1] if vs else -1, cps[-1] if cps else -1)
        if version is None:
            version = latest
        start_cp = max(
            (c for c in cps if c <= version), default=None
        )
        if start_cp is None:
            if not vs or vs[0] != 0:
                raise ValueError(
                    f"log starts at {vs[0] if vs else '<empty>'}, not 0, "
                    f"and no checkpoint <= {version} exists — cannot "
                    "replay a truncated log"
                )
            replay_vs = [v for v in vs if v <= version]
        else:
            replay_vs = [v for v in vs if start_cp < v <= version]
            # the JSON tail after the checkpoint must be gapless
            expect = list(range(start_cp + 1, version + 1))
            if replay_vs != expect:
                missing = sorted(set(expect) - set(replay_vs))
                raise ValueError(
                    f"log entries {missing} missing between checkpoint "
                    f"{start_cp} and requested version {version}"
                )
        if version != latest and version not in vs and version not in cps:
            raise ValueError(
                f"unknown version {version} (have json {vs}, "
                f"checkpoints {cps})"
            )
        live: dict[str, dict] = {}
        meta: dict | None = None
        proto: dict | None = None
        action_stream = []
        if start_cp is not None:
            action_stream.append(self._checkpoint_actions(start_cp))
        action_stream.extend(self._actions(v) for v in replay_vs)
        for actions in action_stream:
            for a in actions:
                if "metaData" in a:
                    meta = a["metaData"]
                elif "protocol" in a:
                    proto = a["protocol"]
                    feats = set(proto.get("readerFeatures") or [])
                    unsupported = feats - _SUPPORTED_READER_FEATURES
                    if unsupported:
                        raise NotImplementedError(
                            f"Delta reader features {sorted(unsupported)} "
                            "not supported by this reader"
                        )
                    if proto.get("minReaderVersion", 1) > 3:
                        raise NotImplementedError(
                            "minReaderVersion "
                            f"{proto['minReaderVersion']} > 3"
                        )
                elif "add" in a:
                    live[a["add"]["path"]] = a["add"]
                elif "remove" in a:
                    live.pop(a["remove"]["path"], None)
        if meta is None:
            raise ValueError("log contains no metaData action")
        return {"files": live, "meta": meta, "version": version}

    # --------------------------------------------------------- read
    def read(self, version: int | None = None) -> DataFrame:
        """DataFrame over the live file set at ``version`` (latest by
        default).  Hive-partitioned layouts keep their partition
        columns via ``basePath``; an empty snapshot returns an empty
        frame with the schema from ``metaData.schemaString``."""
        snap = self._replay(version)
        paths = [
            os.path.join(self.path, p) for p in sorted(snap["files"])
        ]
        if not paths:
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(
                json.loads(snap["meta"]["schemaString"])
            )
            return self.spark.createDataFrame([], schema)
        return (
            self.spark.read.option("basePath", self.path).parquet(*paths)
        )

    def pruned_read(
        self,
        col: str,
        lo,
        hi,
        version: int | None = None,
    ) -> tuple[DataFrame, int, int]:
        """Range read via the per-file ``add.stats`` min/max envelopes
        (Delta data skipping, the protocol-native form of
        ``sources/zonemap.py``): returns (df filtered to [lo, hi],
        n_files_total, n_files_read).  Files without stats for
        ``col`` are conservatively kept; the residual filter keeps
        correctness exact inside survivors."""
        snap = self._replay(version)
        total = len(snap["files"])
        keep = []
        for path, add in sorted(snap["files"].items()):
            stats = add.get("stats")
            skip = False
            if stats:
                st = json.loads(stats) if isinstance(stats, str) else stats
                mn = (st.get("minValues") or {}).get(col)
                mx = (st.get("maxValues") or {}).get(col)
                if mn is not None and mx is not None:
                    skip = mx < lo or mn > hi
            if not skip:
                keep.append(os.path.join(self.path, path))
        from pyspark.sql import functions as F

        if not keep:
            return (
                self.read(version).filter(F.lit(False)),
                total,
                0,
            )
        df = (
            self.spark.read.option("basePath", self.path)
            .parquet(*keep)
            .filter((F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)))
        )
        return df, total, len(keep)

    def history(self) -> list[dict]:
        """commitInfo per version (empty dict where a writer logged
        none)."""
        out = []
        for v in self.versions():
            info = next(
                (
                    a["commitInfo"]
                    for a in self._actions(v)
                    if "commitInfo" in a
                ),
                {},
            )
            out.append({"version": v, **info})
        return out

    def upsert(self, updates: DataFrame, keys: list[str]) -> int:
        """MERGE INTO (matched -> update whole row, unmatched ->
        insert) as a keyed rewrite + one overwrite commit — the
        reference's SCD-1 pattern on the protocol path (updates
        collapsed keep-latest happens upstream in
        ``operators/merge.py``; here the last duplicate key wins via
        anti-join semantics).  Row-level MERGE without deletion
        vectors IS a rewrite; the prior version still time-travels."""
        current = self.read()
        merged = current.join(updates, keys, "left_anti").unionByName(
            updates
        )
        return self.write(merged, "overwrite")

    def vacuum(self, keep_versions: int = 1) -> dict:
        """Delete data files referenced ONLY by versions older than
        the last ``keep_versions`` (tombstoned files past the
        retention horizon — Delta VACUUM's role).  Time travel to
        vacuumed versions fails at scan time; retained versions keep
        every file they reference, because deletion is computed from
        the retained snapshots' union, never from age."""
        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1")
        vs = self.versions()
        cps = self._checkpoints()
        latest = max(vs[-1] if vs else -1, cps[-1] if cps else -1)
        if latest < 0:
            raise FileNotFoundError(f"no Delta log at {self._log}")
        horizon = latest - keep_versions + 1
        retained: set[str] = set()
        for v in range(horizon, latest + 1):
            if v in vs or v in cps:
                retained.update(self._replay(v)["files"])
        deleted = 0
        for dirpath, _dirs, files in os.walk(self.path):
            if os.path.basename(dirpath) == "_delta_log":
                continue
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                rel = os.path.relpath(
                    os.path.join(dirpath, f), self.path
                ).replace(os.sep, "/")
                if rel not in retained:
                    os.remove(os.path.join(dirpath, f))
                    deleted += 1
        return {"deleted_files": deleted, "horizon": horizon}

    def optimize(
        self,
        n_files: int = 1,
        zorder_by: list[str] | None = None,
    ) -> int:
        """OPTIMIZE [ZORDER BY]: rewrite the current snapshot into
        ``n_files`` files — Morton-clustered on ``zorder_by`` when
        given (`operators/zorder.py`), plain coalesce otherwise — and
        commit remove(old)+add(new) with ``dataChange: false`` (the
        protocol's bin-compaction marker: the TABLE's rows are
        unchanged, only their layout).  Old files stay on disk for
        time travel; footer stats on the new clustered files make
        ``pruned_read`` envelopes tight.  The reference runs this as
        ``OPTIMIZE ... ZORDER BY (customer_id, product_id)``
        (gold_transformation.py:85,160)."""
        snap = self._replay(None)
        df = self.read()
        part_cols = snap["meta"].get("partitionColumns") or []
        if part_cols:
            raise NotImplementedError(
                "optimize on partitioned tables (per-partition bins) "
                "is out of scope; compact partitions individually"
            )
        if zorder_by:
            from ..operators.zorder import zorder_key

            keyed, key = zorder_key(df, list(zorder_by))
            df = (
                keyed.repartitionByRange(n_files, key)
                .sortWithinPartitions(key)
                .drop(key)
            )
        else:
            df = df.coalesce(n_files)
        return self.write(df, "overwrite", _data_change=False)

    def checkpoint(self) -> int:
        """Write a checkpoint parquet of the CURRENT snapshot (one
        action per row: protocol, metaData, per-app txn watermarks,
        one add per live file) plus the ``_last_checkpoint`` pointer.
        After a checkpoint, JSON entries at or before it may be
        deleted (log retention) and the table stays fully readable —
        replay cost drops from O(|log|) to O(|files| + |tail|)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        vs = self.versions()
        snap = self._replay(None)
        v = snap["version"]
        txns = {}
        for jv in vs:
            for a in self._actions(jv):
                t = a.get("txn")
                if t:
                    txns[t["appId"]] = max(
                        txns.get(t["appId"], -1), int(t["version"])
                    )
        def _nz(obj):
            # parquet cannot store an EMPTY struct; {} fields (an
            # unpartitioned add's partitionValues, a bare metaData
            # configuration) checkpoint as null and read back as {}
            if isinstance(obj, dict):
                out = {k: _nz(v) for k, v in obj.items()}
                return out or None
            return obj

        rows: list[dict] = [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": _nz(snap["meta"])},
        ]
        rows.extend(
            {"txn": {"appId": k, "version": n}} for k, n in sorted(txns.items())
        )
        rows.extend(
            {"add": _nz(add)} for _p, add in sorted(snap["files"].items())
        )
        cols = ("protocol", "metaData", "txn", "add", "remove")
        table = pa.Table.from_pylist(
            [{c: r.get(c) for c in cols} for r in rows]
        )
        name = os.path.join(self._log, f"{v:020d}.checkpoint.parquet")
        pq.write_table(table, name)
        with open(os.path.join(self._log, "_last_checkpoint"), "w") as fh:
            json.dump({"version": v, "size": len(rows)}, fh)
        return v

    # ---------------------------------------------- streaming write
    def last_txn_version(self, app_id: str) -> int:
        """Highest ``txn.version`` committed for ``app_id`` (-1 if
        none) — the protocol's idempotent-writer bookkeeping.
        Checkpoints carry the per-app watermarks forward, so the
        answer survives JSON log truncation."""
        last = -1
        cps = self._checkpoints()
        streams = []
        if cps:
            streams.append(self._checkpoint_actions(cps[-1]))
            tail = [v for v in self.versions() if v > cps[-1]]
        else:
            tail = self.versions()
        streams.extend(self._actions(v) for v in tail)
        for actions in streams:
            for a in actions:
                txn = a.get("txn")
                if txn and txn.get("appId") == app_id:
                    last = max(last, int(txn["version"]))
        return last

    def write_batch_exactly_once(
        self,
        df: DataFrame,
        app_id: str,
        batch_id: int,
        partition_by: list[str] | None = None,
    ) -> int | None:
        """foreachBatch sink with protocol-level exactly-once: a
        ``txn {appId, version}`` action rides in the same atomic
        commit as the data, so a RESTARTED stream that replays an
        already-committed micro-batch sees ``last_txn_version >=
        batch_id`` and skips — the duplicate never reaches the log.
        Returns the committed version, or None for a skipped replay.

        Usage::

            q = (df.writeStream.foreachBatch(
                     lambda b, i: t.write_batch_exactly_once(b, "app", i)
                 ).trigger(availableNow=True).start())
        """
        if batch_id <= self.last_txn_version(app_id):
            return None
        return self.write(
            df,
            "append",
            partition_by=partition_by,
            _txn={"appId": app_id, "version": int(batch_id)},
        )

    # -------------------------------------------------------- write
    def write(
        self,
        df: DataFrame,
        mode: str = "append",
        partition_by: list[str] | None = None,
        _txn: dict | None = None,
        _data_change: bool = True,
    ) -> int:
        """Commit ``df`` as one Delta transaction; returns the new
        version.  ``overwrite`` logs ``remove`` tombstones for every
        previously-live file (the protocol's overwrite semantics —
        data files are immutable and stay on disk for time travel)."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        vs = self.versions()
        cps = self._checkpoints()
        # a truncated-head log (JSON entries vacuumed after a
        # checkpoint) still has a current version — the checkpoint's
        latest = max(vs[-1] if vs else -1, cps[-1] if cps else -1)
        schema_changed = False
        if latest >= 0:
            prev = self._replay(None)
            prev_part = prev["meta"].get("partitionColumns") or []
            prev_fields = {
                (f["name"], f["type"])
                for f in json.loads(prev["meta"]["schemaString"])["fields"]
                if not isinstance(f["type"], dict)  # nested: name-only
            } | {
                (f["name"], "<nested>")
                for f in json.loads(prev["meta"]["schemaString"])["fields"]
                if isinstance(f["type"], dict)
            }
            new_fields = {
                (f["name"], f["type"])
                for f in json.loads(df.schema.json())["fields"]
                if not isinstance(f["type"], dict)
            } | {
                (f["name"], "<nested>")
                for f in json.loads(df.schema.json())["fields"]
                if isinstance(f["type"], dict)
            }
            schema_changed = new_fields != prev_fields
            if mode == "append":
                if list(partition_by or []) != list(prev_part):
                    raise ValueError(
                        f"append partition_by {partition_by} != table "
                        f"partitioning {prev_part}"
                    )
                # schema ENFORCEMENT, Delta's signature behavior: a
                # drifted append would otherwise silently drop or null
                # columns at read time (plain parquet reads sample ONE
                # file's footer for the schema)
                if schema_changed:
                    raise ValueError(
                        "append schema mismatch: table has "
                        f"{sorted(prev_fields)}, frame has "
                        f"{sorted(new_fields)}; use overwrite to "
                        "change the schema"
                    )
        # 1. data: write into a staging dir, then move files into the
        # table root under fresh UUID names (Delta file names are
        # opaque; uniqueness is what matters)
        stage = os.path.join(self.path, f"_stage_{uuid.uuid4().hex}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(stage)
        adds = []
        for dirpath, _dirs, files in os.walk(stage):
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                rel_dir = os.path.relpath(dirpath, stage)
                part_values = {}
                if rel_dir != ".":
                    for seg in rel_dir.split(os.sep):
                        k, _, val = seg.partition("=")
                        part_values[k] = (
                            None if val == "__HIVE_DEFAULT_PARTITION__"
                            else val
                        )
                new_name = f"part-{uuid.uuid4().hex}.snappy.parquet"
                rel_path = (
                    new_name if rel_dir == "."
                    else os.path.join(rel_dir, new_name)
                )
                dst = os.path.join(self.path, rel_path)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.rename(os.path.join(dirpath, f), dst)
                adds.append(
                    {
                        "add": {
                            "path": rel_path.replace(os.sep, "/"),
                            "partitionValues": part_values,
                            "size": os.path.getsize(dst),
                            "modificationTime": int(time.time() * 1000),
                            "dataChange": _data_change,
                            "stats": _footer_stats(dst),
                        }
                    }
                )
        import shutil

        shutil.rmtree(stage)

        # 2. actions
        actions: list[dict] = [
            {
                "commitInfo": {
                    "timestamp": int(time.time() * 1000),
                    "operation": "WRITE" if _data_change else "OPTIMIZE",
                    "operationParameters": {"mode": mode.upper()},
                    "engineInfo": "lakehouse-alchemy-spark-deltalog",
                }
            }
        ]
        next_v = latest + 1
        if next_v == 0:
            actions.append(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
            actions.append(
                {
                    "metaData": {
                        "id": str(uuid.uuid4()),
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": df.schema.json(),
                        "partitionColumns": list(partition_by or []),
                        "configuration": {},
                        "createdTime": int(time.time() * 1000),
                    }
                }
            )
        elif mode == "overwrite":
            if schema_changed:
                # overwriteSchema semantics: an overwrite MAY evolve
                # the schema, and the protocol records that as a new
                # metaData action in the same commit (table id kept)
                actions.append(
                    {
                        "metaData": {
                            **prev["meta"],
                            "schemaString": df.schema.json(),
                            "partitionColumns": list(partition_by or []),
                        }
                    }
                )
            ts = int(time.time() * 1000)
            for p in sorted(prev["files"]):
                actions.append(
                    {
                        "remove": {
                            "path": p,
                            "deletionTimestamp": ts,
                            "dataChange": _data_change,
                        }
                    }
                )
        if _txn is not None:
            actions.append({"txn": {**_txn, "lastUpdated":
                                    int(time.time() * 1000)}})
        actions.extend(adds)

        # 3. atomic commit: put-if-absent on the next log name — the
        # protocol's optimistic-concurrency primitive.  A concurrent
        # writer that claimed this version first makes the open fail;
        # single-writer pipelines never hit it.
        os.makedirs(self._log, exist_ok=True)
        name = os.path.join(self._log, f"{next_v:020d}.json")
        fd = os.open(name, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w") as fh:
            for a in actions:
                fh.write(json.dumps(a) + "\n")
        return next_v
