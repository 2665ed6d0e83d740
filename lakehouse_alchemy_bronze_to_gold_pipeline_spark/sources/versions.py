"""Portable snapshot versioning / time travel for parquet tables.

The reference's sinks are all Delta, whose transaction log gives
time travel and rollback for free; delta-spark is optional in this
environment (``TableIO`` falls back to plain parquet and loses
history).  ``VersionedTable`` restores the log-structured essence
with nothing but parquet + JSON manifests:

- every commit writes data to a NEW directory (append writes only
  the delta; overwrite writes a fresh snapshot) and then a manifest
  ``_versions/v{N}.json`` listing the full set of data directories
  visible at that version — the manifest IS the version, data files
  are immutable once written;
- reads resolve a manifest (latest or ``version=``) and scan exactly
  its directories — time travel is manifest selection, no copies;
- ``restore(v)`` commits a NEW version whose directory list equals
  the old one — rollback is O(manifest), data is never rewritten.

Scale notes: this is the same design Delta/Iceberg use (ordered
metadata log + immutable data files); what is deliberately omitted
here is multi-writer optimistic concurrency (a conditional
put-if-absent on the next manifest name at the store layer) and
manifest compaction/checkpointing — single-writer pipelines, which
is what the reference runs, don't need them.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import col as F_col


class VersionedTable:
    """Manifest-versioned parquet table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self._mdir = os.path.join(self.path, "_versions")

    # ----------------------------------------------------- manifests
    def versions(self) -> list[int]:
        if not os.path.isdir(self._mdir):
            return []
        return sorted(
            int(f[1:-5])
            for f in os.listdir(self._mdir)
            if f.startswith("v") and f.endswith(".json")
        )

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self._mdir, f"v{version}.json")) as fh:
            return json.load(fh)

    def _commit(self, dirs: list[str], op: str, schema: str) -> int:
        os.makedirs(self._mdir, exist_ok=True)
        version = (self.versions() or [0])[-1] + 1
        manifest = {
            "version": version,
            "op": op,
            "dirs": dirs,
            "schema": schema,
        }
        # write-then-rename: the manifest appears atomically, so a
        # concurrent reader never sees a half-written version
        tmp = os.path.join(self._mdir, f".v{version}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
        os.rename(tmp, os.path.join(self._mdir, f"v{version}.json"))
        return version

    # --------------------------------------------------------- write
    def write(self, df: DataFrame, mode: str = "overwrite") -> int:
        """Commit a new version; returns its number.  ``append``
        writes ONLY the new rows (a delta directory) and carries the
        parent's directory list forward; ``overwrite`` starts a fresh
        snapshot."""
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite|append, got {mode!r}")
        nxt = (self.versions() or [0])[-1] + 1
        data_dir = os.path.join(self.path, "data", f"v{nxt}")
        df.write.mode("overwrite").parquet(data_dir)
        if mode == "append" and self.versions():
            dirs = self._manifest(self.versions()[-1])["dirs"] + [data_dir]
        else:
            dirs = [data_dir]
        return self._commit(dirs, mode, df.schema.simpleString())

    def compact(self) -> int:
        """Rewrite the CURRENT snapshot into a single fresh data
        directory and commit it — the log-structured compaction that
        keeps append-heavy tables from accumulating one directory per
        commit (Delta OPTIMIZE's role).  Old versions still resolve
        until ``vacuum`` drops them; readers never block."""
        nxt = (self.versions() or [0])[-1] + 1
        data_dir = os.path.join(self.path, "data", f"v{nxt}")
        df = self.read()
        df.write.mode("overwrite").parquet(data_dir)
        return self._commit(
            [data_dir], "compact", df.schema.simpleString()
        )

    def vacuum(self, keep_last: int = 2) -> dict:
        """Retention: drop all but the last ``keep_last`` manifests
        and delete every data directory no RETAINED manifest
        references (Delta VACUUM's role).  Time travel to vacuumed
        versions raises; retained versions — including restores that
        point at old directories — keep every directory they
        reference, because deletion is computed from the retained
        manifests' union, never from age."""
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        vs = self.versions()
        keep, drop = vs[-keep_last:], vs[:-keep_last]
        # realpath-normalize both sides of the membership test:
        # manifests store the dir strings as written at commit time,
        # so opening the same table via a differently-spelled path
        # (relative vs absolute, symlink) must NOT make every data
        # dir look unreferenced and vacuum live data
        referenced = set()
        for v in keep:
            referenced.update(
                os.path.realpath(d) for d in self._manifest(v)["dirs"]
            )
        deleted_dirs = 0
        data_root = os.path.join(self.path, "data")
        if os.path.isdir(data_root):
            for d in sorted(os.listdir(data_root)):
                full = os.path.join(data_root, d)
                if os.path.realpath(full) not in referenced:
                    shutil.rmtree(full)
                    deleted_dirs += 1
        for v in drop:
            os.remove(os.path.join(self._mdir, f"v{v}.json"))
        return {"dropped_versions": len(drop), "deleted_dirs": deleted_dirs}

    def forget_keys(self, key_col: str, keys) -> dict:
        """Right-to-be-forgotten: rewrite the CURRENT snapshot
        without the given keys as a new version, then vacuum history
        down to it — erasure is only real once no retained manifest
        references a directory still containing the rows (time
        travel to pre-erasure versions must die with them; the
        vacuum stats prove the old directories are gone)."""
        keep = self.read().filter(~F_col(key_col).isin(list(keys)))
        nxt = (self.versions() or [0])[-1] + 1
        data_dir = os.path.join(self.path, "data", f"v{nxt}")
        keep.write.mode("overwrite").parquet(data_dir)
        v = self._commit(
            [data_dir], f"forget({key_col})", keep.schema.simpleString()
        )
        stats = self.vacuum(keep_last=1)
        return {"version": v, **stats}

    def restore(self, version: int) -> int:
        """Roll back: commit a new version with ``version``'s
        directory list — no data movement."""
        m = self._manifest(version)
        return self._commit(m["dirs"], f"restore(v{version})", m["schema"])

    # ---------------------------------------------------------- read
    def read(self, version: int | None = None) -> DataFrame:
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no versions at {self.path}")
        v = vs[-1] if version is None else version
        if v not in vs:
            raise FileNotFoundError(f"version {v} not in {vs}")
        return self.spark.read.parquet(*self._manifest(v)["dirs"])

    def changes(
        self, v_from: int, v_to: int | None = None, keys=("id",)
    ) -> DataFrame:
        """Change data feed between two versions: (keys..., change)
        rows with change in insert/delete/update — Delta CDF's role,
        derived by diffing the two manifest snapshots with the
        engine's own ``operators.diff.snapshot_diff`` (one full-outer
        key join; no change log is stored, which trades write-path
        cost for read-path compute — the right trade for a
        single-writer snapshot store)."""
        from ..operators.diff import snapshot_diff

        vs = self.versions()
        v_to = vs[-1] if v_to is None else v_to
        return snapshot_diff(
            self.read(v_from), self.read(v_to), list(keys)
        )

    def history(self) -> list[dict]:
        """Commit log, oldest first (version / op / n_dirs)."""
        return [
            {
                "version": m["version"],
                "op": m["op"],
                "n_dirs": len(m["dirs"]),
            }
            for m in (self._manifest(v) for v in self.versions())
        ]
