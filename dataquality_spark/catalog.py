"""Manifest-backed table catalog — Iceberg-semantics emulation over Parquet.

The north rule targets Iceberg tables, but the sandbox's Spark install ships
no ``iceberg-spark-runtime`` jar (verified against ``pyspark/jars/``;
SURVEY.md §1.4). This module provides the thin catalog boundary so the engine
is behaviorally identical in both modes:

  * real-Iceberg mode (cluster): ``spark.read.table(name)`` /
    ``df.writeTo(name).append()`` — snapshot metadata from Iceberg itself
  * manifest mode (here): partitioned Parquet under ``<path>/data/`` plus a
    ``manifest.json`` recording snapshots (id, parent, file list, summary) —
    the analogue of Iceberg's snapshot log, append-only

Reference parity: S-7's "metadata file exists" accessibility check
(`dimensions/accessibility/s1.py:36`) becomes a real ``snapshots()`` metadata
listing; S-5's versioned CSV sink (`utils/core_operations.py:20-31`) becomes
snapshot history on one table instead of ``_v{N}`` file proliferation.

Iceberg parity matrix (asserted by ``tests/test_iceberg_parity.py``, which
runs the SAME scripted lifecycle through both backends — the real-Iceberg
leg is jar-gated and activates automatically on a cluster classpath):

  | observable                       | ManifestCatalog     | Iceberg            |
  |----------------------------------|---------------------|--------------------|
  | overwrite → new table state      | write(mode=o'write) | createOrReplace    |
  | append → union of snapshots      | write(mode=append)  | writeTo().append() |
  | current read                     | read()              | read.table         |
  | time-travel by snapshot id       | read(snapshot_id)   | option snapshot-id |
  | snapshot listing, commit order   | snapshots()         | <t>.snapshots      |
  | parent linkage (None for first)  | snapshot["parent"]  | parent_id          |
  | unknown/expired snapshot → error | FileNotFoundError   | analysis error     |
  | expire keeps current readable    | expire_snapshots()  | expire_snapshots   |

Known deliberate differences (metadata-internal, not observable through the
boundary above): snapshot ids are uuid-hex here vs int64 there; expiry here
takes keep_last while Iceberg's procedure takes ids/timestamps (the test
drives both to the same end state).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class ManifestCatalog:
    """Filesystem catalog: each table is ``<root>/<name>/{data/, manifest.json}``."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _tdir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._tdir(name), "manifest.json")

    def _load_manifest(self, name: str) -> dict:
        p = self._manifest_path(name)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {"table": name, "snapshots": [], "current": None}

    def _store_manifest(self, name: str, man: dict) -> None:
        tmp = self._manifest_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
        os.replace(tmp, self._manifest_path(name))  # atomic commit

    def write(self, df: DataFrame, name: str, mode: str = "overwrite",
              partition_by: list[str] | None = None,
              summary: dict | None = None) -> str:
        """Write a new snapshot; returns its snapshot id.

        Each snapshot owns its own data subdirectory, so 'overwrite' is a
        metadata swap (old files remain until expired) — the Iceberg
        copy-on-write behavior that makes concurrent readers safe.
        """
        snap_id = uuid.uuid4().hex[:16]
        data_dir = os.path.join(self._tdir(name), "data", snap_id)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(data_dir)
        man = self._load_manifest(name)
        files = sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(data_dir) for f in fs
            if f.endswith(".parquet")
        )
        parent = man["current"]
        if mode == "append" and parent is not None:
            prev = next(s for s in man["snapshots"] if s["id"] == parent)
            all_dirs = prev["data_dirs"] + [data_dir]
        else:
            all_dirs = [data_dir]
        man["snapshots"].append({
            "id": snap_id,
            "parent": parent,
            "mode": mode,
            "data_dirs": all_dirs,
            "new_files": files,
            "summary": summary or {},
        })
        man["current"] = snap_id
        self._store_manifest(name, man)
        return snap_id

    def read(self, spark: SparkSession, name: str,
             snapshot_id: str | None = None) -> DataFrame:
        """Time-travel read: current snapshot by default."""
        man = self._load_manifest(name)
        sid = snapshot_id or man["current"]
        if sid is None:
            raise FileNotFoundError(f"table {name} has no snapshots")
        snap = next((s for s in man["snapshots"] if s["id"] == sid), None)
        if snap is None:
            # bare next() would raise StopIteration (→ RuntimeError inside
            # generators per PEP 479) for unknown or already-expired ids
            raise FileNotFoundError(
                f"table {name} has no snapshot {sid!r} (unknown or expired)")
        return spark.read.parquet(*snap["data_dirs"])

    def snapshots(self, name: str) -> list[dict]:
        """The Iceberg `table.snapshots()` metadata-table analogue."""
        return self._load_manifest(name)["snapshots"]

    def has_metadata(self, name: str) -> bool:
        """Reference S1 accessibility check (`dimensions/accessibility/s1.py:36`)."""
        return os.path.exists(self._manifest_path(name))

    def expire_snapshots(self, name: str, keep_last: int = 1) -> list[str]:
        """Iceberg `expireSnapshots` analogue: drop all but the newest
        ``keep_last`` snapshots and delete data directories no kept snapshot
        references (append-chain snapshots share dirs, so reachability is
        computed over the survivors, never per-snapshot). Returns the
        deleted directories. The pruned manifest commits BEFORE any file
        delete — the Iceberg order: a crash mid-expire leaves orphan data
        files (harmless, re-collectable), never a manifest pointing at
        missing data. (The previous delete-then-commit order had exactly
        the failure its docstring claimed to prevent.)"""
        import shutil
        if keep_last < 1:
            # snapshots[-0:] would silently keep EVERYTHING; a table must
            # always retain its current snapshot
            raise ValueError("keep_last must be >= 1")
        man = self._load_manifest(name)
        if len(man["snapshots"]) <= keep_last:
            return []
        kept = man["snapshots"][-keep_last:]
        expired = man["snapshots"][:-keep_last]
        man["snapshots"] = kept
        self._store_manifest(name, man)  # commit FIRST, then delete
        referenced = {d for s in kept for d in s["data_dirs"]}
        removed = []
        for snap in expired:
            for d in snap["data_dirs"]:
                if d not in referenced and os.path.isdir(d):
                    shutil.rmtree(d)
                    removed.append(d)
                    referenced.add(d)  # rmtree once even if shared upstream
        return removed
