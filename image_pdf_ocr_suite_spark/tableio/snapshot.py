"""Snapshot-committed Parquet tables — Iceberg-style semantics offline.

The north_rule requires idempotent resume from snapshot checkpoints.  The
sandbox has no Iceberg jars, so this module implements the same interface
over plain Parquet + JSON snapshot manifests:

- ``append(df, run_id)`` writes data files into a snapshot-private
  directory, then COMMITS by writing a manifest via write-temp + atomic
  rename.  A crash before the rename leaves orphan data files that no
  reader ever sees (exactly Iceberg's invariant: readers only see
  committed snapshots).
- ``read()`` unions the data directories of committed snapshots only.
- ``processed_keys(col)`` is the resume primitive: restart = input
  LEFT ANTI JOIN processed urls (SURVEY §2.6) — idempotent, no dupes,
  no gaps.

On a real cluster, swap this for ``df.writeTo(tbl).append()`` against an
Iceberg catalog; the pipeline code only touches this interface.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Snapshot:
    snapshot_id: str
    parent_id: str | None
    data_dir: str
    run_id: str
    committed_at: float
    # "append": data_dir adds to the table; "replace": data_dir IS the
    # table as of this snapshot (upsert/compaction result) — readers ignore
    # everything older.
    op: str = "append"


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        self.snap_dir = os.path.join(root, "_snapshots")
        os.makedirs(self.snap_dir, exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # ---- manifest protocol -------------------------------------------------
    def _snapshot_files(self) -> list[str]:
        return sorted(
            f for f in os.listdir(self.snap_dir)
            if f.endswith(".json") and not f.startswith(".")
        )

    def snapshots(self) -> list[Snapshot]:
        out = []
        for f in self._snapshot_files():
            with open(os.path.join(self.snap_dir, f)) as fh:
                d = json.load(fh)
            out.append(Snapshot(**d))
        return out

    def current_snapshot(self) -> Snapshot | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    def _commit(self, snap: Snapshot) -> None:
        seq = len(self._snapshot_files())
        final = os.path.join(self.snap_dir, f"{seq:06d}-{snap.snapshot_id}.json")
        tmp = final + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(snap.__dict__, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, final)  # atomic commit point

    # ---- public API ----------------------------------------------------------
    def append(self, df: DataFrame, run_id: str) -> Snapshot:
        """Write df into a new snapshot directory, then commit atomically."""
        snapshot_id = uuid.uuid4().hex[:16]
        data_dir = os.path.join(self.root, "data", snapshot_id)
        df.write.mode("error").parquet(data_dir)
        parent = self.current_snapshot()
        snap = Snapshot(snapshot_id=snapshot_id,
                        parent_id=parent.snapshot_id if parent else None,
                        data_dir=data_dir, run_id=run_id,
                        committed_at=time.time())
        self._commit(snap)
        return snap

    def write_uncommitted(self, df: DataFrame, run_id: str) -> str:
        """Data files without a manifest — simulates a mid-job crash for
        resume tests; readers must never see these rows."""
        data_dir = os.path.join(self.root, "data", f"orphan-{uuid.uuid4().hex[:8]}")
        df.write.mode("error").parquet(data_dir)
        return data_dir

    def upsert(self, df: DataFrame, key_col: str, run_id: str) -> Snapshot:
        """Iceberg-MERGE-style upsert: rows in ``df`` replace committed rows
        with the same key; everything else carries over.  Implemented as a
        REPLACE snapshot (anti-join survivors ∪ new rows written once) —
        readers before the commit see the old table, after it the new one."""
        current = self.read(df.sparkSession)
        if current is None:
            return self.append(df, run_id)
        from pyspark.sql.functions import broadcast
        keys = df.select(key_col).distinct()
        survivors = current.join(broadcast(keys), key_col, "left_anti")
        merged = survivors.unionByName(df)
        return self._replace(merged, run_id)

    def compact(self, spark: SparkSession, run_id: str,
                n_files: int | None = None) -> Snapshot | None:
        """Small-file compaction: rewrite all committed data as one
        REPLACE snapshot (table maintenance — at 100 TB this runs per
        partition, not whole-table)."""
        current = self.read(spark)
        if current is None:
            return None
        if n_files:
            current = current.coalesce(n_files)
        return self._replace(current, run_id)

    def _replace(self, df: DataFrame, run_id: str) -> Snapshot:
        snapshot_id = uuid.uuid4().hex[:16]
        data_dir = os.path.join(self.root, "data", snapshot_id)
        df.write.mode("error").parquet(data_dir)
        parent = self.current_snapshot()
        snap = Snapshot(snapshot_id=snapshot_id,
                        parent_id=parent.snapshot_id if parent else None,
                        data_dir=data_dir, run_id=run_id,
                        committed_at=time.time(), op="replace")
        self._commit(snap)
        return snap

    def expire_snapshots(self) -> list[str]:
        """Drop data directories no committed reader can see (everything
        older than the latest REPLACE snapshot).  Manifests stay (history);
        returns removed dirs."""
        import shutil
        snaps = self.snapshots()
        last_replace = max((i for i, s in enumerate(snaps) if s.op == "replace"),
                           default=None)
        if last_replace is None:
            return []
        removed = []
        for s in snaps[:last_replace]:
            if os.path.isdir(s.data_dir):
                shutil.rmtree(s.data_dir)
                removed.append(s.data_dir)
        return removed

    def _live_dirs(self) -> list[str]:
        snaps = self.snapshots()
        live: list[str] = []
        for s in snaps:
            if s.op == "replace":
                live = [s.data_dir]
            else:
                live.append(s.data_dir)
        return live

    def read(self, spark: SparkSession) -> DataFrame | None:
        dirs = self._live_dirs()
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    def read_at(self, spark: SparkSession,
                snapshot_id: str) -> DataFrame | None:
        """Time travel (Iceberg ``VERSION AS OF`` semantics): read the
        table exactly as committed at ``snapshot_id`` — replay the
        manifest chain up to and including it, applying the same
        append/replace visibility rules as :meth:`read`.  Expired data
        directories raise on scan (history manifests outlive their data,
        as in Iceberg after ``expire_snapshots``)."""
        snaps = self.snapshots()
        cut = next((i for i, s in enumerate(snaps)
                    if s.snapshot_id == snapshot_id), None)
        if cut is None:
            raise KeyError(f"unknown snapshot {snapshot_id!r}")
        live: list[str] = []
        for s in snaps[:cut + 1]:
            if s.op == "replace":
                live = [s.data_dir]
            else:
                live.append(s.data_dir)
        if not live:
            return None
        return spark.read.parquet(*live)

    def read_asof(self, spark: SparkSession,
                  timestamp: float) -> DataFrame | None:
        """Time travel by wall clock (Iceberg ``TIMESTAMP AS OF``): the
        table as of the last snapshot committed at or before
        ``timestamp`` (epoch seconds); None if nothing was committed
        yet."""
        snaps = [s for s in self.snapshots() if s.committed_at <= timestamp]
        if not snaps:
            return None
        return self.read_at(spark, snaps[-1].snapshot_id)

    def processed_keys(self, spark: SparkSession, key_col: str = "url") -> DataFrame | None:
        committed = self.read(spark)
        if committed is None:
            return None
        return committed.select(key_col).distinct()

    def remaining_input(self, input_df: DataFrame, key_col: str = "url") -> DataFrame:
        """Resume primitive: input minus committed keys (left anti join).
        The processed-keys side is small (keys only) → broadcastable."""
        done = self.processed_keys(input_df.sparkSession, key_col)
        if done is None:
            return input_df
        from pyspark.sql.functions import broadcast
        return input_df.join(broadcast(done), key_col, "left_anti")
