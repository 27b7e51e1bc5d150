"""Snapshot-isolated table store over plain parquet — the Iceberg-shaped
metadata layer (SURVEY.md §0.4: no lakehouse jars in this sandbox, so
the table FORMAT is emulated; the API mirrors what Iceberg gives so the
real runtime drops in later).

Model (exactly Iceberg's, minus manifest-file indirection):
- data files are immutable; a **snapshot** is a complete map
  ``partition value → [data files]``;
- append/overwrite never touch existing files — they write NEW files
  and commit a NEW snapshot whose map references old + new files;
- readers resolve a snapshot (latest by default, any retained id for
  time travel) to a file list; a reader holding snapshot N is never
  affected by later commits (snapshot isolation);
- ``vacuum`` deletes files referenced by no retained snapshot.

Commit protocol: data files land first (invisible — no snapshot
references them), then the journal is atomically replaced
(write-temp + rename) with the new snapshot appended. A crash before
the rename leaves the table at the previous snapshot with some
orphaned staging files that the next vacuum removes — the same
failure story as Iceberg's orphan files.

Scale note: the journal inlines each snapshot's full partition→file
map, which is O(partitions) per commit. At 10^6 partitions Iceberg
amortizes this by storing per-partition manifest FILES and having
snapshots reference unchanged manifests; the layout here keeps that
extension open (the map is already keyed by partition) and everything
else — immutability, isolation, time travel, vacuum — is identical.

Layout:
    root/journal.jsonl                     # one snapshot per line
    root/data/<part_col>=<v>/snap-<id>-<i>.parquet
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, root: str, partition_col: str):
        self.root = root
        self.partition_col = partition_col
        self.data_dir = os.path.join(root, "data")
        self.journal_path = os.path.join(root, "journal.jsonl")
        os.makedirs(self.data_dir, exist_ok=True)

    # -- journal ------------------------------------------------------------

    def snapshots(self) -> list[dict]:
        if not os.path.exists(self.journal_path):
            return []
        with open(self.journal_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def current_snapshot_id(self) -> int | None:
        snaps = self.snapshots()
        return snaps[-1]["snapshot_id"] if snaps else None

    def _resolve(self, as_of: int | None) -> dict:
        snaps = self.snapshots()
        if not snaps:
            raise ValueError(f"empty table at {self.root}")
        if as_of is None:
            return snaps[-1]
        for s in snaps:
            if s["snapshot_id"] == as_of:
                return s
        raise ValueError(
            f"snapshot {as_of} not found (retained: "
            f"{[s['snapshot_id'] for s in snaps]}) — vacuumed or never committed"
        )

    def _commit(
        self, op: str, files: dict[str, list[str]], meta: dict | None = None
    ) -> int:
        snaps = self.snapshots()
        sid = (snaps[-1]["snapshot_id"] + 1) if snaps else 1
        rec = {"snapshot_id": sid, "op": op, "files": files}
        if meta:
            rec["meta"] = meta
        snaps.append(rec)
        tmp = self.journal_path + ".tmp"
        with open(tmp, "w") as f:
            for s in snaps:
                f.write(json.dumps(s) + "\n")
        os.replace(tmp, self.journal_path)  # the atomic commit point
        return sid

    # -- writes -------------------------------------------------------------

    def _stage_files(self, df: DataFrame, sid: int) -> dict[str, list[str]]:
        """Write df's data as immutable snapshot-stamped files inside the
        hive partition dirs; return partition value → new relative paths.
        Nothing is visible until _commit references these files."""
        staging = os.path.join(self.root, f"_staging-{sid}")
        shutil.rmtree(staging, ignore_errors=True)
        df.write.mode("overwrite").partitionBy(self.partition_col).parquet(staging)
        new_files: dict[str, list[str]] = {}
        prefix = self.partition_col + "="
        for pdir in sorted(os.listdir(staging)):
            if not pdir.startswith(prefix):
                continue
            val = pdir[len(prefix):]
            dst_dir = os.path.join(self.data_dir, pdir)
            os.makedirs(dst_dir, exist_ok=True)
            for i, f in enumerate(
                sorted(glob.glob(os.path.join(staging, pdir, "*.parquet")))
            ):
                rel = os.path.join(pdir, f"snap-{sid:06d}-{i:04d}.parquet")
                os.replace(f, os.path.join(self.data_dir, rel))
                new_files.setdefault(val, []).append(rel)
        shutil.rmtree(staging, ignore_errors=True)
        return new_files

    def append(self, df: DataFrame, meta: dict | None = None) -> int:
        """New snapshot = previous map + this df's files (pure add).
        ``meta`` (e.g. a streaming (query, batch_id)) rides the journal
        record — the hook idempotent sinks key on."""
        snaps = self.snapshots()
        base = dict(snaps[-1]["files"]) if snaps else {}
        sid = (snaps[-1]["snapshot_id"] + 1) if snaps else 1
        new = self._stage_files(df, sid)
        merged = {k: list(v) for k, v in base.items()}
        for k, fs in new.items():
            merged.setdefault(k, [])
            merged[k] = merged[k] + fs
        return self._commit("append", merged, meta)

    def overwrite_partitions(self, df: DataFrame, meta: dict | None = None) -> int:
        """Dynamic partition overwrite: partitions present in df are
        replaced (their OLD files stay on disk for time travel until
        vacuumed); untouched partitions carry over. ``meta`` rides the
        journal record like append's (e.g. the batch pipeline's
        processed-parts list)."""
        snaps = self.snapshots()
        base = dict(snaps[-1]["files"]) if snaps else {}
        sid = (snaps[-1]["snapshot_id"] + 1) if snaps else 1
        new = self._stage_files(df, sid)
        merged = {k: list(v) for k, v in base.items()}
        merged.update(new)
        return self._commit("overwrite_partitions", merged, meta)

    # -- reads --------------------------------------------------------------

    def read(
        self,
        spark: SparkSession,
        as_of: int | None = None,
        merge_schema: bool = False,
    ) -> DataFrame:
        """The table at a snapshot (latest by default). basePath keeps
        the hive partition column alive over the explicit file list, and
        partition-value filters still prune at the file level because
        each file path carries its <col>=<v> directory. ``merge_schema``
        enables additive schema evolution (later snapshots may add
        columns; older files read as NULL for them — Iceberg's
        add-column semantics)."""
        snap = self._resolve(as_of)
        paths = [
            os.path.join(self.data_dir, rel)
            for fs in snap["files"].values()
            for rel in fs
        ]
        if not paths:
            raise ValueError(f"snapshot {snap['snapshot_id']} is empty")
        reader = spark.read.option("basePath", self.data_dir)
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*paths)

    # -- maintenance --------------------------------------------------------

    def compact(self, spark: SparkSession, max_files: int = 1) -> int | None:
        """Small-files compaction (Iceberg's rewrite_data_files): every
        partition holding more than ``max_files`` files is rewritten to
        one file, committed as ONE new snapshot. Readers pinned to
        earlier snapshots keep the old files until vacuum; rows are
        identical before/after — only the layout changes. Returns the
        new snapshot id, or None if nothing was fragmented.

        The rewrite repartitions by the partition column, so each
        value's rows land in a single task → a single file per
        partition dir (the small-files fix, not a parallelism cap: ONE
        maintenance snapshot covers any number of partitions, each
        written by its own task)."""
        snap = self._resolve(None)
        fragmented = [
            val for val, fs in snap["files"].items() if len(fs) > max_files
        ]
        if not fragmented:
            return None
        paths = [
            os.path.join(self.data_dir, rel)
            for val in fragmented
            for rel in snap["files"][val]
        ]
        df = (
            spark.read.option("basePath", self.data_dir)
            .parquet(*paths)
            .repartition(max(len(fragmented), 1), self.partition_col)
        )
        return self.overwrite_partitions(df)

    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Drop all but the last ``keep_last`` snapshots and delete every
        data file no retained snapshot references (plus orphans from
        crashed commits). Time travel to vacuumed ids then raises —
        same contract as Iceberg's expire_snapshots."""
        snaps = self.snapshots()
        keep = snaps[-keep_last:] if keep_last > 0 else []
        referenced = {
            rel for s in keep for fs in s["files"].values() for rel in fs
        }
        # journal FIRST (atomic replace), data files after — mirroring the
        # write path's data-then-journal ordering in reverse. A crash after
        # the replace leaves unreferenced-but-present files (re-vacuumable,
        # harmless); the old ordering could leave the journal referencing
        # already-deleted files, turning time travel into a missing-file
        # error instead of the documented clean ValueError.
        tmp = self.journal_path + ".tmp"
        with open(tmp, "w") as f:
            for s in keep:
                f.write(json.dumps(s) + "\n")
        os.replace(tmp, self.journal_path)
        removed = []
        for f in glob.glob(os.path.join(self.data_dir, "*", "*.parquet")):
            rel = os.path.relpath(f, self.data_dir)
            if rel not in referenced:
                os.remove(f)
                removed.append(rel)
        for stale in glob.glob(os.path.join(self.root, "_staging-*")):
            shutil.rmtree(stale, ignore_errors=True)
        return removed
