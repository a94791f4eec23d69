"""Write-ahead journal for ShardedVectorIndex — Milvus durability parity.

The reference's Milvus server makes inserts durable through a WAL plus
sealed segments persisted to a volume (docker-compose.yml:11-12), with
`collection.flush()` as the client's durability barrier
(ImageEmbeddingSystem.py:137). Our in-process index previously had only
whole-snapshot `save()` — anything inserted since the last save died with
the process. This module is the TPU-host-native equivalent of the WAL:

  <dir>/ops.jsonl        append-only op log, one JSON record per mutation,
                         each carrying a monotonically increasing `seq`.
  <dir>/seg-<seq>.npz    embedding payload for an insert record (unit rows
                         f32 + magnitudes f32) — written (page cache)
                         BEFORE its ops.jsonl record is appended and
                         fsynced by the next flush() barrier (GROUP
                         COMMIT: per-insert segment fsync measured
                         ~86 ms/1 MB batch on this host; Milvus likewise
                         defers durability to flush()). Recovery treats a
                         logged record whose segment is torn/missing as
                         the un-flushed tail and truncates from there.
  <dir>/snap-<seq>/      a full `ShardedVectorIndex.save()` checkpoint
                         covering every op up to and including `seq`.
  <dir>/CURRENT          the name of the live snapshot directory; updated
                         by atomic rename, so a crash at ANY point leaves
                         either the old complete checkpoint or the new one
                         — never a half-written mix (a snapshot is several
                         files, so a single-file rename can't cover it;
                         the pointer file can).

Recovery (`ShardedVectorIndex.open`): load the CURRENT snapshot if one
exists, then replay ops with seq greater than the snapshot's, in order. A
torn tail (partial final line from a crash mid-append) is detected and
ignored; so is a tail whose first record references a torn/unreadable
segment (a crash between an acknowledged insert and the next flush() —
everything from that record on is dropped via drop_from, matching the
flush-barrier contract). Replay skips records the snapshot already
covers, so the window between the CURRENT rename and the log truncation
cannot double-apply.

Small scalars (paths, attrs, delete arguments) live in the JSON records;
only embedding payloads go to segment files. `flush()` fsyncs the log —
the same durability barrier Milvus gives `flush()`.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, List, Optional, Sequence

import numpy as np

OPS = "ops.jsonl"
CURRENT = "CURRENT"


class IndexJournal:
    """Append-only op log under one directory. Not thread-safe by itself —
    the index calls it under its own RLock."""

    def __init__(self, directory: str):
        self.dir = directory
        os.makedirs(directory, exist_ok=True)
        self.ops_path = os.path.join(directory, OPS)
        self.covered_seq = 0
        cur = os.path.join(directory, CURRENT)
        if os.path.exists(cur):
            with open(cur) as f:
                name = f.read().strip()
            self.covered_seq = int(name.split("-")[1])
            self.snapshot_dirname = name
        else:
            self.snapshot_dirname = None
        self._records = self._read_records()
        self.next_seq = 1 + max(
            [r["seq"] for r in self._records], default=self.covered_seq)
        self._fh = open(self.ops_path, "a", encoding="utf-8")
        self._pending_segs: List[str] = []  # group commit, see flush()

    # -- read side -----------------------------------------------------------

    def _read_records(self) -> List[dict]:
        if not os.path.exists(self.ops_path):
            return []
        records = []
        good_end = 0
        with open(self.ops_path, "rb") as f:
            for line in f:
                try:
                    rec = json.loads(line.decode("utf-8"))
                except (json.JSONDecodeError, UnicodeDecodeError):
                    break  # torn tail from a crash mid-append: stop here
                good_end += len(line)
                records.append(rec)
        if good_end < os.path.getsize(self.ops_path):
            # drop the torn tail so the next append starts a clean line
            with open(self.ops_path, "rb+") as f:
                f.truncate(good_end)
        elif records:
            # the final line parsed but may lack its trailing newline (a
            # crash can persist a prefix ending exactly at the closing
            # brace). Appending onto it would merge two records on one
            # line, and a LATER recovery would drop both — losing a
            # flushed, acknowledged record (r5 review). Terminate it now.
            with open(self.ops_path, "rb+") as f:
                f.seek(-1, os.SEEK_END)
                if f.read(1) != b"\n":
                    f.write(b"\n")
                    f.flush()
                    os.fsync(f.fileno())
        return records

    def pending(self) -> List[dict]:
        """Records not covered by the snapshot, in append order."""
        return [r for r in self._records if r["seq"] > self.covered_seq]

    def load_config(self) -> Optional[dict]:
        """Index tier config persisted at first open (a journal-only
        directory with no checkpoint yet must still know its dim/dtype)."""
        path = os.path.join(self.dir, "config.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def store_config(self, config: dict) -> None:
        tmp = os.path.join(self.dir, "config.json.tmp")
        with open(tmp, "w") as f:
            json.dump(config, f)
            f.flush()
            os.fsync(f.fileno())  # a torn config.json blocks recovery
        os.replace(tmp, os.path.join(self.dir, "config.json"))

    def snapshot_path(self) -> Optional[str]:
        """Base path (save()/load_from() form) of the live snapshot."""
        if self.snapshot_dirname is None:
            return None
        return os.path.join(self.dir, self.snapshot_dirname, "snapshot")

    def load_segment(self, seq: int):
        data = np.load(os.path.join(self.dir, f"seg-{seq}.npz"))
        return data["unit"], data["mags"]

    # -- write side ----------------------------------------------------------

    def _append(self, rec: dict) -> None:
        rec["seq"] = self.next_seq
        self.next_seq += 1
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        self._records.append(rec)

    def log_insert(
        self,
        paths: Sequence[str],
        unit: np.ndarray,
        mags: np.ndarray,
        attrs: Optional[Dict[str, Sequence]],
    ) -> None:
        seq = self.next_seq
        seg = os.path.join(self.dir, f"seg-{seq}.npz")
        tmp = seg + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, unit=np.asarray(unit, np.float32),
                     mags=np.asarray(mags, np.float32))
            f.flush()
            # GROUP COMMIT: durability comes from the next flush()
            # barrier, which fsyncs pending segments before the log —
            # per-insert fsync measured ~86 ms per 1 MB batch (bench.py
            # journal_insert extras), and Milvus's contract is likewise
            # flush-barrier durability, not per-insert
        os.replace(tmp, seg)
        self._pending_segs.append(seg)
        rec = {"op": "insert", "paths": list(map(str, paths))}
        if attrs is not None:
            rec["attrs"] = {
                k: [x.item() if hasattr(x, "item") else x for x in v]
                for k, v in attrs.items()
            }
        self._append(rec)

    def log_delete(self, paths: Sequence[str]) -> None:
        self._append({"op": "delete", "paths": list(map(str, paths))})

    def log_delete_rows(self, rows) -> None:
        self._append({"op": "delete_rows",
                      "rows": [int(r) for r in np.asarray(rows).ravel()]})

    def log_compact(self) -> None:
        self._append({"op": "compact"})

    def log_meta(self, key: str, value) -> None:
        """Small JSON-serializable index metadata (e.g. the partition name
        set — Milvus persists partitions even when empty, so names must
        survive restart independently of row data)."""
        self._append({"op": "meta", "key": str(key), "value": value})

    def flush(self) -> None:
        """Durability barrier: everything logged so far survives a crash
        (the Milvus `collection.flush()` contract). Segment payloads fsync
        BEFORE the log so a durable log record never references a torn
        segment; recovery handles the inverse (durable segment, lost
        record) by construction — an unreferenced segment is ignored."""
        synced_any = False
        for seg in self._pending_segs:
            try:
                fd = os.open(seg, os.O_RDONLY)
            except FileNotFoundError:
                continue  # checkpoint GC raced us; its data is covered
            try:
                os.fsync(fd)
                synced_any = True
            finally:
                os.close(fd)
        if synced_any:
            # segment files were published via os.replace(); fsync the
            # directory so a power loss cannot un-publish a segment whose
            # log record is about to be made durable (r5 review finding)
            self._fsync_dir(self.dir)
        self._pending_segs = []
        self._fh.flush()
        os.fsync(self._fh.fileno())

    def drop_from(self, seq: int) -> None:
        """Recovery: discard record `seq` and everything after it — the
        un-flushed tail (its segment was torn/missing). Truncates the log
        to the surviving prefix and removes orphaned segment files."""
        keep = [r for r in self._records if r["seq"] < seq]
        self._fh.close()
        with open(self.ops_path, "w", encoding="utf-8") as f:
            for r in keep:
                f.write(json.dumps(r) + "\n")
            f.flush()
            os.fsync(f.fileno())
        self._records = keep
        self.next_seq = 1 + max([r["seq"] for r in keep],
                                default=self.covered_seq)
        self._fh = open(self.ops_path, "a", encoding="utf-8")
        for fname in os.listdir(self.dir):
            if fname.startswith("seg-") and fname.endswith(".npz"):
                try:
                    if int(fname[4:-4]) >= seq:
                        os.remove(os.path.join(self.dir, fname))
                except ValueError:
                    continue

    # -- checkpoint ----------------------------------------------------------

    def begin_checkpoint(self):
        """Reserve the next snapshot directory. Returns (seq, base_path) —
        the caller runs `index.save(base_path)` into it, then calls
        commit_checkpoint(seq). Returns (None, None) when there is nothing
        new to checkpoint (no ops since the last one): snap-<seq> would
        then BE the live published snapshot, and rmtree'ing it here would
        destroy the only durable copy before the new save lands — a crash
        mid-save would lose the whole index (r5 review finding)."""
        seq = self.next_seq - 1
        name = f"snap-{seq}"
        if seq == self.covered_seq and name == self.snapshot_dirname:
            return None, None  # idempotent: current snapshot already covers seq
        path = os.path.join(self.dir, name)
        if os.path.exists(path):  # leftover from a crashed checkpoint
            shutil.rmtree(path)
        os.makedirs(path)
        return seq, os.path.join(path, "snapshot")

    def _fsync_dir(self, path: str) -> None:
        try:
            fd = os.open(path, os.O_RDONLY)
        except OSError:
            return  # platform without directory fds: best effort
        try:
            os.fsync(fd)
        finally:
            os.close(fd)

    def commit_checkpoint(self, seq: int) -> None:
        """Atomically publish snap-<seq> as CURRENT, then truncate the log
        and GC consumed segments + old snapshots.

        Power-loss ordering (r5 review finding): the snapshot payload
        files and their directory entry fsync BEFORE CURRENT is published
        — otherwise a power cut after the rename could leave CURRENT
        durably naming a torn snapshot with the op log already truncated,
        and no fallback."""
        name = f"snap-{seq}"
        snap_dir = os.path.join(self.dir, name)
        for fname in os.listdir(snap_dir):
            fd = os.open(os.path.join(snap_dir, fname), os.O_RDONLY)
            try:
                os.fsync(fd)
            finally:
                os.close(fd)
        self._fsync_dir(snap_dir)
        cur = os.path.join(self.dir, CURRENT)
        tmp = cur + ".tmp"
        with open(tmp, "w") as f:
            f.write(name)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, cur)
        self._fsync_dir(self.dir)
        old_snap = self.snapshot_dirname
        self.snapshot_dirname = name
        self.covered_seq = seq
        self._fh.close()
        self._fh = open(self.ops_path, "w", encoding="utf-8")
        self._records = []
        for fname in os.listdir(self.dir):
            if fname.startswith("seg-") and fname.endswith(".npz"):
                try:
                    if int(fname[4:-4]) <= seq:
                        os.remove(os.path.join(self.dir, fname))
                except ValueError:
                    continue
        if old_snap and old_snap != name:
            shutil.rmtree(os.path.join(self.dir, old_snap),
                          ignore_errors=True)

    def close(self) -> None:
        self._fh.close()
