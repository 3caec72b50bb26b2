"""Minimal transaction log: atomic, crash-safe parquet commits.

The production north star for the warehouse sink is Delta/Iceberg
(BASELINE; SURVEY §7 M6). Neither ships in this container, so this
module implements the essential mechanism those formats provide —
write-audit-publish with an atomic commit point — in ~100 lines over
plain parquet, structured like a miniature Delta log:

- Writers stage part-files into a hidden ``_staging_*`` directory,
  then publish by moving them into the table directory and writing
  ONE numbered JSON entry into ``_txlog/`` via ``open(..., 'x')`` +
  ``os.replace`` — creation of the log entry IS the commit point
  (atomic on POSIX; ``'x'`` makes two concurrent writers of the same
  version a detectable conflict, and the loser retries with the next
  version number).
- Readers resolve the live file set by replaying the log in version
  order: ``add`` actions contribute files, ``replace`` actions drop
  every earlier file under the named partition directories first
  (the ``replaceWhere``/dynamic-overwrite analog). Unpublished
  staging files and crash orphans are invisible — a reader never
  lists the data directory.
- A crash BEFORE the log entry leaves only invisible orphans (swept
  by ``vacuum`` after its retention grace); a crash AFTER is a
  completed commit (the entry file AND its directory entry are
  fsynced). There is no torn state.

Reference tie-in: huckli appends row-at-a-time into DuckDB with no
transaction around data+checkpoint (huckli-import/src/lib.rs:202-210,
§3.1 step 8). This log closes the torn-write half of that gap
per-table; cross-table atomicity (data vs files_processed) remains
at-least-once, which composes with idempotent ``replace`` commits to
effective exactly-once.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Optional

LOG_DIR = "_txlog"
_STAGING_PREFIX = "_staging_"


class TransactionLog:
    def __init__(self, table_path: str):
        self.table_path = table_path
        self.log_path = os.path.join(table_path, LOG_DIR)

    # -- write side ---------------------------------------------------------
    def staging_dir(self) -> str:
        return os.path.join(self.table_path, f"{_STAGING_PREFIX}{uuid.uuid4().hex}")

    def publish(
        self,
        staging: str,
        replace_partitions: Optional[list[str]] = None,
        replace_all: bool = False,
    ) -> Optional[int]:
        """Move staged part-files into the table and commit one log
        entry. Returns the committed version, or None if the staging
        produced no data files. The entry write is the atomic commit
        point; everything before it is invisible to readers."""
        adds: list[str] = []
        for root, _dirs, files in os.walk(staging):
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                rel = os.path.relpath(os.path.join(root, f), staging)
                dest = os.path.join(self.table_path, rel)
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                os.replace(os.path.join(root, f), dest)
                adds.append(rel)
        _rmtree(staging)
        if not adds and not replace_partitions and not replace_all:
            return None
        entry = {"add": sorted(adds)}
        if replace_partitions:
            entry["replace"] = sorted(replace_partitions)
        if replace_all:
            entry["replace_all"] = True
        os.makedirs(self.log_path, exist_ok=True)
        while True:
            version = self._latest_version() + 1
            tmp = os.path.join(self.log_path, f".{version:08d}.json.tmp{uuid.uuid4().hex}")
            final = os.path.join(self.log_path, f"{version:08d}.json")
            with open(tmp, "w") as fh:
                json.dump(entry, fh)
                fh.flush()
                os.fsync(fh.fileno())
            try:
                # 'x'-style exclusivity: link fails if the version was
                # taken by a concurrent committer -> retry with next
                os.link(tmp, final)
                os.unlink(tmp)
                # the entry's DIRECTORY ENTRY must also be durable, or
                # a power loss after return could roll the commit back
                # while the data files survive as vacuumable orphans
                _fsync_dir(self.log_path)
                return version
            except FileExistsError:
                os.unlink(tmp)  # lost the race; re-read latest and retry

    # -- read side ----------------------------------------------------------
    def _latest_version(self) -> int:
        if not os.path.isdir(self.log_path):
            return -1
        versions = [
            int(f[:8])
            for f in os.listdir(self.log_path)
            if f.endswith(".json") and f[:8].isdigit()
        ]
        return max(versions, default=-1)

    def entries(self) -> list[dict]:
        if not os.path.isdir(self.log_path):
            return []
        names = sorted(
            f for f in os.listdir(self.log_path)
            if f.endswith(".json") and f[:8].isdigit()
        )
        out = []
        for n in names:
            with open(os.path.join(self.log_path, n)) as fh:
                out.append(json.load(fh))
        return out

    def live_files(self, as_of: Optional[int] = None) -> list[str]:
        """Replay the log: the snapshot's relative file paths — current
        by default, or as of a past ``version`` (time travel; valid as
        long as the superseded files haven't been vacuumed). An
        out-of-range ``as_of`` raises — silently serving the current
        snapshot under a stale version number would be a wrong-data
        read."""
        if as_of is not None and not (0 <= as_of <= self._latest_version()):
            raise ValueError(
                f"version {as_of} not in [0, {self._latest_version()}]"
            )
        live: list[str] = []
        for version, entry in enumerate(self.entries()):
            if as_of is not None and version > as_of:
                break
            if entry.get("replace_all"):
                live = []
            for part in entry.get("replace", []):
                live = [f for f in live if not f.startswith(part + os.sep)]
            live.extend(entry.get("add", []))
        return live

    def latest_version(self) -> int:
        """Highest committed version, -1 if none."""
        return self._latest_version()

    def exists(self) -> bool:
        return self._latest_version() >= 0

    # -- maintenance --------------------------------------------------------
    def vacuum(self, grace_seconds: float = 3600.0) -> list[str]:
        """Remove crash orphans: staged dirs and data files not in the
        current snapshot.

        ``grace_seconds`` is the retention window (Delta-style): any
        candidate younger than it is kept, because a publish moves its
        part-files into the table BEFORE the commit entry lands — a
        zero-grace vacuum racing an in-flight publish would delete
        files that are about to be committed. With a grace period
        longer than any plausible publish duration, concurrent
        vacuum/writer operation is safe; pass 0 only when no writer
        can be active."""
        import time

        removed: list[str] = []
        cutoff = time.time() - grace_seconds
        live = set(self.live_files())

        def _old(path: str) -> bool:
            try:
                return os.path.getmtime(path) <= cutoff
            except OSError:
                return False  # vanished underneath us — leave it be

        for name in os.listdir(self.table_path):
            p = os.path.join(self.table_path, name)
            if name.startswith(_STAGING_PREFIX) and _old(p):
                _rmtree(p)
                removed.append(name)
        for root, _dirs, files in os.walk(self.table_path):
            if os.path.basename(root) == LOG_DIR or _STAGING_PREFIX in root:
                continue
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, self.table_path)
                if rel not in live and _old(full):
                    os.unlink(full)
                    removed.append(rel)
        return removed


def _rmtree(path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)


def _fsync_dir(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)
