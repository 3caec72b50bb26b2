"""Delta-protocol snapshot export: make warehouse tables readable by
real Delta Lake readers.

The warehouse's crash-safe commit mechanism is `ingest/txlog.py` (its
own compact format, proven by the crash matrix and the multi-process
contention tests). This module does NOT replace it — it materializes
the CURRENT live snapshot of a table as a `_delta_log/` directory in
the open Delta Lake protocol format
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md):

- one commit file ``_delta_log/00000000000000000000.json`` of
  newline-delimited actions,
- ``protocol`` action: minReaderVersion 1 / minWriterVersion 2 (the
  floor for plain parquet tables with no advanced table features),
- ``metaData`` action: provider "parquet", Spark-JSON ``schemaString``,
  the table's Hive partition columns,
- one ``add`` action per live data file: URL-encoded relative path,
  ``partitionValues`` parsed from the ``k=v`` path segments, byte
  size, mtime, ``dataChange: true``.

After export, ``delta.`spark.read.format("delta")``, delta-rs, or
DuckDB's delta extension can read the table directory as a Delta
table at that snapshot. (None of those readers ship in this sandbox —
the tests pin the action JSON against the public protocol spec
structurally; cross-reader verification is a deployment step.)

Export is read-only with one atomic publish (tmp file + os.replace)
per commit. Two modes:

- ``export_delta_snapshot``: full version-0 snapshot; re-running
  rebases v0 while no later versions exist.
- ``export_delta_increment`` (round 6): appends version N+1 holding
  only the diff since the last export — ``remove`` actions for files
  replaced/compacted away, ``add`` actions for new files — so a
  continuously-ingesting warehouse exports each batch as one small
  commit instead of rewriting the whole log. Readers of the txlog
  and readers of the exported Delta log see the same files at every
  version (pinned by the independent-parser round-trip tests).
"""

from __future__ import annotations

import json
import os
import time
import urllib.parse
import uuid
from typing import Optional

DELTA_LOG_DIR = "_delta_log"


def _partition_values(rel_path: str, partition_columns: list[str]) -> dict:
    """Parse Hive ``k=v`` directory segments into partitionValues.
    The Hive null marker maps to JSON null per the protocol."""
    out = {}
    for seg in rel_path.split("/")[:-1]:
        if "=" not in seg:
            continue
        k, _, v = seg.partition("=")
        if k in partition_columns:
            out[k] = (
                None
                if v == "__HIVE_DEFAULT_PARTITION__"
                else urllib.parse.unquote(v)
            )
    return out


def _live_files(table_path: str) -> list[str]:
    from huckli_spark.ingest.txlog import TransactionLog

    log = TransactionLog(table_path)
    if log.exists():
        return log.live_files()
    # plain (non-acid) parquet dir: every data file is live
    files = []
    for root, dirs, names in os.walk(table_path):
        dirs[:] = [
            d for d in dirs if d != DELTA_LOG_DIR and not d.startswith("_")
        ]
        for f in names:
            if f.endswith(".parquet"):
                files.append(
                    os.path.relpath(os.path.join(root, f), table_path)
                )
    files.sort()
    return files


def _replay_exported(table_path: str) -> tuple[int, set[str]]:
    """Writer-side replay of its own prior commits: (last_version,
    currently-exported live path set). (-1, empty) when no log."""
    log_dir = os.path.join(table_path, DELTA_LOG_DIR)
    if not os.path.isdir(log_dir):
        return -1, set()
    commits = sorted(
        n for n in os.listdir(log_dir)
        if n.endswith(".json") and n[:-5].isdigit()
    )
    if not commits:
        return -1, set()
    live: set[str] = set()
    for name in commits:
        with open(os.path.join(log_dir, name)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "add" in action:
                    live.add(urllib.parse.unquote(action["add"]["path"]))
                elif "remove" in action:
                    live.discard(
                        urllib.parse.unquote(action["remove"]["path"])
                    )
    return int(commits[-1][:-5]), live


def _quote_path(rel: str) -> str:
    # the protocol URL-encodes each path segment
    return "/".join(urllib.parse.quote(seg) for seg in rel.split("/"))


def _add_action(table_path: str, rel: str, partition_columns: list[str]) -> dict:
    st = os.stat(os.path.join(table_path, rel))
    return {
        "add": {
            "path": _quote_path(rel),
            "partitionValues": _partition_values(rel, partition_columns),
            "size": st.st_size,
            "modificationTime": int(st.st_mtime * 1000),
            "dataChange": True,
        }
    }


def _write_commit(table_path: str, version: int, actions: list[dict]) -> str:
    log_dir = os.path.join(table_path, DELTA_LOG_DIR)
    os.makedirs(log_dir, exist_ok=True)
    final = os.path.join(log_dir, f"{version:020d}.json")
    tmp = f"{final}.tmp{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, final)
    return final


def export_delta_increment(
    table_path: str, partition_columns: Optional[list[str]] = None
) -> Optional[str]:
    """Append ONE new Delta version containing only the diff since the
    last export: ``remove`` actions for files no longer live (e.g. a
    replaced file_source partition), ``add`` actions for new files.
    Per the protocol, ``protocol``/``metaData`` need not repeat after
    version 0 — readers replay the whole log. Returns the new commit
    path, or None when nothing changed (no empty commits). Requires a
    prior full export (version 0)."""
    partition_columns = partition_columns or []
    last, exported = _replay_exported(table_path)
    if last < 0:
        raise ValueError(
            f"no prior export in {table_path}: run export_delta_snapshot "
            "once before incremental exports"
        )
    current = set(_live_files(table_path))
    gone, new = sorted(exported - current), sorted(current - exported)
    if not gone and not new:
        return None
    now_ms = int(time.time() * 1000)
    actions: list[dict] = [
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "WRITE",
                "operationParameters": {"mode": "Append"},
                "engineInfo": "huckli_spark txlog export",
            }
        }
    ]
    for rel in gone:
        actions.append(
            {
                "remove": {
                    "path": _quote_path(rel),
                    "deletionTimestamp": now_ms,
                    "dataChange": True,
                }
            }
        )
    for rel in new:
        actions.append(_add_action(table_path, rel, partition_columns))
    return _write_commit(table_path, last + 1, actions)


def export_delta_snapshot(
    table_path: str,
    schema_json: str,
    partition_columns: Optional[list[str]] = None,
) -> str:
    """Write ``_delta_log/`` version 0 for the table's current live
    snapshot. Returns the commit file path. ``schema_json`` is the
    Spark StructType JSON string (``df.schema.json()``) — what
    Delta's ``schemaString`` field contains. Re-running rebases
    version 0 — but ONLY while no incremental versions exist:
    rewriting v0 under a v1+ tail would corrupt the replay, so that
    case raises and the caller chooses increment or a fresh dir."""
    last, _ = _replay_exported(table_path)
    if last > 0:
        raise ValueError(
            f"_delta_log in {table_path} has incremental versions "
            f"(latest {last}); use export_delta_increment, or clear "
            "the log for a fresh rebase"
        )
    partition_columns = partition_columns or []
    files = _live_files(table_path)

    now_ms = int(time.time() * 1000)
    actions = [
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "WRITE",
                "operationParameters": {"mode": "Overwrite"},
                "engineInfo": "huckli_spark txlog export",
            }
        },
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_json,
                "partitionColumns": partition_columns,
                "configuration": {},
                "createdTime": now_ms,
            }
        },
    ]
    for rel in files:
        actions.append(_add_action(table_path, rel, partition_columns))
    return _write_commit(table_path, 0, actions)
