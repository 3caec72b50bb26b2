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
and can be re-run after further txlog commits: each run rewrites
version 0 as a fresh full snapshot — the checkpoint-style "rebase"
pattern, appropriate for a one-way export bridge. Readers of the
txlog and readers of the exported Delta log see the same files.
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


def export_delta_snapshot(
    table_path: str,
    schema_json: str,
    partition_columns: Optional[list[str]] = None,
) -> str:
    """Write ``_delta_log/`` for the table's current live snapshot.
    Returns the commit file path. ``schema_json`` is the Spark
    StructType JSON string (``df.schema.json()``) — what Delta's
    ``schemaString`` field contains."""
    from huckli_spark.ingest.txlog import TransactionLog

    partition_columns = partition_columns or []
    log = TransactionLog(table_path)
    if log.exists():
        files = log.live_files()
    else:  # plain (non-acid) parquet dir: every data file is live
        files = []
        for root, dirs, names in os.walk(table_path):
            dirs[:] = [
                d
                for d in dirs
                if d != DELTA_LOG_DIR and not d.startswith("_")
            ]
            for f in names:
                if f.endswith(".parquet"):
                    files.append(
                        os.path.relpath(os.path.join(root, f), table_path)
                    )
        files.sort()

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
        full = os.path.join(table_path, rel)
        st = os.stat(full)
        actions.append(
            {
                "add": {
                    # the protocol URL-encodes each path segment
                    "path": "/".join(
                        urllib.parse.quote(seg) for seg in rel.split("/")
                    ),
                    "partitionValues": _partition_values(rel, partition_columns),
                    "size": st.st_size,
                    "modificationTime": int(st.st_mtime * 1000),
                    "dataChange": True,
                }
            }
        )

    log_dir = os.path.join(table_path, DELTA_LOG_DIR)
    os.makedirs(log_dir, exist_ok=True)
    final = os.path.join(log_dir, f"{0:020d}.json")
    tmp = f"{final}.tmp{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, final)
    return final
