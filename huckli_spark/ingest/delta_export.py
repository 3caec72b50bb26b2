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
structurally and round-trip through the independent spec-derived
reader ``tools/delta_read.py``; cross-reader verification against a
foreign implementation is a deployment step.)

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
  Round 7: the increment re-emits a fresh ``metaData`` action when
  the caller's schema differs from the last exported one (schema
  evolution used to silently keep the stale v0 schemaString —
  external readers dropped the new columns), and every
  ``checkpoint_interval`` versions the writer emits a protocol
  checkpoint — ``_delta_log/{v:020d}.checkpoint.parquet`` holding
  the reconciled state plus the ``_last_checkpoint`` pointer — so
  the log can be compacted (``clean_log``) instead of accumulating
  one JSON commit per batch forever; real readers start from the
  checkpoint and replay only the JSON tail.
"""

from __future__ import annotations

import json
import os
import time
import urllib.parse
import uuid
from typing import Optional

DELTA_LOG_DIR = "_delta_log"
CHECKPOINT_INTERVAL = 10
LAST_CHECKPOINT = "_last_checkpoint"


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


def _read_last_checkpoint(log_dir: str) -> Optional[dict]:
    path = os.path.join(log_dir, LAST_CHECKPOINT)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def _read_checkpoint_state(
    log_dir: str, version: int
) -> tuple[Optional[dict], dict[str, dict]]:
    """Load a checkpoint parquet back into (metaData, live add actions
    keyed by decoded path). Writer-side replay only — the independent
    reader in tools/delta_read.py has its own spec-derived copy."""
    import pyarrow.parquet as pq

    path = os.path.join(log_dir, f"{version:020d}.checkpoint.parquet")
    meta: Optional[dict] = None
    live: dict[str, dict] = {}
    for row in pq.read_table(path).to_pylist():
        if row.get("metaData") is not None:
            m = dict(row["metaData"])
            m["format"] = dict(m["format"])
            m["format"]["options"] = dict(m["format"]["options"] or [])
            m["configuration"] = dict(m.get("configuration") or [])
            m["partitionColumns"] = list(m.get("partitionColumns") or [])
            meta = m
        elif row.get("add") is not None:
            a = dict(row["add"])
            a["partitionValues"] = dict(a.get("partitionValues") or [])
            live[urllib.parse.unquote(a["path"])] = a
    return meta, live


def _replay_exported(
    table_path: str,
) -> tuple[int, dict[str, dict], Optional[dict]]:
    """Writer-side replay of its own prior commits: (last_version,
    live add-actions keyed by decoded path, last metaData action).
    Starts from the latest checkpoint when one exists (the JSON
    commits at or below it may have been compacted away by
    ``clean_log``). (-1, {}, None) when no log."""
    log_dir = os.path.join(table_path, DELTA_LOG_DIR)
    if not os.path.isdir(log_dir):
        return -1, {}, None
    start = -1
    live: dict[str, dict] = {}
    meta: Optional[dict] = None
    ck = _read_last_checkpoint(log_dir)
    if ck is not None:
        start = int(ck["version"])
        meta, live = _read_checkpoint_state(log_dir, start)
    commits = sorted(
        n for n in os.listdir(log_dir)
        if n.endswith(".json") and n[:-5].isdigit()
        and int(n[:-5]) > start
    )
    last = start
    for name in commits:
        last = int(name[:-5])
        with open(os.path.join(log_dir, name)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "add" in action:
                    a = action["add"]
                    live[urllib.parse.unquote(a["path"])] = a
                elif "remove" in action:
                    live.pop(
                        urllib.parse.unquote(action["remove"]["path"]), None
                    )
                elif "metaData" in action:
                    meta = action["metaData"]
    return last, live, meta


def _quote_path(rel: str) -> str:
    # the protocol URL-encodes each path segment
    return "/".join(urllib.parse.quote(seg) for seg in rel.split("/"))


def _file_stats(full_path: str) -> Optional[str]:
    """Per-file statistics as the protocol's ``stats`` JSON string:
    numRecords + min/max/nullCount per top-level primitive column,
    read from the parquet footer (no data scan). Real Delta readers
    use these for file skipping — exporting them makes min/max
    pruning (including both columns of a z-ordered layout) work
    through the exported log, not just against raw footers. Columns
    without usable footer stats (binary, nested) are simply omitted,
    which the spec allows. Returns None if the footer is unreadable
    (stats are an optimization, never a correctness dependency)."""
    import datetime

    import pyarrow.parquet as pq

    def ser(v):
        if isinstance(v, bytes):
            return None
        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat()
        if isinstance(v, float) and (v != v):  # NaN never a bound
            return None
        return v

    try:
        pf = pq.ParquetFile(full_path)
        n_rows = pf.metadata.num_rows
        mins: dict = {}
        maxs: dict = {}
        nulls: dict = {}
        pq_names = list(pf.schema.names)  # flattened leaf paths
        for field in pf.schema_arrow:
            # top-level primitives only: nested arrow fields have
            # child fields, and their parquet leaves carry dotted
            # paths that would not line up with the arrow name
            if field.type.num_fields or field.name not in pq_names:
                continue
            name = field.name
            idx = pq_names.index(name)
            lo = hi = None
            nn = 0
            ok = True
            for g in range(pf.num_row_groups):
                st = pf.metadata.row_group(g).column(idx).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                nn += st.null_count if st.null_count is not None else 0
                lo = st.min if lo is None or st.min < lo else lo
                hi = st.max if hi is None or st.max > hi else hi
            if not ok:
                continue
            lo, hi = ser(lo), ser(hi)
            if lo is None or hi is None:
                continue
            mins[name] = lo
            maxs[name] = hi
            nulls[name] = nn
        return json.dumps(
            {
                "numRecords": n_rows,
                "minValues": mins,
                "maxValues": maxs,
                "nullCount": nulls,
            }
        )
    except Exception:  # noqa: BLE001 — stats are best-effort
        return None


def _add_action(table_path: str, rel: str, partition_columns: list[str]) -> dict:
    full = os.path.join(table_path, rel)
    st = os.stat(full)
    add = {
        "path": _quote_path(rel),
        "partitionValues": _partition_values(rel, partition_columns),
        "size": st.st_size,
        "modificationTime": int(st.st_mtime * 1000),
        "dataChange": True,
    }
    stats = _file_stats(full)
    if stats is not None:
        add["stats"] = stats
    return {"add": add}


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


# ------------------------------------------------------------ checkpoints
def write_checkpoint(table_path: str, version: Optional[int] = None) -> str:
    """Write the protocol checkpoint for ``version`` (default: the
    latest exported version): ``{v:020d}.checkpoint.parquet`` with one
    action per row in the spec's column layout (``protocol`` /
    ``metaData`` / ``add`` struct columns, absent actions null,
    ``partitionValues`` a map<string,string> with null values for the
    Hive default partition, ``dataChange: false`` as checkpoints are
    reconciled state, not changes) plus the ``_last_checkpoint``
    pointer file. Atomic via tmp + os.replace. Returns the checkpoint
    path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    last, live, meta = _replay_exported(table_path)
    if last < 0:
        raise ValueError(f"no export in {table_path} to checkpoint")
    if meta is None:
        raise ValueError(f"no metaData action in {table_path} log")
    if version is None:
        version = last
    elif version != last:
        raise ValueError(
            f"can only checkpoint the latest version {last}, got {version}"
        )
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
        ]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            (
                "format",
                pa.struct(
                    [
                        ("provider", pa.string()),
                        ("options", pa.map_(pa.string(), pa.string())),
                    ]
                ),
            ),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
            ("createdTime", pa.int64()),
        ]
    )
    protocol_t = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
    )
    schema = pa.schema(
        [("protocol", protocol_t), ("metaData", meta_t), ("add", add_t)]
    )
    rows: list[dict] = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": meta["id"],
                "format": {
                    "provider": meta["format"]["provider"],
                    "options": list(
                        (meta["format"].get("options") or {}).items()
                    ),
                },
                "schemaString": meta["schemaString"],
                "partitionColumns": meta.get("partitionColumns") or [],
                "configuration": list(
                    (meta.get("configuration") or {}).items()
                ),
                "createdTime": meta.get("createdTime"),
            }
        },
    ]
    for rel in sorted(live):
        a = live[rel]
        rows.append(
            {
                "add": {
                    "path": a["path"],
                    "partitionValues": list(
                        (a.get("partitionValues") or {}).items()
                    ),
                    "size": a["size"],
                    "modificationTime": a["modificationTime"],
                    "dataChange": False,
                    "stats": a.get("stats"),
                }
            }
        )
    table = pa.Table.from_pylist(rows, schema=schema)
    log_dir = os.path.join(table_path, DELTA_LOG_DIR)
    final = os.path.join(log_dir, f"{version:020d}.checkpoint.parquet")
    tmp = f"{final}.tmp{uuid.uuid4().hex}"
    pq.write_table(table, tmp)
    os.replace(tmp, final)
    lc = os.path.join(log_dir, LAST_CHECKPOINT)
    lc_tmp = f"{lc}.tmp{uuid.uuid4().hex}"
    with open(lc_tmp, "w") as fh:
        json.dump({"version": version, "size": len(rows)}, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(lc_tmp, lc)
    return final


def clean_log(table_path: str) -> list[str]:
    """Log compaction: delete JSON commits AT OR BELOW the latest
    checkpoint (their state is fully contained in the checkpoint —
    the same expired-log cleanup real Delta writers run). Keeps every
    commit above the checkpoint and every checkpoint file. Returns
    the removed file names. No-op without a checkpoint."""
    log_dir = os.path.join(table_path, DELTA_LOG_DIR)
    ck = _read_last_checkpoint(log_dir)
    if ck is None:
        return []
    v = int(ck["version"])
    removed = []
    for name in sorted(os.listdir(log_dir)):
        if name.endswith(".json") and name[:-5].isdigit() and int(name[:-5]) <= v:
            os.remove(os.path.join(log_dir, name))
            removed.append(name)
    return removed


def export_delta_increment(
    table_path: str,
    partition_columns: Optional[list[str]] = None,
    schema_json: Optional[str] = None,
    checkpoint_interval: int = CHECKPOINT_INTERVAL,
) -> Optional[str]:
    """Append ONE new Delta version containing only the diff since the
    last export: ``remove`` actions for files no longer live (e.g. a
    replaced file_source partition), ``add`` actions for new files,
    and — when ``schema_json`` differs from the last exported
    schemaString — a fresh ``metaData`` action carrying the evolved
    schema (same table id; per the protocol the latest metaData wins
    on replay). Without the re-emit, external Delta readers would keep
    projecting the stale v0 columns after warehouse schema evolution
    (ADVICE r6). Per the protocol, ``protocol``/``metaData`` need not
    repeat after version 0 while unchanged — readers replay the whole
    log. Returns the new commit path, or None when nothing changed
    (no empty commits). Requires a prior full export (version 0).
    Every ``checkpoint_interval`` versions the reconciled state is
    also written as a protocol checkpoint + ``_last_checkpoint`` so
    readers can skip the log prefix and ``clean_log`` can compact it;
    pass 0 to disable."""
    partition_columns = partition_columns or []
    last, exported_adds, meta = _replay_exported(table_path)
    if last < 0:
        raise ValueError(
            f"no prior export in {table_path}: run export_delta_snapshot "
            "once before incremental exports"
        )
    exported = set(exported_adds)
    current = set(_live_files(table_path))
    gone, new = sorted(exported - current), sorted(current - exported)
    schema_changed = (
        schema_json is not None
        and meta is not None
        and meta.get("schemaString") != schema_json
    )
    if not gone and not new and not schema_changed:
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
    if schema_changed:
        new_meta = dict(meta)
        new_meta["schemaString"] = schema_json
        actions.append({"metaData": new_meta})
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
    version = last + 1
    commit = _write_commit(table_path, version, actions)
    if checkpoint_interval and version % checkpoint_interval == 0:
        write_checkpoint(table_path, version)
    return commit


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
    last, _, _ = _replay_exported(table_path)
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
