#!/usr/bin/env python
"""Independent minimal Delta Lake log reader — the verification twin
for ``huckli_spark/ingest/delta_export.py``.

Implemented FROM THE PUBLIC PROTOCOL SPEC
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md), sharing
NO code with the writer: this is the closest a sandbox without
delta-rs / Spark-Delta / DuckDB-delta can get to cross-reader
verification. It replays the commit JSONs exactly as the spec says a
reader must — ascending version order, ``add``/``remove`` file-action
reconciliation keyed on path, last ``metaData`` wins — then loads the
live parquet files and re-attaches partition columns from
``partitionValues`` (partition values are NOT stored in the data
files; a reader that ignored them would drop columns).

Round 7: consumes protocol checkpoints — when ``_last_checkpoint``
exists, the reader loads ``{v:020d}.checkpoint.parquet`` (one action
per row: ``protocol`` / ``metaData`` / ``add`` struct columns, per
the spec's checkpoint schema), reconstructs the state at v, and
replays only the JSON commits ABOVE v — commits at or below the
checkpoint may have been compacted away. Multi-part checkpoints,
deletion vectors, column mapping and reader version > 1 still raise
instead of mis-reading.

Usage:
    python tools/delta_read.py /path/to/table   # prints row count + schema
"""

from __future__ import annotations

import json
import os
import re
import sys
import urllib.parse

_COMMIT_RE = re.compile(r"^(\d{20})\.json$")


class DeltaReadError(Exception):
    pass


def _commit_files(table_path: str, after: int) -> list[tuple[int, str]]:
    """JSON commits with version > ``after``, contiguous from
    ``after + 1`` (gaps in the tail are corruption; missing commits
    at or below a checkpoint are expected compaction)."""
    log_dir = os.path.join(table_path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise DeltaReadError(f"no _delta_log in {table_path}")
    out = []
    for name in os.listdir(log_dir):
        m = _COMMIT_RE.match(name)
        if m and int(m.group(1)) > after:
            out.append((int(m.group(1)), os.path.join(log_dir, name)))
    out.sort()
    versions = [v for v, _ in out]
    if versions != list(range(after + 1, after + 1 + len(versions))):
        raise DeltaReadError(
            f"non-contiguous versions {versions} after {after}"
        )
    if after < 0 and not out:
        raise DeltaReadError("empty _delta_log")
    return out


def _load_checkpoint(table_path: str) -> tuple[int, dict | None, dict[str, dict]]:
    """If ``_last_checkpoint`` exists, load the checkpoint parquet it
    points at; return (version, metaData-or-None, live adds keyed by
    decoded path). (-1, None, {}) without a checkpoint. The spec's
    ``parts`` field (multi-part checkpoints) is unsupported — raise."""
    import pyarrow.parquet as pq

    lc = os.path.join(table_path, "_delta_log", "_last_checkpoint")
    if not os.path.exists(lc):
        return -1, None, {}
    with open(lc) as fh:
        pointer = json.load(fh)
    if pointer.get("parts"):
        raise DeltaReadError("multi-part checkpoints not supported")
    v = int(pointer["version"])
    path = os.path.join(
        table_path, "_delta_log", f"{v:020d}.checkpoint.parquet"
    )
    if not os.path.exists(path):
        raise DeltaReadError(f"_last_checkpoint points at missing {path}")
    meta = None
    live: dict[str, dict] = {}
    for row in pq.read_table(path).to_pylist():
        proto = row.get("protocol")
        if proto is not None:
            if proto["minReaderVersion"] > 1:
                raise DeltaReadError(
                    f"reader version {proto['minReaderVersion']} "
                    "not supported by this minimal reader"
                )
        elif row.get("metaData") is not None:
            meta = dict(row["metaData"])
            fmt = dict(meta["format"])
            fmt["options"] = dict(fmt.get("options") or [])
            meta["format"] = fmt
            meta["partitionColumns"] = list(meta.get("partitionColumns") or [])
        elif row.get("add") is not None:
            a = dict(row["add"])
            a["partitionValues"] = dict(a.get("partitionValues") or [])
            live[urllib.parse.unquote(a["path"])] = a
        elif row.get("remove") is not None:
            # spec allows tombstones in checkpoints; they are not live
            continue
    return v, meta, live


def replay_log(table_path: str) -> tuple[dict, dict[str, dict]]:
    """Replay checkpoint (if any) + commit tail; return
    (metaData, {decoded_path: add})."""
    ck_version, meta, live = _load_checkpoint(table_path)
    for _, path in _commit_files(table_path, after=ck_version):
        with open(path) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    if action["protocol"]["minReaderVersion"] > 1:
                        raise DeltaReadError(
                            "reader version "
                            f"{action['protocol']['minReaderVersion']} "
                            "not supported by this minimal reader"
                        )
                elif "metaData" in action:
                    meta = action["metaData"]
                elif "add" in action:
                    a = action["add"]
                    live[urllib.parse.unquote(a["path"])] = a
                elif "remove" in action:
                    live.pop(
                        urllib.parse.unquote(action["remove"]["path"]), None
                    )
                # commitInfo / txn / cdc: reader-irrelevant here
    if meta is None:
        raise DeltaReadError("no metaData action in log")
    if meta["format"]["provider"] != "parquet":
        raise DeltaReadError(f"unsupported provider {meta['format']}")
    return meta, live


def _cast_partition_value(v, spark_type: str):
    """Spec: partitionValues are strings; the reader applies the
    schema type. Cover the types this warehouse partitions by."""
    if v is None:
        return None
    if spark_type in ("string", "date"):
        # dates stay ISO strings here; comparison side does the same
        return v
    if spark_type in ("integer", "long", "short", "byte"):
        return int(v)
    if spark_type in ("double", "float"):
        return float(v)
    if spark_type == "boolean":
        return v == "true"
    raise DeltaReadError(f"unsupported partition type {spark_type}")


def read_rows(table_path: str) -> tuple[list[str], list[tuple]]:
    """Materialize the snapshot: (column_names, rows). Parquet files
    load via pyarrow; partition columns come from partitionValues."""
    import pyarrow.parquet as pq

    meta, live = replay_log(table_path)
    schema = json.loads(meta["schemaString"])
    types = {f["name"]: f["type"] for f in schema["fields"]}
    part_cols = meta["partitionColumns"]
    data_cols = [f["name"] for f in schema["fields"] if f["name"] not in part_cols]
    cols = data_cols + part_cols
    rows: list[tuple] = []
    for rel, add in sorted(live.items()):
        full = os.path.join(table_path, rel)
        # spec: the CURRENT schema projects over every file; files
        # written before a schema evolution lack the new columns and
        # the reader fills them with null
        present = set(pq.ParquetFile(full).schema_arrow.names)
        table = pq.read_table(
            full, columns=[c for c in data_cols if c in present]
        )
        pv = tuple(
            _cast_partition_value(
                add["partitionValues"].get(c), types[c]
            )
            for c in part_cols
        )
        for r in table.to_pylist():
            rows.append(tuple(r.get(c) for c in data_cols) + pv)
    return cols, rows


def prune_files(
    table_path: str, col: str, lo, hi
) -> tuple[list[str], list[str]]:
    """Data skipping from the LOG ALONE: partition live files into
    (must_read, skippable) for the predicate ``lo <= col <= hi``
    using each add action's ``stats`` JSON (numRecords / minValues /
    maxValues) — the same file-level min/max pruning real Delta
    readers perform, with no parquet footer touched. Files without
    stats for the column are conservatively kept."""
    _meta, live = replay_log(table_path)
    keep: list[str] = []
    skip: list[str] = []
    for rel, add in sorted(live.items()):
        stats = add.get("stats")
        if not stats:
            keep.append(rel)
            continue
        s = json.loads(stats) if isinstance(stats, str) else stats
        mn = (s.get("minValues") or {}).get(col)
        mx = (s.get("maxValues") or {}).get(col)
        if mn is None or mx is None:
            keep.append(rel)
            continue
        if mn <= hi and mx >= lo:
            keep.append(rel)
        else:
            skip.append(rel)
    return keep, skip


def main() -> int:
    table = sys.argv[1]
    cols, rows = read_rows(table)
    print(f"{len(rows)} rows, columns: {cols}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
