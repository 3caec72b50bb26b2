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

Deliberately minimal, loudly so: deletion vectors, column mapping,
checkpoints and reader version > 1 raise instead of mis-reading.

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


def _commit_files(table_path: str) -> list[tuple[int, str]]:
    log_dir = os.path.join(table_path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise DeltaReadError(f"no _delta_log in {table_path}")
    out = []
    for name in os.listdir(log_dir):
        m = _COMMIT_RE.match(name)
        if m:
            out.append((int(m.group(1)), os.path.join(log_dir, name)))
    if not out:
        raise DeltaReadError("empty _delta_log")
    out.sort()
    versions = [v for v, _ in out]
    if versions != list(range(versions[0], versions[0] + len(versions))):
        raise DeltaReadError(f"non-contiguous versions {versions}")
    if versions[0] != 0:
        raise DeltaReadError("no checkpoint support: log must start at 0")
    return out


def replay_log(table_path: str) -> tuple[dict, dict[str, dict]]:
    """Replay all commits; return (metaData, {decoded_path: add})."""
    meta = None
    live: dict[str, dict] = {}
    for _, path in _commit_files(table_path):
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
        table = pq.read_table(full, columns=data_cols)
        pv = tuple(
            _cast_partition_value(
                add["partitionValues"].get(c), types[c]
            )
            for c in part_cols
        )
        for r in table.to_pylist():
            rows.append(tuple(r[c] for c in data_cols) + pv)
    return cols, rows


def main() -> int:
    table = sys.argv[1]
    cols, rows = read_rows(table)
    print(f"{len(rows)} rows, columns: {cols}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
