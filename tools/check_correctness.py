#!/usr/bin/env python
"""Local replica of the driver's correctness gate — strict fetch path.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet dir, then compares row count, sorted
column names, an order-insensitive value hash, and — stricter than
round 1/2 — the per-column *type kind* of the oracle's Arrow fetch
against Spark's schema.

Why Arrow instead of ``fetchall()``: DuckDB promotes ``sum(BIGINT)``
to HUGEINT (int128). ``fetchall()`` renders it as a Python int (hiding
the promotion), but pandas/Arrow fetch — the driver's path — renders
it as float64 / Decimal, which hash-mismatches Spark's plain bigint.
Two rounds of red ``q_token_count``/``q_corpus_prep`` rows came from
exactly this gap (VERDICT r02 "What's wrong #1"). The kind check makes
any such representation divergence a loud local failure regardless of
how the driver normalizes values.
"""

from __future__ import annotations

import datetime as dt
import decimal
import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, decimal.Decimal):
        # Flagged separately by the kind check; normalize for the hash
        # so the failure message points at the type, not the value.
        return norm_cell(float(v)) if v != v.to_integral_value() else str(int(v))
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ")
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def driver_canon_error(cols, rows):
    """Replicate the DRIVER gate's canonicalization step (VERDICT r12
    #1/#4): the driver fetches each result into pandas via Arrow and
    runs ``sort_values`` over ALL columns before hashing — a column
    whose cells are unhashable (list/map/dict fetch) dies there with
    ``TypeError: unhashable type`` even when the values hash-match
    under this replica's own recipe (round 12's q_pack_emit ERR
    shipped through a "strict PASS" replica exactly this way). Rows
    go through an Arrow table first so nullable ints land as float64
    NaN columns, matching the driver's Arrow-fetched frame. Returns
    the canonicalization error string, or None when the driver's sort
    would succeed."""
    import pandas as pd
    import pyarrow as pa

    try:
        data = list(rows)
        tbl = pa.table(
            {c: [r[i] for r in data] for i, c in enumerate(cols)}
        ) if cols else pa.table({})
        pdf = tbl.to_pandas()
        pdf = pdf.reindex(sorted(pdf.columns), axis=1)
        if len(pdf.columns):
            pdf.sort_values(by=list(pdf.columns))
        return None
    except Exception as e:  # noqa: BLE001 — any raise is the defect
        return f"{type(e).__name__}: {e}"


def hash_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def spark_kind(dtype: str) -> str:
    d = dtype.split("(")[0].split("<")[0]
    return {
        "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
        "float": "float", "double": "float",
        "decimal": "decimal",
        "boolean": "bool",
        "string": "str", "varchar": "str", "char": "str",
        "binary": "binary",
        "timestamp": "ts", "timestamp_ntz": "ts",
        "date": "date",
        "array": "array", "map": "map", "struct": "struct",
    }.get(d, d)


def arrow_kind(t) -> str:
    import pyarrow.types as pt

    if pt.is_decimal(t):
        return "decimal"
    if pt.is_integer(t):
        return "int"
    if pt.is_floating(t):
        return "float"
    if pt.is_boolean(t):
        return "bool"
    if pt.is_string(t) or pt.is_large_string(t):
        return "str"
    if pt.is_binary(t) or pt.is_large_binary(t):
        return "binary"
    if pt.is_timestamp(t):
        return "ts"
    if pt.is_date(t):
        return "date"
    if pt.is_list(t) or pt.is_large_list(t) or pt.is_fixed_size_list(t):
        return "array"
    if pt.is_map(t):
        return "map"
    if pt.is_struct(t):
        return "struct"
    if pt.is_null(t):
        return "null"
    return str(t)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import duckdb

    from __spark_entry__ import oracle_sql, queries
    from huckli_spark.session import get_spark

    spark = get_spark(app_name="correctness_check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, os_ = queries(), oracle_sql()
    fails = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        try:
            df = qs[name](spark, sf_dir)
            srows = df.collect()
            scols = df.columns
            skinds = {c: spark_kind(d) for c, d in df.dtypes}
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            fails.append(name)
            continue
        if name not in os_:
            print(f"ok?  {name}: rows={len(srows)} (no oracle, rows-only)")
            continue
        try:
            # Arrow fetch = the driver-like path (NOT fetchall; see module doc)
            tbl = con.execute(os_[name]).arrow()
            ocols = tbl.column_names
            okinds = {f.name: arrow_kind(f.type) for f in tbl.schema}
            cols_data = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
            orows = list(zip(*cols_data)) if cols_data else []
            if tbl.num_rows and not orows:
                orows = [() for _ in range(tbl.num_rows)]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            fails.append(name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)}!={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)}!={sorted(ocols)}")
        else:
            # fetch-representation hazard check: an oracle column whose
            # Arrow kind differs from Spark's (e.g. decimal vs int) will
            # hash-mismatch on the driver even when values are equal.
            for c in scols:
                sk, ok = skinds[c], okinds[c]
                if ok == "null":  # all-NULL oracle column — kind unknowable
                    continue
                if sk != ok:
                    problems.append(f"kind[{c}] spark={sk} oracle={ok}")
        # driver-canonicalization fidelity (VERDICT r12 #4): the gate's
        # pandas sort must succeed on BOTH sides or the row ERRs there
        # regardless of value equality
        err = driver_canon_error(scols, [tuple(r) for r in srows])
        if err:
            problems.append(f"driver-canon spark: {err}")
        err = driver_canon_error(ocols, orows)
        if err:
            problems.append(f"driver-canon oracle: {err}")
        if not problems:
            sh, oh = hash_rows(scols, srows), hash_rows(ocols, orows)
            if sh != oh:
                problems.append(f"hash {sh}!={oh}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            fails.append(name)
        else:
            print(f"PASS {name} ({len(srows)} rows)")
    print(f"\n{len(fails)} failures" + (f": {fails}" if fails else ""))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
