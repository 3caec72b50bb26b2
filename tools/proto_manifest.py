#!/usr/bin/env python
"""Proto schema manifest: freeze the wire descriptors.

The reference pins its message definitions by vendoring helium-proto at
a git rev (Cargo.lock: git+https://github.com/helium/proto#3dbaedf;
decode at huckli-import/src/lib.rs:215-238). This engine declares its
descriptors in huckli_spark/ingest/filetypes.py, so nothing structural
pinned the field numbers/types — an accidental edit would silently
decode garbage (VERDICT r02 "What's missing #3").

This tool serializes every registered file type's wire schema (field
numbers, types, repeated flags, enum domains, nested messages, bucket
and prefix bindings) into ``huckli_spark/ingest/proto_manifest.json``.
``tests/test_proto_manifest.py`` regenerates the manifest and asserts
byte-for-byte equality — schema changes now require touching TWO files
in the same commit, which is the review hook.

The manifest also records the PLACEHOLDER ENUM CENSUS — the tables
whose variant spellings are invented (filetypes.PLACEHOLDER_ENUM_
TABLES) — so "how much of the schema is placeholder" is a frozen,
reviewable number, and ``--descriptor-set`` can diff the frozen enum
domains against a compiled FileDescriptorSet when a deployment can
produce one (``protoc --descriptor_set_out`` over helium-proto at the
pinned rev).

Usage:
    python tools/proto_manifest.py            # diff, exit 1 on drift
    python tools/proto_manifest.py --write    # (re)freeze
    python tools/proto_manifest.py --descriptor-set fds.pb \\
        [--enum-map map.json]   # diff enum domains vs compiled protos;
                                # map.json: {"E_CARRIER": "helium.poc_mobile.carrier_id", ...}
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MANIFEST_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "huckli_spark",
    "ingest",
    "proto_manifest.json",
)


def _field_dict(f) -> dict:
    d = {"num": f.num, "name": f.name, "type": f.ptype, "repeated": f.repeated}
    if f.enum_names is not None:
        d["enum"] = {str(k): v for k, v in sorted(f.enum_names.items())}
    if f.schema is not None:
        d["message"] = _msg_dict(f.schema)
    return d


def _msg_dict(msg) -> dict:
    return {
        "name": msg.name,
        "fields": [_field_dict(f) for f in sorted(msg.fields, key=lambda f: f.num)],
    }


def build_manifest() -> dict:
    from huckli_spark.ingest.filetypes import (
        ENUM_TABLES,
        PLACEHOLDER_ENUM_TABLES,
        REGISTRY,
    )

    out = {
        name: {
            "bucket": spec.bucket,
            "prefix": spec.prefix,
            "tables": list(spec.tables),
            "message": _msg_dict(spec.msg),
        }
        for name, spec in sorted(REGISTRY.items())
    }
    out["__placeholder_enums__"] = {
        name: {str(k): v for k, v in sorted(ENUM_TABLES[name].items())}
        for name in sorted(PLACEHOLDER_ENUM_TABLES)
    }
    return out


def render(manifest: dict) -> str:
    return json.dumps(manifest, indent=1, sort_keys=True) + "\n"


def diff_descriptor_set(fds_path: str, enum_map_path: str | None) -> int:
    """Diff the live enum tables against a compiled FileDescriptorSet.

    Requires google.protobuf (absent in the build sandbox — this arm
    is the deployment-side closer for the placeholder census). The
    optional enum map names which proto enum backs which table; tables
    not mapped are reported as unverified, never silently passed."""
    try:
        from google.protobuf import descriptor_pb2
    except ImportError:
        print(
            "google.protobuf is not installed: --descriptor-set needs it "
            "(pip install protobuf on the deployment host)"
        )
        return 2
    from huckli_spark.ingest.filetypes import ENUM_TABLES

    fds = descriptor_pb2.FileDescriptorSet()
    with open(fds_path, "rb") as fh:
        fds.ParseFromString(fh.read())
    compiled: dict[str, dict[int, str]] = {}
    for fd in fds.file:
        pkg = fd.package

        def walk(prefix, enums, messages):
            for e in enums:
                compiled[f"{prefix}.{e.name}".lstrip(".")] = {
                    v.number: v.name for v in e.value
                }
            for m in messages:
                walk(f"{prefix}.{m.name}", m.enum_type, m.nested_type)

        walk(pkg, fd.enum_type, fd.message_type)
    enum_map: dict[str, str] = {}
    if enum_map_path:
        with open(enum_map_path) as fh:
            enum_map = json.load(fh)
    rc = 0
    for table, live in sorted(ENUM_TABLES.items()):
        target = enum_map.get(table)
        if target is None:
            print(f"UNVERIFIED {table}: no enum-map entry")
            continue
        if target not in compiled:
            print(f"MISSING {table}: {target} not in descriptor set")
            rc = 1
            continue
        want = compiled[target]
        if want == live:
            print(f"OK {table} == {target} ({len(want)} variants)")
        else:
            rc = 1
            for code in sorted(set(want) | set(live)):
                w, h = want.get(code), live.get(code)
                if w != h:
                    print(f"DIFF {table}[{code}]: manifest={h!r} proto={w!r}")
    return rc


def main() -> int:
    if "--descriptor-set" in sys.argv:
        fds_path = sys.argv[sys.argv.index("--descriptor-set") + 1]
        emap = (
            sys.argv[sys.argv.index("--enum-map") + 1]
            if "--enum-map" in sys.argv
            else None
        )
        return diff_descriptor_set(fds_path, emap)
    current = render(build_manifest())
    if "--write" in sys.argv:
        with open(MANIFEST_PATH, "w") as fh:
            fh.write(current)
        print(f"wrote {MANIFEST_PATH} ({len(current)} bytes)")
        return 0
    if not os.path.exists(MANIFEST_PATH):
        print("manifest missing — run with --write")
        return 1
    with open(MANIFEST_PATH) as fh:
        frozen = fh.read()
    if frozen == current:
        print("manifest matches filetypes.py")
        return 0
    print("DRIFT: filetypes.py schemas differ from proto_manifest.json")
    return 1


if __name__ == "__main__":
    sys.exit(main())
