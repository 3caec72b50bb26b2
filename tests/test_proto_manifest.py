"""Schema-drift guard for the wire descriptors (VERDICT r02 item 7).

The reference freezes its protobuf schema by pinning helium-proto at a
git rev (Cargo.lock); this engine freezes its declarative descriptors
in proto_manifest.json. Any change to field numbers/types/enums/nested
messages in filetypes.py must be deliberate: it now fails here until
the manifest is regenerated (tools/proto_manifest.py --write) in the
same commit, i.e. schema changes become reviewable diffs.
"""

from __future__ import annotations

import json
import os


def test_descriptors_match_frozen_manifest():
    from tools.proto_manifest import MANIFEST_PATH, build_manifest, render

    assert os.path.exists(MANIFEST_PATH), (
        "proto_manifest.json missing — run tools/proto_manifest.py --write"
    )
    with open(MANIFEST_PATH) as fh:
        frozen = fh.read()
    assert frozen == render(build_manifest()), (
        "wire descriptors drifted from proto_manifest.json; if the "
        "change is intentional, regenerate with "
        "`python tools/proto_manifest.py --write` and review the diff "
        "against the reference's helium-proto definitions"
    )


def test_manifest_structural_invariants():
    """The frozen manifest itself is well-formed: unique field numbers
    per message, valid wire types, 20 file types, 31+1 tables."""
    from huckli_spark.sources.protowire import _SCALAR_WIRE
    from tools.proto_manifest import MANIFEST_PATH

    with open(MANIFEST_PATH) as fh:
        manifest = json.load(fh)

    assert len(manifest) == 20  # SupportedFileTypes parity

    tables: set[str] = set()

    def walk(msg):
        nums = [f["num"] for f in msg["fields"]]
        assert len(nums) == len(set(nums)), f"dup field nums in {msg['name']}"
        assert nums == sorted(nums)
        for f in msg["fields"]:
            if "message" in f:
                assert f["type"] == "message"
                walk(f["message"])
            else:
                assert f["type"] in _SCALAR_WIRE, (msg["name"], f["name"], f["type"])

    for name, spec in manifest.items():
        assert spec["bucket"].startswith("helium-mainnet-")
        walk(spec["message"])
        tables.update(spec["tables"])
    assert len(tables) == 31  # data tables (files_processed is separate)
