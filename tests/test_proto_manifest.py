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

    manifest.pop("__placeholder_enums__")  # the census, not a file type
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


# ---------------------------------------------------------------------------
# Enum override hook (round 6): placeholder spellings are injectable at
# runtime, warned about when decoded un-overridden, and frozen in the
# manifest as a census.
# ---------------------------------------------------------------------------
import contextlib
import warnings

import pytest

from huckli_spark.ingest import filetypes as ft
from huckli_spark.sources import protowire


@contextlib.contextmanager
def _restore(table_name: str):
    """Undo in-place table mutation and bookkeeping after a test."""
    before = dict(ft.ENUM_TABLES[table_name])
    warned = set(ft._WARNED_TABLES)
    overridden = set(ft._OVERRIDDEN_TABLES)
    try:
        yield
    finally:
        live = ft.ENUM_TABLES[table_name]
        live.clear()
        live.update(before)
        ft._WARNED_TABLES.clear()
        ft._WARNED_TABLES.update(warned)
        ft._OVERRIDDEN_TABLES.clear()
        ft._OVERRIDDEN_TABLES.update(overridden)


class TestEnumOverrides:
    def test_apply_mutates_tables_in_place(self):
        spec = ft.REGISTRY["enabled-carriers-info"]
        with _restore("E_CARRIER"):
            ft.apply_enum_overrides(
                {"E_CARRIER": {"0": "CARRIER_NONE", 1: "HELIUM_MOBILE_US"}}
            )
            # every Field holding the dict sees the new names: find one
            found = []

            def walk(msg):
                for f in msg.fields:
                    if f.ptype == "enum" and f.enum_names is ft.E_CARRIER:
                        found.append(f)
                    elif f.ptype == "message" and f.schema is not None:
                        walk(f.schema)

            walk(spec.msg)
            assert found, "no E_CARRIER field reachable from the spec"
            assert found[0].enum_names[1] == "HELIUM_MOBILE_US"
            # replace=True dropped the invented codes 2/3
            assert 2 not in ft.E_CARRIER
        assert ft.E_CARRIER[1] == "CARRIER_A"  # restored

    def test_unknown_table_raises(self):
        with pytest.raises(KeyError, match="E_NOPE"):
            ft.apply_enum_overrides({"E_NOPE": {0: "X"}})

    def test_env_file_applies(self, tmp_path, monkeypatch):
        p = tmp_path / "overrides.json"
        p.write_text(json.dumps({"E_HEX_STATUS": {"0": "REAL_ELIGIBLE"}}))
        monkeypatch.setenv("HUCKLI_SPARK_ENUM_OVERRIDES", str(p))
        with _restore("E_HEX_STATUS"):
            applied = ft.load_enum_overrides_from_env()
            assert applied == ["E_HEX_STATUS"]
            assert ft.E_HEX_STATUS[0] == "REAL_ELIGIBLE"

    def test_env_unset_noop(self, monkeypatch):
        monkeypatch.delenv("HUCKLI_SPARK_ENUM_OVERRIDES", raising=False)
        assert ft.load_enum_overrides_from_env() == []

    def test_warning_fires_once_per_placeholder_table(self):
        spec = ft.REGISTRY["enabled-carriers-info"]
        with _restore("E_CARRIER"):
            ft._WARNED_TABLES.clear()
            with warnings.catch_warnings(record=True) as w:
                warnings.simplefilter("always")
                hit = ft.warn_placeholder_enums(spec.msg, spec.name)
                assert "E_CARRIER" in hit
                again = ft.warn_placeholder_enums(spec.msg, spec.name)
                assert "E_CARRIER" in again  # still placeholder...
            msgs = [str(x.message) for x in w]
            assert sum("E_CARRIER" in m for m in msgs) == 1  # ...warned once

    def test_override_silences_warning(self):
        spec = ft.REGISTRY["enabled-carriers-info"]
        with _restore("E_CARRIER"):
            ft._WARNED_TABLES.clear()
            ft.apply_enum_overrides({"E_CARRIER": {0: "REAL"}})
            with warnings.catch_warnings(record=True) as w:
                warnings.simplefilter("always")
                hit = ft.warn_placeholder_enums(spec.msg, spec.name)
            assert "E_CARRIER" not in hit
            assert not [x for x in w if "E_CARRIER" in str(x.message)]

    def test_decode_uses_overridden_spelling(self):
        # end-to-end: wire bytes -> decode -> new enum label
        msg = protowire.Msg(
            "T", (protowire.Field(1, "carrier", "enum", enum_names=ft.E_CARRIER),)
        )
        raw = bytes([0x08, 0x01])  # field 1 varint = 1
        with _restore("E_CARRIER"):
            assert protowire.decode(msg, raw)["carrier"] == "CARRIER_A"
            ft.apply_enum_overrides({"E_CARRIER": {1: "HELIUM_MOBILE_US"}})
            assert protowire.decode(msg, raw)["carrier"] == "HELIUM_MOBILE_US"

    def test_manifest_census_frozen(self):
        manifest_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "huckli_spark", "ingest", "proto_manifest.json",
        )
        with open(manifest_path) as fh:
            frozen = json.load(fh)
        census = frozen["__placeholder_enums__"]
        assert set(census) == set(ft.PLACEHOLDER_ENUM_TABLES)
        assert census["E_CARRIER"]["1"] == "CARRIER_A"


class TestDescriptorSetDeploymentLoop:
    """VERDICT r6 #8: the FULL deployment path, end to end in CI —
    a compiled FileDescriptorSet (built here as real wire bytes and
    parsed by the repo's own codec, no google.protobuf needed) is
    diffed against the live tables, the diff EMITS an overrides JSON,
    the overrides are injected through HUCKLI_SPARK_ENUM_OVERRIDES,
    a placeholder-family fixture decodes through the real ingest with
    the injected spellings, the placeholder warning goes silent, and
    a re-diff reports OK."""

    def _fake_fds(self, tmp_path):
        import tools.proto_manifest as pm

        fds_bytes = protowire.encode(
            pm._descriptor_set_schema(),
            {
                "file": [
                    {
                        "name": "service_provider.proto",
                        "package": "helium.poc_mobile",
                        "enum_type": [
                            {
                                "name": "CarrierId",
                                "value": [
                                    {"name": "CARRIER_ID_NONE", "number": 0},
                                    {"name": "HELIUM_MOBILE_US", "number": 1},
                                ],
                            }
                        ],
                        "message_type": [
                            {
                                "name": "RadioRewardV2",
                                "nested_type": [],
                                "enum_type": [
                                    {
                                        "name": "HexStatus",
                                        "value": [
                                            {"name": "HEX_OK", "number": 0},
                                            {"name": "HEX_BANNED_LOC", "number": 1},
                                            {"name": "HEX_BANNED_RADIO", "number": 2},
                                        ],
                                    }
                                ],
                            }
                        ],
                    }
                ]
            },
        )
        fds = tmp_path / "fds.pb"
        fds.write_bytes(fds_bytes)
        emap = tmp_path / "enum_map.json"
        emap.write_text(
            json.dumps(
                {
                    "E_CARRIER": "helium.poc_mobile.CarrierId",
                    "E_HEX_STATUS": "helium.poc_mobile.RadioRewardV2.HexStatus",
                }
            )
        )
        return fds, emap

    def test_parse_descriptor_set_nested_enums(self, tmp_path):
        from tools.proto_manifest import parse_descriptor_set

        fds, _ = self._fake_fds(tmp_path)
        compiled = parse_descriptor_set(str(fds))
        assert compiled["helium.poc_mobile.CarrierId"] == {
            0: "CARRIER_ID_NONE",
            1: "HELIUM_MOBILE_US",
        }
        assert (
            compiled["helium.poc_mobile.RadioRewardV2.HexStatus"][2]
            == "HEX_BANNED_RADIO"
        )

    def test_full_loop(self, spark, tmp_path, monkeypatch, capsys):
        from tools.proto_manifest import diff_descriptor_set

        fds, emap = self._fake_fds(tmp_path)
        ov = tmp_path / "overrides.json"

        # 1. diff flags the placeholder spellings and emits overrides
        rc = diff_descriptor_set(str(fds), str(emap), str(ov))
        out = capsys.readouterr().out
        assert rc == 1
        assert "DIFF E_CARRIER" in out and "DIFF E_HEX_STATUS" in out
        emitted = json.loads(ov.read_text())
        assert emitted["E_CARRIER"]["1"] == "HELIUM_MOBILE_US"

        with _restore("E_CARRIER"), _restore("E_HEX_STATUS"):
            # 2. inject through the documented env hook
            monkeypatch.setenv("HUCKLI_SPARK_ENUM_OVERRIDES", str(ov))
            applied = ft.load_enum_overrides_from_env()
            assert set(applied) == {"E_CARRIER", "E_HEX_STATUS"}
            assert ft.E_CARRIER == {0: "CARRIER_ID_NONE", 1: "HELIUM_MOBILE_US"}

            # 3. a placeholder-family fixture decodes through the REAL
            # ingest pipeline with the injected spellings
            from tests.test_all_filetypes import (
                T0_MS,
                synth_message,
            )
            from huckli_spark.ingest.warehouse import Warehouse
            from huckli_spark.sources.framing import write_framed_gzip

            spec = ft.REGISTRY["enabled-carriers-info"]
            raw = tmp_path / "raw"
            raw.mkdir()
            payloads = [
                protowire.encode(spec.msg, synth_message(spec.msg, i))
                for i in range(2)
            ]
            fname = f"{spec.prefix.rstrip('.')}.{T0_MS}.gz"
            write_framed_gzip(str(raw / fname), payloads)
            wh = Warehouse(spark, str(tmp_path / "wh"))
            wh.ingest("enabled-carriers-info", str(raw))
            rows = wh.table(spec.tables[0]).collect()
            seen: set[str] = set()
            for r in rows:
                v = r["enabled_carriers"]
                # repeated enums land as a JSON array string (S11)
                seen.update(json.loads(v) if isinstance(v, str) else (v or []))
            assert "HELIUM_MOBILE_US" in seen
            assert not any(c.startswith("CARRIER_A") for c in seen)

            # 4. the placeholder warning is silent for overridden tables
            ft._WARNED_TABLES.clear()
            with warnings.catch_warnings(record=True) as w:
                warnings.simplefilter("always")
                hit = ft.warn_placeholder_enums(spec.msg, spec.name)
            assert "E_CARRIER" not in hit
            assert not [x for x in w if "E_CARRIER" in str(x.message)]

            # 5. re-diff: both tables now match the descriptor set
            rc2 = diff_descriptor_set(str(fds), str(emap), None)
            out2 = capsys.readouterr().out
            assert rc2 == 0
            assert "OK E_CARRIER" in out2 and "OK E_HEX_STATUS" in out2
