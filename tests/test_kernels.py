"""Unit tests for the custom kernels (SURVEY §5.2): wire codec,
framing, base58check, uuid16, timestamp heuristic, decimal default,
file listing."""

from __future__ import annotations

import gzip
import io
import os
import uuid
from datetime import datetime, timezone

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from huckli_spark.functions import keys
from huckli_spark.sources import framing, listing, protowire
from huckli_spark.sources.protowire import Field, Msg

MSG = Msg(
    "Test",
    (
        Field(1, "key", "bytes"),
        Field(2, "count", "uint64"),
        Field(3, "name", "string"),
        Field(4, "ratio", "double"),
        Field(5, "flag", "bool"),
        Field(6, "status", "enum", enum_names={0: "UNKNOWN", 1: "OK", 2: "BAD"}),
        Field(7, "items", "uint32", repeated=True),
        Field(8, "child", "message", schema=Msg("Child", (Field(1, "v", "int32"),))),
        Field(9, "signed", "int64"),
    ),
)


class TestProtowire:
    def test_round_trip(self):
        vals = {
            "key": b"\x01\x02",
            "count": 12345678901234,
            "name": "hot spot",
            "ratio": 2.5,
            "flag": True,
            "status": "BAD",
            "items": [1, 2, 3],
            "child": {"v": -7},
            "signed": -99,
        }
        out = protowire.decode(MSG, protowire.encode(MSG, vals))
        assert out == vals

    def test_proto3_defaults(self):
        out = protowire.decode(MSG, b"")
        assert out == {
            "key": b"",
            "count": 0,
            "name": "",
            "ratio": 0.0,
            "flag": False,
            "status": "UNKNOWN",
            "items": [],
            "child": None,
            "signed": 0,
        }

    def test_unknown_fields_skipped(self):
        extra = Msg("Extra", (Field(99, "x", "string"), Field(2, "count", "uint64")))
        data = protowire.encode(extra, {"x": "ignore me", "count": 5})
        assert protowire.decode(MSG, data)["count"] == 5

    def test_truncated_raises(self):
        data = protowire.encode(MSG, {"name": "abcdef"})
        with pytest.raises(protowire.WireError):
            protowire.decode(MSG, data[:-3])

    @given(
        st.integers(min_value=0, max_value=(1 << 64) - 1),
        st.text(max_size=50),
        st.booleans(),
        st.floats(allow_nan=False),
        st.lists(st.integers(min_value=0, max_value=(1 << 32) - 1), max_size=8),
    )
    @settings(max_examples=200, deadline=None)
    def test_property_round_trip(self, count, name, flag, ratio, items):
        vals = {"count": count, "name": name, "flag": flag, "ratio": ratio, "items": items}
        out = protowire.decode(MSG, protowire.encode(MSG, vals))
        for k, v in vals.items():
            if k == "items" and not v:
                continue  # empty repeated is indistinguishable from absent
            assert out[k] == v


class TestFraming:
    def test_round_trip(self, tmp_path):
        payloads = [b"a", b"bb" * 1000, b"", b"xyz"]
        path = str(tmp_path / "t.1700000000000.gz")
        assert framing.write_framed_gzip(path, payloads) == 4
        with gzip.open(path, "rb") as fh:
            assert list(framing.iter_frames(fh)) == payloads

    def test_truncated_final_frame_dropped(self):
        buf = io.BytesIO()
        framing.write_frames(buf, [b"good1", b"good2"])
        buf.write(framing.FRAME_HEADER.pack(100))
        buf.write(b"only-ten-b")  # claims 100 bytes, has 10
        buf.seek(0)
        assert list(framing.iter_frames(buf)) == [b"good1", b"good2"]

    def test_absurd_length_raises(self):
        buf = io.BytesIO(framing.FRAME_HEADER.pack(1 << 31))
        with pytest.raises(ValueError):
            list(framing.iter_frames(buf, max_frame=1 << 20))


class TestBase58:
    def test_known_bitcoin_vector(self):
        # pubkey-hash of secp256k1 generator point, the classic vector
        payload = bytes([0x00]) + bytes.fromhex(
            "751e76e8199196d454941c45d1b3a323f1433bd6"
        )
        assert keys.b58check_encode(payload) == "1BgGZ9tcN4rm9KBzDn7KprQz87SZ26SAMH"

    def test_round_trip(self):
        data = bytes(range(33))
        assert keys.b58decode(keys.b58encode(data)) == data

    def test_helium_pubkey_prepends_version(self):
        raw = bytes(range(1, 34))
        enc = keys.helium_pubkey(raw)
        assert keys.b58decode(enc)[:1] == b"\x00"
        assert keys.b58decode(enc)[1:34] == raw

    def test_leading_zeros(self):
        assert keys.b58encode(b"\x00\x00\x01") == "112"


class TestListing:
    def test_fileinfo_parse(self):
        info = listing.FileInfo.from_key(
            "foo/bar/coverage_object.1700000000123.gz"
        )
        assert info.prefix == "coverage_object"
        assert info.timestamp == datetime(
            2023, 11, 14, 22, 13, 20, 123000, tzinfo=timezone.utc
        )

    def test_bad_key_raises(self):
        with pytest.raises(ValueError):
            listing.FileInfo.from_key("UPPER.123.gz")

    def test_local_listing_bounds(self, tmp_path):
        for ms in (1000, 2000, 3000, 4000):
            (tmp_path / f"pfx.{ms}.gz").write_bytes(b"")
        (tmp_path / "other.2500.gz").write_bytes(b"")
        t = lambda ms: datetime.fromtimestamp(ms / 1000, tz=timezone.utc)
        all_files = listing.list_local(str(tmp_path), "pfx")
        assert [f.timestamp for f in all_files] == [t(1000), t(2000), t(3000), t(4000)]
        # after is strict (start_after semantics)
        assert [
            f.timestamp for f in listing.list_local(str(tmp_path), "pfx", after=t(2000))
        ] == [t(3000), t(4000)]
        # before is inclusive
        assert [
            f.timestamp for f in listing.list_local(str(tmp_path), "pfx", before=t(3000))
        ] == [t(1000), t(2000), t(3000)]

    def test_selection_validation(self):
        sel = listing.FileSelection(continue_=True, after=datetime.now(timezone.utc))
        with pytest.raises(ValueError):
            sel.validate()
        sel2 = listing.FileSelection(
            file="x.1.gz", before=datetime.now(timezone.utc)
        )
        with pytest.raises(ValueError):
            sel2.validate()

    def test_continue_requires_checkpoint(self, tmp_path):
        sel = listing.FileSelection(continue_=True)
        with pytest.raises(ValueError, match="cannot continue"):
            sel.resolve_files(str(tmp_path), "pfx", checkpoint_after=None)


class TestSparkKernels:
    def test_uuid16(self, spark):
        u = uuid.uuid4()
        df = spark.createDataFrame([(u.bytes,), (b"\x01\x02",), (None,)], "b: binary")
        from huckli_spark.functions.keys import uuid16

        rows = df.select(uuid16(df.b).alias("u")).collect()
        assert rows[0].u == str(u)
        assert rows[1].u is None  # wrong length
        assert rows[2].u is None

    def test_ts_heuristic(self, spark):
        from pyspark.sql import functions as F

        from huckli_spark.functions.timestamps import ts_heuristic

        df = spark.createDataFrame(
            [(1_700_000_000,), (1_700_000_000_000,), (1_000_000_000_000,)], "v: long"
        )
        rows = df.select(
            F.date_format(ts_heuristic(df.v), "yyyy-MM-dd HH:mm:ss").alias("t")
        ).collect()
        assert rows[0].t == "2023-11-14 22:13:20"  # seconds
        assert rows[1].t == "2023-11-14 22:13:20"  # millis
        # exactly at threshold => seconds branch (strict >)
        assert rows[2].t.startswith("+33658-")

    def test_proto_decimal(self, spark):
        from pyspark.sql import functions as F

        from huckli_spark.functions.decimals import proto_decimal

        df = spark.createDataFrame([("1.5",), ("oops",), ("",), (None,)], "s: string")
        vals = [r.v for r in df.select(proto_decimal(df.s).alias("v")).collect()]
        assert vals == [1.5, 0.0, 0.0, 0.0]

    def test_helium_pubkey_udf(self, spark):
        raw = bytes(range(1, 34))
        df = spark.createDataFrame([(raw,)], "b: binary")
        out = df.select(keys.helium_pubkey_udf(df.b).alias("k")).collect()[0].k
        assert out == keys.helium_pubkey(raw)
