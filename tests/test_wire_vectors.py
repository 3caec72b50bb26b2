"""Hand-built wire vectors for the transcribed helium-proto layouts.

Every byte here is written out by hand from the proto wire format
(tag = field_num << 3 | wire_type, varint/LEN encodings) using the
field numbers transcribed from the public github.com/helium/proto
definitions — NOT via this repo's own ``encode()``. That breaks the
encode/decode self-consistency loop: if a transcribed field number or
nesting level were wrong in the Msg descriptors, decode would read the
wrong field and these assertions would fail.

Families covered (VERDICT r03 item 6): mobile-rewards (oneof arm
numbering, nested helium.Decimal, nested speedtest_avg) and
coverage-object (oneof key_type arms, h3-string locations), plus the
double-nested verified_speedtest report.
"""

from __future__ import annotations

from huckli_spark.ingest.filetypes import REGISTRY
from huckli_spark.sources.protowire import decode


def tag(num: int, wire: int) -> bytes:
    t = (num << 3) | wire
    assert t < 0x80  # all our field numbers are <= 15
    return bytes([t])


def varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def ld(payload: bytes) -> bytes:
    """LEN wire value: length prefix + payload."""
    return varint(len(payload)) + payload


VARINT, LEN = 0, 2


class TestMobileRewardShareWire:
    def test_gateway_reward_is_field_4(self):
        # mobile_reward_share { start_period=1; end_period=2;
        #   oneof reward { ... gateway_reward = 4 ... } }
        gw = (
            tag(1, LEN) + ld(b"\x01" * 33)  # hotspot_key
            + tag(2, VARINT) + varint(77)   # dc_transfer_reward
            + tag(3, VARINT) + varint(4096) # rewardable_bytes
            + tag(4, VARINT) + varint(5)    # price
        )
        wire = (
            tag(1, VARINT) + varint(1_700_000_000)
            + tag(2, VARINT) + varint(1_700_086_400)
            + tag(4, LEN) + ld(gw)
        )
        out = decode(REGISTRY["mobile-rewards"].msg, wire)
        assert out["start_period"] == 1_700_000_000
        assert out["gateway_reward"]["dc_transfer_reward"] == 77
        assert out["gateway_reward"]["rewardable_bytes"] == 4096
        # the other oneof arms stay absent
        assert out["subscriber_reward"] is None
        assert out["radio_reward_v2"] is None

    def test_deprecated_radio_reward_v1_arm_is_skipped(self):
        # field 3 is the deprecated radio_reward (v1) arm; the engine
        # (like the reference) must skip it as an unknown field
        junk_v1 = tag(1, LEN) + ld(b"\x02" * 33) + tag(3, VARINT) + varint(9)
        wire = (
            tag(1, VARINT) + varint(1)
            + tag(3, LEN) + ld(junk_v1)
            + tag(2, VARINT) + varint(2)
        )
        out = decode(REGISTRY["mobile-rewards"].msg, wire)
        assert out["start_period"] == 1 and out["end_period"] == 2
        assert out["gateway_reward"] is None

    def test_radio_reward_v2_decimal_and_speedtest_avg_nesting(self):
        # radio_reward_v2 = 8; base_coverage_points_sum = 3 is a nested
        # helium.Decimal { string value = 1 }; speedtest_average = 18
        # is a nested speedtest_avg { upload_speed_bps = 1; ... }
        decimal_12_5 = tag(1, LEN) + ld(b"12.5")
        st_avg = (
            tag(1, VARINT) + varint(111)  # upload_speed_bps
            + tag(2, VARINT) + varint(222)  # download_speed_bps
            + tag(3, VARINT) + varint(33)   # latency_ms
            + tag(4, VARINT) + varint(1_700_000_000)
        )
        v2 = (
            tag(1, LEN) + ld(b"\x03" * 33)      # hotspot_key
            + tag(3, LEN) + ld(decimal_12_5)    # base_coverage_points_sum
            + tag(7, VARINT) + varint(1000)     # base_poc_reward
            # field 18's tag exceeds one byte — emit the 2-byte varint tag
            + varint((18 << 3) | LEN) + ld(st_avg)
        )
        wire = tag(1, VARINT) + varint(1) + tag(8, LEN) + ld(v2)
        out = decode(REGISTRY["mobile-rewards"].msg, wire)
        r = out["radio_reward_v2"]
        assert r["base_coverage_points_sum"] == {"value": "12.5"}
        assert r["base_poc_reward"] == 1000
        assert r["speedtest_average"]["upload_speed_bps"] == 111
        assert r["speedtest_average"]["latency_ms"] == 33

    def test_promotion_reward_is_field_9(self):
        promo = (
            tag(1, LEN) + ld(b"promo-entity")
            + tag(2, VARINT) + varint(21)
            + tag(3, VARINT) + varint(22)
        )
        wire = tag(9, LEN) + ld(promo)
        out = decode(REGISTRY["mobile-rewards"].msg, wire)
        assert out["promotion_reward"] == {
            "entity": "promo-entity",
            "service_provider_amount": 21,
            "matched_amount": 22,
        }


class TestCoverageObjectWire:
    def test_oneof_key_type_hotspot_key_is_field_8(self):
        hexlvl = (
            tag(1, LEN) + ld(b"8c2681a3064d9ff")  # h3 STRING location
            + tag(2, VARINT) + varint(3)           # signal_level HIGH
            # signal_power -70 as two's-complement varint
            + tag(3, VARINT) + varint((1 << 64) - 70)
        )
        req = (
            tag(1, LEN) + ld(b"\x04" * 33)   # pub_key (oracle signer)
            + tag(2, LEN) + ld(bytes(range(16)))  # uuid
            + tag(3, VARINT) + varint(1_700_000_000)  # coverage_claim_time
            + tag(4, VARINT) + varint(1)     # indoor
            + tag(5, LEN) + ld(hexlvl)       # coverage[0]
            + tag(8, LEN) + ld(b"\x05" * 33)  # oneof: hotspot_key
        )
        wire = tag(1, LEN) + ld(req) + tag(2, VARINT) + varint(0)
        out = decode(REGISTRY["coverage-object"].msg, wire)
        o = out["coverage_object"]
        assert o["hotspot_key"] == b"\x05" * 33
        assert o["cbsd_id"] == ""  # other oneof arm absent -> default
        assert o["coverage"][0]["location"] == "8c2681a3064d9ff"
        assert o["coverage"][0]["signal_power"] == -70
        assert o["indoor"] is True

    def test_oneof_key_type_cbsd_id_is_field_7(self):
        req = (
            tag(2, LEN) + ld(bytes(range(16)))
            + tag(7, LEN) + ld(b"CBSD-0099")
        )
        wire = tag(1, LEN) + ld(req)
        out = decode(REGISTRY["coverage-object"].msg, wire)
        assert out["coverage_object"]["cbsd_id"] == "CBSD-0099"
        assert out["coverage_object"]["hotspot_key"] == b""


class TestVerifiedSpeedtestWire:
    def test_double_nested_report(self):
        # verified_speedtest.report (1) = speedtest_ingest_report_v1
        #   { received_timestamp = 1; speedtest_req_v1 report = 2 }
        req = (
            tag(1, LEN) + ld(b"\x06" * 33)   # pub_key
            + tag(2, LEN) + ld(b"sn-42")     # serial
            + tag(3, VARINT) + varint(1_700_000_123)  # timestamp (sec)
            + tag(4, VARINT) + varint(100)   # upload_speed
            + tag(5, VARINT) + varint(1000)  # download_speed
            + tag(6, VARINT) + varint(17)    # latency
        )
        ingest = (
            tag(1, VARINT) + varint(1_700_000_123_456)  # received (ms)
            + tag(2, LEN) + ld(req)
        )
        wire = (
            tag(1, LEN) + ld(ingest)
            + tag(2, VARINT) + varint(0)  # result
            + tag(3, VARINT) + varint(1_700_000_200)  # verified ts
        )
        out = decode(REGISTRY["verified-speedtest"].msg, wire)
        assert out["report"]["received_timestamp"] == 1_700_000_123_456
        assert out["report"]["report"]["serial"] == "sn-42"
        assert out["report"]["report"]["latency"] == 17
        assert out["timestamp"] == 1_700_000_200


class TestRewardManifestWire:
    def test_epoch_price_at_6_7_and_oneof_skipped(self):
        # reward_manifest: written_files=1 (repeated), start=2, end=3,
        # oneof reward_data occupies 4/5 (skipped), epoch=6, price=7
        unread_oneof = tag(1, LEN) + ld(b"ignored")
        wire = (
            tag(1, LEN) + ld(b"f1.gz")
            + tag(1, LEN) + ld(b"f2.gz")
            + tag(2, VARINT) + varint(10)
            + tag(3, VARINT) + varint(20)
            + tag(4, LEN) + ld(unread_oneof)  # mobile_reward_data (unknown)
            + tag(6, VARINT) + varint(555)
            + tag(7, VARINT) + varint(777)
        )
        out = decode(REGISTRY["mobile-reward-manifest"].msg, wire)
        assert out["written_files"] == ["f1.gz", "f2.gz"]
        assert out["epoch"] == 555
        assert out["price"] == 777


class TestIngestWrapperConventionWire:
    def test_data_transfer_ingest_received_then_report(self):
        # poc_mobile ingest convention: received_timestamp = 1, report = 2
        usage = (
            tag(1, LEN) + ld(b"\x07" * 33)   # pub_key
            + tag(2, VARINT) + varint(1000)  # upload_bytes
            + tag(3, VARINT) + varint(2000)  # download_bytes
            + tag(4, VARINT) + varint(1)     # radio_access_technology WIFI
            + tag(5, LEN) + ld(b"evt-1")
            + tag(7, VARINT) + varint(1_700_000_000)
        )
        req = (
            tag(1, LEN) + ld(usage)
            + tag(2, VARINT) + varint(512)   # rewardable_bytes
            + tag(3, VARINT) + varint(2)     # carrier_id_v2 (enum)
        )
        wire = tag(1, VARINT) + varint(1_700_000_111_000) + tag(2, LEN) + ld(req)
        out = decode(REGISTRY["data-transfer-ingest"].msg, wire)
        assert out["received_timestamp"] == 1_700_000_111_000
        r = out["report"]
        assert r["data_transfer_usage"]["radio_access_technology"] == "WIFI"
        assert r["rewardable_bytes"] == 512
        assert r["carrier_id_v2"] == "CARRIER_B"

    def test_enabled_carriers_packed_repeated_enums(self):
        # proto3 packs repeated enums: one LEN record of varints
        req = (
            tag(1, LEN) + ld(b"\x08" * 33)          # hotspot_pubkey
            + tag(2, LEN) + ld(b"\x01\x02")          # enabled_carriers packed
            + tag(3, LEN) + ld(b"\x03")              # sampling packed
            + tag(4, LEN) + ld(b"fw-9.9")
            + tag(5, VARINT) + varint(1_700_000_222_000)
        )
        wire = tag(1, LEN) + ld(req)
        out = decode(REGISTRY["enabled-carriers-info"].msg, wire)
        r = out["report"]
        assert r["enabled_carriers"] == ["CARRIER_A", "CARRIER_B"]
        assert r["sampling_enabled_carriers"] == ["CARRIER_C"]
        assert r["firmware_version"] == "fw-9.9"

    def test_unique_connections_double_nesting(self):
        req = (
            tag(1, LEN) + ld(b"\x09" * 33)
            + tag(2, VARINT) + varint(100)
            + tag(3, VARINT) + varint(200)
            + tag(4, VARINT) + varint(42)   # unique_connections
            + tag(5, VARINT) + varint(150)  # sent timestamp
        )
        ingest = tag(1, VARINT) + varint(160) + tag(2, LEN) + ld(req)
        wire = (
            tag(1, LEN) + ld(ingest)
            + tag(2, VARINT) + varint(0)     # status
            + tag(3, VARINT) + varint(170)   # verified timestamp
        )
        out = decode(REGISTRY["verified-unique-connections"].msg, wire)
        assert out["report"]["report"]["unique_connections"] == 42
        assert out["report"]["report"]["timestamp"] == 150
        assert out["report"]["received_timestamp"] == 160
        assert out["timestamp"] == 170

    def test_boosted_hex_version_at_8(self):
        hexinfo = (
            tag(1, VARINT) + varint(123456)      # location
            + tag(2, VARINT) + varint(100)       # start_ts
            + tag(3, VARINT) + varint(200)       # end_ts
            + tag(4, VARINT) + varint(30)        # period_length
            + tag(5, LEN) + ld(b"\x02\x03")      # multipliers packed [2,3]
            + tag(6, LEN) + ld(b"\x0a" * 33)     # boosted_hex_pubkey (skipped)
            + tag(7, LEN) + ld(b"\x0b" * 33)     # boost_config_pubkey (skipped)
            + varint((8 << 3) | VARINT) + varint(4)  # version = 4 at field 8
        )
        wire = tag(1, VARINT) + varint(999) + tag(2, LEN) + ld(hexinfo)
        out = decode(REGISTRY["boosted-hex-update"].msg, wire)
        u = out["update"]
        assert u["multipliers"] == [2, 3]
        assert u["version"] == 4
        assert u["location"] == 123456
