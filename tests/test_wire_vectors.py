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
        # poc_mobile ingest convention: received_timestamp = 1, report = 2;
        # session req accretion puts pub_key=3/signature=4/legacy
        # carrier_id=5 (all skipped as unknown) and carrier_id_v2 at 6
        usage = (
            tag(1, LEN) + ld(b"\x07" * 33)   # pub_key
            + tag(2, VARINT) + varint(1000)  # upload_bytes
            + tag(3, VARINT) + varint(2000)  # download_bytes
            + tag(4, VARINT) + varint(5)     # radio_access_technology EUTRAN
            + tag(5, LEN) + ld(b"evt-1")
            + tag(7, VARINT) + varint(1_700_000_000)
        )
        req = (
            tag(1, LEN) + ld(usage)
            + tag(2, VARINT) + varint(512)   # rewardable_bytes
            + tag(3, LEN) + ld(b"\x0c" * 33)  # pub_key (unread -> skipped)
            + tag(4, LEN) + ld(b"\x0d" * 64)  # signature (unread -> skipped)
            + tag(5, LEN) + ld(b"legacy")     # legacy string carrier_id
            + tag(6, VARINT) + varint(2)      # carrier_id_v2 (enum)
        )
        wire = tag(1, VARINT) + varint(1_700_000_111_000) + tag(2, LEN) + ld(req)
        out = decode(REGISTRY["data-transfer-ingest"].msg, wire)
        assert out["received_timestamp"] == 1_700_000_111_000
        r = out["report"]
        assert r["data_transfer_usage"]["radio_access_technology"] == "EUTRAN"
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


def dbl(v: float) -> bytes:
    import struct

    return struct.pack("<d", v)


I64 = 1


class TestVerifiedDataTransferWire:
    def test_triple_nesting_and_status(self):
        # verified_data_transfer_ingest_report_v1
        #   { report = 1 (ingest); status = 2; timestamp = 3 }
        usage = (
            tag(1, LEN) + ld(b"\x0e" * 33)
            + tag(2, VARINT) + varint(10)
            + tag(3, VARINT) + varint(20)
            + tag(4, VARINT) + varint(6)     # NR
            + tag(5, LEN) + ld(b"evt-9")
            + tag(6, LEN) + ld(b"\x0f" * 33)  # payer
            + tag(7, VARINT) + varint(1_700_000_500_000)
        )
        req = tag(1, LEN) + ld(usage) + tag(2, VARINT) + varint(30)
        ingest = tag(1, VARINT) + varint(1_700_000_600_000) + tag(2, LEN) + ld(req)
        wire = (
            tag(1, LEN) + ld(ingest)
            + tag(2, VARINT) + varint(0)
            + tag(3, VARINT) + varint(1_700_000_700_000)
        )
        out = decode(REGISTRY["verified-data-transfer-ingest"].msg, wire)
        assert out["report"]["report"]["data_transfer_usage"]["event_id"] == "evt-9"
        assert out["report"]["report"]["data_transfer_usage"][
            "radio_access_technology"
        ] == "NR"
        assert out["report"]["received_timestamp"] == 1_700_000_600_000
        assert out["status"] == "VALID"
        assert out["timestamp"] == 1_700_000_700_000


class TestDataTransferBurnWire:
    def test_flat_packet_verifier_layout(self):
        # packet_verifier valid_data_transfer_session: flat 1..9
        wire = (
            tag(1, LEN) + ld(b"\x10" * 33)       # pub_key
            + tag(2, VARINT) + varint(111)       # upload_bytes
            + tag(3, VARINT) + varint(222)       # download_bytes
            + tag(4, VARINT) + varint(7)         # num_dcs
            + tag(5, LEN) + ld(b"\x11" * 33)     # payer
            + tag(6, VARINT) + varint(1_700_000_000_000)  # first (ms)
            + tag(7, VARINT) + varint(1_700_000_060_000)  # last (ms)
            + tag(8, VARINT) + varint(333)       # rewardable_bytes
            + tag(9, VARINT) + varint(1_700_000_120_000)  # burn (ms)
        )
        out = decode(REGISTRY["data-transfer-burn"].msg, wire)
        assert out["num_dcs"] == 7
        assert out["first_timestamp"] == 1_700_000_000_000
        assert out["burn_timestamp"] == 1_700_000_120_000
        assert out["rewardable_bytes"] == 333


class TestHeartbeatWire:
    def test_validated_heartbeat_cbrs_era_sparse_numbering(self):
        # poc_mobile ``heartbeat`` keeps its cbrs heritage: cbsd_id=1,
        # reward_multiplier=3 (deprecated double), cell_type=4 — all
        # unread/undeclared and skipped; wifi-era location fields are
        # APPENDED at 10..13
        wire = (
            tag(1, LEN) + ld(b"CBSD-X")            # cbsd_id (skipped)
            + tag(2, LEN) + ld(b"\x12" * 33)        # pub_key
            + tag(3, I64) + dbl(1.0)                # reward_multiplier (skipped)
            + tag(4, VARINT) + varint(2)            # cell_type (skipped)
            + tag(5, VARINT) + varint(0)            # validity VALID
            + tag(6, VARINT) + varint(1_700_000_000)
            + tag(7, I64) + dbl(37.77)              # lat
            + tag(8, I64) + dbl(-122.41)            # lon
            + tag(9, LEN) + ld(bytes(range(16)))    # coverage_object
            + tag(10, VARINT) + varint(1_699_999_000)
            + tag(11, VARINT) + varint(42)          # distance_to_asserted
            + tag(12, VARINT) + varint(1)           # trust score mult
            + tag(13, VARINT) + varint(3)           # location_source SKYHOOK
        )
        out = decode(REGISTRY["verified-wifi-heartbeat"].msg, wire)
        assert out["pub_key"] == b"\x12" * 33
        assert out["validity"] == "HEARTBEAT_VALIDITY_VALID"
        assert out["lat"] == 37.77 and out["lon"] == -122.41
        assert out["distance_to_asserted"] == 42
        assert out["location_source"] == "SKYHOOK"
        assert "cbsd_id" not in out  # undeclared fields stay skipped

    def test_unknown_validity_value_surfaces_raw_int(self):
        # prost's getter would collapse unknown values to the default
        # variant; with a partial variant table the decoder must NOT
        # guess — a raw "7" is the documented failure mode
        wire = tag(2, LEN) + ld(b"\x13" * 33) + tag(5, VARINT) + varint(7)
        out = decode(REGISTRY["verified-wifi-heartbeat"].msg, wire)
        assert out["validity"] == "7"

    def test_wifi_heartbeat_req_gaps_6_and_8(self):
        req = (
            tag(1, LEN) + ld(b"\x14" * 33)
            + tag(2, VARINT) + varint(1_700_000_111)
            + tag(3, I64) + dbl(40.0)
            + tag(4, I64) + dbl(-74.0)
            + tag(5, VARINT) + varint(1_700_000_000)  # loc validation ts
            + tag(6, VARINT) + varint(99)             # distance (skipped)
            + tag(7, VARINT) + varint(1)              # operation_mode
            + tag(8, LEN) + ld(b"\x15" * 64)          # signature (skipped)
            + tag(9, LEN) + ld(bytes(range(16)))      # coverage_object
            + tag(10, VARINT) + varint(2)             # GPS
        )
        wire = tag(1, VARINT) + varint(1_700_000_222_000) + tag(2, LEN) + ld(req)
        out = decode(REGISTRY["wifi-heartbeat-ingest"].msg, wire)
        r = out["report"]
        assert r["operation_mode"] is True
        assert r["location_source"] == "GPS"
        assert r["coverage_object"] == bytes(range(16))
        assert out["received_timestamp"] == 1_700_000_222_000


class TestIotRewardShareWire:
    def test_oneof_arms_3_4_5(self):
        gw = (
            tag(1, LEN) + ld(b"\x16" * 33)
            + tag(2, VARINT) + varint(11)   # beacon_amount
            + tag(3, VARINT) + varint(22)   # witness_amount
            + tag(4, VARINT) + varint(33)   # dc_transfer_amount
        )
        wire = (
            tag(1, VARINT) + varint(100)
            + tag(2, VARINT) + varint(200)
            + tag(3, LEN) + ld(gw)
        )
        out = decode(REGISTRY["iot-rewards"].msg, wire)
        assert out["gateway_reward"]["witness_amount"] == 22
        assert out["operational_reward"] is None

        op = tag(1, VARINT) + varint(555)
        out = decode(REGISTRY["iot-rewards"].msg, tag(4, LEN) + ld(op))
        assert out["operational_reward"]["amount"] == 555

    def test_unallocated_reward_type_names(self):
        # unallocated_reward_type 4 = MAPPER (prefixed helium spelling)
        un = tag(1, VARINT) + varint(4) + tag(2, VARINT) + varint(9)
        out = decode(REGISTRY["iot-rewards"].msg, tag(5, LEN) + ld(un))
        assert out["unallocated_reward"]["reward_type"] == (
            "UNALLOCATED_REWARD_TYPE_MAPPER"
        )


class TestRadioUsageStatsWire:
    def test_v1_carrier_transfer_info_at_9(self):
        info = (
            tag(1, VARINT) + varint(1)    # carrier_id (enum)
            + tag(2, VARINT) + varint(1024)  # transfer_bytes
            + tag(3, VARINT) + varint(3)     # user_count
        )
        req = (
            tag(1, LEN) + ld(b"\x17" * 33)
            + tag(2, VARINT) + varint(1_700_000_000)  # epoch_start
            + tag(3, VARINT) + varint(1_700_003_600)  # epoch_end
            + tag(4, VARINT) + varint(5)
            + tag(5, VARINT) + varint(6)
            + tag(6, VARINT) + varint(7)
            + tag(7, VARINT) + varint(1000)
            + tag(8, VARINT) + varint(2000)
            + tag(9, LEN) + ld(info)
            + tag(9, LEN) + ld(info)
            + tag(10, VARINT) + varint(1_700_003_700)
        )
        wire = tag(1, VARINT) + varint(1_700_003_800_000) + tag(2, LEN) + ld(req)
        out = decode(REGISTRY["radio-usage-stats"].msg, wire)
        r = out["report"]
        assert len(r["carrier_transfer_info"]) == 2
        assert r["carrier_transfer_info"][0]["carrier_id"] == "CARRIER_A"
        assert r["carrier_transfer_info"][0]["transfer_bytes"] == 1024
        assert r["offload_transfer_bytes"] == 2000

    def test_v2_sampling_info_at_11_timestamp_at_12(self):
        ct = (
            tag(1, VARINT) + varint(2)
            + tag(2, VARINT) + varint(4)
            + tag(3, VARINT) + varint(100)  # rewarded
            + tag(4, VARINT) + varint(50)   # unrewarded
        )
        sct = (
            tag(1, VARINT) + varint(3)
            + tag(2, VARINT) + varint(8)
            + tag(3, VARINT) + varint(77)   # bytes_transferred
        )
        req = (
            tag(1, LEN) + ld(b"\x18" * 33)
            + tag(2, VARINT) + varint(1_700_000_000_000)
            + tag(3, VARINT) + varint(1_700_003_600_000)
            + tag(4, LEN) + ld(b"\x19" * 33)  # carrier_pubkey
            + tag(5, VARINT) + varint(12)
            + tag(6, VARINT) + varint(1111)
            + tag(7, VARINT) + varint(2222)
            + tag(8, VARINT) + varint(13)
            + tag(9, VARINT) + varint(3333)
            + tag(10, LEN) + ld(ct)
            + tag(11, LEN) + ld(sct)
            + tag(12, VARINT) + varint(1_700_003_700_000)
        )
        wire = tag(1, VARINT) + varint(1_700_003_800_000) + tag(2, LEN) + ld(req)
        out = decode(REGISTRY["radio-usage-stats-v2"].msg, wire)
        r = out["report"]
        assert r["carrier_transfer_info"][0]["rewarded_bytes_transferred"] == 100
        assert r["sampling_carrier_transfer_info"][0]["bytes_transferred"] == 77
        assert r["timestamp_ms"] == 1_700_003_700_000


class TestSubscriberMappingWire:
    def test_entity_key_at_7_past_signing_fields(self):
        req = (
            tag(1, LEN) + ld(bytes(range(16)))    # subscriber_id
            + tag(2, VARINT) + varint(30)
            + tag(3, VARINT) + varint(40)
            + tag(4, VARINT) + varint(1_700_000_000)
            + tag(5, LEN) + ld(b"\x1a" * 33)      # carrier_pub_key (skipped)
            + tag(6, LEN) + ld(b"\x1b" * 64)      # signature (skipped)
            + tag(7, LEN) + ld(b"entity-9")       # reward_override_entity_key
        )
        wire = tag(1, VARINT) + varint(1_700_000_100_000) + tag(2, LEN) + ld(req)
        out = decode(REGISTRY["subscriber-mapping-activity"].msg, wire)
        r = out["report"]
        assert r["discovery_reward_shares"] == 30
        assert r["reward_override_entity_key"] == "entity-9"

    def test_verified_wrapper_and_status_names(self):
        req = tag(1, LEN) + ld(bytes(range(16))) + tag(2, VARINT) + varint(1)
        ingest = tag(1, VARINT) + varint(160) + tag(2, LEN) + ld(req)
        wire = (
            tag(1, LEN) + ld(ingest)
            + tag(2, VARINT) + varint(2)
            + tag(3, VARINT) + varint(170)
        )
        out = decode(REGISTRY["verified-subscriber-mapping-activity"].msg, wire)
        assert out["status"] == (
            "SUBSCRIBER_REPORT_VERIFICATION_STATUS_INVALID_CARRIER_KEY"
        )
        assert out["report"]["report"]["discovery_reward_shares"] == 1


class TestSpBannedRadioWire:
    def test_oneof_key_and_ban_type_at_6(self):
        req = (
            tag(1, LEN) + ld(b"\x1c" * 33)   # oneof: hotspot_key
            + tag(3, VARINT) + varint(1)     # reason NO_NETWORK_CORRELATION
            + tag(4, VARINT) + varint(1_700_100_000)  # until
            + tag(5, LEN) + ld(b"\x1d" * 64)  # signature (skipped)
            + tag(6, VARINT) + varint(1)      # ban_type POC
        )
        ingest = tag(1, VARINT) + varint(1_700_000_100_000) + tag(2, LEN) + ld(req)
        wire = (
            tag(1, LEN) + ld(ingest)
            + tag(2, VARINT) + varint(0)
            + tag(3, VARINT) + varint(1_700_000_200_000)
        )
        out = decode(REGISTRY["verified-sp-banned-radio"].msg, wire)
        r = out["report"]["report"]
        assert r["hotspot_key"] == b"\x1c" * 33
        assert r["reason"] == (
            "SP_BOOSTED_REWARDS_BANNED_RADIO_REASON_NO_NETWORK_CORRELATION"
        )
        assert r["ban_type"] == "SP_BOOSTED_REWARDS_BANNED_RADIO_BAN_TYPE_POC"
        assert r["until"] == 1_700_100_000

    def test_cbsd_id_arm(self):
        req = tag(2, LEN) + ld(b"CBSD-77") + tag(6, VARINT) + varint(0)
        ingest = tag(2, LEN) + ld(req)
        out = decode(
            REGISTRY["verified-sp-banned-radio"].msg, tag(1, LEN) + ld(ingest)
        )
        r = out["report"]["report"]
        assert r["cbsd_id"] == "CBSD-77" and r["hotspot_key"] == b""
        assert r["ban_type"] == (
            "SP_BOOSTED_REWARDS_BANNED_RADIO_BAN_TYPE_BOOSTED_HEX"
        )


class TestRadioThresholdWire:
    def test_verified_threshold_unread_tail_skipped(self):
        req = (
            tag(1, LEN) + ld(b"\x1e" * 33)
            + tag(3, VARINT) + varint(5_000_000)  # bytes_threshold
            + tag(4, VARINT) + varint(25)         # subscriber_threshold
            + tag(5, VARINT) + varint(1_700_000_000)
            + tag(6, LEN) + ld(b"\x1f" * 33)      # carrier_pub_key (skipped)
            + tag(7, LEN) + ld(b"\x20" * 64)      # signature (skipped)
        )
        ingest = tag(1, VARINT) + varint(1_700_000_100_000) + tag(2, LEN) + ld(req)
        wire = (
            tag(1, LEN) + ld(ingest)
            + tag(2, VARINT) + varint(0)
            + tag(3, VARINT) + varint(1_700_000_200_000)
        )
        out = decode(REGISTRY["verified-radio-threshold"].msg, wire)
        r = out["report"]["report"]
        assert r["bytes_threshold"] == 5_000_000
        assert r["subscriber_threshold"] == 25
        assert out["report"]["received_timestamp"] == 1_700_000_100_000

    def test_invalidated_threshold_req(self):
        req = (
            tag(2, LEN) + ld(b"CBSD-55")     # cbsd_id arm
            + tag(3, VARINT) + varint(2)     # reason
            + tag(4, VARINT) + varint(1_700_000_000)
        )
        ingest = tag(1, VARINT) + varint(1) + tag(2, LEN) + ld(req)
        wire = tag(1, LEN) + ld(ingest) + tag(2, VARINT) + varint(1)
        out = decode(
            REGISTRY["verified-invalidated-radio-threshold"].msg, wire
        )
        r = out["report"]["report"]
        assert r["cbsd_id"] == "CBSD-55"
        assert r["reason"] == "STALE"
        assert out["status"] == "INVALID"
