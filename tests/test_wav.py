"""Real WAV codec tests (operators/multimodal.py): pure-stdlib RIFF
PCM decode — round-trips, stereo mixdown, chunk-walk robustness,
unsupported-variant errors, and the Spark feature pipeline accepting
real WAVs interchangeably with the HKA1 fixture codec."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from huckli_spark.operators import multimodal as mm


def _sine(n=1600, sr=16000, f=440.0, amp=0.5):
    t = np.arange(n) / sr
    return (np.sin(2 * np.pi * f * t) * amp * 32767).astype(np.int16)


class TestWavCodec:
    def test_mono_round_trip(self):
        s = _sine()
        out, sr = mm.decode_wav_bytes(mm.encode_wav(s, 16000))
        assert sr == 16000
        assert np.array_equal(out, s)

    def test_stereo_mixdown(self):
        left = _sine(amp=0.5)
        right = _sine(amp=0.25)
        stereo = np.stack([left, right], axis=1)
        out, sr = mm.decode_wav_bytes(mm.encode_wav(stereo, 8000))
        expect = np.round(
            (left.astype(np.int32) + right.astype(np.int32)) / 2
        ).astype(np.int16)
        assert sr == 8000
        assert np.array_equal(out, expect)

    def test_extra_chunks_skipped(self):
        # a LIST metadata chunk between fmt and data must be walked over
        s = _sine(100)
        raw = mm.encode_wav(s, 16000)
        fmt_end = 12 + 8 + 16
        listc = b"LIST" + struct.pack("<I", 4) + b"INFO"
        patched = raw[:fmt_end] + listc + raw[fmt_end:]
        patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
        out, sr = mm.decode_wav_bytes(patched)
        assert np.array_equal(out, s)

    def test_non_pcm_raises_with_reason(self):
        raw = bytearray(mm.encode_wav(_sine(10), 16000))
        raw[20:22] = struct.pack("<H", 3)  # IEEE float format tag
        with pytest.raises(NotImplementedError, match="format tag 3"):
            mm.decode_wav_bytes(bytes(raw))

    def test_not_wav_raises_valueerror(self):
        with pytest.raises(ValueError):
            mm.decode_wav_bytes(b"RIFFxxxxJUNK")
        with pytest.raises(ValueError):
            mm.decode_wav_bytes(b"\x00" * 32)

    def test_decode_real_routes_wav(self):
        s = _sine(50)
        out, sr = mm.decode_real(mm.encode_wav(s, 22050), "audio")
        assert sr == 22050 and np.array_equal(out, s)

    def test_decode_any_audio_dispatch(self):
        s = _sine(50)
        a1, r1 = mm.decode_any_audio(mm.encode_audio(s, 16000))
        a2, r2 = mm.decode_any_audio(mm.encode_wav(s, 16000))
        assert np.array_equal(a1, a2) and r1 == r2


class TestWavInPipeline:
    def test_audio_features_on_real_wav(self, spark):
        s = _sine(n=16000, sr=16000)  # exactly 1 s
        rows = [
            (1, bytearray(mm.encode_wav(s, 16000))),
            (2, bytearray(mm.encode_audio(s, 16000))),
            (3, bytearray(b"garbage-bytes")),
        ]
        df = spark.createDataFrame(rows, "media_id long, data binary")
        got = {r["media_id"]: r for r in mm.audio_features(df).collect()}
        # WAV and HKA1 of the same samples produce identical features
        assert got[1]["duration_ms"] == got[2]["duration_ms"] == 1000.0
        assert got[1]["rms"] == got[2]["rms"]
        assert got[1]["zero_crossing_rate"] == got[2]["zero_crossing_rate"]
        # junk is quarantined as nulls, not fatal
        assert got[3]["sample_rate"] is None
