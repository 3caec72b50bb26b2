"""transformWithStateInPandas sessionization (streaming/sessionize_tws):
must emit exactly what the proven applyInPandasWithState form emits on
the same staged stream, and agree with the batch/window form — the
migration-safety differential for the Spark 4 StatefulProcessor API."""

from __future__ import annotations

import importlib.util
import os
import shutil
import time

import pytest
from pyspark.sql import types as T

def _has_protobuf() -> bool:
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no 'google' namespace package at all
        return False


# the transformWithState worker protocol needs google.protobuf
# (StateMessage_pb2); see sessionize_tws module docstring. Applied to
# the Spark-streaming class only — the in-process processor-logic
# tests below run everywhere.
needs_protobuf = pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState worker protocol requires the protobuf "
    "package, absent in this sandbox (same environment bound that "
    "motivated sources/protowire.py)",
)

from huckli_spark.streaming.sessionize import sessionize_batch, sessionize_stream
from huckli_spark.streaming.sessionize_tws import sessionize_stream_tws

_EV_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

_T0 = 1_700_000_000_000_000  # epoch micros


def _ts(minutes: float):
    from datetime import datetime, timezone

    return datetime.fromtimestamp(
        (_T0 + int(minutes * 60 * 1_000_000)) / 1e6, tz=timezone.utc
    )


def _stage(spark, tmp_path, rows_batches):
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    for i, rows in enumerate(rows_batches):
        df = spark.createDataFrame(rows, _EV_SCHEMA).coalesce(1)
        part_dir = tmp_path / f"part{i}"
        df.write.mode("overwrite").parquet(str(part_dir))
        src = next(f for f in os.listdir(part_dir) if f.endswith(".parquet"))
        dst = stream_dir / f"batch{i}.parquet"
        shutil.copy(part_dir / src, dst)
        base = time.time() - 1000
        os.utime(dst, (base + i * 10, base + i * 10))
    return str(stream_dir)


def _run(spark, tmp_path, stream_dir, builder, name):
    stream = (
        spark.readStream.schema(_EV_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    sess = builder(stream)
    q = (
        sess.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    return {
        (r.user_id, r.n_events, r.start_us, r.end_us)
        for r in spark.table(name).collect()
    }


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()
        self.timers: list[int] = []

    def getValueState(self, name, schema):
        return self.state

    def listTimers(self):
        return list(self.timers)

    def deleteTimer(self, t):
        self.timers.remove(t)

    def registerTimer(self, t):
        self.timers.append(t)


class _FakeTimerValues:
    def __init__(self, wm_ms=0):
        self._wm = wm_ms

    def getCurrentWatermarkInMs(self):
        return self._wm


class TestProcessorLogicInProcess:
    """Drive the StatefulProcessor directly (fake handle/state/timers)
    — runs in this sandbox even though the Spark-side worker protocol
    cannot (no protobuf). Asserts the same session semantics the
    staged-stream differential pins where it can run."""

    def _mk(self, gap_minutes=60):
        import pandas as pd

        from huckli_spark.streaming.sessionize_tws import _session_processor

        p = _session_processor(gap_minutes)
        h = _FakeHandle()
        p.init(h)

        def feed(minutes, wm_ms=0):
            pdf = pd.DataFrame(
                {"ts": [pd.Timestamp((_T0 + int(m * 60e6)) * 1000) for m in minutes]}
            )
            out = list(p.handleInputRows((7,), iter([pdf]),
                                         _FakeTimerValues(wm_ms)))
            return [
                tuple(r) for o in out for r in o.itertuples(index=False)
            ]

        return p, h, feed

    def test_gap_closes_session(self):
        _, h, feed = self._mk()
        got = feed([0, 10, 200, 210])
        m = 60 * 1_000_000
        assert got == [(7, 2, _T0, _T0 + 10 * m)]
        assert h.state.get() == (_T0 + 200 * m, _T0 + 210 * m, 2)
        assert len(h.timers) == 1  # stale timers always pruned

    def test_state_carries_across_batches(self):
        _, h, feed = self._mk()
        assert feed([0, 10]) == []
        got = feed([20, 300])  # 20m extends; 300m closes it
        m = 60 * 1_000_000
        assert got == [(7, 3, _T0, _T0 + 20 * m)]

    def test_timer_expiry_flushes_open_session(self):
        p, h, feed = self._mk()
        feed([0, 10])
        out = list(p.handleExpiredTimer((7,), _FakeTimerValues(10**15), None))
        m = 60 * 1_000_000
        rows = [tuple(r) for o in out for r in o.itertuples(index=False)]
        assert rows == [(7, 2, _T0, _T0 + 10 * m)]
        assert not h.state.exists()

    def test_expired_timer_with_no_state_is_noop(self):
        p, h, _ = self._mk()
        assert list(p.handleExpiredTimer((7,), _FakeTimerValues(0), None)) == []


@needs_protobuf
class TestSessionizeTws:
    def test_tws_matches_v1_and_batch(self, spark, tmp_path):
        batch1 = [
            (1, 1, _ts(0)),
            (1, 2, _ts(10)),
            (2, 3, _ts(60)),
            (2, 4, _ts(90)),
        ]
        batch2 = [(1, 5, _ts(180)), (1, 6, _ts(185)), (2, 7, _ts(600))]
        stream_dir = _stage(spark, tmp_path, [batch1, batch2])

        v2 = _run(
            spark,
            tmp_path,
            stream_dir,
            lambda s: sessionize_stream_tws(s, gap_minutes=60,
                                            watermark="0 seconds"),
            "tws_sink",
        )
        v1 = _run(
            spark,
            tmp_path,
            stream_dir,
            lambda s: sessionize_stream(s, gap_minutes=60,
                                        watermark="0 seconds"),
            "v1_sink",
        )

        all_events = spark.createDataFrame(batch1 + batch2, _EV_SCHEMA)
        by_key = {
            (r.user_id, r.session_id): (
                r.user_id,
                r.n_events,
                r.start_us,
                int(r.start_us + r.duration_s * 1_000_000),
            )
            for r in sessionize_batch(all_events, gap_minutes=60).collect()
        }
        closed_by_data = {by_key[(1, 1)], by_key[(2, 1)]}
        timeout_eligible = {by_key[(1, 2)]}

        # the new API reproduces the proven operator exactly
        assert v2 == v1
        # and both sit inside the batch-derived envelope
        assert closed_by_data <= v2
        assert v2 <= closed_by_data | timeout_eligible
        assert v2 <= set(by_key.values())

    def test_tws_single_batch_in_order(self, spark, tmp_path):
        rows = [(7, i, _ts(m)) for i, m in enumerate([0, 5, 10, 200, 210, 500])]
        stream_dir = _stage(spark, tmp_path, [rows])
        got = _run(
            spark,
            tmp_path,
            stream_dir,
            lambda s: sessionize_stream_tws(s, gap_minutes=60,
                                            watermark="0 seconds"),
            "tws_sink2",
        )
        # within one batch, sessions 1 and 2 close by data; session 3
        # ([500m]) stays open (watermark timing may or may not flush it)
        start = _T0
        m = 60 * 1_000_000
        s1 = (7, 3, start, start + 10 * m)
        s2 = (7, 2, start + 200 * m, start + 210 * m)
        assert {s1, s2} <= got
