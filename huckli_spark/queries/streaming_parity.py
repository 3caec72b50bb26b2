"""Streaming parity queries.

q_stream_time_bucket runs the REAL Structured Streaming pipeline
(file-source stream -> watermarked tumbling window -> memory sink,
availableNow trigger) and must hash-match the plain batch SQL oracle —
proving the streaming operator computes the same aggregate as the
batch engine on a drained backlog.

q_sessionize is the batch form of the custom stateful operator
(streaming.sessionize); its streaming twin is differentially tested in
tests/test_streaming.py (emission semantics make it non-comparable to
a single batch SQL statement: only closed sessions emit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from huckli_spark.functions.portable import sql_fround
from huckli_spark.queries import query
from huckli_spark.session import load_table as _t
from huckli_spark.streaming.sessionize import sessionize_batch, sessionize_batch_oracle
from huckli_spark.streaming.windows import (
    events_stream,
    run_to_memory,
    stage_table_stream,
    tumbling_agg,
)


@query(
    "q_stream_time_bucket",
    f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           event_type, count(*) AS n,
           {sql_fround('sum(value)')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Structured Streaming tumbling-window aggregate (watermarked, "
    "availableNow) vs the batch SQL oracle.",
)
def q_stream_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream_dir = stage_table_stream(sf_dir, "events")
    stream = events_stream(spark, stream_dir)
    agg = tumbling_agg(stream, width="1 hour", watermark="2 hours")
    return run_to_memory(agg, output_mode="complete")


@query(
    "q_stream_dedup",
    f"""
    SELECT event_type, count(*) AS n, {sql_fround('sum(value)')} AS total_value
    FROM events
    GROUP BY event_type
    """,
    doc="streaming idempotent re-ingest: the SAME file delivered twice "
    "into the stream, deduplicated on event_id by "
    "dropDuplicatesWithinWatermark, must aggregate to the single-copy "
    "batch oracle. Models (and fixes, stream-side) the reference's "
    "at-least-once duplicate window (huckli-import/src/lib.rs:202-210).",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from huckli_spark.streaming.dedup import dedup_stream

    stream_dir = stage_table_stream(sf_dir, "events")
    # second delivery of the same file = the reference's crash-between-
    # append-and-checkpoint re-import
    shutil.copy(
        f"{stream_dir}/events.parquet", f"{stream_dir}/events_redelivered.parquet"
    )
    stream = events_stream(spark, stream_dir)
    # watermark delay far beyond the fixture's time span: within one
    # drain the state never evicts, so the dedup is exact (production
    # uses a horizon sized to the redelivery window)
    deduped = dedup_stream(stream, ["event_id"], delay="87600 hours")
    agg = deduped.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.expr(
            "cast(floor(sum(value) * 100.0 + 0.5) / 100.0 AS double)"
        ).alias("total_value"),
    )
    return run_to_memory(agg, output_mode="complete")


@query(
    "q_sessionize",
    sessionize_batch_oracle(gap_minutes=60),
    doc="gap-based sessionization (60 min), batch form of the stateful "
    "streaming operator.",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize_batch(_t(spark, sf_dir, "events"), gap_minutes=60)
