"""Gap-based sessionization: batch (window functions) and streaming
(``applyInPandasWithState`` custom stateful operator).

A session is a maximal run of a user's events where consecutive gaps
are <= ``gap_minutes``. The batch form is two window passes + an
aggregate — fully SQL-expressible, so it carries a DuckDB oracle. The
streaming form keeps one open session per user in state, emits a
session as soon as a later event closes it, and uses an event-time
timeout (watermark-driven) to flush idle users.

Differential guarantee (tested): streaming emissions == batch sessions
minus each user's final (still-open) session.

Scale: state is O(live users) x ~48 bytes; the watermark timeout
bounds it regardless of stream length. Batch form is one shuffle on
user_id reused by both window passes and the final aggregate.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from huckli_spark.functions.portable import fround

if TYPE_CHECKING:
    import pandas as pd

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("start_us", T.LongType(), True),
        T.StructField("end_us", T.LongType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), True),
        T.StructField("end_us", T.LongType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)


def sessionize_batch(events: DataFrame, gap_minutes: int = 60) -> DataFrame:
    """Per-session aggregate: (user_id, session_id, n_events, start_us,
    duration_s). ``session_id`` is 1-based per user in time order."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e = events.select("user_id", "event_id", F.unix_micros("ts").alias("us"))
    marked = e.withColumn(
        "new_s",
        F.when(
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) > gap_us),
            1,
        ).otherwise(0),
    ).withColumn("session_id", F.sum("new_s").over(run))
    return marked.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("us").alias("start_us"),
        fround((F.max("us") - F.min("us")) / 1_000_000.0).alias("duration_s"),
    )


def sessionize_batch_oracle(gap_minutes: int = 60) -> str:
    """DuckDB SQL computing exactly ``sessionize_batch`` over events."""
    from huckli_spark.functions.portable import sql_fround

    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS us FROM events
    ), m AS (
      SELECT user_id, event_id, us,
             CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > {gap_us}
                  THEN 1 ELSE 0 END AS new_s
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), s AS (
      SELECT user_id, us,
             CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM m
    )
    SELECT user_id, session_id, count(*) AS n_events, min(us) AS start_us,
           {sql_fround('(max(us) - min(us)) / 1000000.0')} AS duration_s
    FROM s GROUP BY user_id, session_id
    """


def sessionize_stream(events: DataFrame, gap_minutes: int = 60, watermark: str = "0 seconds") -> DataFrame:
    """Streaming sessionization over an event-time stream.

    Input needs columns (user_id, event_id, ts). Emits CLOSED sessions
    only: a session closes when a later event of the same user starts a
    new one, or when the watermark passes its gap timeout.
    """
    import pandas as pd  # noqa: F401

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, n, start_us, end_us)],
                columns=["user_id", "n_events", "start_us", "end_us"],
            )
            return
        times: list[int] = []
        for pdf in pdfs:
            # normalize to epoch micros regardless of pandas datetime unit
            ns = pd.to_datetime(pdf["ts"]).astype("datetime64[ns]").astype("int64")
            times.extend(int(v) // 1000 for v in ns)
        times.sort()
        if state.exists:
            start_us, end_us, n = state.get
        elif times:
            start_us = end_us = times[0]
            n = 0
        else:
            return
        closed: list[tuple[int, int, int, int]] = []
        for us in times:
            if n > 0 and us - end_us > gap_us:
                closed.append((user_id, n, start_us, end_us))
                start_us = us
                n = 0
            end_us = max(end_us, us)
            n += 1
        state.update((start_us, end_us, n))
        # timeout must exceed the current watermark; clamping only fires
        # the flush earlier, never changes session contents
        timeout_ms = max(
            (end_us + gap_us) // 1000, state.getCurrentWatermarkMs() + 1
        )
        state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield pd.DataFrame(
                closed, columns=["user_id", "n_events", "start_us", "end_us"]
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
