"""Streaming deduplication with watermark-bounded state.

The reference's ingest is at-least-once: data append and checkpoint
insert are two separate statements with no transaction around them
(/root/reference/huckli-import/src/lib.rs:202-210), so a crash between
them re-imports the file on ``--continue`` and duplicates every row.
The batch engine fixes this with idempotent dynamic-partition
overwrite (ingest.warehouse); this module is the STREAMING fix:
re-delivered records collapse on their key inside the stream itself.

``dropDuplicatesWithinWatermark`` keeps one state row per key and
evicts keys once the watermark passes their event time — state is
O(keys in the lateness horizon), independent of stream length. That
is the scale contract: an unbounded stream dedups with bounded
memory, trading exactness outside the horizon (a duplicate arriving
later than the watermark delay is no longer remembered — by then the
idempotent sink is the backstop).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    df: DataFrame,
    keys: Sequence[str],
    event_time_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Drop re-delivered rows by key within the watermark horizon.

    ``delay`` bounds BOTH lateness tolerance and state size: a
    duplicate arriving within ``delay`` of the original's event time
    is dropped; state for older keys is evicted.
    """
    return df.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(
        list(keys)
    )
