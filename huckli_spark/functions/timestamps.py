"""Timestamp kernels (reference S2-S4).

- ``ts_seconds`` / ``ts_millis``: epoch -> UTC timestamp
  (huckli-import/src/lib.rs:158-164).
- ``ts_heuristic``: the sec-vs-ms guess at threshold 1e12
  (huckli-import/src/lib.rs:165-175) — values above the threshold are
  treated as milliseconds, otherwise seconds.

All pure Column expressions (JVM-side, codegen-friendly).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MS_THRESHOLD = 1_000_000_000_000  # 1e12, reference lib.rs:169


def ts_seconds(col: Column) -> Column:
    return F.timestamp_seconds(col)


def ts_millis(col: Column) -> Column:
    return F.timestamp_millis(col)


def ts_heuristic(col: Column) -> Column:
    return F.when(col > MS_THRESHOLD, F.timestamp_millis(col)).otherwise(
        F.timestamp_seconds(col)
    )
