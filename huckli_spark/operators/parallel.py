"""Scan-parallelism guard for CPU-heavy map stages.

Spark splits a parquet scan at ROW-GROUP granularity: a file written
as one row group is one task no matter what
``spark.sql.files.maxPartitionBytes`` says. The driver's fixtures are
single-row-group files, so without intervention every per-document
kernel (shingling, sketches, decode) runs on one core of the 32
available.

``fan_out`` repartitions ONLY when the input has fewer partitions
than the session's parallelism — at production scale (100 TB = many
thousands of files/row-groups) the scan already yields plenty of
splits and this is a metadata check + no-op, so the guard never adds
a shuffle where the data is already wide. When it does fire, the
shuffle moves just the projected columns (callers project before
fanning out), which for a doc-id + text relation is the minimum
possible volume to distribute the compute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan is narrower than the
    cluster. Cheap for narrow inputs, no-op for wide ones.

    Streaming inputs pass through untouched: ``.rdd`` is illegal on a
    streaming plan, and a micro-batch's parallelism comes from the
    source's file layout anyway (stage_table_stream's ``n_files`` is
    the fixture-side control) — so operators shared between batch and
    streaming (the media fingerprints) can call this unconditionally."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
