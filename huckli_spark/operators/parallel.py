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
from pyspark.sql import functions as F


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


def pos_exploded(
    df: DataFrame, keep: list, arr, pos_alias: str, val_alias: str
) -> DataFrame:
    """``select(*keep, posexplode(arr) AS (pos, val))`` without the
    Generate filter-pushdown re-derivation pathology.

    ``Generate(outer=false)`` makes the optimizer infer
    ``size(arr) > 0 AND isnotnull(arr)`` and push it toward the scan;
    when ``arr`` is an aliased EXPENSIVE projection (shingling, n-gram
    arrays, feature arrays) sitting above a fan_out exchange, the
    pushed filter re-derives that whole expression BELOW the exchange
    — on the scan's task count (one task for single-row-group
    fixtures) and a second time above it. Measured on the shingle
    kernel (r13): the exploded plan ran one-task and ~3x slower than
    the map stage itself. ``outer=true`` infers no filter; dropping
    the NULL-pos row (emitted only for empty/NULL arrays — exactly
    the rows ``outer=false`` suppresses) above the Generate yields
    the identical relation, computed once, wide."""
    out = df.select(*keep, F.posexplode_outer(arr).alias(pos_alias, val_alias))
    return out.where(F.col(pos_alias).isNotNull())


def exploded(df: DataFrame, keep: list, arr, val_alias: str) -> DataFrame:
    """``select(*keep, explode(arr) AS val)`` — see pos_exploded."""
    pos = "__exploded_pos"
    return pos_exploded(df, keep, arr, pos, val_alias).drop(pos)
