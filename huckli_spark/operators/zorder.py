"""Z-order (Morton) clustering for multi-column data skipping.

Parquet row-group pruning works off per-column min/max stats; a table
sorted by one column skips beautifully on that column and not at all
on others. Interleaving the bits of several columns into one Morton
key and range-partitioning + sorting by it gives every participating
column locality, so min/max ranges per row group stay narrow on ALL
of them — the same layout optimization Delta's OPTIMIZE ZORDER BY
performs. Spark-first: the key is a pure column expression, the
layout is ``repartitionByRange(z).sortWithinPartitions(z)``, and
Catalyst/parquet do the actual skipping at read time.

Scale: one range shuffle over the data (sampling-based bounds), then
a local sort — exactly the cost of any global sort, paid once at
write time and repaid on every selective scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bits kept per column; capped so the key stays < 2^63


def _key_bits(n_cols: int) -> int:
    """Per-column bits such that n_cols * bits <= 63: the interleaved
    key must never reach bit 63 (the BIGINT sign bit), or rows whose
    last column's top bit is set would get NEGATIVE keys and sort
    before everything else — not Morton order. (ADVICE r6: with 4
    columns and a flat 16 bits the interleave wrote bit 63.)"""
    return min(ZBITS, 63 // n_cols)


def _scaled(col: str, mn: Column, mx: Column, bits: int) -> Column:
    """Column scaled into [0, 2^bits): rank-free min/max normalization
    (two-pass: caller supplies global min/max as literal columns)."""
    span = (mx - mn).cast("double")
    frac = F.when(span > 0, (F.col(col).cast("double") - mn.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    top = float((1 << bits) - 1)
    return F.least(
        F.lit((1 << bits) - 1),
        F.greatest(F.lit(0), F.floor(frac * top + 0.5).cast("long")),
    )


def morton_key(scaled_cols: list[Column], bits: int = ZBITS) -> Column:
    """Interleave ``bits`` bits of each scaled column into one BIGINT.
    Caller must keep ``len(scaled_cols) * bits <= 63`` (see _key_bits)
    so the key stays non-negative."""
    n = len(scaled_cols)
    if n * bits > 63:
        raise ValueError(
            f"{n} cols x {bits} bits would reach the BIGINT sign bit; "
            f"cap bits at {63 // n}"
        )
    key = F.lit(0).cast("long")
    for j, c in enumerate(scaled_cols):
        for i in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return key


def zorder(df: DataFrame, cols: list[str], partitions: int = 32) -> DataFrame:
    """Return ``df`` laid out in Z-order over ``cols`` (numeric or
    date/timestamp — anything castable to double). Write the result
    with plain ``.write.parquet`` to get the clustered files."""
    if not 2 <= len(cols) <= 4:
        raise ValueError(f"zorder wants 2-4 columns, got {len(cols)}")
    # date/timestamp columns normalize through epoch seconds (a plain
    # DATE -> DOUBLE cast is rejected by Spark)
    work = df
    renamed: dict[str, str] = {}
    for c in cols:
        dt = dict(df.dtypes)[c]
        if dt in ("date", "timestamp", "timestamp_ntz"):
            alias = f"__zn_{c}"
            work = work.withColumn(
                alias, F.col(c).cast("timestamp").cast("double")
            )
            renamed[c] = alias
    key_cols = [renamed.get(c, c) for c in cols]
    bits = _key_bits(len(cols))
    stats = work.agg(
        *[F.min(c).alias(f"mn_{c}") for c in key_cols],
        *[F.max(c).alias(f"mx_{c}") for c in key_cols],
    )
    with_stats = work.crossJoin(F.broadcast(stats))
    scaled = [
        _scaled(c, F.col(f"mn_{c}"), F.col(f"mx_{c}"), bits)
        for c in key_cols
    ]
    keyed = with_stats.withColumn("__z", morton_key(scaled, bits)).drop(
        *[f"mn_{c}" for c in key_cols],
        *[f"mx_{c}" for c in key_cols],
        *renamed.values(),
    )
    return (
        keyed.repartitionByRange(partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
