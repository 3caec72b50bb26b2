"""Portable (Spark ⇄ DuckDB) deterministic expression helpers.

The driver compares Spark results to DuckDB oracles by value hash, so
every floating-point output must round identically in both engines.
Spark's ``round()`` works on the decimal string of the double
(HALF_UP on ``BigDecimal.valueOf``), DuckDB's on the binary value —
they disagree on values like 2.675. We therefore round with an explicit
``floor(x * 10^n + 0.5) / 10^n`` in BOTH engines: the arithmetic is
plain IEEE-754, so identical inputs give identical outputs.

Also here: a portable 60-bit string hash — ``bigint(hex15(md5(s)))`` —
used by the dedup sketches (MinHash/SimHash) so the Spark operator and
the DuckDB oracle hash every shingle to the same integer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fround(col: Column, digits: int = 2) -> Column:
    """floor-based half-up rounding; bit-identical to sql_fround."""
    scale = 10**digits
    return (F.floor(col * F.lit(float(scale)) + F.lit(0.5)) / F.lit(float(scale))).cast(
        "double"
    )


def sql_fround(expr: str, digits: int = 2) -> str:
    """DuckDB-side twin of fround."""
    scale = float(10**digits)
    return f"(FLOOR(({expr}) * {scale} + 0.5) / {scale})"


# 60-bit portable string hash: first 15 hex chars of md5 as a bigint.
# Spark: conv(hex, 16, 10) -> decimal string -> bigint.
def h60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def sql_h60(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"
