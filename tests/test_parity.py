"""Differential oracle tests — mirrors the driver's correctness gate.

Every registered query with an oracle runs twice (Spark plan vs DuckDB
SQL) on the sf0.001 fixtures and must match on row count, column names,
and order-insensitive values.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from huckli_spark.queries import all_queries
from tests.conftest import SF_SMALL

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.sql("SET TimeZone = 'UTC'")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return f"{val:.9g}"
    return str(val)


def _rows_to_set(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(_canon(r[i]) for i in idx)
        out[key] = out.get(key, 0) + 1
    return out


SPECS = [s for s in all_queries().values() if s.oracle is not None]
NO_ORACLE = [s for s in all_queries().values() if s.oracle is None]


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_query_matches_oracle(spark, spec):
    sdf = spec.build(spark, SF_SMALL)
    srows = sdf.collect()
    scols = sdf.columns

    con = _duck(SF_SMALL)
    ores = con.sql(spec.oracle)
    ocols = [c.lower() for c in ores.columns]
    orows = ores.fetchall()

    assert sorted(c.lower() for c in scols) == sorted(ocols), (
        f"{spec.name}: column mismatch spark={scols} oracle={ocols}"
    )
    assert len(srows) == len(orows), (
        f"{spec.name}: row count spark={len(srows)} oracle={len(orows)}"
    )
    sset = _rows_to_set([c.lower() for c in scols], [tuple(r) for r in srows])
    oset = _rows_to_set(ocols, orows)
    if sset != oset:
        only_s = list(set(sset) - set(oset))[:5]
        only_o = list(set(oset) - set(sset))[:5]
        raise AssertionError(
            f"{spec.name}: value mismatch\n spark-only: {only_s}\n oracle-only: {only_o}"
        )


@pytest.mark.parametrize(
    "spec", NO_ORACLE or [None], ids=[s.name for s in NO_ORACLE] or ["none"]
)
def test_rows_only_queries_run(spark, spec):
    if spec is None:
        pytest.skip("all queries have oracles")
    df = spec.build(spark, SF_SMALL)
    assert df.count() >= 0
