"""SQL function surface: registered kernels must equal their
column-API twins on the same inputs."""

from __future__ import annotations

import uuid as uuidlib

from pyspark.sql import functions as F

from huckli_spark.functions.keys import helium_pubkey
from huckli_spark.functions.registry import register_all


def test_registered_functions_match_column_api(spark):
    names = register_all(spark)
    assert "helium_pubkey" in names and "uuid16" in names

    key = bytes(range(1, 34))
    uid = uuidlib.UUID("11111111-2222-3333-4444-555555555555")
    df = spark.createDataFrame(
        [(key, uid.bytes, 1_700_000_000, 1_700_000_000_000, "3.25", "junk")],
        "k binary, u binary, sec long, ms long, dec string, bad string",
    )
    df.createOrReplaceTempView("reg_probe")
    row = spark.sql(
        """
        SELECT helium_pubkey(k) AS pk, uuid16(u) AS uid,
               ts_heuristic(sec) AS t1, ts_heuristic(ms) AS t2,
               proto_decimal(dec) AS d1, proto_decimal(bad) AS d2,
               h60('hello') AS h
        FROM reg_probe
        """
    ).collect()[0]
    assert row.pk == helium_pubkey(key)
    assert row.uid == str(uid)
    # heuristic: both spellings of the same instant agree (S4)
    assert row.t1 == row.t2
    assert row.d1 == 3.25 and row.d2 == 0.0
    assert row.h == int("5d41402abc4b2a7", 16)  # md5('hello') prefix


def test_sql_udfs_stay_jvm_side(spark):
    register_all(spark)
    df = spark.range(5).selectExpr("ts_heuristic(id + 1700000000) AS t")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # a Python UDF would show BatchEvalPython / ArrowEvalPython
    assert "Python" not in plan, plan


def test_gate_priority_names_all_exist():
    # a typo in _GATE_PRIORITY silently drops a query out of the
    # driver's graded window (it filters on membership) — make typos loud
    from huckli_spark.queries import _GATE_PRIORITY, all_queries

    names = set(all_queries())
    missing = [n for n in _GATE_PRIORITY if n not in names]
    assert not missing, f"_GATE_PRIORITY names not in registry: {missing}"
    assert len(_GATE_PRIORITY) <= 50  # must fit the graded window
