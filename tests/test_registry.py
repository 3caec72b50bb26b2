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


# Gate pin policy (round 12, VERDICT r11 "Next round #1"): five
# permanent SURVEY §2.B sentinels — one per environment-coupling class
# (aggregation, warehouse checkpoint read, timestamp heuristics, oneof
# demux, explode fan-out) — never rotate out of the graded window; the
# other fifteen §2.B rows rotate through normal freshness slots. The
# round-3 lesson (VERDICT r03 "What's wrong #4") is covered by the
# sentinels plus the full-registry local replica and the registry-wide
# oracle sweep below.
_PINNED_SENTINELS = [
    "q_group_sum",
    "q_checkpoint_max",
    "q_ts_heuristic",
    "q_demux_counts",
    "q_explode",
]

# The full §2.B named set: every row must stay REGISTERED (replica
# coverage every session) even when not holding a graded slot.
_SURVEY_2B = _PINNED_SENTINELS + [
    "q_scan_project",
    "q_filter_timerange",
    "q_parent_child_join",
    "q_semi_anti_join",
    "q_broadcast_dim_join",
    "q_group_distinct",
    "q_rollup",
    "q_window_rank",
    "q_window_lag",
    "q_topk",
    "q_union_dedup",
    "q_except",
    "q_json_extract",
    "q_time_bucket",
    "q_decimal_default",
]


def test_sentinels_pinned_and_2b_set_registered():
    from huckli_spark.queries import _GATE_PRIORITY, all_queries

    assert _GATE_PRIORITY[:5] == _PINNED_SENTINELS, (
        "the five §2.B sentinels must occupy the first graded slots — "
        "they are the permanent environment-regression tripwire"
    )
    assert len(_GATE_PRIORITY) == 50  # exactly fill the graded window
    # and the window is what the driver will actually see: the first
    # 50 names of the returned registry, in order
    names = list(all_queries())
    assert names[:50] == _GATE_PRIORITY
    # every §2.B row stays registered with an oracle (replica-covered
    # every session even while out of the graded window)
    reg = all_queries()
    missing = [n for n in _SURVEY_2B if n not in reg]
    assert not missing, missing
    no_oracle = [n for n in _SURVEY_2B if reg[n].oracle is None]
    assert not no_oracle, no_oracle


def test_every_oracle_arrow_fetch_has_no_decimal_columns():
    """Registry-wide oracle-kind sweep (VERDICT r10 "What's wrong #1").

    DuckDB promotes SUM over integer columns to HUGEINT, which the
    driver's Arrow fetch renders as decimal128(38,0) — hash-mismatching
    Spark's plain bigint even when every value is equal. q_ann_maxsim
    shipped with exactly this (uncast ``SUM(m)``) in round 10; rounds
    1-2 lost driver rows to the same trap. This sweep runs EVERY
    registered oracle through DuckDB's ``.arrow()`` fetch (the
    driver-like path) on the sf0.001 views and fails on any decimal
    column, so the class cannot recur: integer aggregates must be
    CAST back to BIGINT in the oracle SQL itself.
    """
    import os

    import duckdb
    import pyarrow.types as pt

    from huckli_spark.queries import all_queries

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    offenders, errors = [], []
    for name, spec in all_queries().items():
        if spec.oracle is None:  # rows-only query, nothing to sweep
            continue
        try:
            schema = con.execute(spec.oracle).arrow().schema
        except Exception as e:  # noqa: BLE001 — oracle must at least run
            errors.append(f"{name}: {type(e).__name__}: {e}")
            continue
        bad = [f.name for f in schema if pt.is_decimal(f.type)]
        if bad:
            offenders.append(f"{name}: decimal cols {bad}")
    assert not errors, "oracles failed to execute standalone:\n" + "\n".join(errors)
    assert not offenders, (
        "DuckDB HUGEINT/decimal promotion in oracle output — add "
        "CAST(... AS BIGINT) in the oracle SQL:\n" + "\n".join(offenders)
    )


def test_every_oracle_survives_driver_canonicalization():
    """Registry-wide driver-canonicalization sweep (VERDICT r12 #1).

    The driver's gate canonicalizes each result by fetching it into
    pandas (Arrow path) and running ``sort_values`` over ALL columns
    before hashing. A column whose cells are unhashable — a raw
    ``array<string>``, a map, a struct-as-dict — dies inside pandas
    with ``TypeError: unhashable type``, ERRing the gate row even
    when the values hash-match under every other recipe. q_pack_emit
    shipped exactly this in round 12 (and its two emit siblings were
    queued to repeat it). This sweep applies the DRIVER's
    canonicalization step to EVERY registered oracle's Arrow fetch on
    the sf0.001 views, so a non-sortable output type can never
    register again; the session replica (tools/check_correctness.py)
    applies the same step to the Spark side of every query, and its
    kind check pins the two sides to the same column kinds.
    """
    import os

    import duckdb

    from huckli_spark.queries import all_queries

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    offenders = []
    for name, spec in all_queries().items():
        if spec.oracle is None:
            continue
        pdf = con.execute(spec.oracle).arrow().to_pandas()
        pdf = pdf.reindex(sorted(pdf.columns), axis=1)
        try:
            if len(pdf.columns):
                pdf.sort_values(by=list(pdf.columns))
        except Exception as e:  # noqa: BLE001 — any raise is the defect
            offenders.append(f"{name}: {type(e).__name__}: {e}")
    assert not offenders, (
        "driver canonicalization (pandas sort_values over all columns) "
        "fails on these oracle outputs — string-join arrays / flatten "
        "maps and structs (the q_array_fns convention):\n"
        + "\n".join(offenders)
    )
