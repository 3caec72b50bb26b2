"""Warehouse write-path parity queries: MERGE INTO and SCD Type 2,
ORACLE-GATED.

These queries actually EXECUTE the write path — build a temp ACID
warehouse, append a deterministic base derived from ``orders``, run
the merge — and return the resulting table; the DuckDB oracle states
the same final relation DECLARATIVELY from the source tables. A green
hash means the imperative commit machinery (staging, snapshot-replace
log entry, reader resolution) lands byte-for-byte on the declarative
MERGE/SCD2 semantics — stronger than the unit tests, which assert
counts and spot values.

All values ride as exact integer cents so no comparison depends on
float summation order.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from huckli_spark.queries import query
from huckli_spark.session import load_table as _t

_CENTS = "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 7 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.expr(
                "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"
            ).alias("v"),
        )
    )


def _merge_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGE update set (bump %21 keys, insert shifted %35 keys)
    — ONE builder behind q_merge_upsert and q_time_travel."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.where(F.col("o_orderkey") % 21 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            (
                F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)")
                + 1000
            ).alias("v"),
        )
        .unionByName(
            orders.where(F.col("o_orderkey") % 35 == 0).select(
                (F.col("o_orderkey") + 10000000).alias("k"),
                F.expr(
                    "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"
                ).alias("v"),
            )
        )
    )


def _merge_ctes() -> str:
    """CTEs ``base(k, v)`` / ``merged(k, v)``: the declarative MERGE
    result — ONE generator behind q_merge_upsert's oracle and the
    time-travel gate, so the two formulations cannot drift."""
    return f"""base AS (
      SELECT o_orderkey AS k, {_CENTS} AS v
      FROM orders WHERE o_orderkey % 7 = 0
    ), upd AS (
      SELECT o_orderkey AS k, {_CENTS} + 1000 AS v
      FROM orders WHERE o_orderkey % 21 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, {_CENTS}
      FROM orders WHERE o_orderkey % 35 = 0
    ), merged AS (
      SELECT k, v FROM base WHERE k NOT IN (SELECT k FROM upd)
      UNION ALL
      SELECT k, v FROM upd
    )"""


@query(
    "q_merge_upsert",
    f"""
    WITH {_merge_ctes()}
    SELECT k, v FROM merged
    """,
    doc="MERGE INTO, oracle-gated end to end: the query builds a temp "
    "ACID warehouse, appends the deterministic base (orders keys "
    "divisible by 7, totalprice as exact cents), MERGEs an update set "
    "(keys divisible by 21 get +1000; keys divisible by 35 insert "
    "under shifted ids) through the real staging + snapshot-replace "
    "commit, and returns the table the LOG then resolves. The oracle "
    "states the merged relation declaratively (anti-join + union) "
    "from the source table — a hash match proves the imperative "
    "write path implements declarative MERGE semantics exactly.",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.ingest.warehouse import Warehouse

    updates = _merge_updates(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="huckli_merge_gate_")
    try:
        wh = Warehouse(spark, tmp, acid=True)
        wh.append("t", _base(spark, sf_dir))
        wh.merge("t", updates, key="k")
        # materialize before the temp dir disappears
        rows = wh.table("t").collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, "k long, v long")


@query(
    "q_time_travel",
    f"""
    WITH {_merge_ctes()}
    SELECT coalesce(b.k, m.k) AS k, b.v AS v_v0, m.v AS v_now
    FROM base b FULL OUTER JOIN merged m ON b.k = m.k
    """,
    doc="TIME TRAVEL, oracle-gated end to end: append commits "
    "version 0, MERGE commits version 1, and the query reads BOTH — "
    "the as_of=0 snapshot (the transaction log's pinned file list; "
    "readers never list the data directory) full-outer-joined to the "
    "current version — so the hash certifies that superseded files "
    "remain readable at their commit and that inserted keys are "
    "absent from the past (NULL v_v0) while updated keys show both "
    "values. The oracle reuses the shared _merge_ctes generator; a "
    "green row proves snapshot isolation of the reference-shaped "
    "warehouse's log, not just the current head.",
)
def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.ingest.warehouse import Warehouse

    updates = _merge_updates(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="huckli_tt_gate_")
    try:
        wh = Warehouse(spark, tmp, acid=True)
        wh.append("t", _base(spark, sf_dir))
        wh.merge("t", updates, key="k")
        v0 = wh.table("t", as_of=0).select(
            F.col("k"), F.col("v").alias("v_v0")
        )
        cur = wh.table("t").select(F.col("k"), F.col("v").alias("v_now"))
        rows = (
            v0.join(cur, "k", "full_outer")
            .select("k", "v_v0", "v_now")
            .collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, "k long, v_v0 long, v_now long")


def _scd2_hist_ctes() -> str:
    """CTE ``hist(k, v, valid_from, valid_to)``: the declarative
    reconstruction of the two-wave SCD2 history — ONE generator
    behind q_scd2_history's oracle and the point-in-time lookup
    (q_stream_scd2_lookup), so the two formulations cannot drift."""
    return f"""base AS (
      SELECT o_orderkey AS k, {_CENTS} AS v
      FROM orders WHERE o_orderkey % 7 = 0
    ), w1k AS (SELECT k FROM base WHERE k % 21 = 0),
    w2k AS (SELECT k FROM base WHERE k % 35 = 0),
    hist AS (
      -- never-updated keys: one open row from version 0
      SELECT k, v, 0 AS valid_from, CAST(NULL AS BIGINT) AS valid_to
      FROM base WHERE k NOT IN (SELECT k FROM w1k)
                  AND k NOT IN (SELECT k FROM w2k)
      UNION ALL
      -- wave-1 closes the original at version 1
      SELECT k, v, 0, 1 FROM base WHERE k IN (SELECT k FROM w1k)
      UNION ALL
      -- wave-1 rows: open unless wave 2 touches the key too
      SELECT k, v + 1000, 1,
             CASE WHEN k IN (SELECT k FROM w2k) THEN 2 END
      FROM base WHERE k IN (SELECT k FROM w1k)
      UNION ALL
      -- wave-2-only keys: original closed at version 2
      SELECT k, v, 0, 2 FROM base
      WHERE k IN (SELECT k FROM w2k) AND k NOT IN (SELECT k FROM w1k)
      UNION ALL
      -- wave-2 rows: always the open current version
      SELECT k, v + 2000, 2, NULL FROM base WHERE k IN (SELECT k FROM w2k)
    )"""


def pit_lookup(events: DataFrame, hist: DataFrame) -> DataFrame:
    """The point-in-time join — ONE implementation behind the
    streaming query and its plan pin: key EQUI-join plus the
    half-open interval residual (valid_from <= as_of < valid_to,
    NULL valid_to = open). The equi key keeps the plan a hash/merge
    join with a residual filter — never a BNLJ range product."""
    return (
        events.join(hist, "k")
        .where(
            (F.col("as_of") >= F.col("valid_from"))
            & (F.col("valid_to").isNull()
               | (F.col("as_of") < F.col("valid_to")))
        )
        .select("k", "as_of", "v")
    )


def _scd2_history_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the two-wave SCD2 write path through the REAL warehouse
    and return the history table (k, v, valid_from, valid_to) — ONE
    builder behind q_scd2_history and the point-in-time lookup."""
    from huckli_spark.ingest.warehouse import Warehouse

    orders = _t(spark, sf_dir, "orders")

    def wave(mod: int, bump: int) -> DataFrame:
        return orders.where(F.col("o_orderkey") % mod == 0).select(
            F.col("o_orderkey").alias("k"),
            (
                F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)")
                + bump
            ).alias("v"),
        )

    tmp = tempfile.mkdtemp(prefix="huckli_scd2_gate_")
    try:
        wh = Warehouse(spark, tmp, acid=True)
        wh.append("t", _base(spark, sf_dir))
        wh.merge_scd2("t", wave(21, 1000), key="k", version=1)
        wh.merge_scd2("t", wave(35, 2000), key="k", version=2)
        rows = wh.table("t").collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "k long, v long, valid_from long, valid_to long"
    )


@query(
    "q_scd2_history",
    f"""
    WITH {_scd2_hist_ctes()}
    SELECT k, v, valid_from, valid_to FROM hist
    """,
    doc="SCD Type 2, oracle-gated end to end: two history-preserving "
    "merge waves run through the real write path (wave 1 bumps keys "
    "divisible by 21 at version 1; wave 2 bumps keys divisible by 35 "
    "at version 2 — keys divisible by 105 see both), and the FULL "
    "history table (k, v, valid_from, valid_to) must hash-match the "
    "oracle's declarative reconstruction of every open and closed "
    "version. Proves close-then-insert ordering, no-op suppression "
    "and interval bookkeeping, not just row counts.",
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _scd2_history_df(spark, sf_dir)


@query(
    "q_stream_scd2_lookup",
    f"""
    WITH {_scd2_hist_ctes()},
    ev AS (
      SELECT o_orderkey AS k, (o_orderkey // 7) % 3 AS as_of
      FROM orders WHERE o_orderkey % 7 = 0
    )
    SELECT e.k, CAST(e.as_of AS BIGINT) AS as_of, h.v
    FROM ev e JOIN hist h
      ON h.k = e.k
     AND e.as_of >= h.valid_from
     AND (h.valid_to IS NULL OR e.as_of < h.valid_to)
    """,
    doc="POINT-IN-TIME dimension lookup for a stream — the feature-"
    "store pattern that keeps training data leakage-free: enriching "
    "an event with the dimension's CURRENT version would leak future "
    "attribute values into past examples, so each event must join "
    "the version valid AT its own time. The SCD2 history builds "
    "through the REAL warehouse write path (the q_scd2_history "
    "builder), freezes to parquet (train-once-serve-many), and live "
    "events (as_of = (k div 7) % 3, spanning all three versions) "
    "join stream-static on the key with the half-open interval "
    "predicate valid_from <= as_of < valid_to — stateless, append "
    "mode, exactly one version per event by interval disjointness. "
    "The oracle replays the history declaratively (the shared "
    "_scd2_hist_ctes generator) and the same interval join. Scale: "
    "the history is dimension-sized; the join is a key equi-join "
    "with a residual interval filter, never a range product.",
)
def q_stream_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import uuid

    from pyspark.sql import types as T

    from huckli_spark.operators.cache import _scratch_dir
    from huckli_spark.streaming.windows import run_to_memory

    root = os.path.join(_scratch_dir(), f"scd2_pit_{uuid.uuid4().hex[:12]}")
    _scd2_history_df(spark, sf_dir).write.parquet(
        os.path.join(root, "hist")
    )
    hist = spark.read.parquet(os.path.join(root, "hist"))
    _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("k"),
        ((F.col("o_orderkey") / 7).cast("long") % 3).alias("as_of"),
    ).write.parquet(os.path.join(root, "events"))
    stream = spark.readStream.schema(
        T.StructType(
            [
                T.StructField("k", T.LongType(), True),
                T.StructField("as_of", T.LongType(), True),
            ]
        )
    ).parquet(os.path.join(root, "events"))
    return run_to_memory(pit_lookup(stream, hist), output_mode="append")


@query(
    "q_pit_backfill",
    f"""
    WITH {_scd2_hist_ctes()}
    SELECT b.k, CAST(r.range AS BIGINT) AS as_of, h.v
    FROM (SELECT DISTINCT k FROM base) b
    CROSS JOIN range(0, 3) r
    JOIN hist h
      ON h.k = b.k
     AND r.range >= h.valid_from
     AND (h.valid_to IS NULL OR r.range < h.valid_to)
    """,
    doc="BATCH point-in-time backfill — the training-set construction "
    "twin of q_stream_scd2_lookup: every dimension key is enriched at "
    "EVERY version time (the full key x as_of matrix a feature "
    "backfill job emits), through the SAME pit_lookup builder and the "
    "same warehouse-built SCD2 history, so one green pair certifies "
    "the online and offline paths agree — the train/serve-skew check "
    "feature stores run. Exactly one row per (k, as_of) by interval "
    "disjointness. Scale: the matrix is dimension-sized x versions, "
    "never corpus-sized; the join stays the pinned equi+residual "
    "shape.",
)
def q_pit_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = _scd2_history_df(spark, sf_dir)
    ev = (
        hist.select("k").distinct()
        .crossJoin(
            spark.range(3).select(F.col("id").cast("long").alias("as_of"))
        )
    )
    return pit_lookup(ev, hist)


@query(
    "q_table_changes",
    f"""
    WITH base AS (
      SELECT o_orderkey AS k, {_CENTS} AS v
      FROM orders WHERE o_orderkey % 7 = 0
    )
    SELECT 'U' AS op, k, v + 1000 AS v
    FROM base WHERE k % 21 = 0 AND k % 49 <> 0
    UNION ALL
    SELECT 'I', k + 10000000, v FROM base WHERE k % 35 = 0
    UNION ALL
    -- deleted keys surface with their OLD (version-0) values, even
    -- when an intermediate merge had updated them
    SELECT 'D', k, v FROM base WHERE k % 49 = 0
    """,
    doc="change data feed, oracle-gated: base -> MERGE (updates keys "
    "divisible by 21, inserts shifted keys divisible by 35) -> CDC "
    "delete of keys divisible by 49 (so keys divisible by 147 are "
    "updated THEN deleted), then table_changes diffs version 0 "
    "against the final snapshot. The oracle states the exact I/U/D "
    "relation: updates exclude later-deleted keys, and deletes carry "
    "version-0 values regardless of intermediate updates — the "
    "tombstone contract. A hash match proves the version-diff logic "
    "against the declarative statement of three composed commits.",
)
def q_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.ingest.warehouse import Warehouse

    orders = _t(spark, sf_dir, "orders")
    cents = "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"
    updates = (
        orders.where(F.col("o_orderkey") % 21 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            (F.expr(cents) + 1000).alias("v"),
        )
        .unionByName(
            orders.where(F.col("o_orderkey") % 35 == 0).select(
                (F.col("o_orderkey") + 10000000).alias("k"),
                F.expr(cents).alias("v"),
            )
        )
    )
    tmp = tempfile.mkdtemp(prefix="huckli_cdf_gate_")
    try:
        wh = Warehouse(spark, tmp, acid=True)
        wh.append("t", _base(spark, sf_dir))
        wh.merge("t", updates, key="k")
        deletes = (
            orders.where(F.col("o_orderkey") % 49 == 0)
            .select(
                F.lit("D").alias("op"),
                F.col("o_orderkey").alias("k"),
                F.lit(None).cast("long").alias("v"),
            )
        )
        wh.apply_cdc("t", deletes, key="k")
        rows = wh.table_changes("t", key="k", from_version=0).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, "op string, k long, v long")
