"""Relational parity query set (SURVEY §2.B).

The reference delegates its entire query surface to embedded DuckDB
(/root/reference/Cargo.toml:15); each query below exercises one row of
the SURVEY §2 operator inventory on the driver's fixture tables, with a
DuckDB ANSI-SQL oracle. Spark plans are written DataFrame-first so
Catalyst gets full pushdown/pruning visibility; broadcast hints are
explicit where a dimension table is known-small.

Scale notes are per-query docstrings: every plan here is
shuffle-minimal (single shuffle per agg/join stage, broadcast for dims,
partial aggregation map-side) and survives a 1000-executor / 100 TB
scale-up without driver-side materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from huckli_spark.functions.portable import fround, sql_fround
from huckli_spark.queries import query
from huckli_spark.session import load_table as _t


# ---------------------------------------------------------------------------
# A10 — projection / scalar map (ref: every `impl From<Proto>` module,
# e.g. /root/reference/huckli-import/src/data_transfer.rs:34-52)
# ---------------------------------------------------------------------------
@query(
    "q_scan_project",
    f"""
    SELECT l_orderkey, l_linenumber,
           {sql_fround('l_extendedprice * (1 - l_discount)')} AS net_price,
           l_returnflag
    FROM lineitem
    WHERE l_quantity > 45
    """,
    doc="A10 scan+project+filter; predicate/column pushdown to parquet.",
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # Scale: filter + projection push into the scan (PushedFilters /
    # ReadSchema); no shuffle at all.
    return li.where(F.col("l_quantity") > 45).select(
        "l_orderkey",
        "l_linenumber",
        fround(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        "l_returnflag",
    )


# ---------------------------------------------------------------------------
# A2/A3 — time-range pushdown (ref: huckli-s3/src/lib.rs:90-100,140)
# ---------------------------------------------------------------------------
@query(
    "q_filter_timerange",
    f"""
    SELECT event_type, count(*) AS n,
           {sql_fround('sum(value)')} AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
      AND ts <  TIMESTAMP '2024-01-15 00:00:00'
    GROUP BY event_type
    """,
    doc="A2/A3 lower+upper time-bound filter then aggregate.",
)
def q_filter_timerange(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.session import load_events_timebound

    # Scale: on a date-partitioned warehouse this is partition pruning;
    # here the range bound is translated into the ts column's PHYSICAL
    # domain (nanos long) so it pushes to the parquet row groups.
    ev = load_events_timebound(
        spark, sf_dir, "2024-01-08 00:00:00", "2024-01-15 00:00:00"
    )
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"), fround(F.sum("value")).alias("total_value")
    )


# ---------------------------------------------------------------------------
# A12 read side — parent/child equi-join (ref: radio_reward.rs:16-72 key
# model: children join parents on synthetic id)
# ---------------------------------------------------------------------------
@query(
    "q_parent_child_join",
    f"""
    SELECT o_orderkey, o_orderstatus, count(*) AS n_items,
           {sql_fround('sum(l_extendedprice)')} AS order_total
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderkey, o_orderstatus
    HAVING count(*) >= 5
    """,
    doc="parent-child equi-join + group/having (huckli id/uuid key model).",
)
def q_parent_child_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # Scale: both sides shuffle on orderkey once; AQE picks SMJ at TB
    # scale. Aggregation reuses the join partitioning (no 2nd shuffle
    # on orderkey) because group keys ⊇ join key.
    joined = o.join(li, o.o_orderkey == li.l_orderkey, "inner")
    return (
        joined.groupBy("o_orderkey", "o_orderstatus")
        .agg(F.count("*").alias("n_items"), fround(F.sum("l_extendedprice")).alias("order_total"))
        .where(F.col("n_items") >= 5)
    )


# ---------------------------------------------------------------------------
# semi/anti join
# ---------------------------------------------------------------------------
@query(
    "q_semi_anti_join",
    """
    SELECT 'has_orders' AS kind, c_nationkey, count(*) AS n
    FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
    UNION ALL
    SELECT 'no_orders' AS kind, c_nationkey, count(*) AS n
    FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
    """,
    doc="left_semi + left_anti joins, unioned with a tag column.",
)
def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    # Scale: semi/anti shuffle only the custkey column of orders
    # (column pruning); at 100 TB prefer a bloom-filter pre-pass, which
    # AQE injects automatically (runtime filter).
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n"))
        .select(F.lit("has_orders").alias("kind"), "c_nationkey", "n")
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n"))
        .select(F.lit("no_orders").alias("kind"), "c_nationkey", "n")
    )
    return semi.unionByName(anti)


# ---------------------------------------------------------------------------
# broadcast dimension join
# ---------------------------------------------------------------------------
@query(
    "q_broadcast_dim_join",
    f"""
    SELECT p_brand, count(*) AS n,
           {sql_fround('sum(l_quantity)')} AS sum_qty,
           {sql_fround('sum(l_extendedprice * (1 - l_discount))')} AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    doc="fact⋈dim with explicit broadcast of the small side.",
)
def q_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # Scale: part is ~1/30 of lineitem and only 2 columns survive
    # pruning — broadcast it so the 100 TB fact side never shuffles
    # for the join; the only shuffle is the final small agg on p_brand.
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return joined.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        fround(F.sum("l_quantity")).alias("sum_qty"),
        fround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# the canonical huckli workload: per-key totals over a time range
# (TPC-H Q1 pricing-summary shape)
# ---------------------------------------------------------------------------
@query(
    "q_group_sum",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_fround('sum(l_quantity)')} AS sum_qty,
           {sql_fround('sum(l_extendedprice)')} AS sum_base_price,
           {sql_fround('sum(l_extendedprice * (1 - l_discount))')} AS sum_disc_price,
           {sql_fround('avg(l_quantity)', 4)} AS avg_qty,
           {sql_fround('avg(l_extendedprice)', 4)} AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-11-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape — hash agg with partial (map-side) combine.",
)
def q_group_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # Scale: partial aggregation means the shuffle carries ~|groups|
    # rows per task, not |input|; whole-stage codegen covers the scan
    # + filter + partial agg in one stage.
    return (
        li.where(F.col("l_shipdate") <= F.lit("2024-11-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fround(F.sum("l_quantity")).alias("sum_qty"),
            fround(F.sum("l_extendedprice")).alias("sum_base_price"),
            fround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "sum_disc_price"
            ),
            fround(F.avg("l_quantity"), 4).alias("avg_qty"),
            fround(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q_group_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="multi count-distinct (expand + two-phase agg).",
)
def q_group_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # Scale: Spark plans Expand + partial distinct; for 100 TB with
    # ultra-high cardinality switch to approx_count_distinct (exposed
    # in operators/; exact kept here for oracle parity).
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count_distinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


@query(
    "q_rollup",
    f"""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           {sql_fround('sum(l_quantity)')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP grouping sets.",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), fround(F.sum("l_quantity")).alias("sum_qty")
    )


# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------
@query(
    "q_window_rank",
    f"""
    SELECT p_brand, p_partkey, revenue, rn FROM (
      SELECT p_brand, p_partkey, revenue,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY revenue DESC, p_partkey) AS rn
      FROM (
        SELECT p_brand, p_partkey,
               {sql_fround('sum(l_extendedprice * (1 - l_discount))')} AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_partkey
      )
    ) WHERE rn <= 3
    """,
    doc="top-N per group via row_number window (deterministic tiebreak).",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(fround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )
    # Rank on the ROUNDED revenue with p_partkey tiebreak => identical
    # ordering in both engines even under fp accumulation differences.
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), F.asc("p_partkey"))
    return rev.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 3)


@query(
    "q_window_lag",
    f"""
    SELECT user_id, count(*) AS n_gaps,
           {sql_fround('(sum(gap_us) * 1.0 / count(*)) / 1000000.0')} AS avg_gap_s
    FROM (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ) WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
    doc="lag window — inter-event gap per user (heartbeat-gap shape).",
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # Integer microsecond arithmetic end-to-end; only the final avg is
    # floating point (rounded portably).
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        # exact int sum ÷ exact int count, then one division — the same
        # IEEE ops in both engines (avg() accumulation order is not).
        fround((F.sum("gap_us") * F.lit(1.0) / F.count("*")) / F.lit(1_000_000.0)).alias(
            "avg_gap_s"
        ),
    )


# ---------------------------------------------------------------------------
# sorts / limits / top-k  (A17 pattern: ORDER BY … DESC LIMIT k —
# ref huckli-db/src/lib.rs:46-52)
# ---------------------------------------------------------------------------
@query(
    "q_topk",
    f"""
    SELECT o_orderkey, {sql_fround('o_totalprice')} AS total_price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="A17 top-k; Spark plans TakeOrderedAndProject (no full sort).",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    # Scale: per-partition heap + driver merge of k rows — no global
    # sort shuffle.
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", fround(F.col("o_totalprice")).alias("total_price"))
    )


@query(
    "q_checkpoint_max",
    """
    SELECT event_type AS prefix, max(epoch_us(ts)) AS last_us
    FROM events GROUP BY event_type
    """,
    doc="A17 checkpoint read: max timestamp per prefix "
    "(ORDER BY ts DESC LIMIT 1 ≡ max; ref huckli-db/src/lib.rs:43-56).",
)
def q_checkpoint_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(F.col("event_type").alias("prefix")).agg(
        F.max(F.unix_micros("ts")).alias("last_us")
    )


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------
@query(
    "q_union_dedup",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
    doc="UNION (distinct) across two relations.",
)
def q_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "q_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
    doc="EXCEPT set difference.",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    # subtract == SQL EXCEPT (distinct set difference); exceptAll would
    # keep keys whose left multiplicity merely exceeds the right.
    return c.subtract(s)


# ---------------------------------------------------------------------------
# JSON functions (S11 read-back — the reference writes json columns,
# DuckDB's json feature reads them; ref usage.rs:41-63, Cargo.toml:15)
# ---------------------------------------------------------------------------
@query(
    "q_json_extract",
    f"""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
           count(*) AS n,
           {sql_fround('sum(value)')} AS total_value
    FROM events
    GROUP BY 1
    """,
    doc="JSON field extraction + aggregate.",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            (F.get_json_object("props", "$.k").cast("int") % 10).alias("k_mod"),
            "value",
        )
        .groupBy("k_mod")
        .agg(F.count("*").alias("n"), fround(F.sum("value")).alias("total_value"))
    )


# ---------------------------------------------------------------------------
# time bucketing (tumbling windows over the event stream)
# ---------------------------------------------------------------------------
@query(
    "q_time_bucket",
    f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           count(*) AS n,
           {sql_fround('sum(value)')} AS total_value
    FROM events
    WHERE ts < TIMESTAMP '2024-01-04 00:00:00'
    GROUP BY 1
    """,
    doc="hourly tumbling window aggregate (date_trunc).",
)
def q_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # Bucket emitted as a formatted string => identical hashing across
    # engines regardless of timestamp physical precision (ns vs us).
    return (
        ev.where(F.col("ts") < F.lit("2024-01-04 00:00:00").cast("timestamp"))
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("bucket")
        )
        .agg(F.count("*").alias("n"), fround(F.sum("value")).alias("total_value"))
    )


# ---------------------------------------------------------------------------
# A12 write side — explode/unnest
# ---------------------------------------------------------------------------
@query(
    "q_explode",
    f"""
    SELECT vec_id,
           generate_subscripts(embedding, 1) AS pos,
           {sql_fround('CAST(unnest(embedding) AS DOUBLE)', 6)} AS val
    FROM embeddings
    WHERE vec_id < 50
    """,
    doc="A12 explode: repeated field -> child rows with parent key + position.",
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = _t(spark, sf_dir, "embeddings")
    # posexplode is 0-based; generate_subscripts is 1-based — align.
    return em.where(F.col("vec_id") < 50).select(
        "vec_id", F.posexplode("embedding").alias("pos0", "v")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        fround(F.col("v").cast("double"), 6).alias("val"),
    )


# ---------------------------------------------------------------------------
# A11 — oneof demultiplex: tag rows into classes, count per class
# (ref mobile_rewards.rs:64-105 — one stream fans out to 6 tables)
# ---------------------------------------------------------------------------
@query(
    "q_demux_counts",
    f"""
    SELECT CASE WHEN event_type IN ('click', 'view') THEN 'engagement'
                WHEN event_type IN ('purchase', 'signup') THEN 'conversion'
                ELSE 'other' END AS reward_type,
           count(*) AS n,
           count(DISTINCT user_id) AS n_users,
           {sql_fround('sum(value)')} AS total_value
    FROM events
    GROUP BY 1
    """,
    doc="A11 demux: CASE tag + per-variant aggregates (single pass).",
)
def q_demux_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    tag = (
        F.when(F.col("event_type").isin("click", "view"), "engagement")
        .when(F.col("event_type").isin("purchase", "signup"), "conversion")
        .otherwise("other")
    )
    return (
        ev.select(tag.alias("reward_type"), "user_id", "value")
        .groupBy("reward_type")
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("user_id").alias("n_users"),
            fround(F.sum("value")).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# S5 — proto decimal parse with silent 0.0 default
# (ref huckli-import/src/lib.rs:307-313)
# ---------------------------------------------------------------------------
@query(
    "q_decimal_default",
    f"""
    SELECT source,
           {sql_fround('''sum(COALESCE(TRY_CAST(
             CASE WHEN doc_id % 7 = 0 THEN lang
                  ELSE CAST(n_chars AS VARCHAR) END AS DOUBLE), 0.0))''')}
             AS parsed_total,
           count(*) AS n
    FROM documents
    GROUP BY source
    """,
    doc="S5 decimal-from-string with silent 0.0 default on parse failure.",
)
def q_decimal_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    raw = F.when(F.col("doc_id") % 7 == 0, F.col("lang")).otherwise(
        F.col("n_chars").cast("string")
    )
    parsed = F.coalesce(raw.try_cast("double"), F.lit(0.0))
    return docs.groupBy("source").agg(
        fround(F.sum(parsed)).alias("parsed_total"), F.count("*").alias("n")
    )


# ---------------------------------------------------------------------------
# S4 — sec-vs-ms timestamp heuristic, threshold 1e12
# (ref huckli-import/src/lib.rs:165-175)
# ---------------------------------------------------------------------------
@query(
    "q_ts_heuristic",
    """
    SELECT strftime(date_trunc('month', epoch_ms(
             CASE WHEN raw > 1000000000000 THEN raw ELSE raw * 1000 END)),
             '%Y-%m-%d') AS month, count(*) AS n
    FROM (SELECT CASE WHEN event_id % 2 = 0
                      THEN 1700000000 + event_id * 100
                      ELSE 1700000000000 + event_id * 100000 END AS raw
          FROM events)
    GROUP BY 1
    """,
    doc="S4 sec-vs-ms heuristic at threshold 1e12 (pure integer math; "
    "even ids carry epoch-seconds, odd ids epoch-millis).",
)
def q_ts_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    raw = (
        F.when(F.col("event_id") % 2 == 0, 1_700_000_000 + F.col("event_id") * 100)
        .otherwise(1_700_000_000_000 + F.col("event_id") * 100_000)
        .alias("raw")
    )
    ms = F.when(F.col("raw") > 1_000_000_000_000, F.col("raw")).otherwise(
        F.col("raw") * 1000
    )
    return (
        ev.select(raw)
        .select(F.date_format(F.date_trunc("month", F.timestamp_millis(ms)), "yyyy-MM-dd").alias("month"))
        .groupBy("month")
        .agg(F.count("*").alias("n"))
    )
