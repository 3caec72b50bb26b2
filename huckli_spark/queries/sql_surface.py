"""Delegated-SQL-surface parity queries: subqueries, window frames,
string/date functions, ordered aggregation, deterministic sampling.

The reference hands its users full DuckDB SQL
(/root/reference/Cargo.toml:15 — the product IS a DuckDB file), so
capability parity includes the SQL surface beyond plain
join/agg/window: correlated EXISTS / IN / scalar subqueries, frame
clauses, the scalar function library, and ordered string aggregation.

The subquery queries deliberately go through ``spark.sql`` on temp
views instead of hand-lowered joins: that exercises Catalyst's
decorrelation (RewritePredicateSubquery / RewriteCorrelatedScalar-
Subquery), which turns them into the same semi/aggregate joins at
plan level — verified in tests/test_plans.py.

Scale notes inline per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from huckli_spark.functions.portable import fround, sql_fround, sql_h60
from huckli_spark.queries import query
from huckli_spark.session import load_table as _t


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        _t(spark, sf_dir, t).createOrReplaceTempView(t)


# ---------------------------------------------------------------------------
# Subqueries (EXISTS / IN / scalar / correlated scalar)
# ---------------------------------------------------------------------------
@query(
    "q_exists_subquery",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000
    )
    """,
    doc="correlated EXISTS; Catalyst decorrelates to a left-semi join "
    "(shuffle on the correlation key — no per-row subquery execution).",
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000
        )
        """
    )


@query(
    "q_in_subquery",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey IN (
      SELECT n_nationkey FROM nation WHERE n_regionkey = 1
    )
    """,
    doc="uncorrelated IN-subquery -> left-semi join; the inner side is "
    "tiny and broadcast by AQE.",
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "supplier", "nation")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_nationkey IN (
          SELECT n_nationkey FROM nation WHERE n_regionkey = 1
        )
        """
    )


@query(
    "q_scalar_subquery",
    f"""
    SELECT p_partkey, p_name, {sql_fround('p_retailprice')} AS price
    FROM part
    WHERE p_retailprice > 1.05 * (SELECT avg(p_retailprice) FROM part)
    """,
    doc="uncorrelated scalar subquery: one global aggregate computed "
    "once, broadcast into the filter.",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_retailprice AS price
        FROM part
        WHERE p_retailprice > 1.05 * (SELECT avg(p_retailprice) FROM part)
        """
    ).withColumn("price", fround(F.col("price")))


@query(
    "q_correlated_scalar",
    f"""
    SELECT o_orderkey, o_custkey, {sql_fround('o_totalprice')} AS price
    FROM orders o
    WHERE o_totalprice > 2.5 * (
      SELECT avg(o2.o_totalprice) FROM orders o2
      WHERE o2.o_custkey = o.o_custkey
    )
    """,
    doc="correlated scalar subquery; decorrelated to a per-key "
    "aggregate joined back on o_custkey — one shuffle, not N queries.",
)
def q_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice AS price
        FROM orders o
        WHERE o_totalprice > 2.5 * (
          SELECT avg(o2.o_totalprice) FROM orders o2
          WHERE o2.o_custkey = o.o_custkey
        )
        """
    ).withColumn("price", fround(F.col("price")))


# ---------------------------------------------------------------------------
# Window frames: moving average, frame-bound first/last, ntile
# ---------------------------------------------------------------------------
@query(
    "q_window_frame",
    f"""
    SELECT o_custkey, o_orderkey,
           {sql_fround('avg(o_totalprice) OVER w4')} AS mov_avg4,
           {sql_fround('first_value(o_totalprice) OVER wfull')} AS first_price,
           ntile(4) OVER wfull AS quartile
    FROM orders
    WHERE o_custkey <= 200
    WINDOW
      w4 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
      wfull AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="explicit ROWS frame (moving average), first_value, ntile; "
    "total order (date, key) makes every frame deterministic.",
)
def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") <= 200)
    # One shuffle on o_custkey serves all three windows (same
    # partitioning + ordering) — Catalyst collapses them into a single
    # Window node; check: exactly one Exchange in the plan.
    wfull = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w4 = wfull.rowsBetween(-3, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        fround(F.avg("o_totalprice").over(w4)).alias("mov_avg4"),
        fround(F.first("o_totalprice").over(wfull)).alias("first_price"),
        F.ntile(4).over(wfull).alias("quartile"),
    )


# ---------------------------------------------------------------------------
# Latest-row-per-key (DISTINCT ON / argmax pattern)
# ---------------------------------------------------------------------------
@query(
    "q_latest_per_key",
    """
    SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_orderdate
    FROM orders
    WHERE o_custkey <= 500
    ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC
    """,
    doc="latest order per customer (argmax): row_number over a "
    "total-ordered window == DuckDB DISTINCT ON. Generalizes the "
    "reference's checkpoint top-1 (huckli-db/src/lib.rs:43-56) to "
    "per-group.",
)
def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") <= 500)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


# ---------------------------------------------------------------------------
# Scalar function library: strings, dates
# ---------------------------------------------------------------------------
@query(
    "q_string_fns",
    """
    SELECT c_custkey,
           upper(c_name) AS name_up,
           substr(c_name, 1, 8) AS name_head,
           length(c_name) AS name_len,
           replace(c_mktsegment, 'AUTO', 'CAR') AS seg,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_pad,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_num
    FROM customer
    WHERE c_name LIKE '%ustomer%' AND c_mktsegment LIKE '_U%'
    """,
    doc="string function battery: LIKE with _ wildcard, upper, substr, "
    "length, replace, lpad, regexp_extract — all JVM built-ins, all "
    "inside whole-stage codegen.",
)
def q_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.where(
        F.col("c_name").like("%ustomer%") & F.col("c_mktsegment").like("_U%")
    ).select(
        "c_custkey",
        F.upper("c_name").alias("name_up"),
        F.substring("c_name", 1, 8).alias("name_head"),
        F.length("c_name").cast("long").alias("name_len"),
        F.replace(F.col("c_mktsegment"), F.lit("AUTO"), F.lit("CAR")).alias("seg"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_pad"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_num"),
    )


@query(
    "q_date_fns",
    """
    SELECT o_orderkey,
           CAST(date_part('year', o_orderdate) AS BIGINT) AS yr,
           CAST(date_part('month', o_orderdate) AS BIGINT) AS mon,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS due_date,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                AS BIGINT) AS days_since,
           last_day(CAST(o_orderdate AS DATE)) AS month_end
    FROM orders
    WHERE o_orderdate BETWEEN DATE '1995-03-01' AND DATE '1995-03-31'
    """,
    doc="date function battery: extract, trunc, interval arithmetic, "
    "datediff, last_day; the BETWEEN range is pushed to the scan.",
)
def q_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderdate").between("1995-03-01", "1995-03-31")
    ).select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mon"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add("o_orderdate", 90).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
        F.last_day("o_orderdate").alias("month_end"),
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation (listagg / string_agg)
# ---------------------------------------------------------------------------
@query(
    "q_string_agg",
    """
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           count(*) AS n
    FROM nation
    GROUP BY n_regionkey
    """,
    doc="ordered string aggregation: collect_list is unordered in a "
    "distributed engine, so sort the array THEN join — deterministic "
    "regardless of task scheduling (== string_agg ... ORDER BY).",
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# Deterministic hash sampling (the scalable TABLESAMPLE)
# ---------------------------------------------------------------------------
@query(
    "q_hash_sample",
    f"""
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE {sql_h60("CAST(o_orderkey AS VARCHAR)")} % 100 < 5
    """,
    doc="deterministic ~5% sample by key hash. Unlike TABLESAMPLE "
    "(engine- and partitioning-dependent) a hash predicate selects the "
    "SAME rows on any engine, any partitioning, any cluster size — the "
    "reproducible-training-subset primitive; trivially pushes down.",
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.functions.portable import h60

    o = _t(spark, sf_dir, "orders")
    return o.where(
        h60(F.col("o_orderkey").cast("string")) % 100 < 5
    ).select("o_orderkey", "o_custkey")


# ---------------------------------------------------------------------------
# Multi-join analytics (TPC-H Q3 / Q5 shapes)
# ---------------------------------------------------------------------------
@query(
    "q_multi_join_topk",
    f"""
    SELECT l_orderkey,
           {sql_fround("sum(l_extendedprice * (1 - l_discount))")} AS revenue,
           o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < DATE '1995-03-15'
      AND l_shipdate > DATE '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective dim filter -> 3-way join -> agg -> "
    "top-k. Catalyst pushes both date filters to the scans, broadcasts "
    "the filtered customer side, and plans the LIMIT as "
    "TakeOrderedAndProject (no global sort).",
)
def q_multi_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1995-03-15")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1995-03-15")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(fround(F.sum(rev)).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q_region_revenue",
    f"""
    SELECT n_name,
           {sql_fround("sum(l_extendedprice * (1 - l_discount))")} AS revenue
    FROM region, nation, customer, orders, lineitem
    WHERE r_name = 'ASIA'
      AND n_regionkey = r_regionkey
      AND c_nationkey = n_nationkey
      AND o_custkey = c_custkey
      AND l_orderkey = o_orderkey
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: 5-way star join. The dim chain region->nation"
    "->customer stays broadcast end-to-end; only the orders-lineitem "
    "fact-fact edge shuffles.",
)
def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(fround(F.sum(rev)).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Array function battery
# ---------------------------------------------------------------------------
@query(
    "q_array_fns",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_words,
           len(list_distinct(string_split(text, ' '))) AS n_distinct,
           array_to_string(string_split(text, ' ')[1:3], ' ') AS head3,
           list_contains(string_split(text, ' '), 'the') AS has_the
    FROM documents
    WHERE doc_id <= 200
    """,
    doc="array function battery: split, size, distinct, slice, "
    "array_join, membership — all document-local map expressions "
    "(zero shuffle; the plan is scan -> project).",
)
def q_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") <= 200)
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct"),
        F.array_join(F.slice(words, 1, 3), " ").alias("head3"),
        F.array_contains(words, "the").alias("has_the"),
    )


# ---------------------------------------------------------------------------
# Map functions
# ---------------------------------------------------------------------------
@query(
    "q_map_fns",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
           count(DISTINCT l_linestatus) AS n_statuses
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="map construction + lookup: per-flag status->count map built "
    "with map_from_entries(collect_list(struct)), probed with "
    "element_at, sized with map_keys. The oracle states the same "
    "values relationally (conditional aggregation) — the map is the "
    "Spark-side representation under test, like q_pivot.",
)
def q_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt")
    )
    mapped = counts.groupBy("l_returnflag").agg(
        F.map_from_entries(
            F.collect_list(F.struct("l_linestatus", "cnt"))
        ).alias("m")
    )
    return mapped.select(
        "l_returnflag",
        F.coalesce(F.element_at("m", F.lit("O")), F.lit(0)).alias("n_open"),
        F.coalesce(F.element_at("m", F.lit("F")), F.lit(0)).alias("n_filled"),
        F.size(F.map_keys("m")).cast("long").alias("n_statuses"),
    )


# ---------------------------------------------------------------------------
# NULL semantics battery
# ---------------------------------------------------------------------------
@query(
    "q_null_semantics",
    """
    WITH t AS (
      SELECT c_custkey,
             nullif(c_mktsegment, 'BUILDING') AS seg,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
      FROM customer
    )
    SELECT coalesce(seg, 'SUPPRESSED') AS seg_filled,
           count(*) AS n_rows,
           count(bal) AS n_bal,
           count(*) - count(bal) AS n_null_bal,
           CAST(sum(CASE WHEN seg IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_seg,
           CAST(sum(CASE WHEN (seg IS NOT DISTINCT FROM NULL) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nullsafe
    FROM t
    GROUP BY 1
    """,
    doc="NULL semantics: nullif, coalesce, count(col) vs count(*) "
    "(null-skipping aggregation), IS NULL vs null-safe equality "
    "(IS NOT DISTINCT FROM / <=>). Fixture columns are all NOT NULL "
    "(mirroring the reference's DDL), so NULLs are manufactured with "
    "nullif/CASE.",
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    t = c.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal")).alias("bal"),
    )
    return t.groupBy(
        F.coalesce(F.col("seg"), F.lit("SUPPRESSED")).alias("seg_filled")
    ).agg(
        F.count("*").alias("n_rows"),
        F.count("bal").alias("n_bal"),
        (F.count("*") - F.count("bal")).alias("n_null_bal"),
        F.sum(F.when(F.col("seg").isNull(), 1).otherwise(0)).alias("n_null_seg"),
        F.sum(F.when(F.col("seg").eqNullSafe(F.lit(None)), 1).otherwise(0)).alias(
            "n_nullsafe"
        ),
    )


# ---------------------------------------------------------------------------
# UDAF surface: pandas GROUPED_AGG (Arrow-batched custom aggregate)
# ---------------------------------------------------------------------------
@query(
    "q_udaf_median",
    """
    SELECT l_returnflag,
           count(*) AS n,
           CAST(quantile_disc(l_quantity, 0.5) AS DOUBLE) AS median_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="custom aggregate via a pandas GROUPED_AGG UDF (the PySpark "
    "UDAF surface, Arrow-batched): exact lower-median, defined as "
    "sorted[(n-1)//2] to coincide with DuckDB's quantile_disc(0.5) — "
    "a deterministic statistic, so the custom-aggregate machinery "
    "itself is hash-gated. Scale note: GROUPED_AGG buffers each "
    "group's values in one worker (holistic aggregate); for hot keys "
    "compose with the skew toolkit or switch to approx_percentile.",
)
def q_udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.functions.udafs import median_disc, n_values

    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        n_values("l_quantity").alias("n"),
        median_disc("l_quantity").alias("median_qty"),
    )


# ---------------------------------------------------------------------------
# UNPIVOT / melt, extended window functions, bitwise aggregates
# ---------------------------------------------------------------------------
@query(
    "q_unpivot",
    """
    SELECT n_name, metric, CAST(val AS BIGINT) AS val
    FROM (
      SELECT n.n_name,
             count(DISTINCT s.s_suppkey) AS n_suppliers,
             count(DISTINCT c.c_custkey) AS n_customers
      FROM nation n
      LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
      LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    )
    UNPIVOT (val FOR metric IN (n_suppliers, n_customers))
    """,
    doc="UNPIVOT/melt: wide per-nation metrics into (nation, metric, "
    "value) long form — Spark's unpivot() vs DuckDB's UNPIVOT clause. "
    "Map-only reshape over an aggregated input; no extra shuffle.",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    wide = (
        n.join(s, s.s_nationkey == n.n_nationkey, "left")
        .join(c, c.c_nationkey == n.n_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count_distinct("s_suppkey").alias("n_suppliers"),
            F.count_distinct("c_custkey").alias("n_customers"),
        )
    )
    return wide.unpivot(
        ids=["n_name"],
        values=["n_suppliers", "n_customers"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@query(
    "q_window_misc",
    f"""
    SELECT o_custkey,
           o_orderkey,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           {sql_fround('percent_rank() OVER w', 6)} AS pr,
           {sql_fround('cume_dist() OVER w', 6)} AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    QUALIFY o_custkey < 50
    """,
    doc="extended window-function surface: ntile, percent_rank, "
    "cume_dist over a per-customer price ordering (unique tiebreak), "
    "restricted to a stable key slice; one shuffle on the partition "
    "key shared by all three functions.",
)
def q_window_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        fround(F.percent_rank().over(w), 6).alias("pr"),
        fround(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "q_bitwise",
    """
    SELECT l_returnflag,
           CAST(bit_and(l_orderkey % 4096) AS BIGINT) AS flags_and,
           CAST(bit_or(l_orderkey % 4096) AS BIGINT) AS flags_or,
           CAST(bit_xor(l_orderkey % 4096) AS BIGINT) AS flags_xor,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="bitwise aggregate surface (bit_and/bit_or/bit_xor) over a "
    "bounded bitfield domain — single partial-agged shuffle; the "
    "bitfield pattern is how permission/flag columns aggregate at "
    "warehouse scale.",
)
def q_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    v = (F.col("l_orderkey") % 4096).alias("v")
    return (
        li.select("l_returnflag", v)
        .groupBy("l_returnflag")
        .agg(
            F.expr("bit_and(v)").cast("long").alias("flags_and"),
            F.expr("bit_or(v)").cast("long").alias("flags_or"),
            F.expr("bit_xor(v)").cast("long").alias("flags_xor"),
            F.count("*").alias("n"),
        )
    )


@query(
    "q_kmv_distinct",
    f"""
    WITH h AS (
      SELECT DISTINCT l_returnflag,
             {sql_h60("'kmv:' || CAST(l_orderkey AS VARCHAR)")} AS hv
      FROM lineitem
    ), r AS (
      SELECT l_returnflag, hv,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rk,
             count(*) OVER (PARTITION BY l_returnflag) AS n_distinct
      FROM h
    )
    SELECT l_returnflag,
           CAST(n_distinct AS BIGINT) AS n_exact,
           {sql_fround(
               'CASE WHEN n_distinct < 256 THEN n_distinct * 1.0 '
               'ELSE 255.0 * 1152921504606846976.0 / hv END', 2
           )} AS kmv_estimate
    FROM r WHERE rk = least(n_distinct, 256)
    """,
    doc="KMV (k-minimum-values, k=256) distinct-count sketch: estimate "
    "= (k-1) * 2^60 / h_(k) over the portable 60-bit hash. Unlike HLL "
    "(engine-specific registers, rows-only gate), KMV over a shared "
    "hash is DETERMINISTIC and engine-portable, so the approximate "
    "answer itself hash-matches the DuckDB oracle. Scale: the k-min "
    "set is tiny, mergeable across partitions/streams, and never "
    "requires a global distinct — the gate's window form is the "
    "fixture-scale equivalent of the map-side bounded-heap merge.",
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.functions.portable import h60

    K = 256
    li = _t(spark, sf_dir, "lineitem")
    h = li.select(
        "l_returnflag",
        h60(F.concat(F.lit("kmv:"), F.col("l_orderkey").cast("string"))).alias("hv"),
    ).distinct()
    w = Window.partitionBy("l_returnflag").orderBy("hv")
    wc = Window.partitionBy("l_returnflag")
    r = h.withColumn("rk", F.row_number().over(w)).withColumn(
        "n_distinct", F.count("*").over(wc)
    )
    est = F.when(
        F.col("n_distinct") < K, F.col("n_distinct").cast("double")
    ).otherwise(F.lit(float(K - 1)) * F.lit(float(1 << 60)) / F.col("hv"))
    return (
        r.where(F.col("rk") == F.least(F.col("n_distinct"), F.lit(K)))
        .select(
            "l_returnflag",
            F.col("n_distinct").cast("long").alias("n_exact"),
            fround(est, 2).alias("kmv_estimate"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H decorrelation battery (Q11/Q13/Q15/Q17/Q18/Q22 shapes)
# ---------------------------------------------------------------------------
# The classic correlated/scalar-subquery TPC-H shapes, adapted to the
# fixture's reduced schema (no partsupp/commitdate: Q11 builds supply
# value from lineitem, Q22's "inactive" customers are those with no
# RECENT order — every fixture customer has some order). Money math
# uses the exact-cents discipline (floor(x*100+0.5) per row, BIGINT
# sums) wherever a threshold or equality depends on an aggregate, so
# comparisons never ride on float summation order.
@query(
    "q_tpch_q13",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
    doc="TPC-H Q13 (customer order-count distribution): LEFT join with "
    "a join-side filter (zero-order customers MUST survive), count "
    "per customer, then the distribution of those counts. Exercises "
    "outer-join + double aggregation; all-integer output. Scale: "
    "first agg shuffles on custkey (the join key — AQE coalesces), "
    "second on the tiny count domain.",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("long").alias("custdist")
    )


@query(
    "q_tpch_q17",
    f"""
    SELECT {sql_fround('sum(l_extendedprice) / 7.0')} AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
    doc="TPC-H Q17 (small-quantity-order revenue): correlated SCALAR "
    "subquery — each lineitem compares against 0.2x the average "
    "quantity of ITS part. Catalyst decorrelates to a per-part "
    "aggregate joined back (RewriteCorrelatedScalarSubquery). "
    "Portable boundary: l_quantity is integral and the per-part avg "
    "is an exact-integer sum / count, so 0.2*avg is the identical "
    "double on both engines. Scale: the decorrelated agg shuffles on "
    "partkey once; the brand filter prunes the probe side first.",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT cast(floor((sum(l_extendedprice) / 7.0) * 100.0 + 0.5)
                    AS double) / 100.0 AS avg_yearly
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND p_brand = 'Brand#23'
          AND l_quantity < (
            SELECT 0.2 * avg(l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = p_partkey
          )
        """
    )


@query(
    "q_tpch_q18",
    f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           {sql_fround('o_totalprice')} AS totalprice,
           CAST(sum(l_quantity) AS BIGINT) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 300
      )
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    doc="TPC-H Q18 (large-volume orders): IN over a grouped HAVING "
    "subquery (semi join against an aggregate), then re-join the "
    "detail for per-order totals. l_quantity is integral, so the "
    "HAVING threshold and total_qty are exact integers. Scale: the "
    "HAVING side collapses lineitem to order keys before the semi "
    "join; AQE picks broadcast for the surviving key set.",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               cast(floor(o_totalprice * 100.0 + 0.5) AS double) / 100.0
                 AS totalprice,
               CAST(sum(l_quantity) AS BIGINT) AS total_qty
        FROM customer, orders, lineitem
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING sum(l_quantity) > 300
          )
          AND c_custkey = o_custkey
          AND o_orderkey = l_orderkey
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        """
    )


@query(
    "q_tpch_q15",
    f"""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0
                            + 0.5) AS BIGINT)) AS total_cents
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           {sql_fround('total_cents / 100.0')} AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_cents = (SELECT max(total_cents) FROM rev)
    """,
    doc="TPC-H Q15 (top supplier): revenue per supplier over a "
    "quarter, then the supplier(s) hitting the GLOBAL max — a scalar "
    "subquery over an aggregate of the same derived relation. The "
    "max-equality comparison runs on exact integer cents (per-row "
    "floor to cents, BIGINT sums), so the tie semantics are "
    "bit-portable — float revenue sums would make 'equals the max' "
    "partition-order dependent. Scale: rev is O(suppliers); the max "
    "is one broadcast scalar.",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(
        """
        WITH rev AS (
          SELECT l_suppkey,
                 SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0
                                + 0.5) AS BIGINT)) AS total_cents
          FROM lineitem
          WHERE l_shipdate >= DATE '1996-01-01'
            AND l_shipdate < DATE '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               cast(floor((total_cents / 100.0) * 100.0 + 0.5) AS double)
                 / 100.0 AS total_revenue
        FROM supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total_cents = (SELECT max(total_cents) FROM rev)
        """
    )


@query(
    "q_tpch_q11",
    f"""
    WITH sv AS (
      SELECT l_partkey,
             SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
               AS value_cents
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey
        AND s_nationkey = n_nationkey
        AND n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey,
           {sql_fround('value_cents / 100.0')} AS part_value
    FROM sv
    WHERE value_cents * 10000 > (SELECT sum(value_cents) FROM sv) * 12
    """,
    doc="TPC-H Q11 shape (important stock — partsupp rebuilt from "
    "lineitem supply value): per-part value within one nation, "
    "keeping parts above 0.12% of the nation's TOTAL value — a scalar "
    "subquery aggregating the same grouped relation the outer query "
    "reads. The fraction threshold is pure integer arithmetic "
    "(value*10000 > total*12): no float ratio at the cut line. Scale: "
    "sv is O(parts); the total is one broadcast scalar; the "
    "supplier->nation chain broadcasts.",
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "supplier", "nation")
    return spark.sql(
        """
        WITH sv AS (
          SELECT l_partkey,
                 SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
                   AS value_cents
          FROM lineitem, supplier, nation
          WHERE l_suppkey = s_suppkey
            AND s_nationkey = n_nationkey
            AND n_name = 'NATION_3'
          GROUP BY l_partkey
        )
        SELECT l_partkey AS partkey,
               cast(floor((value_cents / 100.0) * 100.0 + 0.5) AS double)
                 / 100.0 AS part_value
        FROM sv
        WHERE value_cents * 10000 > (SELECT sum(value_cents) FROM sv) * 12
        """
    )


@query(
    "q_tpch_q22",
    f"""
    WITH pos AS (
      SELECT c_custkey, c_nationkey,
             CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
      FROM customer WHERE c_acctbal > 0.0
    ), stats AS (
      SELECT sum(cents) AS s, count(*) AS n FROM pos
    )
    SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
           {sql_fround('sum(cents) / 100.0')} AS totacctbal
    FROM pos, stats, nation
    WHERE cents * n > s
      AND n_nationkey = c_nationkey
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= DATE '2000-01-01'
      )
    GROUP BY n_name
    """,
    doc="TPC-H Q22 shape (global-sales-opportunity): customers with "
    "above-average positive balance and NO RECENT order (every "
    "fixture customer has SOME order, so 'inactive' means no order "
    "since 2000) — a scalar-average subquery plus NOT EXISTS "
    "anti-join, grouped by nation. The above-average cut is integer "
    "(cents * n > sum_cents), never a float-avg comparison. Scale: "
    "stats is one broadcast row; the anti-join shuffles on custkey "
    "with the date filter pushed to the orders scan.",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders", "nation")
    return spark.sql(
        """
        WITH pos AS (
          SELECT c_custkey, c_nationkey,
                 CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
          FROM customer WHERE c_acctbal > 0.0
        ), stats AS (
          SELECT sum(cents) AS s, count(*) AS n FROM pos
        )
        SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
               cast(floor((sum(cents) / 100.0) * 100.0 + 0.5) AS double)
                 / 100.0 AS totacctbal
        FROM pos, stats, nation
        WHERE cents * n > s
          AND n_nationkey = c_nationkey
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= DATE '2000-01-01'
          )
        GROUP BY n_name
        """
    )


@query(
    "q_tpch_q7",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_fround('sum(cents) / 100.0')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                  AS BIGINT) AS cents
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey
        AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey
        AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
    ) GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 (volume shipping): revenue flowing between two "
    "nations in either direction, by shipping year — a 6-way join "
    "whose nation-pair predicate is DISJUNCTIVE across two dimension "
    "aliases (the shape that defeats naive pushdown; Catalyst still "
    "broadcasts both nation sides and the date range reaches the "
    "lineitem scan). Revenue sums exact integer cents. Scale: only "
    "the lineitem-orders edge shuffles; nations broadcast twice.",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation")
    return spark.sql(
        """
        SELECT supp_nation, cust_nation, l_year,
               cast(floor((sum(cents) / 100.0) * 100.0 + 0.5) AS double)
                 / 100.0 AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS INT) AS l_year,
                 CAST(floor(l_extendedprice * (1 - l_discount) * 100.0
                            + 0.5) AS BIGINT) AS cents
          FROM supplier, lineitem, orders, customer,
               nation n1, nation n2
          WHERE s_suppkey = l_suppkey
            AND o_orderkey = l_orderkey
            AND c_custkey = o_custkey
            AND s_nationkey = n1.n_nationkey
            AND c_nationkey = n2.n_nationkey
            AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
        ) GROUP BY supp_nation, cust_nation, l_year
        """
    )


@query(
    "q_tpch_q8",
    f"""
    SELECT o_year,
           {sql_fround(
               "sum(CASE WHEN supp_nation = 'NATION_2' THEN cents ELSE 0 END)"
               " * 1.0 / sum(cents)", 6)} AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                  AS BIGINT) AS cents,
             n2.n_name AS supp_nation
      FROM part, supplier, lineitem, orders, customer,
           nation n1, nation n2, region
      WHERE p_partkey = l_partkey
        AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey
        AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey
        AND n1.n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND s_nationkey = n2.n_nationkey
        AND p_type = 'PROMO'
    ) GROUP BY o_year
    """,
    doc="TPC-H Q8 (national market share): NATION_2 suppliers' share "
    "of PROMO-part revenue sold into the ASIA region, per order year "
    "— an 8-way join with a conditional-sum ratio. The share is a "
    "ratio of two exact-integer cent sums (one IEEE division, then "
    "the shared fround), so the percentage never rides on float "
    "summation order. Scale: the region->nation->customer chain and "
    "both small dims broadcast; lineitem-orders is the only shuffle "
    "edge.",
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(
        spark, sf_dir,
        "part", "supplier", "lineitem", "orders", "customer",
        "nation", "region",
    )
    return spark.sql(
        """
        SELECT o_year,
               cast(floor((sum(CASE WHEN supp_nation = 'NATION_2'
                                    THEN cents ELSE 0 END)
                           * 1.0 / sum(cents)) * 1000000.0 + 0.5)
                    AS double) / 1000000.0 AS mkt_share
        FROM (
          SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                 CAST(floor(l_extendedprice * (1 - l_discount) * 100.0
                            + 0.5) AS BIGINT) AS cents,
                 n2.n_name AS supp_nation
          FROM part, supplier, lineitem, orders, customer,
               nation n1, nation n2, region
          WHERE p_partkey = l_partkey
            AND s_suppkey = l_suppkey
            AND l_orderkey = o_orderkey
            AND o_custkey = c_custkey
            AND c_nationkey = n1.n_nationkey
            AND n1.n_regionkey = r_regionkey
            AND r_name = 'ASIA'
            AND s_nationkey = n2.n_nationkey
            AND p_type = 'PROMO'
        ) GROUP BY o_year
        """
    )


@query(
    "q_tpch_q6",
    f"""
    SELECT {sql_fround('sum(cents) / 100.0')} AS revenue
    FROM (
      SELECT CAST(floor(l_extendedprice * l_discount * 100.0 + 0.5)
                  AS BIGINT) AS cents
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24
    )
    """,
    doc="TPC-H Q6 (forecasting revenue change): pure scan-filter-sum "
    "— the canonical predicate-pushdown benchmark. All three "
    "predicates (date range, discount band, quantity cap) reach the "
    "parquet scan; the revenue sums exact integer cents. Scale: one "
    "scan, map-side partial sum, a single scalar crosses the wire.",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    cents = F.expr(
        "CAST(floor(l_extendedprice * l_discount * 100.0 + 0.5) AS BIGINT)"
    )
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            fround(F.sum(cents) / 100.0).alias("revenue")
        )
    )


@query(
    "q_tpch_q10",
    f"""
    SELECT c_custkey, c_name, n_name,
           {sql_fround('sum(cents) / 100.0')} AS revenue
    FROM (
      SELECT c_custkey, c_name, n_name,
             CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                  AS BIGINT) AS cents
      FROM customer, orders, lineitem, nation
      WHERE c_custkey = o_custkey
        AND l_orderkey = o_orderkey
        AND o_orderdate >= DATE '1996-01-01'
        AND o_orderdate < DATE '1996-04-01'
        AND l_returnflag = 'R'
        AND c_nationkey = n_nationkey
    )
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 (returned-item reporting): customers who returned "
    "goods in a quarter, ranked by lost revenue — 4-way join with "
    "two selective fact filters and a top-20. Revenue in exact "
    "integer cents so the ranking (and its tiebreak) is portable. "
    "Scale: both date and returnflag predicates push to the scans, "
    "nation broadcasts, the top-20 is TakeOrderedAndProject.",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    cents = F.expr(
        "CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)"
        " AS BIGINT)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(fround(F.sum(cents) / 100.0).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q_tpch_q14",
    f"""
    SELECT {sql_fround(
        "100.0 * sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)"
        " / sum(cents)", 6)} AS promo_revenue
    FROM (
      SELECT p_type,
             CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                  AS BIGINT) AS cents
      FROM lineitem, part
      WHERE l_partkey = p_partkey
        AND l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1996-02-01'
    )
    """,
    doc="TPC-H Q14 (promotion effect): the share of one month's "
    "revenue from PROMO parts — a conditional-sum percentage over a "
    "fact-dim join. One IEEE division of two exact integer cent sums "
    "then the shared fround, so the percentage never rides on float "
    "summation order. Scale: the date band prunes the scan; part "
    "joins broadcast (or bucketed at 100 TB).",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-02-01")
    )
    p = _t(spark, sf_dir, "part")
    cents = F.expr(
        "CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)"
        " AS BIGINT)"
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_type", cents.alias("__c")
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", F.col("__c")).otherwise(0))
    return j.agg(
        fround(100.0 * promo / F.sum("__c"), 6).alias("promo_revenue")
    )


@query(
    "q_tpch_q19",
    f"""
    SELECT {sql_fround('sum(cents) / 100.0')} AS revenue
    FROM (
      SELECT CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                  AS BIGINT) AS cents
      FROM lineitem, part
      WHERE p_partkey = l_partkey
        AND (
          (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
          OR
          (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
          OR
          (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
        )
    )
    """,
    doc="TPC-H Q19 (discounted revenue, disjunctive predicates): an "
    "OR of three brand/size/quantity conjunction arms spanning BOTH "
    "join sides — the shape that defeats naive predicate pushdown; "
    "Catalyst still derives the residual per-side filters (brand IN "
    "set on part, quantity range union on lineitem) before the join. "
    "Revenue in exact integer cents. Scale: part broadcasts; the "
    "derived filters prune both scans.",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT cast(floor((sum(cents) / 100.0) * 100.0 + 0.5) AS double)
                 / 100.0 AS revenue
        FROM (
          SELECT CAST(floor(l_extendedprice * (1 - l_discount) * 100.0
                            + 0.5) AS BIGINT) AS cents
          FROM lineitem, part
          WHERE p_partkey = l_partkey
            AND (
              (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 1 AND l_quantity <= 11)
              OR
              (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 25
               AND l_quantity >= 10 AND l_quantity <= 20)
              OR
              (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 35
               AND l_quantity >= 20 AND l_quantity <= 30)
            )
        )
        """
    )


# ------------------------------------------------------- KMV set algebra
# Theta-sketch-style set operations on two KMV sketches (k=256) over
# the SHARED portable hash: theta = min of the two kth-minimum values,
# the union/intersection samples are the distinct hashes below theta
# (structurally subsets of each k-minimum set), and the estimators are
# |sample| * 2^60 / theta. Everything up to the final division is
# integer, so even the approximate answers hash-match the oracle —
# the sketch-merge algebra used when per-partition/per-day sketches
# roll up without re-scanning history. Exact counts ride along to
# gate the estimator error itself.
_KMVS_K = 256


@query(
    "q_kmv_set_ops",
    f"""
    WITH a AS (
      SELECT DISTINCT {sql_h60("'kmv:' || CAST(o_orderkey AS VARCHAR)")} AS hv,
             o_orderkey
      FROM orders WHERE o_orderstatus = 'O'
    ), b AS (
      SELECT DISTINCT {sql_h60("'kmv:' || CAST(o_orderkey AS VARCHAR)")} AS hv,
             o_orderkey
      FROM orders WHERE o_totalprice > 100000
    ), ka AS (
      SELECT hv, row_number() OVER (ORDER BY hv) AS rk FROM a
    ), kb AS (
      SELECT hv, row_number() OVER (ORDER BY hv) AS rk FROM b
    ), theta AS (
      SELECT least((SELECT hv FROM ka WHERE rk = {_KMVS_K}),
                   (SELECT hv FROM kb WHERE rk = {_KMVS_K})) AS th
    ), sample AS (
      SELECT hv,
             max(in_a) AS in_a, max(in_b) AS in_b
      FROM (
        SELECT hv, 1 AS in_a, 0 AS in_b FROM a
        UNION ALL
        SELECT hv, 0, 1 FROM b
      ) u, theta
      WHERE u.hv < theta.th
      GROUP BY hv
    ), counts AS (
      SELECT count(*) AS n_union_sample,
             sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
               AS n_inter_sample
      FROM sample
    ), exact AS (
      SELECT count(DISTINCT o_orderkey) AS n_union_exact,
             count(DISTINCT CASE WHEN o_orderstatus = 'O'
                                  AND o_totalprice > 100000
                                 THEN o_orderkey END) AS n_inter_exact
      FROM orders
      WHERE o_orderstatus = 'O' OR o_totalprice > 100000
    )
    SELECT CAST(c.n_union_sample AS BIGINT) AS n_union_sample,
           CAST(c.n_inter_sample AS BIGINT) AS n_inter_sample,
           CAST(e.n_union_exact AS BIGINT) AS n_union_exact,
           CAST(e.n_inter_exact AS BIGINT) AS n_inter_exact,
           {sql_fround(
               'c.n_union_sample * 1152921504606846976.0 / t.th', 2
           )} AS est_union,
           {sql_fround(
               'c.n_inter_sample * 1152921504606846976.0 / t.th', 2
           )} AS est_inter,
           {sql_fround('c.n_inter_sample * 1.0 / c.n_union_sample', 4)}
             AS jaccard_est
    FROM counts c, exact e, theta t
    """,
    doc="KMV/theta-sketch set algebra: union, intersection, and "
    "Jaccard estimates for two order subsets from their k-minimum "
    "sketches alone — the mergeable-summary path for cross-partition "
    "distinct arithmetic (|A∩B| is NOT distributive; sketches make it "
    "mergeable). theta = min of kth values; samples are hashes below "
    "theta (always inside the k-min sets, so the estimator never "
    "needs the full sets at merge time). Scale: each sketch is a "
    "bounded k-row relation regardless of input size; the merge "
    "touches at most 2k rows. Estimator error vs exact is asserted "
    "in tests.",
)
def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.functions.portable import h60

    o = _t(spark, sf_dir, "orders")
    hv = h60(F.concat(F.lit("kmv:"), F.col("o_orderkey").cast("string")))
    a = (
        o.where(F.col("o_orderstatus") == "O")
        .select(hv.alias("hv"), "o_orderkey")
        .distinct()
    )
    b = (
        o.where(F.col("o_totalprice") > 100000)
        .select(hv.alias("hv"), "o_orderkey")
        .distinct()
    )
    kth = lambda df: (  # noqa: E731
        df.select("hv")
        .withColumn("rk", F.row_number().over(Window.orderBy("hv")))
        .where(F.col("rk") == _KMVS_K)
        .select(F.col("hv").alias("th"))
    )
    theta = (
        kth(a)
        .crossJoin(kth(b).withColumnRenamed("th", "th_b"))
        .select(F.least("th", "th_b").alias("th"))
    )
    u = a.select("hv", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")).unionAll(
        b.select("hv", F.lit(0), F.lit(1))
    )
    sample = (
        u.crossJoin(F.broadcast(theta))
        .where(F.col("hv") < F.col("th"))
        .groupBy("hv")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    counts = sample.agg(
        F.count("*").alias("n_union_sample"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
        ).alias("n_inter_sample"),
    )
    exact = (
        o.where((F.col("o_orderstatus") == "O") | (F.col("o_totalprice") > 100000))
        .agg(
            F.count_distinct("o_orderkey").alias("n_union_exact"),
            F.count_distinct(
                F.when(
                    (F.col("o_orderstatus") == "O")
                    & (F.col("o_totalprice") > 100000),
                    F.col("o_orderkey"),
                )
            ).alias("n_inter_exact"),
        )
    )
    U = 1152921504606846976.0  # 2^60
    return (
        counts.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(theta))
        .select(
            F.col("n_union_sample").cast("long").alias("n_union_sample"),
            F.col("n_inter_sample").cast("long").alias("n_inter_sample"),
            F.col("n_union_exact").cast("long").alias("n_union_exact"),
            F.col("n_inter_exact").cast("long").alias("n_inter_exact"),
            fround(F.col("n_union_sample") * F.lit(U) / F.col("th"), 2).alias(
                "est_union"
            ),
            fround(F.col("n_inter_sample") * F.lit(U) / F.col("th"), 2).alias(
                "est_inter"
            ),
            fround(
                F.col("n_inter_sample") * 1.0 / F.col("n_union_sample"), 4
            ).alias("jaccard_est"),
        )
    )
