"""Extended relational parity queries (SURVEY §2.B rows not covered by
``tpch_parity``): CUBE / GROUPING SETS, INTERSECT, as-of join, range
(band) join, approximate distinct, and the LSH-bucketed ANN scale path.

The reference delegates all of these to embedded DuckDB
(/root/reference/Cargo.toml:15); here each gets a Spark-first plan and
a DuckDB oracle. The as-of join is the composition SURVEY §2.B calls
out ("as-of join = window/last() over union"): one shuffle on the
partition key, no per-row range probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from huckli_spark.functions.portable import fround, sql_fround
from huckli_spark.operators import simsearch
from huckli_spark.queries import query
from huckli_spark.session import load_table as _t


# ---------------------------------------------------------------------------
# CUBE — all 4 grouping sets over two dims
# ---------------------------------------------------------------------------
@query(
    "q_cube",
    f"""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           {sql_fround('sum(l_quantity)')} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE grouping sets ((),(a),(b),(a,b)).",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # Scale: Expand multiplies input 4x BEFORE the shuffle, but partial
    # aggregation collapses each grouping set map-side, so the shuffle
    # still carries ~|groups| rows per task.
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), fround(F.sum("l_quantity")).alias("sum_qty")
    )


@query(
    "q_grouping_sets",
    f"""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           {sql_fround('sum(l_extendedprice)')} AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="explicit GROUPING SETS list (neither rollup nor cube).",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
    ).agg(F.count("*").alias("n"), fround(F.sum("l_extendedprice")).alias("sum_price"))


# ---------------------------------------------------------------------------
# INTERSECT — set intersection (completes union/except coverage)
# ---------------------------------------------------------------------------
@query(
    "q_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    doc="INTERSECT set operation.",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "q_intersect_all",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    """,
    doc="INTERSECT ALL (bag semantics: min multiplicity per key).",
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


@query(
    "q_except_all",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
    """,
    doc="EXCEPT ALL (bag semantics: left multiplicity minus right).",
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


@query(
    "q_percentile",
    f"""
    SELECT source,
           {sql_fround('quantile_cont(n_chars, 0.5)')} AS median_chars,
           {sql_fround('quantile_cont(n_chars, 0.9)')} AS p90_chars,
           count(*) AS n
    FROM documents
    GROUP BY source
    """,
    doc="exact percentiles (holistic aggregate; Spark percentile == "
    "DuckDB quantile_cont, both linear-interpolating).",
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # Scale: exact percentiles buffer per-group values — at 100 TB
    # switch to approx_percentile (t-digest, constant memory); exact
    # kept here because it is oracle-comparable.
    return docs.groupBy("source").agg(
        fround(F.expr("percentile(n_chars, 0.5)")).alias("median_chars"),
        fround(F.expr("percentile(n_chars, 0.9)")).alias("p90_chars"),
        F.count("*").alias("n"),
    )


@query(
    "q_stats_corr",
    f"""
    SELECT l_returnflag,
           {sql_fround('corr(l_quantity, l_extendedprice)', 6)} AS qty_price_corr,
           {sql_fround('stddev_samp(l_quantity)', 6)} AS qty_stddev,
           {sql_fround('avg(l_discount)', 6)} AS avg_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="statistical aggregates: Pearson correlation + sample stddev.",
)
def q_stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        fround(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        fround(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
        fround(F.avg("l_discount"), 6).alias("avg_disc"),
    )


# ---------------------------------------------------------------------------
# Pivot — wide per-key columns from a tag column. The oracle spells it
# as conditional aggregation (the relational meaning of pivot), so the
# comparison nails Spark's pivot() semantics exactly.
# ---------------------------------------------------------------------------
_PIVOT_TYPES = ["click", "view", "purchase", "signup"]


@query(
    "q_pivot",
    f"""
    SELECT user_id % 10 AS user_mod,
           {", ".join(f"count(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}" for t in _PIVOT_TYPES)}
    FROM events
    GROUP BY 1
    """,
    doc="pivot event_type into per-type count columns.",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # Scale: explicit value list keeps pivot a single pass (no distinct
    # pre-query for the column set) and bounds the output width.
    return (
        ev.groupBy((F.col("user_id") % 10).alias("user_mod"))
        .pivot("event_type", _PIVOT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _PIVOT_TYPES)
    )


# ---------------------------------------------------------------------------
# As-of join — for every purchase, the most recent click at-or-before
# its timestamp per user. Spark has no ASOF keyword; the scalable
# composition is union + last(ignoreNulls) over an ordered window:
# ONE shuffle on user_id, O(n log n) per user, no range probe per row.
# DuckDB expresses the same thing natively (ASOF LEFT JOIN).
# ---------------------------------------------------------------------------
@query(
    "q_asof_join",
    f"""
    SELECT p.user_id, p.event_id,
           {sql_fround('(epoch_us(p.ts) - epoch_us(c.ts)) / 1000000.0')} AS gap_s
    FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN
         (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="as-of join: latest click at-or-before each purchase, per user.",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts"),
        F.lit(0).alias("is_purchase"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts"),
        F.lit(1).alias("is_purchase"),
        "event_id",
        F.lit(None).cast("timestamp").alias("click_ts"),
    )
    # clicks sort BEFORE purchases at equal ts (is_purchase asc) =>
    # inclusive at-or-before semantics, matching ASOF's p.ts >= c.ts.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "last_click_ts", F.last("click_ts", ignorenulls=True).over(w)
    )
    return merged.where(F.col("is_purchase") == 1).select(
        "user_id",
        "event_id",
        fround(
            (F.unix_micros("ts") - F.unix_micros("last_click_ts")) / 1_000_000.0
        ).alias("gap_s"),
    )


# ---------------------------------------------------------------------------
# Range (band) join — non-equi join of a fact column into value bands.
# ---------------------------------------------------------------------------
_BANDS = [
    ("small", 0.0, 50_000.0),
    ("medium", 50_000.0, 150_000.0),
    ("large", 150_000.0, 300_000.0),
    ("jumbo", 300_000.0, 1e12),
]

_BANDS_SQL = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _BANDS)


@query(
    "q_range_join",
    f"""
    SELECT band, count(*) AS n, {sql_fround('sum(o_totalprice)')} AS total
    FROM orders
    JOIN (VALUES {_BANDS_SQL}) AS bands(band, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
    doc="range/band non-equi join (broadcast nested loop on a tiny band table).",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_totalprice")
    bands = spark.createDataFrame(
        _BANDS,
        T.StructType(
            [
                T.StructField("band", T.StringType(), False),
                T.StructField("lo", T.DoubleType(), False),
                T.StructField("hi", T.DoubleType(), False),
            ]
        ),
    )
    # Scale: the band table is tiny and broadcast, so the non-equi
    # condition runs as BroadcastNestedLoopJoin — each fact row tests
    # |bands| predicates map-side, no shuffle of the fact side.
    joined = o.join(
        F.broadcast(bands),
        (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
    )
    return joined.groupBy("band").agg(
        F.count("*").alias("n"), fround(F.sum("o_totalprice")).alias("total")
    )


# ---------------------------------------------------------------------------
# Approximate distinct — the 100 TB cardinality path. HLL sketches are
# engine-specific (Spark's HLL++ vs DuckDB's HLL give different
# estimates), so this is a rows-only check by design; exact
# count_distinct parity is covered by q_group_distinct.
# ---------------------------------------------------------------------------
@query(
    "q_approx_distinct",
    None,
    doc="approx_count_distinct (HLL++, rsd=0.01) — estimates are "
    "engine-specific so no SQL oracle; rows-only check.",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # Scale: HLL sketch merges are constant-size per group — the
    # shuffle carries one ~kB sketch per (group, task), independent of
    # key cardinality. This is the q_group_distinct replacement at
    # 100 TB.
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", rsd=0.01).alias("approx_supps"),
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN — the scale path for q_ann_bruteforce: candidates
# are restricted to equal random-hyperplane signatures, replacing the
# O(n*q) cross product with a bucket equi-join. The oracle re-derives
# the identical signatures in SQL from the same md5-seeded plane
# constants, so both engines bucket identically.
# ---------------------------------------------------------------------------
_LSH_PLANES = 8
_LSH_DIM = 64


def _lsh_sig_sql(col: str) -> str:
    terms = []
    for p in range(_LSH_PLANES):
        consts = ", ".join(
            repr(simsearch._md5_unit("huckli", p, i)) for i in range(_LSH_DIM)
        )
        terms.append(
            f"CASE WHEN list_dot_product({col}, [{consts}]) > 0"
            f" THEN {1 << p} ELSE 0 END"
        )
    return " + ".join(terms)


_COS = (
    "list_dot_product(qv, nv)"
    " / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv)))"
)


@query(
    "q_ann_lsh",
    f"""
    WITH sig AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             {_lsh_sig_sql('embedding::DOUBLE[]')} AS bucket
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, v AS qv, bucket FROM sig WHERE vec_id < 10
    ), c AS (
      SELECT vec_id AS neighbor_id, v AS nv, bucket FROM sig
    ), sims AS (
      SELECT query_id, neighbor_id, {sql_fround(_COS, 6)} AS cos_sim
      FROM q JOIN c USING (bucket)
      WHERE neighbor_id <> query_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT query_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM sims
    ) WHERE rank <= 5
    """,
    doc="LSH-bucketed approximate top-5 neighbors (8 hyperplanes): "
    "bucket equi-join replaces the cross product.",
)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    em = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    sigs = simsearch.lsh_assign(em, n_planes=_LSH_PLANES, dim=_LSH_DIM)
    q = sigs.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qv"),
        simsearch.l2_norm("embedding").alias("__nq"), "bucket",
    )
    c = sigs.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("__nv"),
        simsearch.l2_norm("embedding").alias("__nn"), "bucket",
    )
    # Scale: the corpus side shuffles on bucket (or stays put with a
    # broadcast query side); candidate count per query ~ n / 2^planes.
    # Norms are per-vector columns (bit-identical sims, one O(d) fold
    # per candidate instead of three).
    sims = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            fround(
                simsearch.dot("__qv", "__nv")
                / (F.col("__nq") * F.col("__nn")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# salted join — skew pattern proven result-neutral against a plain join
# ---------------------------------------------------------------------------
@query(
    "q_salted_join",
    f"""
    WITH ua AS (
      SELECT user_id,
             {sql_fround('sum(value) * 1.0 / count(*)', 6)} AS user_avg
      FROM events GROUP BY user_id
    )
    SELECT e.event_type,
           count(*) AS n,
           {sql_fround('sum(e.value * ua.user_avg)', 2)} AS weighted
    FROM events e JOIN ua USING (user_id)
    GROUP BY e.event_type
    """,
    doc="hot-key salted join (operators.skew.salted_join, 8 salts: big "
    "side salted per row, small side replicated, join on (key, salt)) "
    "hash-matched against the ORACLE'S PLAIN JOIN — the gate proves "
    "salting is result-neutral, which is the whole point of the "
    "pattern. Use when both sides are too big to broadcast and one "
    "has hot keys; AQE's skew split covers the sort-merge case.",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.skew import salted_join

    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "value")
    # exact sum/count division, not avg(): the repo's standard shape
    # for cross-engine float parity (see q_token_count)
    ua = ev.groupBy("user_id").agg(
        fround(F.sum("value") * F.lit(1.0) / F.count("*"), 6).alias("user_avg")
    )
    joined = salted_join(ev, ua, on="user_id", n_salts=8)
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        fround(F.sum(F.col("value") * F.col("user_avg")), 2).alias("weighted"),
    )


@query(
    "q_two_phase_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="hot-key-safe exact count-distinct "
    "(operators.skew.two_phase_distinct_count: shuffle on "
    "(key, value) first so a hot key spreads across the cluster, "
    "then count deduped rows per key) hash-matched against the "
    "oracle's plain COUNT(DISTINCT) — result-neutrality of the "
    "two-phase rewrite is the gated claim. This is the holistic-"
    "aggregate analog of q_salted_join's join-side guarantee.",
)
def q_two_phase_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.skew import two_phase_distinct_count

    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_partkey")
    return two_phase_distinct_count(
        li, ["l_returnflag"], "l_partkey", out_col="n_parts"
    )


# ---------------------------------------------------------------------------
# Incremental rollup maintenance — mergeable partial-aggregate states
# ---------------------------------------------------------------------------
@query(
    "q_incremental_rollup",
    f"""
    SELECT event_type,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           count(*) AS n,
           {sql_fround('sum(value)')} AS total_value,
           {sql_fround('sum(value) / count(*)', 6)} AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="incremental rollup maintenance: the Spark side materializes a "
    "(count, sum) partial-state table from events BEFORE a cutoff, "
    "then merges the post-cutoff batch's states into it — the "
    "mergeable-aggregate pattern that keeps a 100 TB dashboard rollup "
    "fresh by touching only the new batch, never rescanning history. "
    "The oracle is the full recompute; the gate proves state merge == "
    "recompute exactly (avg derives from merged sum/count, never "
    "averaged averages). One shuffle per batch, state is O(groups).",
)
def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")

    def states(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type", day).agg(
            F.count("*").alias("n"), F.sum("value").alias("sv")
        )

    # historical state table (materialized once in production)...
    cutoff = ev.agg(F.min("ts")).first()[0]
    import datetime as _dt

    split = cutoff + _dt.timedelta(days=2)
    hist = states(ev.where(F.col("ts") < F.lit(split)))
    # ...merged with the new batch's states: same shape, re-agg on key
    batch = states(ev.where(F.col("ts") >= F.lit(split)))
    merged = (
        hist.unionByName(batch)
        .groupBy("event_type", "day")
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    )
    return merged.select(
        "event_type",
        "day",
        "n",
        fround(F.col("sv")).alias("total_value"),
        fround(F.col("sv") / F.col("n"), 6).alias("avg_value"),
    )


# ---------------------------------------------------------------------------
# Product-analytics shapes: ordered funnel, cohort retention
# ---------------------------------------------------------------------------
@query(
    "q_funnel",
    """
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events
    ), v AS (
      SELECT user_id, min(CASE WHEN event_type = 'view' THEN us END) AS v_us
      FROM e GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.us) AS c_us
      FROM e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND v.v_us IS NOT NULL
        AND e.us > v.v_us AND e.us <= v.v_us + 604800000000
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.us) AS p_us
      FROM e JOIN c ON c.user_id = e.user_id
      JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'purchase'
        AND e.us > c.c_us AND e.us <= v.v_us + 604800000000
      GROUP BY e.user_id
    )
    SELECT v.user_id,
           CAST(CASE WHEN p.p_us IS NOT NULL THEN 3
                     WHEN c.c_us IS NOT NULL THEN 2
                     ELSE 1 END AS BIGINT) AS stage
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    WHERE v.v_us IS NOT NULL
    """,
    doc="ordered funnel (view -> click -> purchase within 7 days of "
    "first view): per-user furthest stage reached, with strict event "
    "ordering — the sequential-pattern workload. Three grouped "
    "aggregations + broadcast-size joins on user_id; one shuffle key "
    "throughout, no window over raw events.",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    HORIZON = 604_800_000_000  # 7 days in micros
    v = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("us"))).alias("v_us")
    )
    c = (
        ev.join(v, "user_id")
        .where(
            (F.col("event_type") == "click")
            & F.col("v_us").isNotNull()
            & (F.col("us") > F.col("v_us"))
            & (F.col("us") <= F.col("v_us") + HORIZON)
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("c_us"))
    )
    p = (
        ev.join(c, "user_id")
        .join(v, "user_id")
        .where(
            (F.col("event_type") == "purchase")
            & (F.col("us") > F.col("c_us"))
            & (F.col("us") <= F.col("v_us") + HORIZON)
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"))
    )
    return (
        v.where(F.col("v_us").isNotNull())
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("p_us").isNotNull(), 3)
            .when(F.col("c_us").isNotNull(), 2)
            .otherwise(1)
            .cast("long")
            .alias("stage"),
        )
    )


@query(
    "q_retention",
    f"""
    WITH s AS (
      SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), act AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    ), m AS (
      SELECT s.cohort_day, datediff('day', s.cohort_day, act.d) AS offset_days,
             act.user_id
      FROM s JOIN act ON act.user_id = s.user_id
      WHERE datediff('day', s.cohort_day, act.d) BETWEEN 0 AND 7
    ), cohorts AS (
      SELECT cohort_day, count(*) AS n_cohort FROM s GROUP BY cohort_day
    )
    SELECT strftime(m.cohort_day, '%Y-%m-%d') AS cohort,
           CAST(m.offset_days AS BIGINT) AS offset_days,
           count(DISTINCT m.user_id) AS n_active,
           CAST(min(c.n_cohort) AS BIGINT) AS n_cohort,
           {sql_fround('count(DISTINCT m.user_id) * 1.0 / min(c.n_cohort)', 4)}
             AS retention
    FROM m JOIN cohorts c ON c.cohort_day = m.cohort_day
    GROUP BY m.cohort_day, m.offset_days
    """,
    doc="cohort retention matrix: users cohorted by signup day, "
    "fraction active on each of the next 7 days — the classic "
    "warehouse engagement workload. Distinct daily actives partial-agg "
    "before the cohort join; shuffle keys are user_id then "
    "(cohort, offset).",
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(day).alias("cohort_day"))
    )
    act = ev.select("user_id", day.alias("d")).distinct()
    m = (
        s.join(act, "user_id")
        .withColumn("offset_days", F.datediff(F.col("d"), F.col("cohort_day")))
        .where(F.col("offset_days").between(0, 7))
    )
    cohorts = s.groupBy("cohort_day").agg(F.count("*").alias("n_cohort"))
    return (
        m.join(cohorts, "cohort_day")
        .groupBy("cohort_day", "offset_days")
        .agg(
            F.count_distinct("user_id").alias("n_active"),
            F.min("n_cohort").alias("n_cohort"),
        )
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"),
            F.col("offset_days").cast("long").alias("offset_days"),
            "n_active",
            "n_cohort",
            fround(F.col("n_active") * 1.0 / F.col("n_cohort"), 4).alias("retention"),
        )
    )


# ---------------------------------------------------------------------------
# FULL OUTER join — the one join type the surface lacked
# ---------------------------------------------------------------------------
@query(
    "q_full_outer_join",
    f"""
    WITH c AS (
      SELECT c_custkey, c_name FROM customer WHERE c_nationkey < 10
    ), o AS (
      SELECT o_custkey, count(*) AS n_orders,
             {sql_fround('sum(o_totalprice)')} AS total
      FROM orders GROUP BY o_custkey
    )
    SELECT coalesce(c.c_custkey, o.o_custkey) AS cust_key,
           c.c_name,
           CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
           coalesce(o.total, 0.0) AS total
    FROM c FULL OUTER JOIN o ON o.o_custkey = c.c_custkey
    """,
    doc="FULL OUTER join: nation-filtered customer dim vs per-customer "
    "order aggregates — unmatched rows survive on BOTH sides "
    "(customers with no orders, orders whose customer fell out of the "
    "filter). Null-padding and key coalescing verified by hash. "
    "Scale: the aggregate side partial-aggs before one shuffle; full "
    "outer forces a shuffle join (no broadcast) — exactly what Spark "
    "plans.",
)
def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_nationkey") < 10)
        .select("c_custkey", "c_name")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            fround(F.sum("o_totalprice")).alias("total"),
        )
    )
    j = c.join(o, c["c_custkey"] == o["o_custkey"], "full_outer")
    return j.select(
        F.coalesce(F.col("c_custkey"), F.col("o_custkey")).alias("cust_key"),
        "c_name",
        F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias("n_orders"),
        F.coalesce(F.col("total"), F.lit(0.0)).alias("total"),
    )


# ---------------------------------------------------------------------------
# hopping (sliding) window aggregation — width 60 min, slide 15 min
# ---------------------------------------------------------------------------
@query(
    "q_hopping_window",
    f"""
    WITH e AS (
      SELECT epoch_us(ts) AS us,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vm
      FROM events
    ), h AS (
      -- width = 4 x slide, so every event lands in exactly 4 hops
      SELECT us - (us % 900000000) - CAST(k AS BIGINT) * 900000000 AS start_us, vm
      FROM e, unnest([0, 1, 2, 3]) AS t(k)
    )
    SELECT start_us, count(*) AS n,
           {sql_fround('CAST(sum(vm) AS DOUBLE) / 1000000', 4)} AS sum_value
    FROM h GROUP BY 1
    """,
    doc="hopping/sliding event-time windows (60-min width, 15-min "
    "slide) via the built-in window(ts, width, slide): each event "
    "expands to width/slide=4 hops BEFORE the shuffle, partial "
    "aggregation collapses per hop map-side. Values sum as fixed-point "
    "micros (exact integer aggregation) for engine portability. The "
    "batch twin of the streaming sliding windows in streaming/windows.",
)
def q_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    vm = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long")
    w = F.window("ts", "60 minutes", "15 minutes")
    return (
        e.select(w.alias("win"), vm.alias("vm"))
        .groupBy(F.unix_micros("win.start").alias("start_us"))
        .agg(
            F.count("*").alias("n"),
            fround(
                F.sum(F.col("vm").cast("decimal(38,0)")).cast("double") / 1000000,
                4,
            ).alias("sum_value"),
        )
    )


# ----------------------------------------------------------- RFM segments
# Classic recency/frequency/monetary customer segmentation: per-metric
# quintiles via ntile(5) over a TOTAL order (metric + custkey
# tiebreak, so bucket boundaries are engine-portable), then a
# rule-based segment label. Monetary sums in exact cents.
@query(
    "q_rfm_segments",
    """
    WITH base AS (
      SELECT o_custkey AS custkey,
             max(CAST(o_orderdate AS DATE)) AS last_order,
             count(*) AS frequency,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS monetary_cents
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT custkey, frequency, monetary_cents,
             ntile(5) OVER (ORDER BY last_order ASC, custkey) AS r_score,
             ntile(5) OVER (ORDER BY frequency ASC, custkey) AS f_score,
             ntile(5) OVER (ORDER BY monetary_cents ASC, custkey) AS m_score
      FROM base
    )
    SELECT custkey,
           CAST(frequency AS BIGINT) AS frequency,
           monetary_cents,
           CAST(r_score AS INT) AS r_score,
           CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CASE
             WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
               THEN 'champion'
             WHEN r_score >= 4 AND f_score >= 3 THEN 'loyal'
             WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
             WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
             ELSE 'regular' END AS segment
    FROM scored
    """,
    doc="RFM customer segmentation: recency/frequency/monetary "
    "quintiles (ntile over metric + custkey — a total order, so the "
    "count-balanced bucket boundaries are engine-portable) and a "
    "rule-based segment label per customer — the lifecycle-marketing "
    "primitive. Monetary is exact integer cents. Scale: one custkey "
    "aggregate; the three ntiles are global sorts over the CUSTOMER "
    "relation (orders-of-magnitude smaller than the fact table; at "
    "100 TB swap for approx-quantile cut points with a documented "
    "tolerance).",
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.to_date("o_orderdate")).alias("last_order"),
        F.count("*").alias("frequency"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        )
        .cast("long")
        .alias("monetary_cents"),
    )
    # round-8 continuation: the three quintiles used global-window
    # ntile — ONE task over the whole customer relation each.
    # exact_ntile (ascending form) is the distributed decomposition,
    # bit-identical to ntile over (metric ASC, custkey); the oracle
    # below keeps plain NTILE, so the green hash PROVES equivalence.
    from huckli_spark.operators.skew import exact_ntile

    scored = base
    for col, out in (("last_order", "r_score"), ("frequency", "f_score"),
                     ("monetary_cents", "m_score")):
        scored = exact_ntile(scored, 5, score_col=col, id_col="custkey",
                             out_col=out, ascending=True)
    scored = scored.select(
        "custkey",
        F.col("frequency").cast("long").alias("frequency"),
        "monetary_cents",
        F.col("r_score").cast("int").alias("r_score"),
        F.col("f_score").cast("int").alias("f_score"),
        F.col("m_score").cast("int").alias("m_score"),
    )
    seg = (
        F.when(
            (F.col("r_score") >= 4)
            & (F.col("f_score") >= 4)
            & (F.col("m_score") >= 4),
            "champion",
        )
        .when((F.col("r_score") >= 4) & (F.col("f_score") >= 3), "loyal")
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 4), "at_risk")
        .when(
            (F.col("r_score") <= 2) & (F.col("f_score") <= 2), "hibernating"
        )
        .otherwise("regular")
    )
    return scored.withColumn("segment", seg)


# ------------------------------------------------------- ship-lag histogram
# Order-to-ship lag distribution per order priority: join + datediff +
# clamped yearly buckets. (The fixture's dates are independent, so the
# lag spans +/-7 years — the HISTOGRAM mechanics, bucket clamping and
# exact integer day-sums are the point, not logistics realism.)
@query(
    "q_ship_lag",
    f"""
    SELECT o.o_orderpriority,
           CAST(greatest(least(
             CAST(floor(datediff('day', CAST(o.o_orderdate AS DATE),
                                 CAST(l.l_shipdate AS DATE)) / 365.0)
                  AS BIGINT), 7), -7) AS BIGINT) AS lag_years,
           CAST(count(*) AS BIGINT) AS n_lines,
           {sql_fround(
               "CAST(sum(datediff('day', CAST(o.o_orderdate AS DATE),"
               " CAST(l.l_shipdate AS DATE))) AS DOUBLE) / count(*)", 4
           )} AS avg_lag_days
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
    """,
    doc="order-to-ship lag histogram per order priority (clamped "
    "yearly buckets, exact integer day sums — floor(x/365.0) on both "
    "engines, because DuckDB's integer // truncates toward zero "
    "while Spark floors, which splits the negative-lag buckets). Scale: one equi-join shuffle on orderkey (orders side "
    "broadcastable at fixture scale, bucketed co-location at 100 TB) "
    "+ one bounded (priority x bucket) aggregate.",
)
def q_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("ship")
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("od")
    )
    j = li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
    lag = F.datediff(F.col("ship"), F.col("od"))
    bucket = F.greatest(
        F.least(F.floor(lag / 365).cast("long"), F.lit(7)), F.lit(-7)
    )
    return (
        j.select("o_orderpriority", lag.alias("lag"), bucket.alias("lag_years"))
        .groupBy("o_orderpriority", "lag_years")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            fround(
                F.sum("lag").cast("double") / F.count("*"), 4
            ).alias("avg_lag_days"),
        )
    )
