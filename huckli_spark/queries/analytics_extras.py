"""Round-5 analytics additions: count-min heavy hitters, weighted
priority sampling, and fixed-point z-score outlier detection.

Portability notes (the driver hashes every value):
- count-min is pure integer arithmetic over h60 — bit-identical.
- the weighted sampler ranks on a ROUNDED key (fround 9) with an id
  tiebreak, the same discipline q_tfidf_terms uses for its ln-derived
  score — engines agree unless an ulp lands exactly on a rounding
  boundary (~1e-12 per value).
- z-scores need mean/stddev, but summing doubles is partition-order
  dependent; instead values become fixed-point micro units (BIGINT),
  summed exactly (decimal(38) on Spark, HUGEINT on DuckDB), and only
  the final moments convert to double — identical IEEE arithmetic on
  identical exact integers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from huckli_spark.functions.portable import fround, h60, sql_fround, sql_h60
from huckli_spark.operators import freq
from huckli_spark.queries import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    # value/user_id/event_type only — no timestamp handling needed
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "user_id", "event_type", "value"
    )


# ------------------------------------------------------------- count-min
@query(
    "q_countmin_topk",
    f"""
    WITH sketch AS (
      {freq.sql_cms_build_cte(
          "SELECT unnest(string_split(text, ' ')) AS key FROM documents")}
    ), truth AS (
      SELECT w AS key, count(*) AS true_cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY 1
    ), probes AS (
      SELECT key, true_cnt, unnest([{", ".join(
          f"{{'row': {r}, 'bucket': {freq.sql_cms_bucket('key', r, freq.CMS_W)}}}"
          for r in range(freq.CMS_D))}]) AS c
      FROM truth
    ), est AS (
      SELECT p.key, p.true_cnt, min(coalesce(s.cnt, 0)) AS est
      FROM probes p LEFT JOIN sketch s
        ON s.row = c.row AND s.bucket = c.bucket
      GROUP BY 1, 2
    ), ranked AS (
      SELECT key, est, true_cnt, est - true_cnt AS overestimate,
             row_number() OVER (ORDER BY est DESC, key) AS rnk
      FROM est
    )
    SELECT key, est, true_cnt, overestimate, rnk FROM ranked WHERE rnk <= 20
    """,
    doc="count-min sketch heavy hitters over the corpus token stream: "
    "a 4x256 counter matrix (fixed size regardless of cardinality, "
    "cell-wise mergeable), min-over-rows estimates, exact counts "
    "alongside so the gate hashes the overestimation error itself. "
    "est >= true_cnt is structural. Sketch broadcastable; top-k is "
    "TakeOrderedAndProject, no global sort.",
)
def q_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = _docs(spark, sf_dir).select(
        F.explode(F.split("text", " ")).alias("w")
    )
    return freq.cms_heavy_hitters(words, "w", k=20).withColumnRenamed("w", "key")


# ------------------------------------------------- weighted priority sample
_WS_K = 100


@query(
    "q_weighted_sample",
    f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             ({sql_h60("'samp:' || CAST(doc_id AS VARCHAR)")} % 1000000 + 1)
               / 1000001.0 AS u
      FROM documents
    ), scored AS (
      SELECT doc_id, n_chars,
             {sql_fround('-ln(u) / n_chars', 9)} AS priority
      FROM keyed
    )
    SELECT doc_id, n_chars, priority,
           row_number() OVER (ORDER BY priority, doc_id) AS rnk
    FROM scored
    ORDER BY priority, doc_id
    LIMIT {_WS_K}
    """,
    doc="weighted sampling without replacement (Efraimidis-Spirakis "
    "A-ES by exponential priority): u from the portable hash, key "
    "-ln(u)/weight, keep the k smallest — inclusion probability "
    "proportional to n_chars. Deterministic, retry-safe, and "
    "partitioning-invariant; top-k by rounded key compiles to "
    "TakeOrderedAndProject. The training-mix primitive when strata "
    "weights are continuous rather than categorical.",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    u = (
        F.pmod(h60(F.concat(F.lit("samp:"), F.col("doc_id").cast("string"))),
               F.lit(1000000))
        + 1
    ) / F.lit(1000001.0)
    scored = d.select(
        "doc_id",
        "n_chars",
        fround(-F.log(u) / F.col("n_chars"), 9).alias("priority"),
    )
    top = scored.orderBy("priority", "doc_id").limit(_WS_K)
    rk = F.row_number().over(Window.orderBy("priority", "doc_id"))
    return top.withColumn("rnk", rk)


# ----------------------------------------------------------------- pagerank
_EDGE_SQL = """
  SELECT src, dst, count(*) AS weight FROM (
    SELECT event_type AS dst,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS src
    FROM events
  ) WHERE src IS NOT NULL GROUP BY 1, 2
"""


def _pagerank_oracle() -> str:
    from huckli_spark.operators.graph import sql_pagerank

    return sql_pagerank(_EDGE_SQL, damping=0.85, iterations=3)


@query(
    "q_pagerank",
    _pagerank_oracle(),  # generated unrolled-iteration oracle
    doc="PageRank over the per-user event-type transition graph "
    "(link-analysis quality prior; generic over any (src,dst,weight) "
    "edges — for web corpora the edges are host hyperlinks). Ranks "
    "are micro fixed-point BIGINTs: per-edge contributions floor to "
    "integers and per-node accumulation is exact integer summation, "
    "so all 3 damped iterations (with dangling-mass redistribution) "
    "are bit-identical on any engine/partitioning. One shuffle per "
    "iteration + broadcast rank vector; edge extraction is a per-user "
    "window.",
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.graph import pagerank, transition_edges
    from huckli_spark.session import load_table

    events = load_table(spark, sf_dir, "events")
    edges = transition_edges(events)
    return pagerank(edges, damping=0.85, iterations=3)


# --------------------------------------------------------- z-score outliers
@query(
    "q_zscore_outliers",
    f"""
    WITH m AS (
      SELECT event_id, event_type,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vm
      FROM events
    ), stats AS (
      SELECT event_type,
             count(*) AS n,
             CAST(sum(vm) AS DOUBLE) AS s1,
             CAST(sum(vm * vm) AS DOUBLE) AS s2
      FROM m GROUP BY 1
    ), z AS (
      SELECT m.event_id, m.event_type,
             {sql_fround('m.vm / 1000000.0', 4)} AS value_r,
             {sql_fround(
                 '(m.vm - s.s1 / s.n)'
                 ' / sqrt((s.s2 - s.s1 * s.s1 / s.n) / s.n)', 4)} AS z
      FROM m JOIN stats s USING (event_type)
    )
    SELECT event_id, event_type, value_r, z
    FROM z WHERE abs(z) > 2
    """,
    doc="per-group z-score outlier detection with ORDER-INDEPENDENT "
    "moments: values become fixed-point micro ints, the two sums are "
    "exact integer aggregation (decimal(38) / HUGEINT), and only the "
    "final mean/std/z computation runs in double — so the result is "
    "partition-count-invariant AND engine-portable, which naive "
    "sum(double) is not. One shuffle on event_type (map-combined); "
    "the stats relation broadcasts back onto the row stream.",
)
def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_raw(spark, sf_dir)
    m = e.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long").alias("vm"),
    )
    stats = m.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("vm").cast("decimal(38,0)")).cast("double").alias("s1"),
        F.sum((F.col("vm") * F.col("vm")).cast("decimal(38,0)"))
        .cast("double")
        .alias("s2"),
    )
    z_expr = (F.col("vm") - F.col("s1") / F.col("n")) / F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / F.col("n")
    )
    z = m.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        fround(F.col("vm") / 1000000.0, 4).alias("value_r"),
        fround(z_expr, 4).alias("z"),
    )
    return z.where(F.abs(F.col("z")) > 2)


# ------------------------------------------------------------- fuzzy join
_FUZZY_PLANT = (
    "CASE WHEN p_partkey % 7 = 0 THEN substr(p_name, 1, 2) ||"
    " substr(p_name, 4, length(p_name))"
    " WHEN p_partkey % 7 = 1 THEN p_name || 'x'"
    " ELSE p_name END"
)


@query(
    "q_fuzzy_join",
    f"""
    WITH named AS (
      SELECT p_partkey, {_FUZZY_PLANT} AS name
      FROM part WHERE p_partkey <= 600
    ), v AS (
      SELECT DISTINCT p_partkey, name,
             {sql_h60('var')} AS vh
      FROM (
        SELECT p_partkey, name,
               unnest(list_distinct(list_prepend(name,
                 list_transform(range(1, length(name) + 1),
                   i -> substr(name, 1, i - 1)
                        || substr(name, i + 1, length(name)))))) AS var
        FROM named
      )
    ), cand AS (
      SELECT DISTINCT a.p_partkey AS a_id, b.p_partkey AS b_id,
                      a.name AS a, b.name AS b
      FROM v a JOIN v b ON a.vh = b.vh AND a.p_partkey < b.p_partkey
    )
    SELECT a_id, b_id, a, b,
           CAST(levenshtein(a, b) AS INTEGER) AS dist
    FROM cand WHERE levenshtein(a, b) <= 1
    """,
    doc="fuzzy entity-resolution join (edit distance <= 1) via "
    "SymSpell deletion-neighborhood blocking: variants join on the "
    "8-byte portable hash, exact levenshtein verifies candidates only "
    "— never all pairs. Typos are planted deterministically on the "
    "part-name fixture (both engines identically) so the pair set is "
    "non-trivial; both engines' levenshtein agree exactly. At corpus "
    "scale the hot-variant guard (max_variant_freq) bounds the join.",
)
def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.dedup import fuzzy_pairs
    from huckli_spark.session import load_table

    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_partkey") <= 600)
        .select(
            "p_partkey",
            F.expr(_FUZZY_PLANT.replace("substr(", "substring(")).alias("name"),
        )
    )
    out = fuzzy_pairs(p, id_col="p_partkey", str_col="name", max_dist=1)
    return out.select(
        F.col("a_id"), F.col("b_id"), "a", "b", F.col("dist").cast("int")
    )


# ----------------------------------------------------------- graph: triangles
@query(
    "q_triangle_count",
    """
    WITH l AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
      WHERE l_quantity > 40
    ), e AS (
      SELECT DISTINCT a.l_suppkey AS s1, b.l_suppkey AS s2
      FROM l a JOIN l b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ), t AS (
      SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
      FROM e e1
      JOIN e e2 ON e2.s1 = e1.s2
      JOIN e e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
    )
    SELECT CAST(v AS BIGINT) AS suppkey,
           CAST(count(*) AS BIGINT) AS n_triangles
    FROM (
      SELECT a AS v FROM t
      UNION ALL SELECT b FROM t
      UNION ALL SELECT c FROM t
    ) GROUP BY v
    """,
    doc="per-node triangle counting over the supplier co-supply graph "
    "(suppliers sharing an order, high-quantity lines only) — the "
    "classic clustering-coefficient building block, as the canonical "
    "two-equi-join distributed plan: oriented edges (s1 < s2) make "
    "each triangle appear exactly once as a<b<c, wedges build on the "
    "shared middle vertex, the closing edge is an equi-join. Scale: "
    "all joins shuffle on vertex keys; degree skew is the known "
    "hazard — the standard mitigation (orient edges by degree) drops "
    "in without changing the output.",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.session import load_table

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 40)
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    e = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("s1"), F.col("b.l_suppkey").alias("s2")
        )
        .distinct()
    )
    from huckli_spark.operators.graph import triangles_per_node

    # id-oriented form (the oracle's twin); triangles_per_node also
    # offers the degree-oriented skew mitigation, pinned equal in
    # tests/test_graph.py
    return triangles_per_node(e).select(
        F.col("v").cast("long").alias("suppkey"), "n_triangles"
    )


# ------------------------------------------------------------ graph: k-core
_KCORE_K = 5
_KCORE_ITERS = 6  # measured converged by round 5 at sf0.01 (SCALE.md)


def _kcore_oracle() -> str:
    parts = [
        """l AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
      WHERE l_quantity > 47
    ), e AS MATERIALIZED (
      SELECT DISTINCT a.l_suppkey AS s1, b.l_suppkey AS s2
      FROM l a JOIN l b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ), e0 AS MATERIALIZED (
      SELECT s1 AS v, s2 AS w FROM e UNION ALL SELECT s2, s1 FROM e
    )"""
    ]
    # MATERIALIZED: every round references its predecessor 3x — the
    # same 3^n re-inlining hazard the Spark side cuts with
    # localCheckpoint
    for i in range(_KCORE_ITERS):
        parts.append(
            f"""d{i} AS (
      SELECT v, count(*) AS d FROM e{i} GROUP BY v
    ), k{i} AS MATERIALIZED (
      SELECT v FROM d{i} WHERE d >= {_KCORE_K}
    ), e{i + 1} AS MATERIALIZED (
      SELECT x.v, x.w FROM e{i} x
      JOIN k{i} a ON a.v = x.v
      JOIN k{i} b ON b.v = x.w
    )"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
    SELECT CAST(v AS BIGINT) AS suppkey,
           CAST(count(*) AS BIGINT) AS core_deg
    FROM e{_KCORE_ITERS} GROUP BY v"""
    )


@query(
    "q_kcore",
    _kcore_oracle(),
    doc=f"k-core decomposition (k={_KCORE_K}) of the supplier co-supply "
    "graph (l_quantity > 47 lines): iteratively peel nodes with "
    "degree below k until the dense core remains — the standard "
    "graph-mining primitive for community cores / spam-cluster "
    f"detection. {_KCORE_ITERS} unrolled rounds (measured converged "
    "by round 5 at gate scale; each round is a monotone shrink, so "
    "the count is deterministic), oracle replays the identical "
    "rounds. Scale: one degree groupBy + two vertex-key equi-joins "
    "per round, O(iters * |E|) total, no wedge blowup; lineage cut "
    "every other round on the Spark side mirrors the oracle's "
    "MATERIALIZED CTEs (3 refs/round would otherwise re-analyze the "
    "base 3^iters times).",
)
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.graph import kcore
    from huckli_spark.session import load_table

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 47)
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    e = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("s1"), F.col("b.l_suppkey").alias("s2")
        )
        .distinct()
    )
    return kcore(e, k=_KCORE_K, iterations=_KCORE_ITERS).select(
        F.col("v").cast("long").alias("suppkey"), "core_deg"
    )


# ---------------------------------------------------------- table profiling
_PROFILE_NUM = ["l_quantity", "l_extendedprice", "l_discount"]
_PROFILE_STR = ["l_returnflag", "l_linestatus"]


def _profile_oracle() -> str:
    aggs = ["count(*) AS n_rows"]
    for c in _PROFILE_NUM + _PROFILE_STR:
        aggs += [
            f"sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS nn_{c}",
            f"count(DISTINCT {c}) AS nd_{c}",
            f"min({c}) AS mn_{c}",
            f"max({c}) AS mx_{c}",
        ]
    arms = []
    for c in _PROFILE_NUM:
        arms.append(
            f"SELECT '{c}' AS column, n_rows, CAST(nn_{c} AS BIGINT) AS n_nulls,"
            f" CAST(nd_{c} AS BIGINT) AS n_distinct,"
            f" CAST(mn_{c} AS DOUBLE) AS min_num, CAST(mx_{c} AS DOUBLE) AS max_num,"
            f" CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str"
            f" FROM a"
        )
    for c in _PROFILE_STR:
        arms.append(
            f"SELECT '{c}', n_rows, CAST(nn_{c} AS BIGINT), CAST(nd_{c} AS BIGINT),"
            f" CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), mn_{c}, mx_{c} FROM a"
        )
    return (
        "WITH a AS (SELECT "
        + ", ".join(aggs)
        + " FROM lineitem)\n"
        + "\nUNION ALL ".join(arms)
    )


@query(
    "q_profile_table",
    _profile_oracle(),
    doc="column-level data-quality profile of lineitem (row count, "
    "null count, exact distinct count, typed min/max per column) — "
    "the audit summary a pipeline runs before admitting a new data "
    "drop into the training mix. ONE aggregate pass computes every "
    "metric (column-pruned scan, map-side combine); the per-column "
    "rows are an in-row inline() over the single aggregate row, so "
    "profiling a 100 TB table costs exactly one scan. Exact distinct "
    "counts shuffle per column; the approx_count_distinct swap is "
    "one word when 2%% error is acceptable (q_approx_distinct).",
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count("*").alias("n_rows")]
    for c in _PROFILE_NUM + _PROFILE_STR:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"nd_{c}"),
            F.min(c).alias(f"mn_{c}"),
            F.max(c).alias(f"mx_{c}"),
        ]
    a = li.agg(*aggs)
    structs = []
    for c in _PROFILE_NUM:
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("n_rows"),
                F.col(f"nn_{c}").cast("long").alias("n_nulls"),
                F.col(f"nd_{c}").cast("long").alias("n_distinct"),
                F.col(f"mn_{c}").cast("double").alias("min_num"),
                F.col(f"mx_{c}").cast("double").alias("max_num"),
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            )
        )
    for c in _PROFILE_STR:
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("n_rows"),
                F.col(f"nn_{c}").cast("long").alias("n_nulls"),
                F.col(f"nd_{c}").cast("long").alias("n_distinct"),
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
                F.col(f"mn_{c}").alias("min_str"),
                F.col(f"mx_{c}").alias("max_str"),
            )
        )
    return a.select(F.inline(F.array(*structs)))


# -------------------------------------------------------------- event funnel
@query(
    "q_event_funnel",
    """
    WITH v AS (
      SELECT user_id, min(epoch_us(ts)) AS t1
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t2
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
        AND epoch_us(e.ts) <= v.t1 + 86400000000
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t3
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
        AND epoch_us(e.ts) <= c.t2 + 86400000000
      GROUP BY e.user_id
    )
    SELECT CAST(1 AS INT) AS step, 'view' AS event_type,
           CAST(count(*) AS BIGINT) AS n_users FROM v
    UNION ALL
    SELECT 2, 'click', count(*) FROM c
    UNION ALL
    SELECT 3, 'purchase', count(*) FROM p
    """,
    doc="ordered funnel analysis (view -> click -> purchase, max 24 h "
    "between steps): a user advances a step only with an event "
    "STRICTLY AFTER their earliest completion of the previous step "
    "and within the conversion window — the earliest-continuation "
    "semantics product-analytics engines implement (min-timestamp "
    "chaining, not mere per-type existence); the window makes the "
    "funnel genuinely selective (150 -> 60 -> 25 at gate scale). "
    "All arithmetic is exact "
    "integer epoch-micros. Scale: each stage is one groupBy(user) on "
    "the already-filtered event slice joined to the (shrinking) "
    "survivor set — cost O(events of that type), survivors broadcast "
    "as the funnel narrows.",
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("__us")
    )
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("__us").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .where(
            (F.col("__us") > F.col("t1"))
            & (F.col("__us") <= F.col("t1") + 86400000000)
        )
        .groupBy("user_id")
        .agg(F.min("__us").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .where(
            (F.col("__us") > F.col("t2"))
            & (F.col("__us") <= F.col("t2") + 86400000000)
        )
        .groupBy("user_id")
        .agg(F.min("__us").alias("t3"))
    )

    def n(df, step, et):
        return df.agg(
            F.lit(step).cast("int").alias("step"),
            F.lit(et).alias("event_type"),
            F.count("*").cast("long").alias("n_users"),
        )

    return n(v, 1, "view").unionByName(n(c, 2, "click")).unionByName(
        n(p, 3, "purchase")
    )


# ---------------------------------------------------------------- event paths
@query(
    "q_event_paths",
    """
    WITH seq AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM (
        SELECT user_id, event_type, ts, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
      ) WHERE rn <= 5
      GROUP BY user_id
    )
    , counts AS (
      SELECT path, count(*) AS n_users FROM seq GROUP BY path
    ), ranked AS (
      SELECT path, n_users,
             row_number() OVER (ORDER BY n_users DESC, path) AS rnk
      FROM counts
    )
    SELECT path, CAST(n_users AS BIGINT) AS n_users,
           CAST(rnk AS INT) AS rank
    FROM ranked WHERE rnk <= 10
    """,
    doc="clickstream path mining: each user's first five events (total "
    "order: ts then event_id) concatenate into a path string, then "
    "the 10 most common paths — the session-flow analysis marketing/"
    "product engines run. Path assembly is deterministic because the "
    "sort key includes the unique event_id (no ties), so the string "
    "itself is hash-portable. Scale: one window over (user, ts) + one "
    "count shuffle over O(distinct paths); top-k is a bounded window.",
)
def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("__us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("__us", "event_id")
    first5 = ev.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= 5
    )
    seq = first5.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("__us", "event_id", "event_type")
                    )
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    wp = Window.orderBy(F.desc("n_users"), F.asc("path"))
    return (
        seq.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_users"))
        .withColumn("rank", F.row_number().over(wp).cast("int"))
        .where(F.col("rank") <= 10)
    )
