"""TPC-H battery completion — the 10 query shapes (Q1-Q5, Q9, Q12,
Q16, Q20, Q21) missing from the earlier waves, adapted to the
fixture's reduced schema. With the 12 shapes already gated
(Q6/7/8/10/11/13/14/15/17/18/19/22) this closes ALL 22 TPC-H query
shapes: the reference delegates its whole query surface to embedded
DuckDB (/root/reference/Cargo.toml:15), so "a user could run every
query they run today" includes the standard analytics battery.

Schema adaptations (the fixture has no partsupp table and no
commitdate/receiptdate/shipmode/shipinstruct/shippriority columns;
each adaptation keeps the SHAPE the query exists to exercise):

* Q2  — supply relation derived from lineitem (min unit price per
        part/supplier); keeps the correlated-scalar-MIN shape.
* Q4  — "late" = shipped > 30 days after order date (no commitdate);
        keeps the correlated non-equi EXISTS shape.
* Q9  — cost proxy = 50% of p_retailprice per unit (no
        ps_supplycost); keeps the multi-join profit-by-nation-by-year
        shape.
* Q12 — l_returnflag stands in for l_shipmode; late = >14-day ship
        lag; keeps the conditional two-way count pivot.
* Q16 — part/supplier pairs from lineitem; "complaint" suppliers =
        negative account balance; keeps the NOT-IN + distinct-count.
* Q20 — dominant supplier = shipped >30% of a part's annual volume
        (no ps_availqty); keeps the nested-IN-over-aggregate shape.
* Q21 — expressed as its decorrelated aggregate form (per-order
        supplier/late-supplier counts) rather than EXISTS+NOT EXISTS
        self-joins: identical semantics, and at 100 TB the one
        groupBy over (order, supplier) IS the plan the self-join form
        must be rewritten into anyway.

Money math follows the exact-cents discipline (floor(x*100+0.5) per
row, BIGINT sums) so no comparison rides on float summation order;
every float output goes through the engine-shared ``_fr`` rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from huckli_spark.queries import query
from huckli_spark.queries.sql_surface import _views

def _fr(expr: str, digits: int = 2) -> str:
    """Engine-shared rounding for SQL text that BOTH Spark and DuckDB
    execute: ``1eN`` / ``0.5e0`` literals are DOUBLE in both engines,
    whereas a plain ``100.0`` parses as DECIMAL in Spark SQL and flips
    bigint/decimal divisions into DECIMAL results (a kind mismatch at
    the gate). Values match functions.portable.sql_fround exactly."""
    s = f"1e{digits}"
    return f"(FLOOR(({expr}) * {s} + 0.5e0) / {s})"


_DISC_CENTS = (
    "CAST(floor(l_extendedprice * (1 - l_discount) * 1e2 + 0.5e0)"
    " AS BIGINT)"
)


def _sql(spark: SparkSession, sf_dir: str, tables: tuple[str, ...],
         text: str) -> DataFrame:
    _views(spark, sf_dir, *tables)
    return spark.sql(text)


# Q1 — pricing summary report ------------------------------------------------
_Q1 = f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           {_fr('sum(CAST(floor(l_extendedprice * 1e2 + 0.5e0) AS BIGINT)) / 1e2')} AS sum_base_price,
           {_fr(f'sum({_DISC_CENTS}) / 1e2')} AS sum_disc_price,
           {_fr('sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1e2 + 0.5e0) AS BIGINT)) / 1e2')} AS sum_charge,
           {_fr('sum(CAST(l_quantity AS BIGINT)) * 1e0 / count(*)', 6)} AS avg_qty,
           {_fr('(sum(CAST(floor(l_extendedprice * 1e2 + 0.5e0) AS BIGINT)) / 1e2) / count(*)', 6)} AS avg_price,
           {_fr('(sum(CAST(floor(l_discount * 1e6 + 0.5e0) AS BIGINT)) / 1e6) / count(*)', 6)} AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
"""


@query(
    "q_tpch_q1",
    _Q1,
    doc="TPC-H Q1 (pricing summary): the canonical wide-aggregate "
    "scan — four exact-cents sums, three averages derived from the "
    "same integer sums (never a float avg()), two group keys. The "
    "fixture's q_group_sum gated a reduced form since round 1; this "
    "is the full-column original. Scale: one scan, map-side partial "
    "agg, six-row result; the date filter reaches the parquet scan.",
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, ("lineitem",), _Q1)


# Q2 — minimum-cost supplier (adapted) ---------------------------------------
_Q2 = f"""
    WITH supply AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             min(CAST(floor(l_extendedprice / l_quantity * 1e2 + 0.5e0)
                      AS BIGINT)) AS unit_cents
      FROM lineitem GROUP BY 1, 2
    )
    SELECT {_fr('s.s_acctbal')} AS s_acctbal, s.s_name, n.n_name,
           p.p_partkey, {_fr('sp.unit_cents / 1e2')} AS supply_cost
    FROM part p
    JOIN supply sp ON sp.partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = sp.suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size = 15 AND p.p_type = 'PROMO' AND r.r_name = 'EUROPE'
      AND sp.unit_cents = (
        SELECT min(sp2.unit_cents)
        FROM supply sp2
        JOIN supplier s2 ON s2.s_suppkey = sp2.suppkey
        JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        WHERE sp2.partkey = p.p_partkey AND r2.r_name = 'EUROPE'
      )
"""


@query(
    "q_tpch_q2",
    _Q2,
    doc="TPC-H Q2 (minimum-cost supplier), supply relation derived "
    "from lineitem: for each qualifying part, keep only suppliers "
    "achieving the region-wide MINIMUM unit cost — the correlated "
    "scalar-MIN subquery Catalyst decorrelates into a per-part "
    "aggregate joined back. Unit cost is a per-row IEEE division "
    "floored to cents, so the min and the equality are exact "
    "integers on both engines. Scale: supply collapses lineitem to "
    "(part, supplier) once; the correlated min reuses it; dims "
    "broadcast.",
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark, sf_dir,
        ("lineitem", "part", "supplier", "nation", "region"), _Q2,
    )


# Q3 — shipping priority ------------------------------------------------------
_Q3 = f"""
    SELECT l_orderkey, {_fr(f'sum({_DISC_CENTS}) / 1e2')} AS revenue,
           o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1997-06-01'
      AND l_shipdate > TIMESTAMP '1997-06-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
"""


@query(
    "q_tpch_q3",
    _Q3,
    doc="TPC-H Q3 (shipping priority): segment-filtered 3-way join, "
    "revenue per unshipped order, top-10. The classic "
    "filter-join-agg-topk pipeline; l_orderkey added to the sort for "
    "a deterministic LIMIT under ties. Scale: both filters push to "
    "their scans, customer broadcasts, TakeOrderedAndProject bounds "
    "the result.",
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, ("customer", "orders", "lineitem"), _Q3)


# Q4 — order priority checking (adapted) --------------------------------------
_Q4 = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
"""


@query(
    "q_tpch_q4",
    _Q4,
    doc="TPC-H Q4 (order priority checking), late = shipped >30 days "
    "after the order date (the fixture has no commitdate): correlated "
    "EXISTS whose inner predicate references the OUTER column in a "
    "non-equality (l_shipdate > o_orderdate + 30d) — exercises "
    "Catalyst's DecorrelateInnerQuery on non-equi correlation, which "
    "plans as a semi join carrying the date condition. Scale: "
    "lineitem collapses through the semi join; the quarter filter "
    "prunes orders at the scan.",
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, ("orders", "lineitem"), _Q4)


# Q5 — local supplier volume ---------------------------------------------------
_Q5 = f"""
    SELECT n_name, {_fr(f'sum({_DISC_CENTS}) / 1e2')} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
"""


@query(
    "q_tpch_q5",
    _Q5,
    doc="TPC-H Q5 (local supplier volume): the 6-way snowflake join "
    "with the LOCAL constraint (customer and supplier share a "
    "nation) — the join-order benchmark query. Scale: "
    "region/nation/supplier/customer all broadcast, lineitem-orders "
    "is the one shuffle join, the nation equality prunes early.",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark, sf_dir,
        ("customer", "orders", "lineitem", "supplier", "nation", "region"),
        _Q5,
    )


# Q9 — product-type profit (adapted) ------------------------------------------
_Q9 = f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           {_fr('sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1e2 + 0.5e0) AS BIGINT) - CAST(floor(p_retailprice * l_quantity * 50.0 + 0.5e0) AS BIGINT)) / 1e2')} AS sum_profit
    FROM part, supplier, lineitem, orders, nation
    WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      AND p_name LIKE '%gear%'
    GROUP BY n_name, year(o_orderdate)
"""


@query(
    "q_tpch_q9",
    _Q9,
    doc="TPC-H Q9 (product-type profit), cost proxy = 50% of retail "
    "price per unit (the fixture has no ps_supplycost): profit by "
    "supplier nation by order year over a LIKE-filtered part set. "
    "Both cents terms floor per row before the BIGINT sum, so the "
    "difference is exact. Scale: the LIKE filter prunes part before "
    "the join; nation/part/supplier broadcast; one shuffle agg on "
    "(nation, year).",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark, sf_dir,
        ("part", "supplier", "lineitem", "orders", "nation"), _Q9,
    )


# Q12 — shipping modes / priority classes (adapted) ----------------------------
_Q12 = """
    SELECT l_returnflag AS ship_mode,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_shipdate > o_orderdate + INTERVAL 14 DAY
    GROUP BY ship_mode
"""


@query(
    "q_tpch_q12",
    _Q12,
    doc="TPC-H Q12 (shipping modes & order priority), l_returnflag "
    "standing in for shipmode and late = >14-day ship lag (no "
    "commit/receipt dates): the conditional two-way count pivot over "
    "a join with a cross-table date predicate. Scale: the year "
    "filter pushes to the lineitem scan; the lag predicate evaluates "
    "on the joined row; 3-row result.",
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, ("orders", "lineitem"), _Q12)


# Q16 — supplier counts by part attributes (adapted) ----------------------------
_Q16 = """
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
"""


@query(
    "q_tpch_q16",
    _Q16,
    doc="TPC-H Q16 (supplier counts by part attributes), part/supplier "
    "pairs derived from lineitem and 'complaint' suppliers = negative "
    "account balance (no partsupp/comment): NOT IN anti-join against "
    "a filtered dim + count(DISTINCT) per 3-column group. Scale: the "
    "anti-join side is dim-sized (broadcast); the distinct count "
    "shuffles once on the group keys with partial distinct upstream.",
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, ("lineitem", "part", "supplier"), _Q16)


# Q20 — potential part promotion (adapted) --------------------------------------
_Q20 = """
    SELECT s_name, n_name
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (
      SELECT sp.suppkey FROM (
        SELECT l_suppkey AS suppkey, l_partkey AS partkey,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1, 2
      ) sp
      JOIN (
        SELECT l_partkey AS partkey,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1
      ) pt ON pt.partkey = sp.partkey
      JOIN part ON p_partkey = sp.partkey
      WHERE p_type = 'PROMO' AND sp.qty * 10 > pt.total_qty * 3
    )
"""


@query(
    "q_tpch_q20",
    _Q20,
    doc="TPC-H Q20 (potential part promotion), dominant supplier = "
    "shipped >30% of a PROMO part's 1996 volume (no ps_availqty): "
    "IN over a join of two aggregates of the same scan — the "
    "nested-subquery shape. The 30% threshold compares as integer "
    "qty*10 > total*3, never a float ratio. Scale: lineitem "
    "aggregates once per granularity (AQE reuses the scan), the IN "
    "list is supplier-sized, dims broadcast.",
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark, sf_dir, ("lineitem", "part", "supplier", "nation"), _Q20,
    )


# Q21 — suppliers who kept orders waiting (adapted, decorrelated form) -----------
_Q21 = """
    WITH ol AS (
      SELECT l_orderkey, l_suppkey,
             max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY 1, 2
    ), agg AS (
      SELECT l_orderkey,
             count(*) AS n_supp,
             CAST(sum(late) AS BIGINT) AS n_late,
             max(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
      FROM ol GROUP BY 1
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM agg JOIN supplier ON s_suppkey = late_supp
    WHERE n_supp >= 2 AND n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
"""


@query(
    "q_tpch_q21",
    _Q21,
    doc="TPC-H Q21 (suppliers who kept orders waiting), late = >60-day "
    "ship lag on finalized orders: expressed directly in its "
    "decorrelated aggregate form — per (order, supplier) lateness, "
    "then per-order supplier/late counts, keeping orders where the "
    "EXISTS (another supplier) and NOT EXISTS (another late supplier) "
    "conditions reduce to n_supp >= 2 AND n_late = 1. Identical "
    "semantics to the self-join original and the formulation a 100 TB "
    "plan needs anyway: ONE groupBy over (order, supplier) replaces "
    "two lineitem self-joins. Scale: two stacked aggs on the join "
    "key, supplier broadcast, top-20 bounded.",
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, ("lineitem", "orders", "supplier"), _Q21)
