"""Skew operators: salted plans must be value-identical to the plain
ones — the whole point is changing the physical distribution without
touching semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from huckli_spark.operators.skew import (
    salted_join,
    two_phase_distinct_count,
    with_row_salt,
)
from huckli_spark.session import load_table
from tests.conftest import SF_SMALL


def test_two_phase_distinct_count_matches_plain(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    salted = {
        (r.l_returnflag, r.n_distinct)
        for r in two_phase_distinct_count(li, ["l_returnflag"], "l_suppkey").collect()
    }
    plain = {
        (r.l_returnflag, r.n)
        for r in li.groupBy("l_returnflag")
        .agg(F.count_distinct("l_suppkey").alias("n"))
        .collect()
    }
    assert salted == plain


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, SF_SMALL, "lineitem").select("l_partkey", "l_quantity")
    part = load_table(spark, SF_SMALL, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    salted = (
        salted_join(li, part, on="l_partkey", n_salts=4)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    plain = (
        li.join(part, "l_partkey")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}


def test_salted_join_left_outer_keeps_misses(spark):
    li = load_table(spark, SF_SMALL, "lineitem").select("l_partkey").limit(50)
    empty_dim = (
        load_table(spark, SF_SMALL, "part")
        .select(F.col("p_partkey").alias("l_partkey"), "p_brand")
        .where(F.lit(False))
    )
    out = salted_join(li, empty_dim, on="l_partkey", n_salts=4, how="left")
    assert out.count() == 50
    assert out.where(F.col("p_brand").isNull()).count() == 50


def test_row_salt_is_deterministic_and_bounded(spark):
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_linenumber")
    s1 = with_row_salt(li, 8).collect()
    s2 = with_row_salt(li, 8).collect()
    assert s1 == s2
    assert all(0 <= r["__salt"] < 8 for r in s1)
