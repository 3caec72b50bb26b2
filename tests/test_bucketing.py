"""Bucketed co-located joins: same key + same bucket count on both
sides must produce a shuffle-free sort-merge join, and results must
match the plain join exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from huckli_spark.ingest.warehouse import Warehouse
from huckli_spark.session import load_table
from tests.conftest import SF_SMALL


def test_bucketed_join_is_shuffle_free_and_correct(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    lineitem = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    wh.save_bucketed("b_orders", orders, key="o_orderkey", buckets=8)
    wh.save_bucketed("b_lineitem", lineitem, key="l_orderkey", buckets=8)
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # fixture tables are tiny enough to broadcast; disable that so
        # the plan shows what happens at scale (SMJ between two big
        # bucketed facts)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bo = wh.bucketed_table("b_orders")
        bl = wh.bucketed_table("b_lineitem")
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)

        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = joined._jdf.queryExecution().explainString(mode)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert "SelectedBucketsCount" in plan, plan

        agg = joined.groupBy("o_orderstatus").agg(
            F.count("*").alias("n"), F.sum("l_quantity").alias("q")
        )
        plain = (
            orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
        )
        assert {tuple(r) for r in agg.collect()} == {
            tuple(r) for r in plain.collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
