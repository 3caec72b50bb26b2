"""fan_out: repartition narrow scans, leave wide plans alone."""

from __future__ import annotations

from huckli_spark.operators.parallel import fan_out


def test_fan_out_widens_narrow_input(spark):
    df = spark.range(1000).coalesce(1)
    out = fan_out(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 1000


def test_fan_out_noop_on_wide_input(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target + 4)
    out = fan_out(df)
    # already wide: returned as-is, no extra shuffle inserted
    assert out is df


def test_fan_out_explicit_minimum(spark):
    df = spark.range(100).coalesce(1)
    assert fan_out(df, min_partitions=7).rdd.getNumPartitions() == 7
