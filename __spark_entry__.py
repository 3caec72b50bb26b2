"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the canonical huckli
workload: per-key totals over a time range — SURVEY §7 M0) on
sf0.001. ``queries()`` / ``oracle_sql()`` expose the parity registry
from ``huckli_spark.queries`` (SURVEY §2.B + the training-data
pipeline operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from huckli_spark.queries import all_queries

    return all_queries()["q_group_sum"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from huckli_spark.queries import all_queries

    return {name: spec.build for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from huckli_spark.queries import all_queries

    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
