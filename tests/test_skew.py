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


class TestExactNtile:
    """exact_ntile's distributed-ranking decomposition must be
    bit-identical to Spark's global-window NTILE over
    (score DESC, id ASC) — including tie groups and the uneven
    first-buckets split."""

    def _fixture(self, spark, n=97):
        # scores with heavy ties (mod 7) so tie groups straddle tile
        # boundaries, plus a few unique outliers
        rows = [(i, (i * 31) % 7 if i % 10 else 1000 + i) for i in range(n)]
        return spark.createDataFrame(rows, "doc_id long, score long")

    def test_matches_global_ntile(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from huckli_spark.operators.skew import exact_ntile

        df = self._fixture(spark)
        for t in (1, 3, 10, 96, 97, 150):
            got = {
                r["doc_id"]: r["tile"]
                for r in exact_ntile(
                    df, t, score_col="score", id_col="doc_id"
                ).collect()
            }
            w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
            want = {
                r["doc_id"]: r["t"]
                for r in df.withColumn(
                    "t", F.ntile(t).over(w)
                ).collect()
            }
            assert got == want, f"n_tiles={t}"

    def test_rank_window_partitions_by_score(self, spark):
        # the scale contract: the corpus-sized window must partition
        # by the score group — a single global partition is the plan
        # this operator exists to avoid
        from huckli_spark.operators.skew import exact_ntile

        df = self._fixture(spark)
        out = exact_ntile(df, 10, score_col="score", id_col="doc_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        import re as _re

        m = _re.search(r"row_number\(\)[^\n]*windowspecdefinition\(([^,]*),", plan)
        assert m and "score" in m.group(1), plan


class TestExactNtileGrouped:
    """exact_ntile_grouped must be bit-identical to the partitioned-
    window NTILE per group — including tie groups, uneven splits, and
    groups smaller than the tile count."""

    def _fixture(self, spark):
        rows = []
        for g, size in (("a", 97), ("b", 40), ("c", 2)):
            for i in range(size):
                rows.append(
                    (g, i, (i * 31) % 7 if i % 10 else 1000 + i)
                )
        return spark.createDataFrame(
            rows, "lang string, doc_id long, score long"
        )

    def test_matches_partitioned_ntile(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from huckli_spark.operators.skew import exact_ntile_grouped

        df = self._fixture(spark)
        for t in (1, 3, 10, 50):
            got = {
                (r["lang"], r["doc_id"]): r["tile"]
                for r in exact_ntile_grouped(
                    df, t, score_col="score", id_col="doc_id",
                    group_col="lang",
                ).collect()
            }
            w = Window.partitionBy("lang").orderBy(
                F.desc("score"), F.asc("doc_id")
            )
            want = {
                (r["lang"], r["doc_id"]): r["t"]
                for r in df.withColumn("t", F.ntile(t).over(w)).collect()
            }
            assert got == want, f"t={t}"


class TestGroupedPrefixScale:
    """ADVICE r08 #2: the grouped prefix must survive near-unique
    score domains (no one-task-per-group histogram window, no forced
    broadcast of a corpus-sized histogram) and hostile group
    literals (quotes/backslashes ride through the VALUES relation)."""

    def test_near_unique_scores_match_partitioned_ntile(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from huckli_spark.operators.skew import exact_ntile_grouped

        rows = [
            (g, i, i * 1000 + hash((g, i)) % 997)
            for g in ("x'y", "a\\b", "plain")
            for i in range(120)
        ]
        df = spark.createDataFrame(
            rows, "lang string, doc_id long, score long"
        )
        got = {
            (r["lang"], r["doc_id"]): r["tile"]
            for r in exact_ntile_grouped(
                df, 7, score_col="score", id_col="doc_id", group_col="lang"
            ).collect()
        }
        w = Window.partitionBy("lang").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        want = {
            (r["lang"], r["doc_id"]): r["t"]
            for r in df.withColumn("t", F.ntile(7).over(w)).collect()
        }
        assert got == want

    def test_histogram_window_partitions_by_pid_and_group(self, spark):
        # the running sum must window by (__pid, group) — a plain
        # per-group window is the one-task bound this exists to kill
        import re as _re

        from pyspark.sql import functions as F

        from huckli_spark.operators.skew import _exclusive_prefix

        hist = spark.createDataFrame(
            [("a", i, 1) for i in range(50)],
            "lang string, score long, __c long",
        )
        out = _exclusive_prefix(
            hist, F.desc("score"), "__c", "__higher", group_col="lang"
        )
        got = {
            (r["lang"], r["score"]): r["__higher"] for r in out.collect()
        }
        assert got[("a", 49)] == 0 and got[("a", 0)] == 49


class TestGroupedNtileNullGroup:
    """ADVICE r09 #1: a NULL group value must behave exactly like the
    partitioned-window NTILE (PARTITION BY groups NULLs together) —
    neither a Python TypeError in the offset sort nor a silent drop
    at the histogram equi-join."""

    def test_null_group_matches_partitioned_ntile(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from huckli_spark.operators.skew import exact_ntile_grouped

        rows = [
            (g, i, (i * 37) % 11 if i % 6 else 500 + i)
            for g in ("a", None, "b")
            for i in range(53)
        ]
        df = spark.createDataFrame(
            rows, "lang string, doc_id long, score long"
        )
        got = {
            (r["lang"], r["doc_id"]): r["tile"]
            for r in exact_ntile_grouped(
                df, 4, score_col="score", id_col="doc_id", group_col="lang"
            ).collect()
        }
        assert len(got) == 159  # nothing dropped
        w = Window.partitionBy("lang").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        want = {
            (r["lang"], r["doc_id"]): r["t"]
            for r in df.withColumn("t", F.ntile(4).over(w)).collect()
        }
        assert got == want
