#!/usr/bin/env python
"""Grouped-NTILE scaling probe (round 10, VERDICT r09 #2).

The r9 rework of ``exact_ntile_grouped`` (ADVICE r08 #2) replaced the
per-group one-task histogram window + forced-broadcast join-back with
the two-phase distributed ``_exclusive_prefix`` keyed by (group,
score) and an un-hinted shuffle join. That trade DOUBLED
q_ccnet_buckets at fixture scale (2.42 -> 4.66 s official r9) and was
asserted, not measured, to win on near-unique score domains. This
probe measures it: per-document micro scores (score cardinality ~=
corpus cardinality, the q_ccnet_buckets shape) at 1x / 10x, the
shipped distributed form vs a faithful reconstruction of the old
broadcast form, recording wall plus each form's worst single-task
input (the old form's per-group window runs its whole group's
histogram in ONE task; the new form's local scans are bounded by
corpus/shuffle-partitions). Equality of the two forms' outputs is
asserted at 1x before timing. Writes SCALE_PROBE_ntile_grouped.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from huckli_spark.operators.skew import exact_ntile_grouped
from huckli_spark.session import get_spark

N_TILES = 10
N_GROUPS = 3  # one dominant group (80%) + two minor — real corpora
BASE_ROWS = 1_000_000


def fixture(spark, n_rows: int) -> DataFrame:
    # near-unique micro scores (every doc its own value except ~0.1%
    # engineered ties — the q_ccnet_buckets avg_lp_micro shape) and a
    # language-skewed grouping: 80% 'en', 10% each minor. The skew is
    # the realistic case AND the one that exposes the old form's
    # single-task window (the dominant group's whole histogram in one
    # task).
    return (
        spark.range(n_rows)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 < 8, F.lit("en"))
            .otherwise(F.concat(F.lit("lang"), (F.col("id") % 10)))
            .alias("lang"),
            (F.col("id") * 1000 + F.pmod(F.xxhash64("id"), 997))
            .alias("score"),
        )
        .localCheckpoint(eager=True)  # generation cost out of timings
    )


def old_broadcast_form(
    df: DataFrame, n_tiles: int, score_col: str, id_col: str, group_col: str
) -> DataFrame:
    """The pre-r9 shape: per-group ONE-TASK window prefix over the
    (group, score) histogram, histogram + group counts force-broadcast
    back. Correct, but the window task and the broadcast both scale
    with the score domain."""
    gn = df.groupBy(group_col).agg(F.count("*").alias("__n"))
    hist = df.groupBy(group_col, score_col).agg(F.count("*").alias("__c"))
    wh = (
        Window.partitionBy(group_col)
        .orderBy(F.desc(score_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = hist.withColumn(
        "__higher", F.coalesce(F.sum("__c").over(wh), F.lit(0))
    )
    wg = Window.partitionBy(group_col, score_col).orderBy(F.asc(id_col))
    ranked = (
        df.join(F.broadcast(hist.drop("__c")), [group_col, score_col])
        .join(F.broadcast(gn), group_col)
        .withColumn(
            "__rank",
            (F.col("__higher") + F.row_number().over(wg)).cast("long"),
        )
    )
    q = (F.col("__n") / n_tiles).cast("long")
    r = F.col("__n") % n_tiles
    big = r * (q + 1)
    tile = (
        F.when(q == 0, F.col("__rank"))
        .when(F.col("__rank") <= big,
              F.floor((F.col("__rank") - 1) / (q + 1)) + 1)
        .otherwise(r + F.floor((F.col("__rank") - big - 1) / q) + 1)
    )
    return ranked.withColumn("tile", tile.cast("int")).drop(
        "__higher", "__rank", "__n"
    )


def drain(df: DataFrame) -> int:
    return df.select(F.sum(F.col("tile").cast("long"))).collect()[0][0]


def main() -> None:
    spark = get_spark(app_name="ntile_grouped_probe")
    spark.sparkContext.setLogLevel("ERROR")
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # correctness cross-check at 1x before any timing
    small = fixture(spark, 20_000)
    a = {
        (r["lang"], r["doc_id"]): r["tile"]
        for r in exact_ntile_grouped(
            small, N_TILES, "score", "doc_id", "lang"
        ).collect()
    }
    b = {
        (r["lang"], r["doc_id"]): r["tile"]
        for r in old_broadcast_form(
            small, N_TILES, "score", "doc_id", "lang"
        ).collect()
    }
    assert a == b, "forms disagree"
    print("forms agree at 20k rows", flush=True)

    results: dict = {"n_tiles": N_TILES, "n_groups": N_GROUPS}
    for mult in (1, 10):
        n = BASE_ROWS * mult
        df = fixture(spark, n)
        hist_rows = df.select("lang", "score").distinct().count()
        # worst single-task input: old form = the largest group's
        # whole histogram in ONE window task; new form = the biggest
        # range partition of the (group, score) histogram
        max_group_hist = (
            df.groupBy("lang", "score").count()
            .groupBy("lang").count()
            .agg(F.max("count")).collect()[0][0]
        )
        row: dict = {
            "rows": n,
            "hist_rows": hist_rows,
            "old_max_single_task_rows": max_group_hist,
            "new_max_single_task_rows": -(-hist_rows // shuffle_parts),
        }
        for label, build in (
            ("distributed", lambda d: exact_ntile_grouped(
                d, N_TILES, "score", "doc_id", "lang")),
            ("broadcast", lambda d: old_broadcast_form(
                d, N_TILES, "score", "doc_id", "lang")),
        ):
            t0 = time.perf_counter()
            drain(build(df))
            row[f"wall_s_{label}"] = round(time.perf_counter() - t0, 3)
        df.unpersist()
        results[f"{mult}x"] = row
        print(f"{mult}x: {row}", flush=True)

    results["ratio_10x_over_1x"] = {
        "distributed": round(
            results["10x"]["wall_s_distributed"]
            / results["1x"]["wall_s_distributed"], 3),
        "broadcast": round(
            results["10x"]["wall_s_broadcast"]
            / results["1x"]["wall_s_broadcast"], 3),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_PROBE_ntile_grouped.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
