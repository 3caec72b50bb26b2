#!/usr/bin/env python
"""No-split packing scaling probe (round 11).

pack_sequences_nosplit's scale claim: the sequential next-fit walk is
per-shard, so the parallelism unit is the shard and the knob is
n_shards — at 10x docs WITH 10x shards the per-task walk length is
unchanged and wall should grow far slower than data. Probe three
points: 1x baseline, 10x docs at the SAME shard count (the anti-
pattern: 10x longer sequential walks), and 10x docs at 10x shards
(the documented operating point). Output is verified inside the
timed run (every doc placed once, bins within budget except oversize
singletons). Writes SCALE_PROBE_pack_nosplit.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from huckli_spark.operators.packing import pack_sequences_nosplit
from huckli_spark.session import get_spark

BASE_DOCS = 200_000
BASE_SHARDS = 64
BUDGET = 2048


def docs_df(spark, n):
    # id-seeded token counts, 1..400 words
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "array_join(transform(sequence(1, cast(id % 400 + 1 as int)),"
            " i -> 'w'), ' ')"
        ).alias("text"),
    ).localCheckpoint(eager=True)


def run(spark, n, shards):
    d = docs_df(spark, n)
    t0 = time.perf_counter()
    packed = pack_sequences_nosplit(d, budget=BUDGET, n_shards=shards)
    agg = packed.groupBy("shard", "seq_idx").agg(
        F.sum("n_tokens").alias("tot"),
        F.count("*").alias("n_docs"),
        F.max(F.col("oversize").cast("int")).alias("over"),
    )
    bad = agg.where(
        (F.col("tot") > BUDGET) & ~((F.col("n_docs") == 1) & (F.col("over") == 1))
    ).count()
    n_placed = packed.count()
    wall = time.perf_counter() - t0
    assert bad == 0 and n_placed == n, (bad, n_placed)
    d.unpersist()
    return round(wall, 3)


def main() -> None:
    spark = get_spark(app_name="pack_nosplit_probe")
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, 5_000, 8)  # warmup

    results: dict = {"budget": BUDGET, "base_shards": BASE_SHARDS}
    results["1x"] = {
        "docs": BASE_DOCS, "shards": BASE_SHARDS,
        "wall_s": run(spark, BASE_DOCS, BASE_SHARDS),
    }
    results["10x_same_shards"] = {
        "docs": BASE_DOCS * 10, "shards": BASE_SHARDS,
        "wall_s": run(spark, BASE_DOCS * 10, BASE_SHARDS),
    }
    results["10x_10x_shards"] = {
        "docs": BASE_DOCS * 10, "shards": BASE_SHARDS * 10,
        "wall_s": run(spark, BASE_DOCS * 10, BASE_SHARDS * 10),
    }
    w1 = results["1x"]["wall_s"]
    results["ratio_10x_over_1x"] = {
        "same_shards": round(results["10x_same_shards"]["wall_s"] / w1, 3),
        "scaled_shards": round(results["10x_10x_shards"]["wall_s"] / w1, 3),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_PROBE_pack_nosplit.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
