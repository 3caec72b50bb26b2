#!/usr/bin/env python
"""Benchmark the headline parity queries.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a noop-format write (full computation, no
driver-side collect overhead).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q_group_sum",
    "q_broadcast_dim_join",
    "q_parent_child_join",
    "q_group_distinct",
    "q_window_rank",
    "q_window_lag",
    "q_time_bucket",
    "q_topk",
    "q_json_extract",
    "q_cube",
    "q_asof_join",
    "q_range_join",
    "q_sessionize",
    "q_ngram_jaccard",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_token_count",
    "q_ann_bruteforce",
    "q_ann_lsh",
    "q_multi_join_topk",
    "q_region_revenue",
    "q_corpus_prep",
    "q_correlated_scalar",
    "q_window_frame",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from huckli_spark.queries import all_queries
    from huckli_spark.session import get_spark

    spark = get_spark(app_name="huckli_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    # warm the JVM + parquet footer caches once so per-query numbers
    # measure execution, not first-touch JIT
    specs["q_topk"].build(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        # min of two runs halves scheduler/JIT noise in the recorded
        # number; the cache is cleared per run so queries that persist
        # intermediates internally still pay their full compute (the
        # CacheManager would otherwise serve run 2 from run 1's plan)
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            df = specs[name].build(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
