#!/usr/bin/env python
"""DoReMi mixture-optimization scaling probe.

The loop's claim: every aggregate lands on bounded relations (B+1
gradient cells, |domains| loss rows), the corpus is scanned once per
inner GD step / loss pass and never shuffled on a data-sized key —
so wall should track the scan count, not blow up with rows. Probe at
1x / 10x the sf0.1 documents corpus (plain replication with shifted
doc_ids; domains and label structure preserved, so the training
dynamics stay comparable). Writes SCALE_PROBE_doremi.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from huckli_spark.operators.mixture import doremi_mixture
from huckli_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

LABEL_SQL = (
    "array_contains(split(text, ' '), 'spark')"
    " OR array_contains(split(text, ' '), 'sql')"
)


def replicated(spark, copies: int):
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    parts = [
        base.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            "text",
            "lang",
        )
        for i in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    spark = get_spark(app_name="doremi_probe")
    # warmup (unmeasured): JVM/codegen compilation
    doremi_mixture(
        replicated(spark, 1).limit(500), F.expr(LABEL_SQL),
        ref_iters=1, rounds=1, inner_iters=1,
    )
    results = {}
    for copies in (1, 10):
        docs = replicated(spark, copies).persist()
        n = docs.count()
        t0 = time.perf_counter()
        out = doremi_mixture(
            docs, F.expr(LABEL_SQL), ref_iters=4, rounds=3, inner_iters=2
        ).collect()
        wall = time.perf_counter() - t0
        docs.unpersist()
        results[f"{copies}x"] = {
            "n_docs": n,
            "wall_s": round(wall, 2),
            "trajectory_rows": len(out),
        }
        print(f"{copies}x: {results[f'{copies}x']}", flush=True)
    results["ratio_10x_over_1x"] = {
        "wall": round(
            results["10x"]["wall_s"] / results["1x"]["wall_s"], 2
        ),
        "n_docs": round(
            results["10x"]["n_docs"] / results["1x"]["n_docs"], 2
        ),
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROBE_doremi.json",
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
