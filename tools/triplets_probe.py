#!/usr/bin/env python
"""Contrastive triplet-mining scaling probe (VERDICT r08 #3).

The operator's claim: the pair stage is cluster-bounded (the SemDeDup
discipline), so with CONSTANT cluster geometry — k scaled with the
corpus — total pair work grows linearly and wall should track the
corpus, not its square. Probe at 1x / 10x the sf0.1 embeddings corpus
(plain replication with shifted vec_ids; a small deterministic
per-copy perturbation keeps replicated vectors from being exact
duplicates of each other, which would distort the positive picks):
1x runs k=8, 10x runs k=80, holding ~vectors/cluster fixed. Writes
SCALE_PROBE_triplets.json with walls and the triplet counts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from huckli_spark.operators.curation import mine_triplets
from huckli_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated(spark, copies: int):
    base = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    parts = []
    for i in range(copies):
        p = base.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            # nudge one coordinate per copy so copies are near, not
            # exact, duplicates (float32-safe, deterministic)
            F.expr(
                f"transform(embedding, (x, j) -> CASE WHEN j = {i % 64}"
                " THEN cast(x + 0.001 as float) ELSE x END)"
            ).alias("embedding"),
        )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    spark = get_spark(app_name="triplets_probe")
    # warmup (unmeasured): JVM/codegen compilation
    mine_triplets(replicated(spark, 1).limit(300), k=4,
                  iterations=1).count()
    results = {}
    for copies, k in ((1, 8), (10, 80)):
        emb = replicated(spark, copies).persist()
        n = emb.count()
        t0 = time.perf_counter()
        n_triplets = mine_triplets(emb, k=k, iterations=2).count()
        wall = time.perf_counter() - t0
        emb.unpersist()
        results[f"{copies}x"] = {
            "n_vectors": n,
            "k": k,
            "wall_s": round(wall, 2),
            "n_triplets": n_triplets,
        }
        print(f"{copies}x: {results[f'{copies}x']}", flush=True)
    results["ratio_10x_over_1x"] = {
        "wall": round(results["10x"]["wall_s"] / results["1x"]["wall_s"], 2),
        "n_vectors": round(
            results["10x"]["n_vectors"] / results["1x"]["n_vectors"], 2
        ),
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROBE_triplets.json",
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
