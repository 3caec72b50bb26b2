#!/usr/bin/env python
"""K-means plan-form crossover probe (round 8).

Round 6 measured the ASSIGNMENT crossover (literal argmin vs codebook
as a broadcast payload); round 8 added the same switch to TRAINING
(kmeans_fit / kmeans_fit_grouped). This probe trains the sf0.1
embeddings at k = 64 / 256 / 512 in both plan forms and records wall
seconds plus centroid equality — the literal form's per-iteration
expression is k*dim cells (512*64 = 33k, past LITERAL_CELL_BOUND),
and at the SemDeDup paper's k~100k it is simply not plannable.
Writes SCALE_PROBE_kmeans_form.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from huckli_spark.operators.clustering import kmeans_fit
from huckli_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="kmeans_form_probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb = emb.persist()
    n = emb.count()

    out: dict = {"sf_dir": sf_dir, "n_emb": n, "runs": {}}
    kmeans_fit(emb, k=8, iterations=1)  # warmup both JIT paths
    kmeans_fit(emb, k=8, iterations=1, plan_form="broadcast")

    for k in (64, 256, 512):
        rec: dict = {"cells": k * 64}
        for form in ("literal", "broadcast"):
            t0 = time.perf_counter()
            cents = kmeans_fit(emb, k=k, iterations=2, plan_form=form)
            rec[f"{form}_wall_s"] = round(time.perf_counter() - t0, 3)
            rec[f"{form}_cents"] = hash(
                tuple(tuple(c) for c in cents)
            )  # equality via hash; full pin lives in tests
        rec["bit_identical"] = rec["literal_cents"] == rec["broadcast_cents"]
        del rec["literal_cents"], rec["broadcast_cents"]
        rec["broadcast_speedup"] = round(
            rec["literal_wall_s"] / rec["broadcast_wall_s"], 2
        )
        out["runs"][f"k{k}"] = rec
        print(k, rec, flush=True)

    emb.unpersist()
    out["loadavg"] = list(os.getloadavg())
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROBE_kmeans_form.json",
    )
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v["broadcast_speedup"] for k, v in out["runs"].items()}))


if __name__ == "__main__":
    main()
