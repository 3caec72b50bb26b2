#!/usr/bin/env python
"""Epoch-shuffle scaling probe (round 11).

epoch_shuffle's scale claim: the two-phase distributed rank does no
global sort and its worst single-task window input is ~n/n_buckets
hash-balanced rows. Probe at 1x / 10x, recording wall, the largest
realized bucket (vs the ideal n/n_buckets), and verifying the
permutation property inside the timed run so the measurement is the
real operator. Writes SCALE_PROBE_epoch_shuffle.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from huckli_spark.operators.packing import epoch_shuffle
from huckli_spark.session import get_spark

BASE_DOCS = 1_000_000
EPOCHS = 2
BUCKETS = 256


def main() -> None:
    spark = get_spark(app_name="epoch_shuffle_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.range(5_000).select(F.col("id").alias("doc_id"))
    epoch_shuffle(docs, epochs=EPOCHS, n_buckets=BUCKETS).count()  # warmup

    results: dict = {"epochs": EPOCHS, "n_buckets": BUCKETS}
    for mult in (1, 10):
        n = BASE_DOCS * mult
        docs = spark.range(n).select(F.col("id").alias("doc_id"))
        t0 = time.perf_counter()
        out = epoch_shuffle(docs, epochs=EPOCHS, n_buckets=BUCKETS)
        agg = out.groupBy("epoch").agg(
            F.count("*").alias("rows"),
            F.min("pos").alias("lo"),
            F.max("pos").alias("hi"),
            F.count_distinct("pos").alias("distinct_pos"),
        ).collect()
        wall = time.perf_counter() - t0
        for r in agg:  # permutation property verified IN the timed run
            assert (r["rows"], r["lo"], r["hi"], r["distinct_pos"]) == (
                n, 1, n, n
            ), r
        # realized bucket skew (untimed diagnostic)
        from huckli_spark.functions.portable import h60

        keyed = docs.select(
            F.explode(F.array(*[F.lit(e) for e in range(EPOCHS)]))
            .alias("epoch"),
            "doc_id",
        ).select(
            "epoch",
            (
                h60(
                    F.concat(
                        F.lit("epoch:"), F.col("epoch").cast("string"),
                        F.lit(":"), F.col("doc_id").cast("string"),
                    )
                )
                / F.lit((1 << 60) // BUCKETS)
            ).cast("long").alias("b"),
        )
        # per-(epoch, bucket): exactly the window partitioning
        mx = keyed.groupBy("epoch", "b").count().agg(
            F.max("count")
        ).collect()[0][0]
        results[f"{mult}x"] = {
            "docs": n,
            "wall_s": round(wall, 3),
            "max_bucket_rows": int(mx),
            "ideal_bucket_rows": n // BUCKETS,
        }
        print(f"{mult}x: {results[f'{mult}x']}", flush=True)
    results["ratio_10x_over_1x"] = {
        "wall": round(
            results["10x"]["wall_s"] / results["1x"]["wall_s"], 3
        ),
        "docs": 10.0,
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_PROBE_epoch_shuffle.json")
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
