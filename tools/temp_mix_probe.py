#!/usr/bin/env python
"""Temperature-sampling mix scaling probe (round 13).

temperature_weights' scale claim: one map-side aggregation to a
|sources| relation + a broadcast totals join — wall flat in corpus
size beyond the scan. The composed epoch_mix_shuffle inherits the
mix-shuffle story (map-side explode + two-phase rank). Probe at
1x / 10x synthetic docs over a skewed 8-source mix; invariants
verified INSIDE the timed runs: the largest source's boost is exactly
1.0, boosts are monotone in inverse size, and the replicated row
count equals the exact sum of per-doc copy counts computed
independently. Writes SCALE_PROBE_temp_mix.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from huckli_spark.operators.mixture import (
    temperature_weight_map,
    temperature_weights,
)
from huckli_spark.operators.packing import _mix_copies, epoch_mix_shuffle
from huckli_spark.session import get_spark

BASE_DOCS = 500_000
ALPHA = 0.3
# floor(log2(id % 256 + 1)) yields src0..src8: geometric skew with
# src7 covering [128, 255] (~half the docs) and src0 only id%256==0
N_SOURCES = 9


def docs_df(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat('src', cast(floor(log2(id % 256 + 1)) "
            "as int))"
        ).alias("source"),
        F.expr(
            "array_join(transform(sequence(1, cast(id % 16 + 5 as int)),"
            " i -> concat('w', cast(i as string))), ' ')"
        ).alias("text"),
    )


def main() -> None:
    spark = get_spark(app_name="temp_mix_probe")
    spark.sparkContext.setLogLevel("ERROR")
    wsmall = temperature_weight_map(docs_df(spark, 5_000), alpha=ALPHA)
    epoch_mix_shuffle(docs_df(spark, 5_000), wsmall, epoch=7).count()

    results: dict = {"alpha": ALPHA, "n_sources": N_SOURCES}
    for mult in (1, 10):
        n = BASE_DOCS * mult
        d = docs_df(spark, n).localCheckpoint(eager=True)

        t0 = time.perf_counter()
        wrows = temperature_weights(d, alpha=ALPHA).collect()
        t_weights = time.perf_counter() - t0
        by_tok = sorted(wrows, key=lambda r: -r["n_tokens"])
        assert by_tok[0]["boost_micro"] == 1_000_000
        boosts = [r["boost_micro"] for r in by_tok]
        assert boosts == sorted(boosts), boosts

        wmap = {r["source"]: r["boost_micro"] / 1e6 for r in wrows}
        want = d.select(
            F.sum(
                _mix_copies(wmap, 7, "doc_id", "source", 1.0)
            ).alias("c")
        ).collect()[0]["c"]

        t1 = time.perf_counter()
        got = epoch_mix_shuffle(d, wmap, epoch=7).count()
        t_mix = time.perf_counter() - t1
        assert got == want, (got, want)

        results[f"{mult}x"] = {
            "docs": n,
            "mixed_rows": int(got),
            "upsample": round(got / n, 4),
            "weights_wall_s": round(t_weights, 3),
            "mix_wall_s": round(t_mix, 3),
        }
    r1, r10 = results["1x"], results["10x"]
    results["ratio_10x_over_1x"] = {
        "weights_wall": round(
            r10["weights_wall_s"] / r1["weights_wall_s"], 3
        ),
        "mix_wall": round(r10["mix_wall_s"] / r1["mix_wall_s"], 3),
        "rows": round(r10["mixed_rows"] / r1["mixed_rows"], 3),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_PROBE_temp_mix.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
