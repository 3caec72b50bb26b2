#!/usr/bin/env python
"""Weighted mix-to-sequences scaling probe (round 13).

epoch_mix_emit's scale claim (VERDICT r12 #6 composition): the
weighted replication is a map-side explode, the text rides the rank's
bucket exchange (no corpus re-join), and the emit regroup is
budget-bounded — so wall should track the MIXED token volume
~linearly. Probe at 1x / 10x synthetic docs with a 1.6x-mean weight
recipe; two invariants verify INSIDE the timed run: emitted tokens ==
sum over docs of copies x (len + EOS) (replayed exactly from the
integer micro-weight arithmetic) and no sequence exceeds the budget.
Writes SCALE_PROBE_mix_emit.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from huckli_spark.operators.packing import _mix_copies, epoch_mix_emit
from huckli_spark.session import get_spark

BASE_DOCS = 500_000
BUDGET = 2048
SHARDS = 64
EPOCH = 1
WEIGHTS = {"web": 0.8, "books": 2.5, "code": 1.5, "junk": 0.0}


def docs_df(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "element_at(array('web','books','code','junk','wiki'), "
            "cast(id % 5 as int) + 1)"
        ).alias("source"),
        F.expr(
            "array_join(transform(sequence(1, cast(id % 16 + 5 as int)),"
            " i -> concat('w', cast(i as string))), ' ')"
        ).alias("text"),
    )


def main() -> None:
    spark = get_spark(app_name="mix_emit_probe")
    spark.sparkContext.setLogLevel("ERROR")
    epoch_mix_emit(docs_df(spark, 5_000), WEIGHTS, epoch=EPOCH,
                   budget=BUDGET, n_shards=SHARDS).count()  # warmup

    results: dict = {"budget": BUDGET, "n_shards": SHARDS,
                     "weights": WEIGHTS}
    for mult in (1, 10):
        n = BASE_DOCS * mult
        d = docs_df(spark, n).localCheckpoint(eager=True)
        copies = _mix_copies(WEIGHTS, EPOCH, "doc_id", "source", 1.0)
        want = d.select(
            F.sum(
                copies * (F.size(F.split("text", " ")) + F.lit(1))
            ).alias("t")
        ).collect()[0]["t"]

        t0 = time.perf_counter()
        agg = epoch_mix_emit(
            d, WEIGHTS, epoch=EPOCH, budget=BUDGET, n_shards=SHARDS
        ).agg(
            F.count("*").alias("seqs"),
            F.sum("n_tokens").alias("tokens"),
            F.max("n_tokens").alias("max_seq"),
        ).collect()[0]
        wall = time.perf_counter() - t0
        assert agg["tokens"] == want, (agg["tokens"], want)
        assert agg["max_seq"] <= BUDGET

        results[f"{mult}x"] = {
            "docs": n,
            "mixed_tokens": int(agg["tokens"]),
            "seqs": agg["seqs"],
            "wall_s": round(wall, 3),
        }
        print(f"{mult}x: {results[f'{mult}x']}", flush=True)
        d.unpersist()
    r1, r10 = results["1x"], results["10x"]
    results["ratio_10x_over_1x"] = {
        "wall": round(r10["wall_s"] / r1["wall_s"], 3),
        "tokens": round(r10["mixed_tokens"] / r1["mixed_tokens"], 3),
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_PROBE_mix_emit.json")
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
