#!/usr/bin/env python
"""Epoch shuffle-then-pack scaling probe (round 12).

epoch_pack's scale claim: the composition adds ONE narrow shuffle (the
permutation rank's bucket exchange) on top of pack_sequences' by-shard
window — no global sort, the position column threads through the pack
projection (never re-joined against the corpus), and shard window
inputs stay ~n/n_shards. Probe at 1x / 10x synthetic docs; pack
invariants (conservation of the running offset, permutation of pos)
verify INSIDE the timed run so the measurement is the real operator.
Writes SCALE_PROBE_epoch_pack.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from huckli_spark.operators.packing import epoch_pack, pack_sequences
from huckli_spark.session import get_spark

BASE_DOCS = 1_000_000
BUDGET = 2048
SHARDS = 64
BUCKETS = 256


def docs_df(spark, n):
    # variable-length synthetic docs (5..20 words), text materialized
    # so the token count is the real split work
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "array_join(transform(sequence(1, cast(id % 16 + 5 as int)),"
            " i -> 'w'), ' ')"
        ).alias("text"),
    )


def main() -> None:
    spark = get_spark(app_name="epoch_pack_probe")
    spark.sparkContext.setLogLevel("ERROR")
    epoch_pack(docs_df(spark, 5_000), epoch=1, budget=BUDGET,
               n_shards=SHARDS, n_buckets=BUCKETS).count()  # warmup

    results: dict = {"budget": BUDGET, "n_shards": SHARDS,
                     "n_buckets": BUCKETS}
    for mult in (1, 10):
        n = BASE_DOCS * mult
        d = docs_df(spark, n).localCheckpoint(eager=True)

        t0 = time.perf_counter()
        out = epoch_pack(d, epoch=1, budget=BUDGET, n_shards=SHARDS,
                         n_buckets=BUCKETS)
        agg = out.agg(
            F.count("*").alias("rows"),
            F.count_distinct("pos").alias("distinct_pos"),
            F.sum("n_tokens").alias("tokens"),
            (F.max("seq_idx") + 1).alias("max_seqs"),
        ).collect()[0]
        wall_pack = time.perf_counter() - t0
        assert (agg["rows"], agg["distinct_pos"]) == (n, n), agg

        # baseline: plain hash-order pack on the same input (aggregate
        # the pack OUTPUTS — a bare count(*) lets column pruning drop
        # the window entirely and times an empty plan)
        t0 = time.perf_counter()
        pack_sequences(d, budget=BUDGET, n_shards=SHARDS).agg(
            F.sum("seq_idx"), F.max("offset_in_seq"), F.count("*")
        ).collect()
        wall_plain = time.perf_counter() - t0

        results[f"{mult}x"] = {
            "docs": n,
            "wall_s_epoch_pack": round(wall_pack, 3),
            "wall_s_plain_pack": round(wall_plain, 3),
            "tokens": int(agg["tokens"]),
        }
        print(f"{mult}x: {results[f'{mult}x']}", flush=True)
        d.unpersist()
    r1, r10 = results["1x"], results["10x"]
    results["ratio_10x_over_1x"] = {
        "epoch_pack_wall": round(
            r10["wall_s_epoch_pack"] / r1["wall_s_epoch_pack"], 3
        ),
        "plain_pack_wall": round(
            r10["wall_s_plain_pack"] / r1["wall_s_plain_pack"], 3
        ),
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_PROBE_epoch_pack.json")
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
