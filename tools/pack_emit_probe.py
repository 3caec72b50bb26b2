#!/usr/bin/env python
"""Materialized-sequence emission scaling probe (round 12).

emit_sequences' scale claim: the explode-to-token shuffle is the
honest cost of re-chunking a corpus into fixed windows — rows are
narrow (shard, gpos, token) and every reduce group is <= budget
tokens, so wall should track TOKEN volume ~linearly with no blowup
from the group-collect. Probe at 1x / 10x synthetic docs; the
conservation invariant (emitted tokens == corpus tokens + one EOS per
doc) verifies INSIDE the timed run. Writes SCALE_PROBE_pack_emit.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from huckli_spark.operators.packing import emit_sequences
from huckli_spark.session import get_spark

BASE_DOCS = 500_000
BUDGET = 2048
SHARDS = 64


def docs_df(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "array_join(transform(sequence(1, cast(id % 16 + 5 as int)),"
            " i -> concat('w', cast(i as string))), ' ')"
        ).alias("text"),
    )


def main() -> None:
    spark = get_spark(app_name="pack_emit_probe")
    spark.sparkContext.setLogLevel("ERROR")
    emit_sequences(docs_df(spark, 5_000), budget=BUDGET,
                   n_shards=SHARDS).count()  # warmup

    results: dict = {"budget": BUDGET, "n_shards": SHARDS}
    for mult in (1, 10):
        n = BASE_DOCS * mult
        d = docs_df(spark, n).localCheckpoint(eager=True)
        want_tokens = d.select(
            F.sum(F.size(F.split("text", " ")) + F.lit(1)).alias("t")
        ).collect()[0]["t"]

        t0 = time.perf_counter()
        agg = emit_sequences(d, budget=BUDGET, n_shards=SHARDS).agg(
            F.count("*").alias("seqs"),
            F.sum("n_tokens").alias("tokens"),
            F.max("n_tokens").alias("max_seq"),
        ).collect()[0]
        wall = time.perf_counter() - t0
        assert agg["tokens"] == want_tokens, (agg["tokens"], want_tokens)
        assert agg["max_seq"] <= BUDGET

        results[f"{mult}x"] = {
            "docs": n,
            "tokens": int(agg["tokens"]),
            "seqs": agg["seqs"],
            "wall_s": round(wall, 3),
        }
        print(f"{mult}x: {results[f'{mult}x']}", flush=True)
        d.unpersist()
    r1, r10 = results["1x"], results["10x"]
    results["ratio_10x_over_1x"] = {
        "wall": round(r10["wall_s"] / r1["wall_s"], 3),
        "tokens": round(r10["tokens"] / r1["tokens"], 3),
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_PROBE_pack_emit.json")
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
