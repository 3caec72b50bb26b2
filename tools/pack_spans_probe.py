#!/usr/bin/env python
"""Doc-span / segment-id emission scaling probe (round 13).

pack_doc_spans' scale claim: spans are a MAP-SIDE projection of the
pack assignment (the only exchange is the pack window's), with
fan-out bounded by each doc's own token mass — so wall should track
the assignment cost, not token volume. pack_segment_ids adds one
budget-bounded group-collect (no token explode). Probe at 1x / 10x
synthetic docs; invariants verified INSIDE the timed runs: span mass
== corpus tokens + one EOS per doc, and every non-tail sequence's
segment_ids length == budget. Writes SCALE_PROBE_pack_spans.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from huckli_spark.operators.packing import (
    pack_doc_spans,
    pack_segment_ids,
    pack_sequences,
)
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
    spark = get_spark(app_name="pack_spans_probe")
    spark.sparkContext.setLogLevel("ERROR")
    warm = pack_sequences(docs_df(spark, 5_000), budget=BUDGET,
                          n_shards=SHARDS, max_shard_rows=None)
    pack_segment_ids(pack_doc_spans(warm, budget=BUDGET)).count()

    results: dict = {"budget": BUDGET, "n_shards": SHARDS}
    for mult in (1, 10):
        n = BASE_DOCS * mult
        d = docs_df(spark, n).localCheckpoint(eager=True)
        want_tokens = d.select(
            F.sum(F.size(F.split("text", " ")) + F.lit(1)).alias("t")
        ).collect()[0]["t"]

        t0 = time.perf_counter()
        packed = pack_sequences(d, budget=BUDGET, n_shards=SHARDS,
                                max_shard_rows=None)
        spans = pack_doc_spans(packed, budget=BUDGET)
        srow = spans.agg(
            F.count("*").alias("spans"),
            F.sum("len_in_seq").alias("mass"),
        ).collect()[0]
        t_spans = time.perf_counter() - t0
        assert srow["mass"] == want_tokens, (srow["mass"], want_tokens)

        t1 = time.perf_counter()
        segs = pack_segment_ids(spans)
        grow = segs.agg(
            F.count("*").alias("seqs"),
            F.sum("n_tokens").alias("mass"),
            F.sum(
                (F.col("n_tokens") == BUDGET).cast("long")
            ).alias("full"),
        ).collect()[0]
        t_segs = time.perf_counter() - t1
        assert grow["mass"] == want_tokens
        # every sequence except possibly one tail per shard is full
        assert grow["seqs"] - grow["full"] <= SHARDS

        results[f"{mult}x"] = {
            "docs": n,
            "tokens": int(want_tokens),
            "spans": int(srow["spans"]),
            "seqs": int(grow["seqs"]),
            "spans_wall_s": round(t_spans, 3),
            "segments_wall_s": round(t_segs, 3),
        }
    r1, r10 = results["1x"], results["10x"]
    results["ratio_10x_over_1x"] = {
        "spans_wall": round(r10["spans_wall_s"] / r1["spans_wall_s"], 3),
        "segments_wall": round(
            r10["segments_wall_s"] / r1["segments_wall_s"], 3
        ),
        "tokens": round(r10["tokens"] / r1["tokens"], 3),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_PROBE_pack_spans.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
