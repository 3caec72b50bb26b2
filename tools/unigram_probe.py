#!/usr/bin/env python
"""Unigram-LM trainer scaling probe.

The E-step is map-only (broadcast vocab row + in-row Viterbi folds)
and every iteration touches word-table-sized data, so the claim to
verify is: wall grows ~linearly with the corpus SCAN and stays
insensitive to everything else. The fixture's 31-word vocabulary
can't probe that — so each copy *i* of the sf0.1 corpus salts every
word with a per-copy suffix, growing the corpus 10x AND the distinct
vocabulary 10x at once (the adversarial direction: more words = more
DP rows, more candidate pieces, bigger broadcast map).

Records, per scale: total fit wall, one frozen E-step wall (isolates
the per-iteration cost from seeding), corpus words, distinct words.
Writes SCALE_PROBE_unigram.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from huckli_spark.operators import unigram_lm as U
from huckli_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated(spark, copies: int):
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    parts = []
    for i in range(copies):
        salted = base.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            # salt every word -> copy i shares no vocabulary with copy j
            F.array_join(
                F.transform(
                    F.split("text", " "), lambda w: F.concat(w, F.lit(f"x{i}"))
                ),
                " ",
            ).alias("text"),
        )
        parts.append(salted)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    spark = get_spark(app_name="unigram_probe")
    # JVM/codegen warmup: an unmeasured small fit, so the 1x row
    # doesn't carry first-query compilation cost
    U.unigram_fit(
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")),
        vocab_size=50, n_iters=1, max_piece_len=3,
    )
    results = {}
    for copies in (1, 10):
        docs = replicated(spark, copies).persist()
        n_docs = docs.count()
        words = U.word_table(docs)
        stats = words.agg(
            F.sum("freq").alias("n"), F.count("*").alias("d")
        ).collect()[0]

        t0 = time.perf_counter()
        vocab = U.unigram_fit(docs, vocab_size=200, n_iters=2,
                              max_piece_len=4)
        fit_wall = time.perf_counter() - t0

        t0 = time.perf_counter()
        U.piece_counts(U.word_table(docs), vocab, 4).agg(
            F.sum("c")
        ).collect()
        estep_wall = time.perf_counter() - t0

        docs.unpersist()
        results[f"{copies}x"] = {
            "n_docs": n_docs,
            "corpus_words": int(stats["n"]),
            "distinct_words": int(stats["d"]),
            "fit_wall_s": round(fit_wall, 2),
            "frozen_estep_wall_s": round(estep_wall, 2),
        }
        print(f"{copies}x: {results[f'{copies}x']}", flush=True)

    r1, r10 = results["1x"], results["10x"]
    results["ratios_10x_over_1x"] = {
        "fit_wall": round(r10["fit_wall_s"] / r1["fit_wall_s"], 2),
        "frozen_estep_wall": round(
            r10["frozen_estep_wall_s"] / r1["frozen_estep_wall_s"], 2
        ),
        "corpus_words": round(r10["corpus_words"] / r1["corpus_words"], 2),
        "distinct_words": round(
            r10["distinct_words"] / r1["distinct_words"], 2
        ),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_PROBE_unigram.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
