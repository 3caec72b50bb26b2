#!/usr/bin/env python
"""Exact-substring-dedup scaling probe (round 10).

duplicate_spans' scale claim: the corpus-sized gram relation shuffles
ONCE (occurrence count via a window partitioned by the gram itself),
so wall should track corpus size ~linearly as long as gram partitions
stay small (occurrence counts). Probe at 1x / 10x a synthetic corpus
with a realistic duplication profile (90% unique docs, 10% verbatim
copies of a shared template pool — duplicated spans cover the copies
end to end), recording wall, span rows, and the largest gram group
(the irreducible tie bound). Writes SCALE_PROBE_substring.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from huckli_spark.operators.dedup import duplicate_spans
from huckli_spark.session import get_spark

BASE_DOCS = 30_000
WORDS_PER_DOC = 40
TEMPLATES = 50
L = 5


def fixture(spark, n_docs: int):
    """90% unique docs (id-seeded words), 10% copies of one of
    TEMPLATES shared templates (template-seeded words) — every copy
    pair shares its full 40-word text verbatim."""
    # hash-mixed word ids: an affine (seed*a + i*b) form makes every
    # doc a shifted copy of others (the whole corpus near-dups)
    k = "(abs(xxhash64(seed, i)) % 200000)"
    word = (
        f"concat(char(97 + ({k} div 17576) % 26),"
        f" char(97 + ({k} div 676) % 26),"
        f" char(97 + ({k} div 26) % 26),"
        f" char(97 + {k} % 26))"
    )
    return (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.when(
                F.col("id") % 10 == 0, (F.col("id") % TEMPLATES) + 1_000_000
            )
            .otherwise(F.col("id"))
            .alias("seed"),
        )
        .select(
            "doc_id",
            F.expr(
                f"array_join(transform(sequence(0, {WORDS_PER_DOC - 1}),"
                f" i -> {word}), ' ')"
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )


def main() -> None:
    spark = get_spark(app_name="substring_probe")
    spark.sparkContext.setLogLevel("ERROR")
    duplicate_spans(fixture(spark, 2_000), window_len=L).count()  # warmup

    results: dict = {
        "words_per_doc": WORDS_PER_DOC,
        "window_len": L,
        "templates": TEMPLATES,
    }
    for mult in (1, 10):
        n = BASE_DOCS * mult
        docs = fixture(spark, n)
        t0 = time.perf_counter()
        spans = duplicate_spans(docs, window_len=L)
        n_spans = spans.count()
        wall = time.perf_counter() - t0
        results[f"{mult}x"] = {
            "docs": n,
            "wall_s": round(wall, 3),
            "span_rows": n_spans,
        }
        print(f"{mult}x: {results[f'{mult}x']}", flush=True)
        docs.unpersist()
    results["ratio_10x_over_1x"] = {
        "wall": round(
            results["10x"]["wall_s"] / results["1x"]["wall_s"], 3
        ),
        "docs": 10.0,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_PROBE_substring.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
