#!/usr/bin/env python
"""Exact-substring CUT-application scaling probe (round 11, VERDICT
r10 directive #4).

SCALE_PROBE_substring.json proved span DETECTION is ~linear (2.9x
wall at 10x docs); this probe times the APPLICATION —
``cut_duplicate_spans`` end to end: span detection, the O(affected
docs) span aggregation, the join-back on the document key, and the
in-row span-exclusion filter — on the same 90%-unique / 10%-template
corpus profile, and verifies the cut output (words removed == span
coverage) so the timed run is the real operator, not a skipped plan.
Writes SCALE_PROBE_substring_cut.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from huckli_spark.operators.dedup import cut_duplicate_spans
from huckli_spark.session import get_spark
from tools.substring_probe import BASE_DOCS, L, WORDS_PER_DOC, fixture


def main() -> None:
    spark = get_spark(app_name="substring_cut_probe")
    spark.sparkContext.setLogLevel("ERROR")
    cut_duplicate_spans(fixture(spark, 2_000), window_len=L).count()  # warmup

    results: dict = {"words_per_doc": WORDS_PER_DOC, "window_len": L}
    for mult in (1, 10):
        n = BASE_DOCS * mult
        docs = fixture(spark, n)
        t0 = time.perf_counter()
        cut = cut_duplicate_spans(docs, window_len=L)
        agg = cut.agg(
            F.count("*").alias("docs"),
            F.sum("n_cut_words").alias("words_cut"),
            F.sum(F.when(F.col("text_cut") == "", 1).otherwise(0)).alias(
                "emptied"
            ),
        ).collect()[0]
        wall = time.perf_counter() - t0
        assert agg["docs"] == n
        # every 10th doc is a full-template copy: its whole 40-word
        # text is duplicated, so the conservative cut empties it
        assert agg["emptied"] == n // 10, agg
        assert agg["words_cut"] == (n // 10) * WORDS_PER_DOC, agg
        results[f"{mult}x"] = {
            "docs": n,
            "wall_s": round(wall, 3),
            "words_cut": int(agg["words_cut"]),
            "docs_emptied": int(agg["emptied"]),
        }
        print(f"{mult}x: {results[f'{mult}x']}", flush=True)
        docs.unpersist()
    results["ratio_10x_over_1x"] = {
        "wall": round(results["10x"]["wall_s"] / results["1x"]["wall_s"], 3),
        "docs": 10.0,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_PROBE_substring_cut.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
