#!/usr/bin/env python
"""BPE merge-count scaling probe (VERDICT r07 #6).

``bpe_train`` unrolls one dataflow round per merge; real tokenizers
need thousands of merges, so the question is whether per-merge wall
stays FLAT as the merge count grows. Before round 8 it did not: each
iteration's plan re-analysis walked the whole lineage, an
O(n_merges^2) driver tax. ``checkpoint_every`` (localCheckpoint, the
PCA/PageRank discipline) bounds plan depth by the interval.

This probe trains the sf0.1 documents corpus at 30 / 100 / 300 merges
with lineage checkpointing, plus 15-merge runs with and WITHOUT it
(15 is the most the uncheckpointed path survives — 20 merges OOM the
8 GiB driver), and records wall seconds and seconds-per-merge.
Writes SCALE_PROBE_bpe_merges.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from huckli_spark.operators.bpe import bpe_train
from huckli_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bpe_merge_probe")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    # The synthetic fixture has a 31-word vocabulary — BPE runs dry at
    # ~89 merges. Salt each word with a per-doc token (doc_id % 50) so
    # the vocab grows to ~1.5k words and a 300-merge run has real
    # material; the corpus size and word-table shape are unchanged.
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id",
        F.expr(
            "array_join(transform(split(text, ' '), "
            "w -> concat(w, '_', cast(doc_id % 50 AS string))), ' ')"
        ).alias("text"),
    )

    out: dict = {"sf_dir": sf_dir, "vocab": "salted (doc_id % 50)", "runs": {}}
    # warmup: JIT the codegen paths once so run 1 isn't penalized
    bpe_train(docs, n_merges=3)

    for label, n, ck in [
        ("m30_ck10", 30, 10),
        ("m100_ck10", 100, 10),
        ("m300_ck10", 300, 10),
        # pre-r8 control: lineage never cut. 15 is the most the old
        # path survives — 20 uncheckpointed merges OOM an 8 GiB
        # driver (the per-level ~6x syms references blow up plan
        # canonicalization/stringification superlinearly)
        ("m15_nockpt", 15, 10**9),
        ("m15_ck10", 15, 10),
    ]:
        t0 = time.perf_counter()
        merges, words = bpe_train(docs, n_merges=n, checkpoint_every=ck)
        n_words = words.count()
        wall = round(time.perf_counter() - t0, 3)
        words.unpersist()
        out["runs"][label] = {
            "n_merges": len(merges),
            "wall_s": wall,
            "s_per_merge": round(wall / max(len(merges), 1), 4),
            "n_words": n_words,
        }
        print(label, out["runs"][label], flush=True)

    r = out["runs"]
    out["summary"] = {
        # flat per-merge wall across 30 -> 300 is the pass criterion
        "per_merge_ratio_300_vs_30": round(
            r["m300_ck10"]["s_per_merge"] / r["m30_ck10"]["s_per_merge"], 2
        ),
        "checkpoint_speedup_at_15": round(
            r["m15_nockpt"]["wall_s"] / r["m15_ck10"]["wall_s"], 2
        ),
        "nockpt_limit": "20 uncheckpointed merges OOM an 8GiB driver",
    }
    out["loadavg"] = list(os.getloadavg())
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROBE_bpe_merges.json",
    )
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["summary"]))


if __name__ == "__main__":
    main()
