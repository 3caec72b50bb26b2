#!/usr/bin/env python
"""Unigram serving probe at production vocab scale (VERDICT r09 #6).

The streaming encode path bakes the trained (piece, cost) table as a
map LITERAL (plan weight O(vocab) — documented as fine "at serving
vocabs in the thousands"); the production path at 100k+ pieces is the
ONE-ROW broadcast map (``encode_docs_broadcast``, plan weight O(1)).
That crossover was documented but unmeasured. Probe both paths at
vocab 1k / 8k / 32k over a synthetic corpus whose lexicon is rich
enough to actually yield those vocab sizes (5-letter base-26 words —
the real sf0.01 fixture tops out at 228 candidate pieces), vocab =
one costed candidate pass (n_iters=0 — the encode is what's being
timed, not the fit), same corpus, same session, recording wall
(which for the literal path includes the plan-compile cost that
grows with the literal) and the literal expression's size. Equality
of the two paths is pinned separately in tests/test_unigram_lm.py.
Writes SCALE_PROBE_unigram_vocab.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from huckli_spark.operators.unigram_lm import (
    encode_docs_broadcast,
    tokens_in_row_expr,
    unigram_fit,
)
from huckli_spark.session import get_spark

VOCABS = (1_000, 8_000, 32_000)
N_DOCS = 100_000
WORDS_PER_DOC = 12


def synth_docs(spark):
    """JVM-side synthetic corpus: 5-letter base-26 words drawn from a
    ~40k-word lexicon — plenty of distinct 2-4-char substrings so the
    candidate pass can actually fill a 32k vocab."""
    k = "((id * 131 + i * 7919) % 40000)"
    word = (
        f"concat(char(97 + ({k} div 456976) % 26),"
        f" char(97 + ({k} div 17576) % 26),"
        f" char(97 + ({k} div 676) % 26),"
        f" char(97 + ({k} div 26) % 26),"
        f" char(97 + {k} % 26))"
    )
    return (
        spark.range(N_DOCS)
        .select(
            F.col("id").alias("doc_id"),
            F.expr(
                f"array_join(transform(sequence(0, {WORDS_PER_DOC - 1}),"
                f" i -> {word}), ' ')"
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )


def main() -> None:
    spark = get_spark(app_name="unigram_vocab_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_docs(spark)
    n_docs = docs.count()

    results: dict = {"n_docs": n_docs, "words_per_doc": WORDS_PER_DOC}
    for v in VOCABS:
        vocab = unigram_fit(docs, vocab_size=v, n_iters=0,
                            max_piece_len=4).localCheckpoint(eager=True)
        vrows = [(r.piece, r.cost) for r in vocab.collect()]
        row: dict = {"vocab_rows": len(vrows)}

        t0 = time.perf_counter()
        expr = tokens_in_row_expr(vrows, 4)
        lit = docs.select("doc_id", F.expr(expr).alias("tk")).agg(
            F.sum(F.col("tk.cost_micro"))
        )
        lit.collect()
        row["wall_s_literal"] = round(time.perf_counter() - t0, 3)
        row["literal_expr_chars"] = len(expr)

        t0 = time.perf_counter()
        bc = encode_docs_broadcast(docs, vocab, 4).agg(
            F.sum(F.col("tk.cost_micro"))
        )
        bc.collect()
        row["wall_s_broadcast_map"] = round(time.perf_counter() - t0, 3)

        results[f"vocab_{v}"] = row
        print(f"vocab={v}: {row}", flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_PROBE_unigram_vocab.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
