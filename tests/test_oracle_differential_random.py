"""Cross-engine differentials on RANDOM corpora (not just the
fixture): the generated DuckDB oracles for the two most intricate
trainers — the unigram-LM tokenizer (unrolled Viterbi DP CTEs) and
DoReMi (weighted-GD + multiplicative-weights CTEs) — must match
Spark bit-for-bit on seeded random corpora with vocabularies,
word-length mixes, and domain imbalances the fixture never
exercises."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _random_corpus(seed: int, n_docs: int = 60):
    rng = random.Random(seed)
    syllables = ["ka", "to", "ri", "mu", "ze", "lon", "qua", "x", "ab"]
    langs = ["aa", "bb", "cc"]
    rows = []
    for i in range(n_docs):
        n_words = rng.randint(1, 12)
        words = []
        for _ in range(n_words):
            w = "".join(
                rng.choice(syllables)
                for _ in range(rng.randint(1, 5))
            )
            words.append(w)
        # imbalanced domains: lang aa gets ~60% of docs
        lang = langs[0] if rng.random() < 0.6 else rng.choice(langs[1:])
        rows.append((i, " ".join(words), lang))
    return rows


def _duck_with(rows):
    con = duckdb.connect()
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    con.register("documents_pd", df)
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_pd")
    return con


@pytest.mark.parametrize("seed", [7, 1234, 99991])
def test_unigram_oracle_matches_on_random_corpus(spark, seed):
    from huckli_spark.operators.unigram_lm import (
        unigram_oracle_sql,
        unigram_table,
    )

    rows = _random_corpus(seed)
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    got = sorted(
        (r.piece, r.cost_micro, r.corpus_count)
        for r in unigram_table(
            docs, vocab_size=50, n_iters=2, max_piece_len=4
        ).collect()
    )
    con = _duck_with(rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            unigram_oracle_sql(vocab_size=50, n_iters=2, max_piece_len=4)
        ).fetchall()
    )
    assert got == want


@pytest.mark.parametrize("seed", [11, 4242])
def test_doremi_oracle_matches_on_random_corpus(spark, seed):
    from huckli_spark.operators.mixture import doremi_mixture, sql_doremi

    rows = _random_corpus(seed, n_docs=45)
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    label = F.expr("length(text) % 2 = 0")
    got = sorted(
        tuple(r)
        for r in doremi_mixture(
            docs, label, ref_iters=3, rounds=2, inner_iters=1
        ).collect()
    )
    con = _duck_with(rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            sql_doremi(
                "length(text) % 2 = 0",
                ref_iters=3,
                rounds=2,
                inner_iters=1,
            )
        ).fetchall()
    )
    assert got == want
