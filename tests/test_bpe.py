"""Distributed BPE vs the pure-Python reference: merge tables and
final tokenizations must match EXACTLY (same frequency-then-
lexicographic tiebreak), on crafted corpora and on the fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from huckli_spark.operators.bpe import (
    bpe_apply,
    bpe_train,
    bpe_train_local,
    word_freqs,
)


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _local_freqs(texts):
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    return freqs


class TestBpeDifferential:
    def test_matches_local_reference(self, spark):
        texts = [
            "low lower lowest low low",
            "new newer newest new",
            "wide wider widest wide wide wide",
        ]
        dist_merges, dist_words = bpe_train(_corpus(spark, texts), n_merges=8)
        ref_merges, ref_words = bpe_train_local(_local_freqs(texts), n_merges=8)
        assert dist_merges == ref_merges
        got = {r["word"]: list(r["syms"]) for r in dist_words.collect()}
        assert got == ref_words

    def test_checkpoint_interval_does_not_change_merges(self, spark):
        # lineage checkpointing is a pure driver-side optimization:
        # training across several checkpoint boundaries must produce
        # the identical merge table and word table
        texts = [
            "low lower lowest low low",
            "new newer newest new",
            "wide wider widest wide wide wide",
        ]
        ck_merges, ck_words = bpe_train(
            _corpus(spark, texts), n_merges=8, checkpoint_every=3
        )
        ref_merges, ref_words = bpe_train_local(_local_freqs(texts), n_merges=8)
        assert ck_merges == ref_merges
        got = {r["word"]: list(r["syms"]) for r in ck_words.collect()}
        assert got == ref_words

    def test_fixture_corpus_differential(self, spark):
        import os

        docs = spark.read.parquet(
            os.path.join("/root/testdata/sf0.001", "documents.parquet")
        )
        texts = [r["text"] for r in docs.select("text").collect()]
        dist_merges, dist_words = bpe_train(docs, n_merges=6)
        ref_merges, ref_words = bpe_train_local(_local_freqs(texts), n_merges=6)
        assert dist_merges == ref_merges
        got = {r["word"]: list(r["syms"]) for r in dist_words.collect()}
        assert got == ref_words

    def test_apply_equals_training_tokenization(self, spark):
        texts = ["aa ab aa ab ba", "aa aa b"]
        corpus = _corpus(spark, texts)
        merges, trained = bpe_train(corpus, n_merges=4)
        applied = bpe_apply(corpus, merges)
        by_word = {
            r["word"]: list(r["syms"]) for r in trained.collect()
        }
        for r in applied.collect():
            assert list(r["syms"]) == by_word[r["__w"]], r

    def test_merge_is_leftmost_nonoverlapping(self, spark):
        # "aaa" with merge (a,a) must become [aa, a], not [a, aa]
        merges, words = bpe_train(_corpus(spark, ["aaa aaa"]), n_merges=1)
        assert merges == [("a", "a")]
        got = {r["word"]: list(r["syms"]) for r in words.collect()}
        assert got["aaa"] == ["aa", "a"]

    def test_word_freqs_weighting(self, spark):
        wf = {
            r["word"]: r["freq"]
            for r in word_freqs(_corpus(spark, ["x x y", "x"])).collect()
        }
        assert wf == {"x": 3, "y": 1}

    def test_partitioning_invariance(self, spark):
        texts = ["pack my box with five dozen jugs"] * 7 + ["quartz quartz"]
        c1 = _corpus(spark, texts).repartition(1)
        c2 = _corpus(spark, texts).repartition(32)
        m1, _ = bpe_train(c1, n_merges=5)
        m2, _ = bpe_train(c2, n_merges=5)
        assert m1 == m2


class TestFrozenFixtureMerges:
    def test_frozen_table_matches_fresh_training(self, spark):
        # q_bpe_encode applies a FROZEN merge table; re-derive it from
        # the fixture so the constant can never drift silently.
        from huckli_spark.queries.governance import BPE_FIXTURE_MERGES

        docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        merges, _ = bpe_train(docs, n_merges=8)
        assert merges == BPE_FIXTURE_MERGES

    def test_apply_matches_local_on_adversarial_words(self, spark):
        # overlap-heavy words through the mapInPandas serving path vs
        # the pure-Python reference loop
        from huckli_spark.operators.bpe import _apply_merges_local

        merges = [("a", "a"), ("aa", "b"), ("e", "r"), ("er", "er")]
        words = ["aaaa", "aaab", "baaab", "ererer", "err", "x", "aabaab"]
        corpus = spark.createDataFrame(
            [(w,) for w in words], "text string"
        )
        got = {
            r["__w"]: list(r["syms"])
            for r in bpe_apply(corpus, merges).collect()
        }
        assert got == {w: _apply_merges_local(w, merges) for w in words}

    def test_apply_skips_null_text(self, spark):
        # null text must produce no tokens (matches split(NULL) -> no
        # rows), never the literal string "None"
        corpus = spark.createDataFrame(
            [(0, "ab"), (1, None)], "doc_id long, text string"
        )
        rows = bpe_apply(corpus, [("a", "b")]).collect()
        assert {r["doc_id"] for r in rows} == {0}
        assert [list(r["syms"]) for r in rows] == [["ab"]]
