"""Property tests for the corpus-quality operators (repetition stats,
contamination, content-defined chunking)."""

from __future__ import annotations

from pyspark.sql import functions as F

from huckli_spark.operators.dedup import contamination
from huckli_spark.operators.textstats import cdc_chunks, repetition_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


class TestRepetitionStats:
    def test_all_same_word_is_maximally_repetitious(self, spark):
        out = repetition_stats(_docs(spark, [(1, "spam spam spam spam")])).collect()[0]
        assert out.n_words == 4
        assert out.distinct_ratio == 0.25
        assert out.top_word_frac == 1.0
        assert out.top_bigram_frac == 1.0  # 'spam spam' x3 of 3

    def test_all_distinct_words(self, spark):
        out = repetition_stats(_docs(spark, [(1, "a b c d")])).collect()[0]
        assert out.distinct_ratio == 1.0
        assert out.top_word_frac == 0.25
        # every bigram unique -> 1/3
        assert out.top_bigram_frac == 0.3333

    def test_single_word_doc_has_no_bigrams(self, spark):
        out = repetition_stats(_docs(spark, [(1, "solo")])).collect()[0]
        assert out.n_words == 1 and out.top_bigram_frac == 0.0


class TestContamination:
    def test_identical_doc_fully_contained(self, spark):
        text = "the quick brown fox jumps over the lazy dog"
        cand = _docs(spark, [(10, text), (11, "completely different words here now")])
        hold = _docs(spark, [(1, text)])
        got = {r.doc_id: r for r in contamination(cand, hold).collect()}
        assert got[10].containment == 1.0
        assert got[10].n_shared == got[10].n_shingles
        assert got[11].containment == 0.0 and got[11].n_shared == 0

    def test_partial_overlap_counts_shared_shingles(self, spark):
        # doc shares exactly its first 3-gram with the holdout
        cand = _docs(spark, [(10, "a b c x y z w")])
        hold = _docs(spark, [(1, "a b c unrelated tail")])
        r = contamination(cand, hold).collect()[0]
        assert r.n_shared == 1 and r.n_shingles == 5
        assert r.containment == 0.2


class TestCdcChunks:
    def test_chunks_reassemble_to_document(self, spark):
        text = "w" + " ".join(f"t{i}" for i in range(50))
        df = _docs(spark, [(1, text)])
        rows = sorted(cdc_chunks(df).collect(), key=lambda r: r.chunk_id)
        assert " ".join(r.chunk_text for r in rows) == text
        assert [r.chunk_id for r in rows] == list(range(1, len(rows) + 1))

    def test_boundaries_survive_prefix_edit(self, spark):
        """The CDC property: prepending words only perturbs chunks up
        to the first content boundary; every later chunk is identical."""
        base = " ".join(f"tok{i}" for i in range(80))
        edited = "inserted words here " + base
        out = cdc_chunks(_docs(spark, [(1, base), (2, edited)]))
        h1 = {r.chunk_hash for r in out.where(F.col("doc_id") == 1).collect()}
        h2 = {r.chunk_hash for r in out.where(F.col("doc_id") == 2).collect()}
        common = h1 & h2
        # all chunks after the first boundary in the original survive
        assert len(common) >= len(h1) - 1
        assert common  # and there genuinely are surviving chunks

    def test_chunk_hash_matches_portable_h60(self, spark):
        from huckli_spark.functions.portable import h60

        df = _docs(spark, [(1, "a b c d e f g h")])
        rows = cdc_chunks(df).collect()
        check = spark.createDataFrame(
            [(r.chunk_text, r.chunk_hash) for r in rows], "t: string, h: long"
        ).select((h60(F.col("t")) == F.col("h")).alias("ok"))
        assert all(r.ok for r in check.collect())


class TestContainmentPairs:
    def test_superset_caught_jaccard_missed(self, spark):
        from huckli_spark.operators.dedup import (
            containment_pairs,
            jaccard_pairs,
        )

        # doc 1 fully contained in doc 2 (quote-extraction shape):
        # Jaccard = 3/6 = 0.5 (under the 0.8 dedup bar), containment
        # of doc 1 in doc 2 = 1.0
        docs = spark.createDataFrame(
            [
                (1, "a b c d e"),
                (2, "a b c d e f g h"),
                (3, "x y z w v"),
            ],
            "doc_id long, text string",
        )
        jac = jaccard_pairs(docs, threshold=0.8).collect()
        assert jac == []  # jaccard misses the superset pair
        out = containment_pairs(docs, threshold=0.9).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["d1"], r["d2"]) == (1, 2)
        assert r["cont_1_in_2"] == 1.0  # all of doc 1's shingles in doc 2
        assert r["cont_2_in_1"] == 0.5  # 3 of doc 2's 6 shingles

    def test_threshold_applies_to_greater_direction(self, spark):
        from huckli_spark.operators.dedup import containment_pairs

        docs = spark.createDataFrame(
            [(1, "a b c d"), (2, "a b c z y x w")],
            "doc_id long, text string",
        )
        # doc1: shingles {abc, bcd}; doc2: {abc, bcz, czy, zyx, yxw};
        # common = {abc}: c12 = 0.5, c21 = 0.2
        assert containment_pairs(docs, threshold=0.5).count() == 1
        assert containment_pairs(docs, threshold=0.6).count() == 0
