"""Tokenizer persistence: train -> save -> load -> encode must be
bit-identical to encoding with the in-session artifacts, and the
store must refuse tampered/mismatched artifacts."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from huckli_spark.operators.bpe import bpe_apply, bpe_train
from huckli_spark.operators.tokenizer_store import (
    bpe_table,
    load_tokenizer,
    merges_from_table,
    save_tokenizer,
)
from huckli_spark.operators.unigram_lm import unigram_encode, unigram_fit

TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest wide wide wide",
]


def _corpus(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


class TestRoundTrip:
    def test_unigram_save_load_encode_identical(self, spark, tmp_path):
        docs = _corpus(spark)
        vocab = unigram_fit(docs, vocab_size=40, n_iters=2)
        path = str(tmp_path / "uni")
        man = save_tokenizer(path, "unigram", vocab,
                             params={"vocab_size": 40, "n_iters": 2})
        assert man["n_rows"] == vocab.count()
        loaded, man2 = load_tokenizer(spark, path, expect_kind="unigram")
        assert man2["checksum"] == man["checksum"]
        a = sorted(tuple(r) for r in
                   unigram_encode(docs, vocab, 4).collect())
        b = sorted(tuple(r) for r in
                   unigram_encode(docs, loaded, 4).collect())
        assert a == b

    def test_bpe_save_load_apply_identical(self, spark, tmp_path):
        docs = _corpus(spark)
        merges, _ = bpe_train(docs, n_merges=8)
        path = str(tmp_path / "bpe")
        save_tokenizer(path, "bpe", bpe_table(spark, merges),
                       params={"n_merges": 8})
        loaded, _ = load_tokenizer(spark, path, expect_kind="bpe")
        got = merges_from_table(loaded)
        assert got == merges
        a = sorted(tuple(r) for r in bpe_apply(docs, merges).collect())
        b = sorted(tuple(r) for r in bpe_apply(docs, got).collect())
        assert a == b


class TestIntegrity:
    def _saved(self, spark, tmp_path):
        vocab = unigram_fit(_corpus(spark), vocab_size=30, n_iters=1)
        path = str(tmp_path / "store")
        save_tokenizer(path, "unigram", vocab)
        return path

    def test_kind_mismatch_refused(self, spark, tmp_path):
        path = self._saved(spark, tmp_path)
        with pytest.raises(ValueError, match="kind mismatch"):
            load_tokenizer(spark, path, expect_kind="bpe")

    def test_tampered_table_refused(self, spark, tmp_path):
        path = self._saved(spark, tmp_path)
        table, _ = load_tokenizer(spark, path)
        # overwrite the table with a drifted cost (materialize the
        # rows first — writing over the files being read corrupts)
        rows = [(r["piece"], r["cost"] + 1) for r in table.collect()]
        spark.createDataFrame(rows, "piece string, cost long").coalesce(
            1
        ).write.mode("overwrite").parquet(
            os.path.join(path, "table.parquet")
        )
        with pytest.raises(ValueError, match="checksum mismatch"):
            load_tokenizer(spark, path)

    def test_future_format_refused(self, spark, tmp_path):
        path = self._saved(spark, tmp_path)
        mp = os.path.join(path, "manifest.json")
        m = json.load(open(mp))
        m["format_version"] = 99
        json.dump(m, open(mp, "w"))
        with pytest.raises(ValueError, match="newer"):
            load_tokenizer(spark, path)

    def test_bad_kind_on_save(self, spark, tmp_path):
        vocab = unigram_fit(_corpus(spark), vocab_size=10, n_iters=1)
        with pytest.raises(ValueError, match="unknown tokenizer kind"):
            save_tokenizer(str(tmp_path / "x"), "wordpiece", vocab)

    def test_missing_columns_on_save(self, spark, tmp_path):
        vocab = unigram_fit(_corpus(spark), vocab_size=10, n_iters=1)
        with pytest.raises(ValueError, match="missing columns"):
            save_tokenizer(str(tmp_path / "x"), "bpe", vocab)


class TestUnigramServeRows:
    def test_serve_rows_round_trip_and_derived_lookback(self, spark, tmp_path):
        from huckli_spark.operators.tokenizer_store import save_tokenizer
        from huckli_spark.operators.unigram_lm import (
            unigram_fit,
            unigram_serve_rows,
        )

        docs = spark.createDataFrame(
            [(0, "international nation nation token tokenize")],
            "doc_id long, text string",
        )
        vocab = unigram_fit(docs, vocab_size=40, n_iters=1, max_piece_len=4)
        path = str(tmp_path / "tok")
        save_tokenizer(path, "unigram", vocab, params={"max_piece_len": 4})
        rows, lmax = unigram_serve_rows(spark, path)
        assert sorted(rows) == sorted(
            (r.piece, r.cost) for r in vocab.collect()
        )
        assert 1 <= lmax <= 4

    def test_serve_new_corpus_with_oov_chars(self, spark, tmp_path):
        # the advertised lifecycle: reload-and-encode on a NEW corpus —
        # unseen characters take the UNK char-fallback, never cost 0
        from pyspark.sql import functions as F

        from huckli_spark.operators.tokenizer_store import save_tokenizer
        from huckli_spark.operators.unigram_lm import (
            UNK_COST,
            tokens_in_row_expr,
            unigram_fit,
            unigram_serve_rows,
        )

        docs = spark.createDataFrame(
            [(0, "nation token nation tokenize")],
            "doc_id long, text string",
        )
        vocab = unigram_fit(docs, vocab_size=40, n_iters=1, max_piece_len=4)
        path = str(tmp_path / "tok")
        save_tokenizer(path, "unigram", vocab, params={})
        rows, lmax = unigram_serve_rows(spark, path)
        new = spark.createDataFrame(
            [(1, "QQ token")], "doc_id long, text string"
        )
        out = new.select(
            F.expr(tokens_in_row_expr(rows, lmax)).alias("tk")
        ).collect()[0].tk
        assert out.tokens[:2] == ["Q", "Q"]
        assert out.cost_micro >= 2 * UNK_COST
