"""Tests for text-analysis operators not covered by the oracle parity
suite: the heuristic language identifier and rolling fingerprints."""

from __future__ import annotations

import pytest

from huckli_spark.operators import textstats


class TestLanguageId:
    def test_major_languages(self, spark):
        rows = [
            (1, "the quick brown fox jumps over the lazy dog and it is fast"),
            (2, "le chat est sur la table et il regarde les oiseaux pour un moment"),
            (3, "der Hund und die Katze sind ein gutes Team mit dem Ball"),
            (4, "el perro y el gato son amigos para la vida es una historia"),
            (5, "xyzzy plugh qwerty asdf"),  # no stopword hits
        ]
        df = spark.createDataFrame(rows, "doc_id: long, text: string")
        out = {r.doc_id: r.predicted_lang for r in textstats.language_id(df).collect()}
        assert out[1] == "en"
        assert out[2] == "fr"
        assert out[3] == "de"
        assert out[4] == "es"
        assert out[5] == "und"

    def test_deterministic_tiebreak(self, spark):
        # 'la' scores for both fr and es -> alphabetical winner (es... de
        # has 0; es vs fr both hit 'la' once -> 'es' wins, being first
        # alphabetically among the tied maxima)
        df = spark.createDataFrame([(1, "la la")], "doc_id: long, text: string")
        out = textstats.language_id(df).collect()[0].predicted_lang
        assert out == "es"


class TestRollingFingerprint:
    def test_shapes_and_determinism(self, spark):
        text = " ".join(f"w{i}" for i in range(20))
        df = spark.createDataFrame(
            [(1, text), (2, text), (3, "short text only")],
            "doc_id: long, text: string",
        )
        out = {r.doc_id: r.fingerprints for r in
               textstats.rolling_fingerprint(df, window=8).collect()}
        assert len(out[1]) == 20 - 8 + 1
        assert out[1] == out[2]  # identical text -> identical prints
        assert out[3] == []  # shorter than the window

    def test_quality_score_range(self, spark):
        df = spark.createDataFrame(
            [(1, "the cat sat on the mat and it is a good day in the sun"),
             (2, "x"), (3, "!!! ??? ...")],
            "doc_id: long, text: string",
        )
        rows = {r.doc_id: r.score for r in textstats.quality_score(df).collect()}
        assert all(0.0 <= s <= 1.2 for s in rows.values())
        assert rows[1] > rows[2]


class TestCharEntropy:
    def test_extremes(self, spark):
        from huckli_spark.operators.textstats import char_entropy

        docs = spark.createDataFrame(
            [(0, "aaaaaaaaaa"), (1, "abcdefghij"), (2, "aabb")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in char_entropy(docs).collect()}
        assert out[0]["entropy_nats"] == 0.0  # constant text
        import math

        assert out[1]["entropy_nats"] == pytest.approx(math.log(10), abs=1e-4)
        assert out[2]["entropy_nats"] == pytest.approx(math.log(2), abs=1e-4)
        assert out[1]["n_distinct_chars"] == 10

    def test_partitioning_invariance(self, spark):
        from huckli_spark.operators.textstats import char_entropy

        docs = spark.createDataFrame(
            [(i, f"doc {i} " + "abcabcxyz" * (i % 5 + 1)) for i in range(40)],
            "doc_id long, text string",
        )
        a = sorted(map(tuple, char_entropy(docs.repartition(1)).collect()))
        b = sorted(map(tuple, char_entropy(docs.repartition(32)).collect()))
        assert a == b
