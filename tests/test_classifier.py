"""Fixed-point logistic-regression classifier tests: separable-corpus
learning, partition invariance of the exact training, and output
invariants. Cross-engine parity (training replayed in DuckDB) is
covered by the gate query q_logreg_quality."""

from __future__ import annotations

from pyspark.sql import functions as F

from huckli_spark.operators.classifier import MICRO, logreg_table


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def LABEL():
    # F.expr needs an active session — build lazily inside tests
    return F.expr("array_contains(split(text, ' '), 'marker')")


class TestLogReg:
    def test_learns_separable_corpus(self, spark):
        # positives carry 'marker', negatives a disjoint vocabulary —
        # linearly separable through the marker's hash bucket
        docs = _docs(
            spark,
            ["marker alpha beta", "marker gamma delta", "marker epsilon"] * 3
            + ["zeta eta theta", "iota kappa lam", "mu nu xi"] * 3,
        )
        out = logreg_table(docs, LABEL(), iterations=8)
        wrong = out.where(F.col("pred") != F.col("is_target")).count()
        assert wrong == 0

    def test_partition_invariant_training(self, spark):
        docs = _docs(
            spark,
            ["marker a b", "marker c d", "e f g", "h i j", "marker k", "l m"],
        )
        a = logreg_table(docs, LABEL(), iterations=4)
        b = logreg_table(docs.repartition(5), LABEL(), iterations=4)
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        )

    def test_output_shape_and_bounds(self, spark):
        docs = _docs(spark, ["marker a", "b c", "d e f"])
        out = logreg_table(docs, LABEL(), iterations=2).collect()
        assert len(out) == 3
        assert {r["doc_id"] for r in out} == {0, 1, 2}
        for r in out:
            assert 0 <= r["p_micro"] <= MICRO
            assert r["pred"] == (r["p_micro"] >= MICRO // 2)

    def test_zero_iterations_predicts_half(self, spark):
        # with w = 0 every score is exactly p = 0.5 (500000 micro)
        docs = _docs(spark, ["marker a", "b c"])
        out = logreg_table(docs, LABEL(), iterations=0).collect()
        assert {r["p_micro"] for r in out} == {MICRO // 2}


class TestLogRegHoldout:
    def test_holdout_rows_do_not_influence_training(self, spark):
        from huckli_spark.operators.classifier import logreg_holdout_table

        train_docs = [
            "marker alpha beta", "marker gamma delta",
            "zeta eta theta", "iota kappa lam",
        ]
        a = _docs(spark, train_docs + ["marker holdout words"])
        b = _docs(spark, train_docs + ["entirely different text here"])
        is_train = F.col("doc_id") < 4
        ra = logreg_holdout_table(a, LABEL(), is_train, iterations=4)
        rb = logreg_holdout_table(b, LABEL(), is_train, iterations=4)
        # training rows score identically whatever the held-out text is
        ta = sorted(map(tuple, ra.where("is_train").collect()))
        tb = sorted(map(tuple, rb.where("is_train").collect()))
        assert ta == tb

    def test_output_covers_both_splits(self, spark):
        from huckli_spark.operators.classifier import logreg_holdout_table

        docs = _docs(spark, ["marker a", "b c", "marker d", "e f"])
        out = logreg_holdout_table(
            docs, LABEL(), F.col("doc_id") < 2, iterations=2
        ).collect()
        assert len(out) == 4
        assert {r["doc_id"]: r["is_train"] for r in out} == {
            0: True, 1: True, 2: False, 3: False,
        }
