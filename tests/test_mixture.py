"""DoReMi domain-mixture optimizer: trajectory invariants,
reweighting behavior, and partitioning invariance. Engine parity
(Spark vs the generated DuckDB replay) is gated by
q_doremi_mixture's oracle in the registry/replica."""

from __future__ import annotations

from pyspark.sql import functions as F

from huckli_spark.operators.mixture import doremi_mixture

def LABEL():
    return F.expr(
        "array_contains(split(text, ' '), 'aa')"
        " OR array_contains(split(text, ' '), 'bb')"
    )


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )


def _fixture_docs(spark):
    # 3 domains with different vocab/label structure: d0 is easy
    # (label words everywhere), d2 is hard (label never co-occurs
    # with its own vocabulary pattern)
    rows = []
    for i in range(30):
        rows.append((i, "aa bb cc dd aa", "d0"))
    for i in range(30, 60):
        rows.append((i, "ee ff gg hh" + (" aa" if i % 2 else ""), "d1"))
    for i in range(60, 90):
        rows.append((i, "ii jj kk ll mm nn" + (" bb" if i % 5 == 0 else ""),
                     "d2"))
    return _docs(spark, rows)


class TestTrajectory:
    def test_invariants(self, spark):
        out = doremi_mixture(
            _fixture_docs(spark), LABEL(), rounds=3, inner_iters=1,
            ref_iters=3
        ).collect()
        assert len(out) == 9  # 3 rounds x 3 domains
        uni = 100 // 3
        by_round: dict = {}
        for r in out:
            assert r.excess_micro >= 0
            assert r.lam_out_milli >= uni  # smoothing floor
            by_round.setdefault(r.round, []).append(r)
        for r, rows in by_round.items():
            s = sum(x.lam_out_milli for x in rows)
            assert 900 <= s <= 1000  # floored normalization
        # round r's lam_out is round r+1's lam_in
        for r in range(2):
            a = {x.dom: x.lam_out_milli for x in by_round[r]}
            b = {x.dom: x.lam_in_milli for x in by_round[r + 1]}
            assert a == b

    def test_worst_domain_gains_weight(self, spark):
        out = doremi_mixture(
            _fixture_docs(spark), LABEL(), rounds=1, inner_iters=1,
            ref_iters=3
        ).collect()
        rows = {r.dom: r for r in out}
        worst = max(rows.values(), key=lambda r: r.excess_micro)
        if worst.excess_micro > 0:
            others = [r for r in rows.values() if r.dom != worst.dom]
            assert all(
                worst.lam_out_milli >= o.lam_out_milli
                or o.excess_micro > 0
                for o in others
            )

    def test_eta_zero_keeps_uniform(self, spark):
        out = doremi_mixture(
            _fixture_docs(spark), LABEL(), rounds=2, inner_iters=1,
            ref_iters=2, eta_milli=0
        ).collect()
        # mult = 1 for every domain: normalize+smooth is the identity
        # on the uniform start (333 -> 299+33 = 332 after flooring)
        lams = {(r.round, r.dom): r.lam_out_milli for r in out}
        assert len(set(lams.values())) == 1

    def test_partitioning_invariance(self, spark):
        docs = _fixture_docs(spark)
        a = sorted(tuple(r) for r in
                   doremi_mixture(docs, LABEL(), rounds=2).collect())
        b = sorted(
            tuple(r)
            for r in doremi_mixture(
                docs.repartition(7), LABEL(), rounds=2
            ).collect()
        )
        assert a == b

    def test_fixture_lang_domains(self, spark):
        from tests.conftest import SF_SMALL

        docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        label = F.expr(
            "array_contains(split(text, ' '), 'spark')"
            " OR array_contains(split(text, ' '), 'sql')"
        )
        out = doremi_mixture(docs, label).collect()
        assert len(out) == 15  # 3 rounds x 5 langs
        assert {r.dom for r in out} == {"de", "en", "es", "fr", "zh"}


class TestDomainLiteralEscaping:
    def test_backslash_and_quote_domains(self, spark):
        # ADVICE r08 #4: a backslash or quote in a domain string must
        # ride the generated VALUES relation intact
        rows = []
        for i in range(20):
            rows.append((i, "aa bb cc dd aa", "d'0\\x"))
        for i in range(20, 40):
            rows.append((i, "ee ff gg hh" + (" aa" if i % 2 else ""),
                         'd"1\\'))
        out = doremi_mixture(
            _docs(spark, rows), LABEL(), rounds=2, inner_iters=1,
            ref_iters=2
        ).collect()
        assert len(out) == 4  # 2 rounds x 2 domains
        assert {r.dom for r in out} == {"d'0\\x", 'd"1\\'}
        assert all(r.n_docs == 20 for r in out)


class TestTemperatureWeights:
    def _docs(self, spark):
        # 6/3/2 docs of 8 tokens each: token masses 48/24/16, so
        # alpha=0 boosts are the exact integers 1/2/3
        rows = []
        for i in range(11):
            src = ["big", "mid", "small"][0 if i < 6 else (1 if i < 9 else 2)]
            rows.append((f"d{i}", src, "w " * 7 + "end"))
        return spark.createDataFrame(rows, ["doc_id", "source", "text"])

    def test_alpha_one_is_natural_mix(self, spark):
        from huckli_spark.operators.mixture import temperature_weights

        out = temperature_weights(self._docs(spark), alpha=1.0).collect()
        assert {r["boost_micro"] for r in out} == {1_000_000}

    def test_alpha_zero_is_full_flattening(self, spark):
        from huckli_spark.operators.mixture import temperature_weights

        out = {r["source"]: r for r in
               temperature_weights(self._docs(spark), alpha=0.0).collect()}
        # boost = n_max / n_s exactly at alpha=0
        assert out["big"]["boost_micro"] == 1_000_000
        assert out["mid"]["boost_micro"] == 2_000_000
        assert out["small"]["boost_micro"] == 3_000_000

    def test_monotone_and_share_exact(self, spark):
        from huckli_spark.operators.mixture import temperature_weights

        rows = temperature_weights(self._docs(spark), alpha=0.3).collect()
        by = {r["source"]: r for r in rows}
        assert (by["small"]["boost_micro"] > by["mid"]["boost_micro"]
                > by["big"]["boost_micro"] == 1_000_000)
        tot = sum(r["n_tokens"] for r in rows)
        for r in rows:
            assert r["share_ppm"] == r["n_tokens"] * 1_000_000 // tot

    def test_weight_map_round_trips_micros(self, spark):
        from huckli_spark.operators.mixture import (
            temperature_weight_map,
            temperature_weights,
        )

        d = self._docs(spark)
        micros = {r["source"]: r["boost_micro"]
                  for r in temperature_weights(d, alpha=0.3).collect()}
        wmap = temperature_weight_map(d, alpha=0.3)
        assert set(wmap) == set(micros)
        for s, w in wmap.items():
            assert int(w * 1_000_000 + 0.5) == micros[s]

    def test_rejects_alpha_out_of_range(self, spark):
        import pytest as _pytest

        from huckli_spark.operators.mixture import temperature_weights

        with _pytest.raises(ValueError):
            temperature_weights(self._docs(spark), alpha=1.5)

    def test_composes_with_mix_shuffle(self, spark):
        from huckli_spark.operators.mixture import temperature_weight_map
        from huckli_spark.operators.packing import epoch_mix_shuffle

        d = self._docs(spark)
        mixed = epoch_mix_shuffle(
            d, temperature_weight_map(d, alpha=0.0), epoch=3
        ).collect()
        # alpha=0 weights are exact integers (1, 2, 3): copy counts
        # are deterministic per source
        per_src = {}
        for r in mixed:
            per_src.setdefault(r["source"], set()).add(
                (r["doc_id"], r["copy"])
            )
        assert len(per_src["big"]) == 6      # 6 docs x 1
        assert len(per_src["mid"]) == 6      # 3 docs x 2
        assert len(per_src["small"]) == 6    # 2 docs x 3
        pos = sorted(r["pos"] for r in mixed)
        assert pos == list(range(1, len(mixed) + 1))

    def test_null_source_is_loud(self, spark):
        import pytest as _pytest

        from huckli_spark.operators.mixture import temperature_weight_map

        d = spark.createDataFrame(
            [("a", None, "w w"), ("b", "s", "w w")],
            "doc_id string, source string, text string",
        )
        with _pytest.raises(ValueError, match="NULL"):
            temperature_weight_map(d, alpha=0.3)
