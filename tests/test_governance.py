"""Unit tests for the round-5 governance / training-prep operators:
PII scrub (operators/privacy.py), portable Bloom filter
(operators/bloom.py), sequence packing (operators/packing.py).

The differential gate (tests/test_parity.py) proves engine parity;
these pin the operator-level semantics on crafted inputs: exact match
counts, redaction order, the Bloom no-false-negative invariant, and
the packer's conservation + partitioning-invariance properties.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from huckli_spark.operators import bloom, packing, privacy


def _pii_row(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return privacy.pii_scrub(df).collect()[0]


class TestPIIScrub:
    def test_email_detection_and_redaction(self, spark):
        r = _pii_row(spark, "mail me at jane.doe+spam@sub.example.co right now")
        assert r["n_email"] == 1 and r["n_ipv4"] == 0 and r["n_phone"] == 0
        assert "<EMAIL>" in r["redacted"]
        assert "jane.doe" not in r["redacted"]

    def test_ipv4_detection(self, spark):
        r = _pii_row(spark, "server 192.168.1.254 and 10.0.0.1 replied")
        assert r["n_ipv4"] == 2
        assert r["redacted"].count("<IP>") == 2

    def test_phone_detection(self, spark):
        r = _pii_row(spark, "call +1 555-123-4567 or (202) 555-0173 today")
        assert r["n_phone"] == 2
        assert r["redacted"].count("<PHONE>") == 2

    def test_ip_not_eaten_by_phone(self, spark):
        # redaction order: the dotted quad becomes <IP>, never <PHONE>
        r = _pii_row(spark, "host 10.42.0.99 up")
        assert r["n_ipv4"] == 1
        assert "<IP>" in r["redacted"] and "<PHONE>" not in r["redacted"]

    def test_clean_text_untouched(self, spark):
        r = _pii_row(spark, "no personal data in this sentence")
        assert r["n_pii"] == 0
        assert r["redacted"] == "no personal data in this sentence"

    def test_counts_sum(self, spark):
        r = _pii_row(spark, "a@b.co and 1.2.3.4 and +44 700-900-1234")
        assert r["n_pii"] == r["n_email"] + r["n_ipv4"] + r["n_phone"] == 3

    def test_long_digit_runs_not_phone(self, spark):
        # Regression (ADVICE r5): without a leading boundary the phone
        # pattern matched 10-digit substrings INSIDE longer runs,
        # partially redacting card numbers / epoch-millis timestamps.
        for text in (
            "card 4111111111111111 on file",  # 16-digit PAN
            "span 12345678901234 ns",  # 14 digits
            "id99999555123456789x",  # run glued to letters
        ):
            r = _pii_row(spark, text)
            assert r["n_phone"] == 0, text
            assert r["redacted"] == text, text

    def test_bare_international_runs_redact(self, spark):
        # Regression (ADVICE r6): the r5 boundary fix silently dropped
        # bare 11-13 digit runs (unformatted international numbers) —
        # the 3-3-4 arm only spans exactly-10-digit bare runs. The
        # second alternation must redact 11-13 digit runs in full.
        for text, redacted in (
            ("call 12025551234 now", "call <PHONE> now"),  # 11
            ("call 442079460958 now", "call <PHONE> now"),  # 12
            ("call 8612025551234 now", "call <PHONE> now"),  # 13
            ("call +12025551234 now", "call +<PHONE> now"),  # bare run after +
        ):
            r = _pii_row(spark, text)
            assert r["n_phone"] == 1, text
            assert r["redacted"] == redacted, text

    def test_paren_and_plus_redact_fully(self, spark):
        r = _pii_row(spark, "call (555) 123-4567 or +1 555 123 4567 now")
        assert r["n_phone"] == 2
        assert r["redacted"] == "call <PHONE> or <PHONE> now"


class TestBloomFilter:
    def _members(self, spark, n=200):
        return spark.range(n).select(
            F.concat(F.lit("member"), F.col("id").cast("string")).alias("key")
        )

    def test_no_false_negatives(self, spark):
        # THE bloom invariant: every member must hit
        mem = self._members(spark)
        bits = bloom.bloom_build(mem, "key")
        probed = bloom.bloom_probe(mem, "key", bits)
        assert probed.where(~F.col("bloom_hit")).count() == 0

    def test_nonmembers_mostly_miss(self, spark):
        mem = self._members(spark)
        bits = bloom.bloom_build(mem, "key")
        other = spark.range(500).select(
            F.concat(F.lit("stranger"), F.col("id").cast("string")).alias("key")
        )
        hits = bloom.bloom_probe(other, "key", bits).where("bloom_hit").count()
        # 200 keys x k=4 into 3968 bits -> fill ~18%, fp ~ 0.18^4 ~ 0.1%
        assert hits < 25

    def test_filter_keys_exactness(self, spark):
        # is_member from the composed pipeline == exact membership
        mem = self._members(spark, 100)
        cand = spark.range(150).select(
            F.concat(F.lit("member"), F.col("id").cast("string")).alias("key")
        )  # first 100 are members, last 50 are not
        out = bloom.bloom_filter_keys(cand, "key", mem, "key").collect()
        for r in out:
            expected = int(r["key"].removeprefix("member")) < 100
            assert r["is_member"] == expected, r
            if expected:
                assert r["bloom_hit"]  # member => always a bloom hit

    def test_build_output_bounded(self, spark):
        # the whole point: output rows <= m_words no matter the key count
        mem = self._members(spark, 5000)
        assert bloom.bloom_build(mem, "key", m_words=64).count() <= 64

    def test_no_false_negatives_with_duplicate_keys(self, spark):
        # Regression (ADVICE r5, high): a probe input containing the SAME
        # member key twice used to sum 2*k hits != k and report a true
        # member as bloom_hit=false — a false negative. The probe must
        # deduplicate before the per-key hit aggregation.
        mem = self._members(spark)
        bits = bloom.bloom_build(mem, "key")
        dup = mem.union(mem).union(mem.limit(7))  # every key 2x, some 3x
        probed = bloom.bloom_probe(dup, "key", bits)
        assert probed.count() == dup.count()  # verdict join preserves rows
        assert probed.where(~F.col("bloom_hit")).count() == 0

    def test_filter_keys_duplicates_no_row_multiplication(self, spark):
        # Regression (ADVICE r5, high, second half): duplicate surviving
        # keys must not multiply rows through the exact-verify join.
        mem = self._members(spark, 100)
        cand = spark.range(150).select(
            F.concat(F.lit("member"), (F.col("id") % 75).cast("string")).alias("key")
        )  # 75 distinct keys, each exactly twice; all members
        out = bloom.bloom_filter_keys(cand, "key", mem, "key")
        assert out.count() == 150
        rows = out.collect()
        assert all(r["bloom_hit"] and r["is_member"] for r in rows)


class TestSequencePacking:
    def _docs(self, spark, n=300):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("w "),
                F.repeat(F.lit("tok "), (F.col("id") % 37).cast("int")),
                F.lit("end"),
            ).alias("text"),
        )

    def test_offsets_are_running_sums(self, spark):
        packed = packing.pack_sequences(self._docs(spark), budget=64, n_shards=4)
        rows = sorted(
            packed.collect(), key=lambda r: (r["shard"], r["pack_rank"])
        )
        by_shard: dict[int, int] = {}
        for r in rows:
            off = by_shard.get(r["shard"], 0)
            assert r["seq_idx"] == off // 64, r
            assert r["offset_in_seq"] == off % 64, r
            by_shard[r["shard"]] = off + r["n_tokens"]

    def test_conservation(self, spark):
        # every doc appears exactly once; token mass is preserved
        docs = self._docs(spark)
        packed = packing.pack_sequences(docs, budget=64, n_shards=4)
        assert packed.count() == docs.count()
        assert packed.select(F.count_distinct("doc_id")).collect()[0][0] == 300

    def test_partitioning_invariance(self, spark):
        docs = self._docs(spark)
        a = packing.pack_sequences(docs.repartition(1), budget=64, n_shards=4)
        b = packing.pack_sequences(docs.repartition(64), budget=64, n_shards=4)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_stats_roll_up(self, spark):
        packed = packing.pack_sequences(self._docs(spark), budget=64, n_shards=4)
        stats = packing.pack_stats(packed, budget=64)
        total = stats.agg(F.sum("n_starting"), F.sum("tokens_started")).collect()[0]
        direct = packed.agg(F.count("*"), F.sum("n_tokens")).collect()[0]
        assert tuple(total) == tuple(direct)


class TestPackDocSpans:
    """pack_doc_spans emits the block-diagonal attention-mask relation:
    within every (shard, seq) the spans must be disjoint and cover the
    sequence exactly, and per-doc the parts must reassemble the doc."""

    BUDGET = 64

    def _spans(self, spark, n=300):
        docs = TestSequencePacking()._docs(spark, n)
        packed = packing.pack_sequences(
            docs, budget=self.BUDGET, n_shards=4
        )
        return packed, packing.pack_doc_spans(packed, budget=self.BUDGET)

    def test_spans_cover_each_sequence_exactly(self, spark):
        packed, spans = self._spans(spark)
        per_seq: dict = {}
        for r in spans.collect():
            per_seq.setdefault((r["shard"], r["seq_idx"]), []).append(
                (r["start_in_seq"], r["len_in_seq"])
            )
        last_seq = {
            r["shard"]: r["m"]
            for r in spans.groupBy("shard")
            .agg(F.max("seq_idx").alias("m"))
            .collect()
        }
        assert per_seq, "no spans emitted"
        for (shard, seq), sl in per_seq.items():
            sl.sort()
            pos = 0
            for start, length in sl:
                assert start == pos, (shard, seq, sl)
                assert length > 0
                pos = start + length
            if seq < last_seq[shard]:
                assert pos == self.BUDGET, (shard, seq, pos)
            else:
                assert 0 < pos <= self.BUDGET

    def test_parts_reassemble_each_doc(self, spark):
        packed, spans = self._spans(spark)
        tok = {r["doc_id"]: r["n_tokens"] for r in packed.collect()}
        by_doc: dict = {}
        for r in spans.collect():
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert set(by_doc) == set(tok)
        for doc, parts in by_doc.items():
            parts.sort(key=lambda r: r["part"])
            assert [p["part"] for p in parts] == list(range(len(parts)))
            assert all(p["n_parts"] == len(parts) for p in parts)
            assert sum(p["len_in_seq"] for p in parts) == tok[doc]
            # consecutive parts sit on consecutive sequences; interior
            # parts span the full budget
            for a, b in zip(parts, parts[1:]):
                assert b["seq_idx"] == a["seq_idx"] + 1
                assert b["start_in_seq"] == 0
            for p in parts[1:-1]:
                assert p["len_in_seq"] == self.BUDGET

    def test_agrees_with_emit_sequences(self, spark):
        # the spans' per-sequence token mass must equal the emitted
        # sequence lengths (same budget, same shard walk)
        docs = TestSequencePacking()._docs(spark, 120)
        packed = packing.pack_sequences(docs, budget=16, n_shards=2)
        spans = packing.pack_doc_spans(packed, budget=16)
        emitted = packing.emit_sequences(docs, budget=16, n_shards=2)
        span_mass = {
            (r["shard"], r["seq_idx"]): r["m"]
            for r in spans.groupBy("shard", "seq_idx")
            .agg(F.sum("len_in_seq").alias("m"))
            .collect()
        }
        emit_mass = {
            (r["shard"], r["seq_idx"]): r["n_tokens"]
            for r in emitted.collect()
        }
        assert span_mass == emit_mass

    def test_plan_is_jvm_side_and_shuffle_free_after_pack(self, spark):
        packed, spans = self._spans(spark)
        plan = spans._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        # the only exchange is the pack window's shard partitioning
        pack_plan = packed._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= pack_plan.count("Exchange")

    def test_rejects_bad_budget(self, spark):
        packed, _ = self._spans(spark, n=10)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            packing.pack_doc_spans(packed, budget=0)

    def test_segment_ids_align_with_spans(self, spark):
        _, spans = self._spans(spark)
        segs = packing.pack_segment_ids(spans).collect()
        span_lens: dict = {}
        for r in spans.collect():
            span_lens.setdefault((r["shard"], r["seq_idx"]), []).append(
                (r["start_in_seq"], r["len_in_seq"])
            )
        assert {(r["shard"], r["seq_idx"]) for r in segs} == set(span_lens)
        for r in segs:
            ids = [int(x) for x in r["segment_ids"].split(" ")]
            assert len(ids) == r["n_tokens"]
            # non-decreasing run starting at 0, one run per doc with
            # exactly the span's length
            assert ids[0] == 0
            assert ids == sorted(ids)
            assert len(set(ids)) == r["n_docs"]
            expected = sorted(span_lens[(r["shard"], r["seq_idx"])])
            runs = [ids.count(i) for i in range(r["n_docs"])]
            assert runs == [ln for _, ln in expected]

    def test_segment_plan_has_no_python_and_no_token_explode(self, spark):
        _, spans = self._spans(spark)
        segs = packing.pack_segment_ids(spans)
        plan = segs._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        # no TOKEN-level explode: the only Generate is the spans'
        # own per-sequence fan-out (the in-row repeat adds none)
        spans_plan = spans._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Generate") == spans_plan.count("Generate") == 1


class TestFuzzyPairs:
    def _df(self, spark, names):
        return spark.createDataFrame(
            list(enumerate(names)), "doc_id long, name string"
        )

    def test_detects_all_ed1_relations(self, spark):
        from huckli_spark.operators.dedup import fuzzy_pairs

        names = ["widget", "widgetx", "wdget", "wadget", "bolt", "bolts"]
        got = {
            (r["a"], r["b"])
            for r in fuzzy_pairs(self._df(spark, names), str_col="name").collect()
        }
        sym = got | {(b, a) for a, b in got}
        # insertion, deletion, substitution all found
        assert ("widget", "widgetx") in sym
        assert ("widget", "wdget") in sym
        assert ("widget", "wadget") in sym
        assert ("bolt", "bolts") in sym
        # no cross-family false positives survive verification
        assert not any("bolt" in a and "dget" in b for a, b in sym)

    def test_exact_duplicates_pair(self, spark):
        from huckli_spark.operators.dedup import fuzzy_pairs

        got = fuzzy_pairs(
            self._df(spark, ["same", "same"]), str_col="name"
        ).collect()
        assert len(got) == 1 and got[0]["dist"] == 0

    def test_variant_freq_guard(self, spark):
        from huckli_spark.operators.dedup import fuzzy_pairs

        names = [f"a{i}" for i in range(20)]  # all share the variant "a"
        guarded = fuzzy_pairs(
            self._df(spark, names), str_col="name", max_variant_freq=5
        )
        unguarded = fuzzy_pairs(self._df(spark, names), str_col="name")
        # the guard prunes the hot "a" block join entirely
        assert guarded.count() < unguarded.count()


def _ed(a: str, b: str) -> int:
    """Tiny Levenshtein DP (test-local reference)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


class TestFuzzyPairsProperty:
    def test_completeness_vs_bruteforce_dense_space(self, spark):
        # random short strings over a 2-letter alphabet: the densest
        # possible ed-1 neighborhood structure. fuzzy_pairs must equal
        # the brute-force all-pairs filter EXACTLY (no false negatives
        # from blocking, no false positives past verification).
        import itertools
        import random

        from huckli_spark.operators.dedup import fuzzy_pairs

        rng = random.Random(1234)
        names = list(
            {
                "".join(rng.choice("ab") for _ in range(rng.randint(0, 5)))
                for _ in range(60)
            }
        )
        df = spark.createDataFrame(
            list(enumerate(names)), "doc_id long, name string"
        )
        got = {
            (r["a_id"], r["b_id"], r["dist"])
            for r in fuzzy_pairs(df, str_col="name").collect()
        }
        want = {
            (i, j, _ed(names[i], names[j]))
            for i, j in itertools.combinations(range(len(names)), 2)
            if _ed(names[i], names[j]) <= 1
        }
        assert got == want


class TestFuzzyPairsDepth2:
    def test_ed2_completeness_vs_bruteforce(self, spark):
        import itertools
        import random

        from huckli_spark.operators.dedup import fuzzy_pairs

        rng = random.Random(77)
        names = list(
            {
                "".join(rng.choice("ab") for _ in range(rng.randint(0, 5)))
                for _ in range(45)
            }
        )
        df = spark.createDataFrame(
            list(enumerate(names)), "doc_id long, name string"
        )
        got = {
            (r["a_id"], r["b_id"], r["dist"])
            for r in fuzzy_pairs(df, str_col="name", max_dist=2).collect()
        }
        want = {
            (i, j, _ed(names[i], names[j]))
            for i, j in itertools.combinations(range(len(names)), 2)
            if _ed(names[i], names[j]) <= 2
        }
        assert got == want

    def test_unsupported_depth_raises(self, spark):
        import pytest

        from huckli_spark.operators.dedup import fuzzy_pairs

        df = spark.createDataFrame([(1, "x")], "doc_id long, name string")
        with pytest.raises(ValueError, match="max_dist 0..2"):
            fuzzy_pairs(df, str_col="name", max_dist=3)


class TestPackReservedNames:
    def test_stray_columns_not_projected_without_order(self, spark):
        # ADVICE r08 #5: full-schema inputs (the CLI path) must not
        # collide with generated names when no order_cols are given
        from huckli_spark.operators import packing

        docs = spark.createDataFrame(
            [(1, "a b c", 7, 3), (2, "d e", 8, 4)],
            "doc_id long, text string, n_tokens long, shard long",
        )
        out = packing.pack_sequences(docs, budget=4, n_shards=2)
        assert set(out.columns) == {
            "doc_id", "n_tokens", "shard", "pack_rank", "seq_idx",
            "offset_in_seq",
        }
        # generated n_tokens (whitespace count + eos), not the input 7
        got = {r.doc_id: r.n_tokens for r in out.collect()}
        assert got == {1: 4, 2: 3}

    def test_reserved_collision_with_order_cols_raises(self, spark):
        import pytest as _pytest
        from pyspark.sql import functions as F

        from huckli_spark.operators import packing

        docs = spark.createDataFrame(
            [(1, "a b", 5, 9)],
            "doc_id long, text string, quality long, shard long",
        )
        with _pytest.raises(ValueError, match="collide"):
            packing.pack_sequences(
                docs, budget=4, n_shards=2, order_cols=[F.desc("quality")]
            )


class TestEpochShuffle:
    """epoch_shuffle: the two-phase distributed rank must be a true
    per-epoch permutation, equal to the naive global rank, stable
    under repartitioning, and different across epochs."""

    def _df(self, spark, n=120):
        return spark.range(n).select(F.col("id").alias("doc_id"))

    def test_permutation_per_epoch(self, spark):
        from huckli_spark.operators.packing import epoch_shuffle

        out = epoch_shuffle(self._df(spark), epochs=2, n_buckets=16)
        rows = out.collect()
        for e in (0, 1):
            pos = sorted(r.pos for r in rows if r.epoch == e)
            assert pos == list(range(1, 121))

    def test_matches_naive_global_rank(self, spark):
        from pyspark.sql import Window as W

        from huckli_spark.functions.portable import h60
        from huckli_spark.operators.packing import epoch_shuffle

        df = self._df(spark, 200)
        got = {
            (r.epoch, r.doc_id): r.pos
            for r in epoch_shuffle(df, epochs=2, n_buckets=8).collect()
        }
        naive = df.select(
            "doc_id",
            F.explode(F.array(F.lit(0), F.lit(1))).alias("epoch"),
        ).select(
            "epoch",
            "doc_id",
            F.row_number()
            .over(
                W.partitionBy("epoch").orderBy(
                    h60(
                        F.concat(
                            F.lit("epoch:"),
                            F.col("epoch").cast("string"),
                            F.lit(":"),
                            F.col("doc_id").cast("string"),
                        )
                    ),
                    "doc_id",
                )
            )
            .alias("pos"),
        )
        want = {(r.epoch, r.doc_id): r.pos for r in naive.collect()}
        assert got == want

    def test_partitioning_invariant_and_epochs_differ(self, spark):
        from huckli_spark.operators.packing import epoch_shuffle

        df = self._df(spark, 150)
        a = {
            (r.epoch, r.doc_id): r.pos
            for r in epoch_shuffle(df, epochs=2).collect()
        }
        b = {
            (r.epoch, r.doc_id): r.pos
            for r in epoch_shuffle(df.repartition(13), epochs=2).collect()
        }
        assert a == b
        e0 = [a[(0, i)] for i in range(150)]
        e1 = [a[(1, i)] for i in range(150)]
        assert e0 != e1  # a different permutation every epoch

    def test_rejects_bad_params(self, spark):
        import pytest as _pytest

        from huckli_spark.operators.packing import epoch_shuffle

        with _pytest.raises(ValueError, match="positive"):
            epoch_shuffle(self._df(spark), epochs=0)
        with _pytest.raises(ValueError, match="power of two"):
            epoch_shuffle(self._df(spark), n_buckets=100)

    def test_no_global_sort_no_corpus_window(self, spark):
        # the scale contract: no Sort global=true, and the only
        # unpartitioned window runs over the tiny offsets relation
        from huckli_spark.operators.packing import epoch_shuffle

        df = epoch_shuffle(self._df(spark), epochs=2, n_buckets=16)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode\
            .fromString("formatted")
        plan = df._jdf.queryExecution().explainString(mode)
        import re as _re

        assert not _re.search(r"Sort\b.*global=true", plan), plan
        assert "Python" not in plan, plan

    def test_bucket_division_is_exact_integer_at_top_of_keyspace(self, spark):
        # regression (ADVICE r11 #1): the bucket must come from exact
        # integer `div`, never float division — doubles lose precision
        # above 2^53, and h60 keys span the full 60-bit range, so the
        # float form rounds the top ~128 key values into bucket ==
        # n_buckets. Pin (a) the exact expression epoch_shuffle builds
        # on the extreme keys, (b) that the float form really is wrong
        # there (documents WHY `div` is load-bearing), and (c) that
        # the operator's source uses `div`.
        import inspect

        from huckli_spark.operators.packing import epoch_shuffle

        n_buckets = 256
        width = (1 << 60) // n_buckets
        top = (1 << 60) - 1
        df = spark.createDataFrame(
            [(top,), (top - 130,), (width * 255,), (width * 255 - 1,)],
            "k long",
        )
        exact = [
            r.b
            for r in df.select(
                F.expr(f"k div {width}").alias("b")
            ).collect()
        ]
        assert exact == [255, 255, 255, 254]
        bad = [
            r.b
            for r in df.select(
                (F.col("k") / F.lit(width)).cast("long").alias("b")
            ).collect()
        ]
        assert bad[0] == 256  # the float arm overflows the bucket range
        assert " div " in inspect.getsource(epoch_shuffle)


class TestEpochPack:
    """shuffle-then-pack composition (VERDICT r11 #5): epoch_shuffle's
    global permutation drives pack_sequences' within-shard order."""

    def _df(self, spark, n=80):
        return spark.createDataFrame(
            [(i, " ".join(["w"] * (i % 9 + 1))) for i in range(n)],
            "doc_id long, text string",
        )

    def test_first_epoch_slices_the_enumeration(self, spark):
        from huckli_spark.operators.packing import epoch_shuffle

        df = self._df(spark)
        both = {
            (r.epoch, r.doc_id): r.pos
            for r in epoch_shuffle(df, epochs=2, n_buckets=8).collect()
        }
        only1 = {
            (r.epoch, r.doc_id): r.pos
            for r in epoch_shuffle(
                df, epochs=1, n_buckets=8, first_epoch=1
            ).collect()
        }
        assert only1 == {k: v for k, v in both.items() if k[0] == 1}

    def test_composition_equals_manual_order_cols(self, spark):
        from pyspark.sql import functions as F

        from huckli_spark.operators.packing import (
            epoch_pack,
            epoch_shuffle,
            pack_sequences,
        )

        df = self._df(spark)
        got = {
            r.doc_id: (r.pos, r.shard, r.pack_rank, r.seq_idx,
                       r.offset_in_seq)
            for r in epoch_pack(df, epoch=1, budget=16,
                                n_shards=4).collect()
        }
        pos = epoch_shuffle(df, epochs=1, first_epoch=1).select(
            "doc_id", "pos"
        )
        manual = pack_sequences(
            df.join(pos, "doc_id"), budget=16, n_shards=4,
            order_cols=[F.col("pos")], keep_cols=["pos"],
        )
        want = {
            r.doc_id: (r.pos, r.shard, r.pack_rank, r.seq_idx,
                       r.offset_in_seq)
            for r in manual.collect()
        }
        assert got == want

    def test_shards_stable_order_remixes_across_epochs(self, spark):
        from huckli_spark.operators.packing import epoch_pack

        df = self._df(spark)
        e0 = {r.doc_id: r for r in epoch_pack(df, epoch=0, budget=16,
                                              n_shards=4).collect()}
        e1 = {r.doc_id: r for r in epoch_pack(df, epoch=1, budget=16,
                                              n_shards=4).collect()}
        assert {d: r.shard for d, r in e0.items()} == {
            d: r.shard for d, r in e1.items()
        }
        assert [e0[d].pack_rank for d in sorted(e0)] != [
            e1[d].pack_rank for d in sorted(e1)
        ]
        # conservation within every (shard, epoch): offsets are the
        # exclusive running sum in pack_rank order
        for rows in (e0, e1):
            by_shard = {}
            for r in rows.values():
                by_shard.setdefault(r.shard, []).append(r)
            for docs in by_shard.values():
                docs.sort(key=lambda r: r.pack_rank)
                off = 0
                for r in docs:
                    assert (r.seq_idx, r.offset_in_seq) == (
                        off // 16, off % 16
                    )
                    off += r.n_tokens

    def test_no_global_sort_no_python(self, spark):
        # the composition's scale contract: the epoch rank stays the
        # two-phase bucket form (no Sort global=true anywhere) and the
        # whole plan is JVM-side
        import re as _re

        from pyspark.sql import functions as F

        from huckli_spark.operators.packing import epoch_pack

        docs = spark.range(80).select(
            F.col("id").alias("doc_id"),
            F.expr(
                "array_join(transform(sequence(1,"
                " cast(id % 9 + 1 as int)), i -> 'w'), ' ')"
            ).alias("text"),
        )
        df = epoch_pack(docs, epoch=1, budget=16, n_shards=4)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode\
            .fromString("formatted")
        plan = df._jdf.queryExecution().explainString(mode)
        assert not _re.search(r"Sort\b.*global=true", plan), plan
        assert "Python" not in plan, plan
        # the text rides the rank's bucket exchange (carry_cols) — the
        # corpus is never re-joined against the positions on doc key
        assert "SortMergeJoin" not in plan, plan

    def test_keep_cols_requires_order_cols_membership(self, spark):
        import pytest as _pytest

        from huckli_spark.operators.packing import pack_sequences

        df = self._df(spark)
        with _pytest.raises(ValueError, match="keep_cols"):
            pack_sequences(df, keep_cols=["nope"])

    def test_carry_cols_thread_through_unchanged(self, spark):
        import pytest as _pytest

        from huckli_spark.operators.packing import epoch_shuffle

        df = self._df(spark, 40)
        out = epoch_shuffle(df, epochs=2, n_buckets=8,
                            carry_cols=["text"])
        rows = out.collect()
        want_text = {r.doc_id: r.text for r in df.collect()}
        assert all(r.text == want_text[r.doc_id] for r in rows)
        # positions unchanged by carrying
        plain = {
            (r.epoch, r.doc_id): r.pos
            for r in epoch_shuffle(df, epochs=2, n_buckets=8).collect()
        }
        assert {(r.epoch, r.doc_id): r.pos for r in rows} == plain
        for bad in (["doc_id"], ["pos"], ["missing_col"]):
            with _pytest.raises(ValueError, match="carry_cols"):
                epoch_shuffle(df, carry_cols=bad)

    def test_mix_shuffle_copies_match_python_reference(self, spark):
        # source-weighted repetition: copy counts must equal the
        # documented integer arithmetic exactly, positions must be a
        # permutation of 1..total, and the draw must differ by epoch
        import hashlib

        from huckli_spark.operators.packing import epoch_mix_shuffle

        def h60(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        rows = [(i, f"w{i}", ["a", "b", "c"][i % 3]) for i in range(90)]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        weights = {"a": 2.5, "b": 0.4, "c": 0.0}

        def want_copies(epoch):
            out = {}
            wm = {"a": 2_500_000, "b": 400_000, "c": 0}
            for i, _, s in rows:
                w = wm[s]
                c = w // 1_000_000 + (
                    1 if h60(f"mix:{epoch}:{i}") % 1_000_000
                    < w % 1_000_000 else 0
                )
                if c >= 1:
                    out[i] = c
            return out

        for epoch in (0, 1):
            got = {}
            res = epoch_mix_shuffle(df, weights, epoch=epoch).collect()
            for r in res:
                got[r.doc_id] = got.get(r.doc_id, 0) + 1
                assert r.epoch == epoch
            assert got == want_copies(epoch)
            assert sorted(r.pos for r in res) == list(
                range(1, len(res) + 1)
            )
            # every copy index present exactly once per doc
            seen = {(r.doc_id, r.copy) for r in res}
            assert len(seen) == len(res)
        # frac(w) rotates the extra copy across epochs: the set of
        # 'a'-source docs drawing the 3rd copy must differ
        third0 = {d for d, c in want_copies(0).items() if c == 3}
        third1 = {d for d, c in want_copies(1).items() if c == 3}
        assert third0 != third1

    def test_mix_shuffle_rejects_negative_weights(self, spark):
        import pytest as _pytest

        from huckli_spark.operators.packing import epoch_mix_shuffle

        df = self._df(spark, 10).withColumn(
            "source", F.lit("s")
        )
        with _pytest.raises(ValueError, match=">= 0"):
            epoch_mix_shuffle(df, {"s": -1.0})

    def test_bucket_autosize_is_output_invariant(self, spark):
        # positions are independent of the bucket count (bucketing is
        # internal to the two-phase rank), so the max_bucket_rows
        # guard must auto-raise n_buckets WITHOUT changing a single
        # position
        from huckli_spark.operators.packing import epoch_shuffle

        df = self._df(spark, 64)
        pinned = {
            (r.epoch, r.doc_id): r.pos
            for r in epoch_shuffle(
                df, epochs=2, n_buckets=2, max_bucket_rows=None
            ).collect()
        }
        # 64 rows / max 4 per bucket -> auto-raises 2 -> 16 buckets
        raised = {
            (r.epoch, r.doc_id): r.pos
            for r in epoch_shuffle(
                df, epochs=2, n_buckets=2, max_bucket_rows=4
            ).collect()
        }
        assert raised == pinned
        import pytest as _pytest

        with _pytest.raises(ValueError, match="max_bucket_rows"):
            epoch_shuffle(df, max_bucket_rows=0)


class TestEmitSequences:
    """emit_sequences materializes the packed token rows; its geometry
    must agree exactly with pack_sequences' assignment arithmetic."""

    def _df(self, spark, n=50):
        return spark.createDataFrame(
            [(i, " ".join([f"t{i}w{j}" for j in range(i % 9 + 1)]))
             for i in range(n)],
            "doc_id long, text string",
        )

    def test_exact_budget_fill_and_conservation(self, spark):
        from huckli_spark.operators.packing import emit_sequences

        df = self._df(spark)
        rows = emit_sequences(df, budget=16, n_shards=2).collect()
        # conservation: every token (incl. one EOS per doc) lands once
        want_total = sum(
            (i % 9 + 1) + 1 for i in range(50)
        )
        assert sum(r.n_tokens for r in rows) == want_total
        by_shard = {}
        for r in rows:
            assert r.n_tokens == len(r.tokens)
            by_shard.setdefault(r.shard, []).append(r)
        for shard_rows in by_shard.values():
            shard_rows.sort(key=lambda r: r.seq_idx)
            assert [r.seq_idx for r in shard_rows] == list(
                range(len(shard_rows))
            )
            # every sequence except the shard's last is exactly full
            for r in shard_rows[:-1]:
                assert r.n_tokens == 16
            assert 1 <= shard_rows[-1].n_tokens <= 16

    def test_agrees_with_pack_sequences_assignment(self, spark):
        # a doc's first token must land at exactly the (seq, offset)
        # pack_sequences assigned it, and its tokens must appear
        # contiguously in emission order
        from huckli_spark.operators.packing import (
            emit_sequences,
            pack_sequences,
        )

        df = self._df(spark)
        assign = {
            r.doc_id: (r.shard, r.seq_idx, r.offset_in_seq, r.n_tokens)
            for r in pack_sequences(df, budget=16, n_shards=2).collect()
        }
        emitted = {
            (r.shard, r.seq_idx): r.tokens
            for r in emit_sequences(df, budget=16, n_shards=2).collect()
        }
        texts = {r.doc_id: r.text for r in df.collect()}
        for doc, (shard, seq, off, n) in assign.items():
            want = texts[doc].split(" ") + ["</s>"]
            assert len(want) == n
            got = []
            s, o = seq, off
            while len(got) < n:  # follow the spill across sequences
                row = emitted[(shard, s)]
                take = min(n - len(got), len(row) - o)
                got.extend(row[o:o + take])
                s, o = s + 1, 0
            assert got == want, (doc, got, want)

    def test_epoch_emit_streams_shards_in_epoch_order(self, spark):
        # the capstone composition: within every shard, the emitted
        # token stream must be exactly the docs' tokens concatenated
        # in epoch-position order
        from huckli_spark.operators.packing import (
            epoch_emit,
            epoch_shuffle,
            pack_sequences,
        )

        df = self._df(spark)
        pos = {
            r.doc_id: r.pos
            for r in epoch_shuffle(df, epochs=1, first_epoch=1).collect()
        }
        shard_of = {
            r.doc_id: r.shard
            for r in pack_sequences(df, budget=16, n_shards=2).collect()
        }
        texts = {r.doc_id: r.text for r in df.collect()}
        want = {}
        for shard in (0, 1):
            docs = sorted(
                (d for d in texts if shard_of[d] == shard),
                key=lambda d: pos[d],
            )
            stream = []
            for d in docs:
                stream.extend(texts[d].split(" ") + ["</s>"])
            want[shard] = stream
        rows = epoch_emit(df, epoch=1, budget=16, n_shards=2).collect()
        got = {}
        for r in sorted(rows, key=lambda r: (r.shard, r.seq_idx)):
            got.setdefault(r.shard, []).extend(r.tokens)
        assert got == want

    def test_nosplit_emission_keeps_docs_whole(self, spark):
        # the SFT emission contract: every bin is a concatenation of
        # WHOLE documents in walk order — each doc's tokens appear
        # contiguously, ending with the EOS, and never span bins
        from huckli_spark.operators.packing import (
            emit_sequences_nosplit,
            pack_sequences_nosplit,
        )

        df = self._df(spark)
        asn = pack_sequences_nosplit(df, budget=16, n_shards=2).collect()
        emitted = {
            (r.shard, r.seq_idx): r
            for r in emit_sequences_nosplit(
                df, budget=16, n_shards=2
            ).collect()
        }
        texts = {r.doc_id: r.text for r in df.collect()}
        # reconstruct every bin from the assignment and compare
        want_bins = {}
        for a in sorted(asn, key=lambda a: (a.shard, a.seq_idx,
                                            a.offset_in_seq)):
            want_bins.setdefault((a.shard, a.seq_idx), []).extend(
                texts[a.doc_id].split(" ") + ["</s>"]
            )
        got_bins = {k: list(r.tokens) for k, r in emitted.items()}
        assert got_bins == want_bins
        for (shard, seq), r in emitted.items():
            assert r.n_tokens == len(r.tokens)
            assert r.oversize or r.n_tokens <= 16
            docs_in_bin = [a for a in asn
                           if (a.shard, a.seq_idx) == (shard, seq)]
            assert r.n_docs == len(docs_in_bin)
            if r.oversize:
                assert len(docs_in_bin) == 1  # solo flagged bin

    def test_reserved_name_collision_is_loud(self, spark):
        # ADVICE r08 #5's lesson applied here too: arbitrary input
        # schemas flow through the CLI, so a stray column must never
        # silently collide with a generated name
        import pytest as _pytest
        from pyspark.sql import functions as F

        from huckli_spark.operators.packing import emit_sequences

        df = self._df(spark).withColumn("shard", F.lit(1))
        with _pytest.raises(ValueError, match="collide"):
            emit_sequences(df, budget=16, n_shards=2,
                           order_cols=[F.col("shard")])

    def test_plan_is_jvm_side(self, spark):
        from pyspark.sql import functions as F

        from huckli_spark.operators.packing import emit_sequences

        docs = spark.range(40).select(
            F.col("id").alias("doc_id"),
            F.expr(
                "array_join(transform(sequence(1,"
                " cast(id % 5 + 1 as int)), i -> 'w'), ' ')"
            ).alias("text"),
        )
        df = emit_sequences(docs, budget=16, n_shards=2)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode\
            .fromString("formatted")
        plan = df._jdf.queryExecution().explainString(mode)
        assert "Python" not in plan, plan


class TestNoSplitPacking:
    def _pack(self, spark, texts, budget=10, n_shards=2):
        from huckli_spark.operators.packing import pack_sequences_nosplit

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        return pack_sequences_nosplit(
            df, budget=budget, n_shards=n_shards
        ).collect()

    def test_no_doc_ever_splits_and_bins_respect_budget(self, spark):
        texts = [" ".join(["w"] * ((i * 3) % 7 + 1)) for i in range(40)]
        rows = self._pack(spark, texts, budget=10)
        assert len({r.doc_id for r in rows}) == 40  # each doc placed once
        by_bin = {}
        for r in rows:
            by_bin.setdefault((r.shard, r.seq_idx), []).append(r)
        for (_, _), docs in by_bin.items():
            total = sum(r.n_tokens for r in docs)
            if total > 10:  # only an oversize singleton may exceed
                assert len(docs) == 1 and docs[0].oversize
            # offsets are the exclusive cumulative within the bin
            docs.sort(key=lambda r: r.pack_rank)
            off = 0
            for r in docs:
                assert r.offset_in_seq == off
                off += r.n_tokens

    def test_oversize_doc_gets_its_own_flagged_bin(self, spark):
        texts = ["a b", " ".join(["x"] * 30), "c d e"]
        rows = self._pack(spark, texts, budget=10, n_shards=1)
        over = [r for r in rows if r.oversize]
        assert len(over) == 1 and over[0].n_tokens == 31
        mates = [
            r for r in rows
            if r.seq_idx == over[0].seq_idx and r.doc_id != over[0].doc_id
        ]
        assert mates == []  # alone in its bin

    def test_partitioning_invariant(self, spark):
        from huckli_spark.operators.packing import pack_sequences_nosplit

        df = spark.createDataFrame(
            [(i, " ".join(["w"] * (i % 9 + 1))) for i in range(60)],
            "doc_id long, text string",
        )
        a = {
            r.doc_id: (r.shard, r.seq_idx, r.offset_in_seq)
            for r in pack_sequences_nosplit(df, budget=12).collect()
        }
        b = {
            r.doc_id: (r.shard, r.seq_idx, r.offset_in_seq)
            for r in pack_sequences_nosplit(
                df.repartition(17), budget=12
            ).collect()
        }
        assert a == b

    def test_rejects_bad_params(self, spark):
        import pytest as _pytest

        from huckli_spark.operators.packing import pack_sequences_nosplit

        df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
        with _pytest.raises(ValueError, match="positive"):
            pack_sequences_nosplit(df, budget=0)

    def test_string_ids_pack(self, spark):
        # VERDICT r11 #2: the applyInPandas schema used to hardcode
        # `<id_col> long`, breaking string-keyed corpora at runtime —
        # the id field's type must come from the input schema
        from huckli_spark.operators.packing import pack_sequences_nosplit

        df = spark.createDataFrame(
            [(f"doc-{i:03d}", " ".join(["w"] * (i % 6 + 1)))
             for i in range(30)],
            "doc_id string, text string",
        )
        rows = pack_sequences_nosplit(df, budget=8, n_shards=2).collect()
        assert {r.doc_id for r in rows} == {f"doc-{i:03d}" for i in range(30)}
        by_bin = {}
        for r in rows:
            by_bin.setdefault((r.shard, r.seq_idx), 0)
            by_bin[(r.shard, r.seq_idx)] += r.n_tokens
        assert all(
            t <= 8 or t in {r.n_tokens for r in rows if r.oversize}
            for t in by_bin.values()
        )

    def test_shard_overflow_auto_raises_with_warning(self, spark):
        # VERDICT r11 #2: a whole shard is one Arrow group, so an
        # undersized shard count must not silently build giant groups
        import warnings as _warnings

        from huckli_spark.operators.packing import pack_sequences_nosplit

        df = spark.createDataFrame(
            [(i, "a b c") for i in range(100)], "doc_id long, text string"
        )
        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            rows = pack_sequences_nosplit(
                df, budget=10, n_shards=2, max_shard_rows=10
            ).collect()
        assert any("raising n_shards" in str(w.message) for w in caught)
        # ceil(100 / 10) = 10 shards; hash-balanced, so every shard
        # must hold well under the naive 50-row overload
        per_shard = {}
        for r in rows:
            per_shard[r.shard] = per_shard.get(r.shard, 0) + 1
        assert len(per_shard) == 10
        assert max(per_shard.values()) < 50
        # and max_shard_rows=None pins the requested count exactly
        pinned = pack_sequences_nosplit(
            df, budget=10, n_shards=2, max_shard_rows=None
        ).collect()
        assert {r.shard for r in pinned} == {0, 1}


class TestNoSplitFillReport:
    def test_fill_report_matches_hand_accounting(self, spark):
        from huckli_spark.operators.packing import (
            pack_sequences_nosplit,
            pack_stats_nosplit,
        )

        df = spark.createDataFrame(
            [(i, " ".join(["w"] * ((i * 3) % 7 + 1))) for i in range(30)]
            + [(99, " ".join(["x"] * 30))],  # oversize at budget 10
            "doc_id long, text string",
        )
        packed = pack_sequences_nosplit(df, budget=10, n_shards=2)
        rows = packed.collect()
        got = {r.shard: r for r in pack_stats_nosplit(
            packed, budget=10
        ).collect()}
        for shard in {r.shard for r in rows}:
            bins = {}
            for r in rows:
                if r.shard != shard:
                    continue
                b = bins.setdefault(r.seq_idx, [0, 0, False])
                b[0] += 1
                b[1] += r.n_tokens
                b[2] = b[2] or r.oversize
            g = got[shard]
            assert g.n_bins == len(bins)
            assert g.n_docs == sum(b[0] for b in bins.values())
            assert g.tokens == sum(b[1] for b in bins.values())
            assert g.oversize_bins == sum(
                1 for b in bins.values() if b[2]
            )
            want_pad = sum(
                0 if b[2] else 10 - b[1] for b in bins.values()
            )
            assert g.padding_tokens == want_pad
            cap = sum(b[1] if b[2] else 10 for b in bins.values())
            assert g.fill_ppm == (g.tokens * 1_000_000) // cap

    def test_ffd_reports_no_worse_fill(self, spark):
        # the report exists to justify the walk order: on this mixed
        # fixture next-fit-decreasing must never pad more than hash
        from huckli_spark.operators.packing import (
            pack_sequences_nosplit,
            pack_stats_nosplit,
        )

        df = spark.createDataFrame(
            [(i, " ".join(["w"] * ((i * 7) % 11 + 1))) for i in range(80)],
            "doc_id long, text string",
        )
        def pad(order):
            return sum(
                r.padding_tokens
                for r in pack_stats_nosplit(
                    pack_sequences_nosplit(
                        df, budget=16, n_shards=2, order=order
                    ),
                    budget=16,
                ).collect()
            )
        assert pad("length") <= pad("hash")


class TestNoSplitDecreasing:
    def test_length_order_fills_at_least_as_well(self, spark):
        # next-fit-decreasing's classic property on mixed lengths:
        # never MORE bins than hash-order next-fit on this fixture
        from huckli_spark.operators.packing import pack_sequences_nosplit

        df = spark.createDataFrame(
            [(i, " ".join(["w"] * ((i * 7) % 11 + 1))) for i in range(80)],
            "doc_id long, text string",
        )
        def n_bins(order):
            rows = pack_sequences_nosplit(
                df, budget=16, n_shards=2, order=order
            ).collect()
            return len({(r.shard, r.seq_idx) for r in rows})
        assert n_bins("length") <= n_bins("hash")

    def test_length_order_is_deterministic_and_no_split(self, spark):
        from huckli_spark.operators.packing import pack_sequences_nosplit

        df = spark.createDataFrame(
            [(i, " ".join(["w"] * (i % 9 + 1))) for i in range(50)],
            "doc_id long, text string",
        )
        a = {
            r.doc_id: (r.shard, r.seq_idx, r.offset_in_seq)
            for r in pack_sequences_nosplit(
                df, budget=12, order="length"
            ).collect()
        }
        b = {
            r.doc_id: (r.shard, r.seq_idx, r.offset_in_seq)
            for r in pack_sequences_nosplit(
                df.repartition(7), budget=12, order="length"
            ).collect()
        }
        assert a == b and len(a) == 50

    def test_rejects_unknown_order(self, spark):
        import pytest as _pytest

        from huckli_spark.operators.packing import pack_sequences_nosplit

        df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
        with _pytest.raises(ValueError, match="order"):
            pack_sequences_nosplit(df, order="random")


class TestSplitPackerShardGuard:
    """VERDICT r12 #3: the split packer's per-shard offset window (and
    emit's) sorts a whole shard in ONE task, so the same
    max_shard_rows auto-raise its no-split sibling got must guard it
    too."""

    def _df(self, spark, n=100):
        return spark.createDataFrame(
            [(i, "a b c") for i in range(n)], "doc_id long, text string"
        )

    def test_pack_sequences_auto_raises_with_warning(self, spark):
        import warnings as _warnings

        from huckli_spark.operators.packing import pack_sequences

        df = self._df(spark)
        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            rows = pack_sequences(
                df, budget=10, n_shards=2, max_shard_rows=10
            ).collect()
        assert any("raising n_shards" in str(w.message) for w in caught)
        shards = {r.shard for r in rows}
        assert len(shards) == 10  # ceil(100 / 10)
        # and None pins the requested count exactly (the oracles do)
        pinned = pack_sequences(
            df, budget=10, n_shards=2, max_shard_rows=None
        ).collect()
        assert {r.shard for r in pinned} == {0, 1}

    def test_emit_sequences_auto_raises_with_warning(self, spark):
        import warnings as _warnings

        from huckli_spark.operators.packing import emit_sequences

        df = self._df(spark)
        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            rows = emit_sequences(
                df, budget=10, n_shards=2, max_shard_rows=25
            ).collect()
        assert any("raising n_shards" in str(w.message) for w in caught)
        assert {r.shard for r in rows} == set(range(4))
        # conservation survives the re-shard: 4 tokens per doc
        assert sum(r.n_tokens for r in rows) == 400

    def test_epoch_variants_resolve_on_input_and_pin_downstream(
        self, spark
    ):
        # epoch_pack/epoch_emit resolve the guard against the INPUT
        # corpus; output token mass must be unchanged by the raise
        import warnings as _warnings

        from huckli_spark.operators.packing import epoch_emit, epoch_pack

        df = self._df(spark, 40)
        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            packed = epoch_pack(
                df, epoch=1, budget=10, n_shards=2, max_shard_rows=10
            ).collect()
            emitted = epoch_emit(
                df, epoch=1, budget=10, n_shards=2, max_shard_rows=10
            ).collect()
        msgs = [str(w.message) for w in caught]
        assert sum("epoch_pack" in m for m in msgs) == 1
        assert sum("epoch_emit" in m for m in msgs) == 1
        assert len({r.shard for r in packed}) == 4  # ceil(40/10)
        assert sum(r.n_tokens for r in packed) == 160
        assert sum(r.n_tokens for r in emitted) == 160

    def test_guard_rejects_nonpositive_bound(self, spark):
        import pytest as _pytest

        from huckli_spark.operators.packing import pack_sequences

        with _pytest.raises(ValueError, match="max_shard_rows"):
            pack_sequences(self._df(spark, 5), max_shard_rows=0)


class TestEpochMixEmit:
    """epoch_mix_emit: source-weighted mixing composed into
    materialized sequences — the last dataloader seam (VERDICT r12
    #6)."""

    def _df(self, spark, n=60):
        return spark.createDataFrame(
            [(i, " ".join(f"d{i}w{j}" for j in range(i % 5 + 1)),
              ["webA", "books", "code"][i % 3])
             for i in range(n)],
            "doc_id long, text string, source string",
        )

    def test_conserves_weighted_token_mass(self, spark):
        from huckli_spark.operators.packing import (
            epoch_mix_emit,
            epoch_mix_shuffle,
        )

        df = self._df(spark)
        weights = {"webA": 2.0, "books": 0.5, "code": 0.0}
        copies = {}
        for r in epoch_mix_shuffle(df, weights, epoch=1).collect():
            copies[r.doc_id] = copies.get(r.doc_id, 0) + 1
        toks = {r.doc_id: r.text.split(" ") + ["</s>"]
                for r in df.collect()}
        want = sorted(
            t for d, c in copies.items() for _ in range(c)
            for t in toks[d]
        )
        rows = epoch_mix_emit(
            df, weights, epoch=1, budget=16, n_shards=2
        ).collect()
        got = sorted(t for r in rows for t in r.tokens)
        assert got == want
        # geometry: every sequence except a shard's last is full
        by_shard = {}
        for r in rows:
            assert r.n_tokens == len(r.tokens)
            by_shard.setdefault(r.shard, []).append(r)
        for srows in by_shard.values():
            srows.sort(key=lambda r: r.seq_idx)
            assert [r.seq_idx for r in srows] == list(range(len(srows)))
            assert all(r.n_tokens == 16 for r in srows[:-1])

    def test_shard_stream_follows_mixed_positions(self, spark):
        # within every shard, the emitted token stream must be exactly
        # the copies' tokens concatenated in mixed-position order,
        # sharded by the injective (id, copy) key
        import hashlib

        from huckli_spark.operators.packing import (
            epoch_mix_emit,
            epoch_mix_shuffle,
        )

        def h60(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        df = self._df(spark, 40)
        weights = {"webA": 2.0, "books": 1.0, "code": 1.5}
        mixed = epoch_mix_shuffle(df, weights, epoch=1).collect()
        texts = {r.doc_id: r.text for r in df.collect()}
        stream = {}
        for r in sorted(mixed, key=lambda r: r.pos):
            key = f"{len(str(r.doc_id))}:{r.doc_id}#{r.copy}"
            shard = h60(f"shard:{key}") % 2
            stream.setdefault(shard, []).extend(
                texts[r.doc_id].split(" ") + ["</s>"]
            )
        rows = epoch_mix_emit(
            df, weights, epoch=1, budget=16, n_shards=2
        ).collect()
        got = {}
        for r in sorted(rows, key=lambda r: (r.shard, r.seq_idx)):
            got.setdefault(r.shard, []).extend(r.tokens)
        assert got == stream

    def test_mix_key_is_injective_for_hashy_string_ids(self, spark):
        # ADVICE r12 #3: string ids containing '#' must not collide;
        # the length-prefixed key keeps every (id, copy) distinct and
        # the order deterministic
        from huckli_spark.operators.packing import epoch_mix_shuffle

        df = spark.createDataFrame(
            [("a", "x", "s"), ("a#1", "y", "s"), ("a#1#2", "z", "s")],
            "doc_id string, text string, source string",
        )
        a = epoch_mix_shuffle(df, {"s": 3.0}, epoch=0).collect()
        b = epoch_mix_shuffle(df, {"s": 3.0}, epoch=0).collect()
        assert len(a) == 9
        assert len({(r.doc_id, r.copy) for r in a}) == 9
        assert sorted(r.pos for r in a) == list(range(1, 10))
        assert {(r.doc_id, r.copy, r.pos) for r in a} == {
            (r.doc_id, r.copy, r.pos) for r in b
        }

    def test_mix_carry_cols_thread_through(self, spark):
        import pytest as _pytest

        from huckli_spark.operators.packing import epoch_mix_shuffle

        df = self._df(spark, 20)
        rows = epoch_mix_shuffle(
            df, {"webA": 2.0}, epoch=0, carry_cols=["text"]
        ).collect()
        want = {r.doc_id: r.text for r in df.collect()}
        assert rows and all(r.text == want[r.doc_id] for r in rows)
        for bad in (["doc_id"], ["copy"], ["missing"]):
            with _pytest.raises(ValueError, match="carry_cols"):
                epoch_mix_shuffle(df, {}, carry_cols=bad)

    def test_rejects_nonfinite_weights(self, spark):
        import pytest as _pytest

        from huckli_spark.operators.packing import epoch_mix_shuffle

        df = self._df(spark, 5)
        for w in (float("nan"), float("inf")):
            with _pytest.raises(ValueError, match="finite"):
                epoch_mix_shuffle(df, {"webA": w})
        with _pytest.raises(ValueError, match="finite"):
            epoch_mix_shuffle(df, {}, default_weight=float("nan"))

    def test_mix_emit_guard_counts_mapside(self, spark):
        # the guard's total is the SUM of copies (mixed rows), not the
        # corpus row count
        import warnings as _warnings

        from huckli_spark.operators.packing import epoch_mix_emit

        df = self._df(spark, 30)  # 10 webA docs x3 + 10 books + 10 code
        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            rows = epoch_mix_emit(
                df, {"webA": 3.0}, epoch=0, budget=16, n_shards=2,
                max_shard_rows=10,
            ).collect()
        msg = [str(w.message) for w in caught if "epoch_mix_emit" in
               str(w.message)]
        assert msg and "50 mixed rows" in msg[0]
        assert rows


class TestFragReport:
    def test_matches_hand_accounting(self, spark):
        from huckli_spark.operators.packing import (
            pack_frag_report,
            pack_sequences,
        )

        df = spark.createDataFrame(
            [(i, " ".join(["w"] * (i % 9 + 1))) for i in range(80)],
            "doc_id long, text string",
        )
        packed = pack_sequences(df, budget=16, n_shards=4,
                                max_shard_rows=None)
        rows = packed.collect()
        want = {}
        for r in rows:
            w = want.setdefault(
                r.shard, {"n_docs": 0, "tokens": 0, "straddlers": 0}
            )
            w["n_docs"] += 1
            w["tokens"] += r.n_tokens
            if r.offset_in_seq + r.n_tokens > 16:
                w["straddlers"] += 1
        got = {r.shard: r.asDict()
               for r in pack_frag_report(packed, budget=16).collect()}
        assert set(got) == set(want)
        for shard, w in want.items():
            g = got[shard]
            n_seqs = -(-w["tokens"] // 16)
            assert g["n_docs"] == w["n_docs"]
            assert g["tokens"] == w["tokens"]
            assert g["straddlers"] == w["straddlers"]
            assert g["n_seqs"] == n_seqs
            assert g["tail_tokens"] == w["tokens"] - 16 * (n_seqs - 1)
            assert 1 <= g["tail_tokens"] <= 16
            assert g["frag_ppm"] == w["straddlers"] * 1_000_000 // w["n_docs"]

    def test_n_seqs_counts_the_spill_of_the_last_doc(self, spark):
        # one doc of 25 tokens at budget 10 STARTS in seq 0 but emits
        # three sequences — n_seqs must be ceil(tokens/budget), not
        # max(seq_idx) + 1
        from huckli_spark.operators.packing import (
            pack_frag_report,
            pack_sequences,
        )

        df = spark.createDataFrame(
            [(1, " ".join(["w"] * 24))], "doc_id long, text string"
        )
        packed = pack_sequences(df, budget=10, n_shards=1,
                                max_shard_rows=None)
        [r] = pack_frag_report(packed, budget=10).collect()
        assert r.tokens == 25 and r.n_seqs == 3 and r.tail_tokens == 5
        assert r.straddlers == 1 and r.frag_ppm == 1_000_000


class TestLengthBatching:
    """length_batches: two-phase global length rank == naive rank;
    batch geometry and the padding report it exists to optimize."""

    def _df(self, spark, n=100):
        return spark.createDataFrame(
            [(i, " ".join(["w"] * (i * 7 % 23 + 1))) for i in range(n)],
            "doc_id long, text string",
        )

    def test_rank_matches_python_reference(self, spark):
        import hashlib

        from huckli_spark.operators.packing import length_batches

        def h60(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        df = self._df(spark)
        rows = length_batches(df, batch_size=8).collect()
        want = sorted(
            ((i * 7 % 23 + 2), h60(f"batch:{i}"), i) for i in range(100)
        )
        want_rank = {doc: r + 1 for r, (_, _, doc) in enumerate(want)}
        got = {r.doc_id: (r.rnk, r.batch_id, r.n_tokens) for r in rows}
        assert len(got) == 100
        for doc, (rnk, bid, n) in got.items():
            assert rnk == want_rank[doc], (doc, rnk, want_rank[doc])
            assert bid == (rnk - 1) // 8
            assert n == doc * 7 % 23 + 2

    def test_rank_is_subbucket_invariant_and_partition_invariant(
        self, spark
    ):
        from huckli_spark.operators.packing import length_batches

        df = self._df(spark, 60)
        base = {(r.doc_id, r.rnk)
                for r in length_batches(df, batch_size=8).collect()}
        for variant in (
            length_batches(df, batch_size=8, n_subbuckets=64),
            length_batches(df.repartition(13), batch_size=8),
        ):
            assert {(r.doc_id, r.rnk) for r in variant.collect()} == base

    def test_batches_are_near_equal_length_and_full(self, spark):
        from huckli_spark.operators.packing import (
            batch_pad_report,
            length_batches,
        )

        df = self._df(spark)
        batched = length_batches(df, batch_size=8)
        rep = {r.batch_id: r.asDict()
               for r in batch_pad_report(batched).collect()}
        # 100 docs / 8 => 12 full batches + one of 4
        sizes = sorted(r["n_seqs"] for r in rep.values())
        assert sizes == [4] + [8] * 12
        for r in rep.values():
            assert r["pad_tokens"] == r["max_len"] * r["n_seqs"] - r["tokens"]
            assert 0 <= r["pad_ppm"] < 1_000_000
        # the point of the sort: total pad far under the worst case
        total_pad = sum(r["pad_tokens"] for r in rep.values())
        total_tok = sum(r["tokens"] for r in rep.values())
        assert total_pad * 10 < total_tok

    def test_validation(self, spark):
        import pytest as _pytest

        from huckli_spark.operators.packing import length_batches

        df = self._df(spark, 5)
        with _pytest.raises(ValueError, match="batch_size"):
            length_batches(df, batch_size=0)
        with _pytest.raises(ValueError, match="power of two"):
            length_batches(df, n_subbuckets=3)


class TestPrecountedPacking:
    def test_precomputed_counts_match_whitespace_path(self, spark):
        # packing a precomputed whitespace count must equal the
        # text-derived path exactly (same hashing, same offsets)
        from huckli_spark.operators.packing import pack_sequences

        df = spark.createDataFrame(
            [(i, " ".join(["w"] * (i % 7 + 1))) for i in range(60)],
            "doc_id long, text string",
        )
        via_text = {
            r.doc_id: (r.n_tokens, r.shard, r.seq_idx, r.offset_in_seq)
            for r in pack_sequences(
                df, budget=16, n_shards=2, max_shard_rows=None
            ).collect()
        }
        pre = df.selectExpr(
            "doc_id", "size(split(text, ' ')) AS cnt"
        )
        via_count = {
            r.doc_id: (r.n_tokens, r.shard, r.seq_idx, r.offset_in_seq)
            for r in pack_sequences(
                pre, budget=16, n_shards=2, n_tokens_col="cnt",
                max_shard_rows=None,
            ).collect()
        }
        assert via_text == via_count

    def test_missing_count_column_is_loud(self, spark):
        import pytest as _pytest

        from huckli_spark.operators.packing import pack_sequences

        df = spark.createDataFrame(
            [(1, "a b")], "doc_id long, text string"
        )
        with _pytest.raises(ValueError, match="n_tokens_col"):
            pack_sequences(df, n_tokens_col="nope", max_shard_rows=None)


class TestSftLossMasks:
    """Completion-only loss masks over no-split bins: token-aligned
    0/1 runs that must agree with the bin geometry."""

    def _docs(self, spark, n=60):
        d = TestSequencePacking()._docs(spark, n)
        return d.withColumn(
            "prompt_tokens", F.expr("size(split(text, ' ')) div 2")
        )

    def test_mask_runs_match_assignment(self, spark):
        docs = self._docs(spark)
        asn = packing.pack_sequences_nosplit(docs, budget=64, n_shards=2)
        out = packing.sft_loss_masks(docs, budget=64, n_shards=2).collect()
        prompts = {
            r["doc_id"]: r["prompt_tokens"] for r in docs.collect()
        }
        by_bin: dict = {}
        for r in asn.collect():
            by_bin.setdefault((r["shard"], r["seq_idx"]), []).append(r)
        assert {(r["shard"], r["seq_idx"]) for r in out} == set(by_bin)
        for r in out:
            bits = r["loss_mask"].split(" ")
            assert len(bits) == r["n_tokens"]
            members = sorted(
                by_bin[(r["shard"], r["seq_idx"])],
                key=lambda x: x["offset_in_seq"],
            )
            assert r["n_docs"] == len(members)
            want = []
            for m in members:
                p = min(max(prompts[m["doc_id"]], 0), m["n_tokens"])
                want += ["0"] * p + ["1"] * (m["n_tokens"] - p)
            assert bits == want
            assert r["masked_tokens"] == want.count("0")

    def test_prompt_clamps_to_doc_length(self, spark):
        docs = self._docs(spark, n=20).withColumn(
            "prompt_tokens", F.lit(10_000)
        )
        out = packing.sft_loss_masks(docs, budget=64, n_shards=2)
        for r in out.collect():
            # everything masked: no loss tokens anywhere
            assert set(r["loss_mask"].split(" ")) == {"0"}
            assert r["masked_tokens"] == r["n_tokens"]

    def test_missing_prompt_col_is_loud(self, spark):
        import pytest as _pytest

        d = TestSequencePacking()._docs(spark, 5)
        with _pytest.raises(ValueError, match="prompt_col"):
            packing.sft_loss_masks(d, budget=64, n_shards=2)

    def test_plan_has_no_token_explode(self, spark):
        docs = self._docs(spark, n=20)
        out = packing.sft_loss_masks(docs, budget=64, n_shards=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Generate" not in plan  # in-row repeat, never explode


class TestFimTransform:
    def _docs(self, spark, n=80):
        return TestSequencePacking()._docs(spark, n)

    def test_untransformed_pass_through_and_psm_reassembles(self, spark):
        from huckli_spark.operators.objectives import fim_transform

        docs = self._docs(spark)
        orig = {r["doc_id"]: r["text"] for r in docs.collect()}
        out = fim_transform(docs, rate=0.5).collect()
        n_fim = sum(1 for r in out if r["fim"])
        assert 0 < n_fim < len(out)  # both arms exercised
        for r in out:
            if not r["fim"]:
                assert r["text_out"] == orig[r["doc_id"]]
                continue
            toks = r["text_out"].split(" ")
            assert toks.count("<PRE>") == 1
            assert toks.count("<SUF>") == 1
            assert toks.count("<MID>") == 1
            i_p, i_s, i_m = (toks.index("<PRE>"), toks.index("<SUF>"),
                             toks.index("<MID>"))
            assert i_p == 0 and i_p < i_s < i_m
            prefix = toks[1:i_s]
            suffix = toks[i_s + 1:i_m]
            middle = toks[i_m + 1:]
            assert prefix + middle + suffix == orig[r["doc_id"]].split(" ")

    def test_rate_bounds(self, spark):
        from huckli_spark.operators.objectives import fim_transform

        docs = self._docs(spark, 10)
        assert all(not r["fim"]
                   for r in fim_transform(docs, rate=0.0).collect())
        assert all(r["fim"]
                   for r in fim_transform(docs, rate=1.0).collect())
        import pytest as _pytest

        with _pytest.raises(ValueError):
            fim_transform(docs, rate=1.5)

    def test_deterministic_and_partitioning_invariant(self, spark):
        from huckli_spark.operators.objectives import fim_transform

        docs = self._docs(spark)
        a = sorted(map(tuple, fim_transform(docs.repartition(1)).collect()))
        b = sorted(map(tuple, fim_transform(docs.repartition(16)).collect()))
        assert a == b

    def test_map_side_only_no_shuffle_no_python(self, spark):
        from huckli_spark.operators.objectives import fim_transform

        out = fim_transform(self._docs(spark, 10))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


class TestLoaderSteps:
    """loader_steps: the closed-form global step manifest must equal
    the naive lexicographic enumeration, and the resume cut must be
    an exact suffix of it."""

    def _packed(self, spark, n=120):
        docs = TestSequencePacking()._docs(spark, n)
        return packing.pack_sequences(
            docs, budget=64, n_shards=4, max_shard_rows=None
        )

    def _naive(self, packed, budget):
        import math

        tok = {}
        for r in packed.collect():
            tok[r["shard"]] = tok.get(r["shard"], 0) + r["n_tokens"]
        seqs = [
            (seq, s)
            for s, t in tok.items()
            for seq in range(math.ceil(t / budget))
        ]
        seqs.sort()
        return {(s, seq): i for i, (seq, s) in enumerate(seqs)}

    def test_matches_naive_enumeration(self, spark):
        packed = self._packed(spark)
        want = self._naive(packed, 64)
        got = {
            (r["shard"], r["seq_idx"]): r["step"]
            for r in packing.loader_steps(packed, budget=64).collect()
        }
        assert got == want

    def test_resume_is_exact_suffix(self, spark):
        packed = self._packed(spark)
        full = packing.loader_steps(packed, budget=64).collect()
        total = len(full)
        k = total // 3
        cut = packing.loader_steps(
            packed, budget=64, start_step=k
        ).collect()
        assert sorted(r["step"] for r in cut) == list(range(k, total))
        assert {(r["shard"], r["seq_idx"], r["step"]) for r in cut} == {
            (r["shard"], r["seq_idx"], r["step"])
            for r in full if r["step"] >= k
        }

    def test_resume_past_end_is_empty(self, spark):
        packed = self._packed(spark)
        total = packing.loader_steps(packed, budget=64).count()
        assert packing.loader_steps(
            packed, budget=64, start_step=total + 5
        ).count() == 0

    def test_manifest_plan_has_no_exchange(self, spark):
        packed = self._packed(spark)
        out = packing.loader_steps(packed, budget=64)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the manifest itself is a local explode over the tiny shard
        # relation: the closed-form rank adds no shuffle
        assert "Exchange" not in plan

    def test_uneven_shards_closed_form(self, spark):
        # adversarial: one giant doc in one shard, tiny docs elsewhere
        docs = spark.createDataFrame(
            [(0, "w " * 500 + "end")]
            + [(i, "a b") for i in range(1, 9)],
            "doc_id long, text string",
        )
        packed = packing.pack_sequences(
            docs, budget=16, n_shards=3, max_shard_rows=None
        )
        want = self._naive(packed, 16)
        got = {
            (r["shard"], r["seq_idx"]): r["step"]
            for r in packing.loader_steps(packed, budget=16).collect()
        }
        assert got == want


class TestSpanZeroTokenDocs:
    def test_zero_token_docs_emit_no_spans(self, spark):
        # model-token path with eos_tokens=0 can yield n_tokens=0; a
        # zero-token doc occupies an empty interval and must emit NO
        # spans — in particular not the descending-sequence pair that
        # Spark's sequence(s0, s0-1) would produce when the doc's
        # offset sits exactly on a budget boundary
        docs = spark.createDataFrame(
            [(0, "x", 16), (1, "x", 0), (2, "x", 16), (3, "x", 0),
             (4, "x", 8)],
            "doc_id long, text string, n_tokens_pre long",
        )
        packed = packing.pack_sequences(
            docs, budget=16, n_shards=1, eos_tokens=0,
            n_tokens_col="n_tokens_pre", max_shard_rows=None,
        )
        spans = packing.pack_doc_spans(packed, budget=16).collect()
        docs_with_spans = {r["doc_id"] for r in spans}
        zero = {r["doc_id"] for r in packed.collect()
                if r["n_tokens"] == 0}
        assert zero and docs_with_spans.isdisjoint(zero)
        for r in spans:
            assert r["len_in_seq"] > 0
        mass = sum(r["len_in_seq"] for r in spans)
        assert mass == 40  # 16 + 16 + 8
