"""duplicate_spans (exact substring dedup) vs a brute-force oracle.

The operator claims: merged spans == union of all L-word windows
whose text occurs >= min_count times corpus-wide, merged when
overlapping or adjacent. Brute force recomputes that claim directly
in Python on crafted and random corpora (duplication within one
document, across documents, back-to-back repeats, none at all).
"""

from __future__ import annotations

import random
from collections import Counter

from huckli_spark.operators.dedup import duplicate_spans


def _brute(rows: list[tuple[int, str]], L: int) -> set[tuple]:
    grams: dict[tuple[int, int], str] = {}
    cnt: Counter = Counter()
    for did, text in rows:
        ws = [x for x in text.split(" ") if x]
        for i in range(max(len(ws) - L + 1, 0)):
            gm = " ".join(ws[i : i + L])
            grams[(did, i)] = gm
            cnt[gm] += 1
    by_doc: dict[int, list[int]] = {}
    for (did, pos), gm in grams.items():
        if cnt[gm] >= 2:
            by_doc.setdefault(did, []).append(pos)
    spans = set()
    for did, poss in by_doc.items():
        poss.sort()
        start, prev, n = poss[0], poss[0], 1
        for p in poss[1:]:
            if p - prev > L:
                spans.add((did, start, prev + L, n))
                start, n = p, 0
            prev = p
            n += 1
        spans.add((did, start, prev + L, n))
    return spans


def _got(spark, rows, L) -> set[tuple]:
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in duplicate_spans(df, window_len=L).collect()
    }


class TestCrafted:
    def test_cross_doc_duplicate_run(self, spark):
        rows = [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "a quick brown fox jumps over the fence today"),
            (2, "completely unrelated words here now"),
        ]
        # shared run: "quick brown fox jumps over the" (6 words) ->
        # windows at doc0 pos 1..4 / doc1 pos 1..4 merge to one span
        assert _got(spark, rows, 3) == {
            (0, 1, 7, 4),
            (1, 1, 7, 4),
        } == _brute(rows, 3)

    def test_within_doc_repeat_merges_across_adjacency(self, spark):
        rows = [(0, "a b c a b c")]
        # "a b c" at pos 0 and 3: gap == L -> adjacent, one span
        assert _got(spark, rows, 3) == {(0, 0, 6, 2)} == _brute(rows, 3)

    def test_no_duplicates_empty_output(self, spark):
        rows = [(0, "w0 w1 w2 w3"), (1, "x0 x1 x2 x3")]
        assert _got(spark, rows, 3) == set() == _brute(rows, 3)

    def test_short_and_empty_docs(self, spark):
        rows = [(0, ""), (1, "a b"), (2, "a b c"), (3, "a b c")]
        # docs 0/1 yield no windows; docs 2/3 share their only window
        assert _got(spark, rows, 3) == {
            (2, 0, 3, 1),
            (3, 0, 3, 1),
        } == _brute(rows, 3)

    def test_disjoint_spans_in_one_doc(self, spark):
        rows = [
            (0, "p q r zz1 zz2 zz3 zz4 p q r"),
            (1, "p q r other words p q r"),
        ]
        got = _got(spark, rows, 3)
        assert got == _brute(rows, 3)
        # doc0: dup windows at pos 0 and 7 -> gap 7 > 3 -> two spans
        assert (0, 0, 3, 1) in got and (0, 7, 10, 1) in got


class TestRandomCorpora:
    def test_random_small_alphabet(self, spark):
        rng = random.Random(42)
        for trial in range(4):
            rows = [
                (
                    did,
                    " ".join(
                        rng.choice("abc")
                        for _ in range(rng.randint(0, 14))
                    ),
                )
                for did in range(25)
            ]
            assert _got(spark, rows, 3) == _brute(rows, 3), f"trial {trial}"

    def test_random_min_count_window_len_combos(self, spark):
        rng = random.Random(7)
        rows = [
            (did, " ".join(rng.choice("abcd") for _ in range(12)))
            for did in range(20)
        ]
        for L in (2, 4):
            df = spark.createDataFrame(rows, "doc_id long, text string")
            got = {
                (r.doc_id, r.span_start, r.span_end, r.n_windows)
                for r in duplicate_spans(df, window_len=L).collect()
            }
            assert got == _brute(rows, L), f"L={L}"
