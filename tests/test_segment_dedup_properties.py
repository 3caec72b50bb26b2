"""Property tests for operators.dedup.segment_dedup against a pure-
Python reference: random corpora with planted duplication, identical
corpora, and short-document edge cases. Follows the seeded-random
adversarial style of test_sketch_properties (hypothesis-free: one
Spark round-trip per corpus)."""

from __future__ import annotations

import random

from huckli_spark.operators.dedup import segment_dedup

SEG = 3
KEY = 100_000


def _reference(corpus: dict[int, str]) -> dict[int, tuple[int, int, str]]:
    """(n_segments, n_kept, kept_text) per doc, first-occurrence keep
    ordered by the integer keeper key doc_id * KEY + seg_idx."""
    segs = []  # (doc, idx, seg)
    for doc_id in sorted(corpus):
        w = corpus[doc_id].split(" ")
        for i in range(0, (len(w) + SEG - 1) // SEG):
            segs.append((doc_id, i, " ".join(w[i * SEG: (i + 1) * SEG])))
    keeper: dict[str, int] = {}
    for doc_id, idx, seg in segs:
        k = doc_id * KEY + idx
        if seg not in keeper or k < keeper[seg]:
            keeper[seg] = k
    out = {}
    for doc_id in sorted(corpus):
        w = corpus[doc_id].split(" ")
        n_seg = (len(w) + SEG - 1) // SEG
        kept = [
            " ".join(w[i * SEG: (i + 1) * SEG])
            for i in range(n_seg)
            if keeper[" ".join(w[i * SEG: (i + 1) * SEG])] == doc_id * KEY + i
        ]
        out[doc_id] = (n_seg, len(kept), " ".join(kept) if kept else None)
    return out


def _check(spark, corpus: dict[int, str]) -> None:
    df = spark.createDataFrame(
        sorted(corpus.items()), "doc_id: long, text: string"
    )
    got = {
        r.doc_id: (r.n_segments, r.n_kept, r.kept_text)
        for r in segment_dedup(df, seg_words=SEG, key_mult=KEY).collect()
    }
    assert got == _reference(corpus)


def test_random_corpus_with_planted_duplication(spark):
    rng = random.Random(7)
    vocab = [f"w{k}" for k in range(12)]  # tiny vocab -> heavy collisions
    corpus = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 25)))
        for d in range(40)
    }
    _check(spark, corpus)


def test_identical_documents_keep_only_the_first(spark):
    text = "a b c d e f g h i"
    corpus = {d: text for d in range(5)}
    _check(spark, corpus)
    # and explicitly: doc 0 keeps all, the rest keep nothing
    ref = _reference(corpus)
    assert ref[0] == (3, 3, text)
    assert all(ref[d][1] == 0 and ref[d][2] is None for d in range(1, 5))


def test_shared_prefix_suffix_partial_dedup(spark):
    corpus = {
        1: "x y z p q r u v w",
        2: "x y z DIFFERENT words here u v w",  # shares first+last segment
    }
    _check(spark, corpus)
    ref = _reference(corpus)
    assert ref[2][1] == 1  # only the middle segment survives in doc 2


def test_short_and_ragged_documents(spark):
    corpus = {1: "solo", 2: "two words", 3: "solo", 4: "a b c d"}
    _check(spark, corpus)
    ref = _reference(corpus)
    assert ref[3] == (1, 0, None)  # dup of doc 1's single segment
