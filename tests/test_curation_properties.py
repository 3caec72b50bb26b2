"""Property tests for the curation family against pure-Python
references (the segment-dedup property-suite pattern): hypothesis
generates small corpora, a straightforward Python implementation of
the SAME exact fixed-point arithmetic produces the expected rows, and
the Spark operators must match tuple-for-tuple. Catches drift between
the operator and its documented arithmetic that example tests miss."""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from huckli_spark.operators.curation import (
    DSIR_BUCKETS,
    dsir_select,
    semdedup,
)

MICRO = 1_000_000


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ------------------------------------------------------------------ DSIR ref
def _dsir_ref(rows, keep):
    """(doc_id, n_feats, w_micro, selected) — pure-Python DSIR with the
    operator's exact arithmetic (hash, smoothing, micro floors)."""
    feats = {}
    for did, text, is_t in rows:
        w = text.split(" ")
        fs = [f"u:{x}" for x in w]
        if len(w) >= 2:
            fs += [f"b:{w[i]} {w[i + 1]}" for i in range(len(w) - 1)]
        cnt = {}
        for f_ in fs:
            b = _h60(f_) % DSIR_BUCKETS
            cnt[b] = cnt.get(b, 0) + 1
        feats[did] = (cnt, is_t)
    rc, tc = {}, {}
    for cnt, is_t in feats.values():
        for b, c in cnt.items():
            rc[b] = rc.get(b, 0) + c
            if is_t:
                tc[b] = tc.get(b, 0) + c
    rt, tt = sum(rc.values()), sum(tc.values())
    lr = {
        b: math.floor(
            (
                math.log((tc.get(b, 0) + 1.0) / (tt + DSIR_BUCKETS))
                - math.log((rc[b] + 1.0) / (rt + DSIR_BUCKETS))
            )
            * 1000000
            + 0.5
        )
        for b in rc
    }
    weights = {
        did: (
            sum(cnt.values()),
            sum(c * lr[b] for b, c in cnt.items()),
        )
        for did, (cnt, _) in feats.items()
    }
    order = sorted(weights, key=lambda d: (-weights[d][1], d))
    chosen = set(order[:keep])
    if chosen:
        tw = min(weights[d][1] for d in chosen)
        tid = max(d for d in chosen if weights[d][1] == tw)
    out = []
    for did, (nf, w) in weights.items():
        sel = bool(chosen) and (w > tw or (w == tw and did <= tid))
        out.append((did, nf, w, sel))
    return sorted(out)


_word = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "omega", "psi", "the", "spark"]
)
_text = st.lists(_word, min_size=1, max_size=6).map(" ".join)


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(_text, min_size=2, max_size=8),
    tmask=st.lists(st.booleans(), min_size=8, max_size=8),
    keep=st.integers(min_value=1, max_value=5),
)
def test_dsir_matches_python_reference(spark, texts, tmask, keep):
    rows = [
        (i, t, tmask[i % len(tmask)]) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        [(d, t, "en" if m else "xx") for d, t, m in rows],
        "doc_id long, text string, lang string",
    )
    got = sorted(
        tuple(r)
        for r in dsir_select(
            df, F.col("lang") == "en", keep=keep
        ).collect()
    )
    assert got == _dsir_ref(rows, keep)


# -------------------------------------------------------------- SemDeDup ref
def _kmeans_ref(vecs, k, iterations):
    """kmeans_fit's exact fixed-point arithmetic in pure Python."""
    ids = sorted(vecs)
    dim = len(vecs[ids[0]])
    vm = {
        i: [math.floor(v * MICRO + 0.5) for v in vecs[i]] for i in ids
    }
    cents = [list(vm[i]) for i in ids[:k]]
    for _ in range(iterations):
        assign = {}
        for i in ids:
            best, bd = None, None
            for cid, c in enumerate(cents):
                d = sum((vm[i][j] - c[j]) ** 2 for j in range(dim))
                if bd is None or d < bd or (d == bd and cid < best):
                    best, bd = cid, d
            assign[i] = best
        for cid in range(len(cents)):
            members = [i for i in ids if assign[i] == cid]
            if not members:
                continue
            cents[cid] = [
                math.floor(
                    sum(vm[i][j] for i in members) / len(members) + 0.5
                )
                for j in range(dim)
            ]
    return cents, vm


def _semdedup_ref(vecs, k, iterations, tau):
    cents, vm = _kmeans_ref(vecs, k, iterations)
    dim = len(next(iter(vecs.values())))
    assign = {}
    for i, v in vm.items():
        best, bd = None, None
        for cid, c in enumerate(cents):
            d = sum((v[j] - c[j]) ** 2 for j in range(dim))
            if bd is None or d < bd or (d == bd and cid < best):
                best, bd = cid, d
        assign[i] = best
    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        da = math.sqrt(sum(x * x for x in a))
        db = math.sqrt(sum(y * y for y in b))
        c = num / (da * db)
        return math.floor(c * 1e6 + 0.5) / 1e6
    ids = sorted(vecs)
    dups = set()
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            if assign[a] == assign[b] and cos(vecs[a], vecs[b]) >= tau:
                dups.add(b)
    return sorted((i, assign[i], i in dups) for i in ids)


_coord = st.sampled_from([0.0, 0.25, 0.5, 0.75, 1.0])


@settings(max_examples=6, deadline=None)
@given(
    vecs=st.lists(
        st.tuples(_coord, _coord, _coord).filter(lambda v: any(v)),
        min_size=3,
        max_size=8,
    ),
    k=st.integers(min_value=1, max_value=3),
)
def test_semdedup_matches_python_reference(spark, vecs, k):
    vd = {i: list(v) for i, v in enumerate(vecs)}
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vd.items()],
        "vec_id long, embedding array<float>",
    )
    got = sorted(
        (r["vec_id"], r["cid"], r["is_dup"])
        for r in semdedup(df, k=k, iterations=2, tau=0.9).collect()
    )
    assert got == _semdedup_ref(vd, k, 2, 0.9)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),
            st.sampled_from(["keep", "remove", "change"]),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.lists(st.integers(min_value=100, max_value=160), max_size=8,
             unique=True),
)
def test_content_diff_matches_construction(spark, base, added_ids):
    """content_diff must classify EXACTLY according to how the
    candidate corpus was constructed from the baseline."""
    from huckli_spark.operators.dedup import content_diff

    a_rows = [(i, f"text-{i}") for i, _ in base]
    b_rows = [
        (i, f"text-{i}" if action == "keep" else f"text-{i}-v2")
        for i, action in base
        if action != "remove"
    ] + [(i, f"new-{i}") for i in added_ids]
    a = spark.createDataFrame(a_rows, "doc_id long, text string")
    b = spark.createDataFrame(b_rows, "doc_id long, text string")
    got = {r.doc_id: r.status for r in content_diff(a, b).collect()}
    want = {
        i: {"keep": "unchanged", "remove": "removed", "change": "changed"}[
            action
        ]
        for i, action in base
    } | {i: "added" for i in added_ids}
    assert got == want


def test_content_diff_null_text_is_presence_not_absence(spark):
    """Regression (ADVICE r11 #2): md5(NULL) is NULL, so hashing alone
    misreads a present-but-NULL doc as absent. A NULL text row (a
    malformed jsonl line reads exactly like this) must diff as
    PRESENT: NULL-vs-text is 'changed', NULL-vs-NULL is 'unchanged',
    and a NULL-text doc on only one side is added/removed."""
    from huckli_spark.operators.dedup import content_diff

    a = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None), (4, "same"), (6, None)],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(1, "recovered"), (2, None), (3, None), (4, "same"), (5, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.status for r in content_diff(a, b).collect()}
    assert got == {
        1: "changed",  # NULL -> text
        2: "changed",  # text -> NULL
        3: "unchanged",  # NULL both sides
        4: "unchanged",
        5: "added",  # NULL-text doc, present only in the candidate
        6: "removed",  # NULL-text doc, present only in the baseline
    }
    # and the sentinel cannot shadow real content: a doc whose text is
    # the literal sentinel string still compares by md5, not equality
    # with a NULL row
    a2 = spark.createDataFrame([(9, "__NULL__")], "doc_id long, text string")
    b2 = spark.createDataFrame([(9, None)], "doc_id long, text string")
    assert {
        r.doc_id: r.status for r in content_diff(a2, b2).collect()
    } == {9: "changed"}


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=24),  # words per doc (0 => "")
        min_size=1,
        max_size=40,
    ),
    st.sampled_from([4, 16, 64]),
)
def test_emit_sequences_conservation_and_agreement(spark, word_counts,
                                                   budget):
    """Property: for ANY corpus shape (including empty-text docs) and
    budget, emit_sequences (a) conserves every token exactly once,
    (b) fills every non-final sequence of a shard to exactly the
    budget, and (c) places each doc's first token at precisely the
    (seq, offset) pack_sequences assigned it."""
    from huckli_spark.operators.packing import (
        emit_sequences,
        pack_sequences,
    )

    rows = [
        (i, " ".join(f"d{i}w{j}" for j in range(n)))
        for i, n in enumerate(word_counts)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    emitted = emit_sequences(df, budget=budget, n_shards=2).collect()
    assign = {
        r.doc_id: (r.shard, r.seq_idx, r.offset_in_seq, r.n_tokens)
        for r in pack_sequences(df, budget=budget, n_shards=2).collect()
    }
    # (a) conservation: split("") == [""], so an empty doc contributes
    # one empty token + EOS — exactly pack_sequences' n_tokens
    assert sum(r.n_tokens for r in emitted) == sum(
        n for (_, _, _, n) in assign.values()
    )
    # (b) exact fill
    by_shard = {}
    for r in emitted:
        assert r.n_tokens == len(r.tokens)
        by_shard.setdefault(r.shard, []).append(r)
    seqs = {}
    for shard, srows in by_shard.items():
        srows.sort(key=lambda r: r.seq_idx)
        assert [r.seq_idx for r in srows] == list(range(len(srows)))
        for r in srows[:-1]:
            assert r.n_tokens == budget
        for r in srows:
            seqs[(shard, r.seq_idx)] = r.tokens
    # (c) first-token placement agrees with the assignment relation
    texts = dict(rows)
    for doc, (shard, seq, off, _) in assign.items():
        first = texts[doc].split(" ")[0]
        assert seqs[(shard, seq)][off] == first, (doc, shard, seq, off)
