"""Property tests for the attention-mask / objective layer (round 13
wave 2): pack_doc_spans, pack_segment_ids, sft_loss_masks and
fim_transform over adversarial corpora — duplicate-length docs, empty
text, one-word docs, budgets smaller than docs, rates at the bounds.
Each property is checked against a pure-python reconstruction of the
contract, not against the operator's own arithmetic."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from huckli_spark.operators import packing
from huckli_spark.operators.objectives import fim_transform

_word = st.sampled_from(["a", "bb", "ccc", "w0", "w1", "tok"])
_text = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(_text, min_size=1, max_size=12),
    budget=st.integers(min_value=2, max_value=9),
)
def test_spans_tile_sequences_and_reassemble_docs(spark, texts, budget):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    packed = packing.pack_sequences(
        df, budget=budget, n_shards=2, max_shard_rows=None
    )
    tok = {r["doc_id"]: r["n_tokens"] for r in packed.collect()}
    spans = packing.pack_doc_spans(packed, budget=budget).collect()

    # per-doc reassembly: parts are contiguous, lengths sum to the doc
    by_doc: dict = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(tok)
    for doc, parts in by_doc.items():
        parts.sort(key=lambda r: r["part"])
        assert [p["part"] for p in parts] == list(range(len(parts)))
        assert sum(p["len_in_seq"] for p in parts) == tok[doc]

    # per-sequence tiling: disjoint, contiguous from 0, full except
    # each shard's last sequence
    per_seq: dict = {}
    for r in spans:
        per_seq.setdefault((r["shard"], r["seq_idx"]), []).append(
            (r["start_in_seq"], r["len_in_seq"])
        )
    last = {}
    for shard, seq in per_seq:
        last[shard] = max(last.get(shard, -1), seq)
    for (shard, seq), sl in per_seq.items():
        sl.sort()
        pos = 0
        for start, ln in sl:
            assert start == pos and ln > 0
            pos += ln
        assert pos == budget or seq == last[shard]


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(_text, min_size=1, max_size=10),
    budget=st.integers(min_value=2, max_value=7),
)
def test_segment_ids_rebuild_from_spans(spark, texts, budget):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    packed = packing.pack_sequences(
        df, budget=budget, n_shards=2, max_shard_rows=None
    )
    spans_df = packing.pack_doc_spans(packed, budget=budget)
    want: dict = {}
    for r in spans_df.collect():
        want.setdefault((r["shard"], r["seq_idx"]), []).append(
            (r["start_in_seq"], r["len_in_seq"])
        )
    got = packing.pack_segment_ids(spans_df).collect()
    assert {(r["shard"], r["seq_idx"]) for r in got} == set(want)
    for r in got:
        sl = sorted(want[(r["shard"], r["seq_idx"])])
        expect = []
        for i, (_, ln) in enumerate(sl):
            expect += [str(i)] * ln
        assert r["segment_ids"].split(" ") == expect
        assert r["n_docs"] == len(sl)
        assert r["n_tokens"] == sum(ln for _, ln in sl)


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(_text, min_size=1, max_size=10),
    budget=st.integers(min_value=2, max_value=9),
    prompts=st.lists(
        st.integers(min_value=-3, max_value=20), min_size=10, max_size=10
    ),
)
def test_sft_masks_match_python_walk(spark, texts, budget, prompts):
    rows = [(i, t, prompts[i % len(prompts)]) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, prompt_tokens long"
    )
    asn = packing.pack_sequences_nosplit(
        df, budget=budget, n_shards=2, max_shard_rows=None
    )
    by_bin: dict = {}
    for r in asn.collect():
        by_bin.setdefault((r["shard"], r["seq_idx"]), []).append(r)
    out = packing.sft_loss_masks(
        df, budget=budget, n_shards=2, max_shard_rows=None
    ).collect()
    assert {(r["shard"], r["seq_idx"]) for r in out} == set(by_bin)
    pr = {i: p for i, _, p in rows}
    for r in out:
        members = sorted(
            by_bin[(r["shard"], r["seq_idx"])],
            key=lambda x: x["offset_in_seq"],
        )
        expect = []
        for m in members:
            p = min(max(pr[m["doc_id"]], 0), m["n_tokens"])
            expect += ["0"] * p + ["1"] * (m["n_tokens"] - p)
        assert r["loss_mask"].split(" ") == expect
        assert r["masked_tokens"] == expect.count("0")
        assert r["n_tokens"] == len(expect)


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(_text, min_size=1, max_size=12),
    rate=st.sampled_from([0.0, 0.3, 0.5, 1.0]),
)
def test_fim_reassembly_property(spark, texts, rate):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    orig = {i: t for i, t in enumerate(texts)}
    for r in fim_transform(df, rate=rate).collect():
        if rate == 0.0:
            assert not r["fim"]
        if rate == 1.0:
            assert r["fim"]
        if not r["fim"]:
            assert r["text_out"] == orig[r["doc_id"]]
            continue
        toks = r["text_out"].split(" ")
        i_s, i_m = toks.index("<SUF>"), toks.index("<MID>")
        assert toks[0] == "<PRE>" and 0 < i_s < i_m
        reassembled = toks[1:i_s] + toks[i_m + 1:] + toks[i_s + 1:i_m]
        assert reassembled == orig[r["doc_id"]].split(" ")
        # sentinel count: exactly one of each, so the mask positions
        # are unambiguous for a downstream tokenizer
        for s in ("<PRE>", "<SUF>", "<MID>"):
            assert toks.count(s) == 1
