"""Data-governance + training-prep parity queries (round 5):
PII audit/redaction, Bloom-prefiltered membership, training-sequence
packing, and a corpus-LM quality score.

Every query is differentially gated against a DuckDB oracle. The PII
patterns live in the common Java-regex/RE2 subset; the Bloom filter
and the packer are pure integer arithmetic over the portable h60
hash; the unigram log-prob sums *fixed-point micro-nats* (BIGINT) so
the aggregate is order-independent and bit-identical across engines —
summing raw doubles would depend on partition order.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from huckli_spark.functions.portable import fround, h60, sql_fround, sql_h60
from huckli_spark.operators import bloom as bl
from huckli_spark.operators import privacy
from huckli_spark.queries import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


# --------------------------------------------------------------------- PII
# The synthetic corpus carries no organic PII, so the query plants
# deterministic PII derived from doc_id on a subset of documents (both
# engines plant identically), then audits + redacts. The operator
# (operators/privacy.py) is what a real pipeline would run unchanged.
_SQL_PLANT = (
    "text || CASE WHEN doc_id % 3 = 0 THEN ' u' || CAST(doc_id AS VARCHAR)"
    " || '@ex' || CAST(doc_id % 7 AS VARCHAR) || '.com' ELSE '' END"
    " || CASE WHEN doc_id % 4 = 0 THEN ' 10.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.0.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' +1 555-123-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
)


def _plant_pii(d: DataFrame) -> DataFrame:
    did = F.col("doc_id")
    email = F.when(
        did % 3 == 0,
        F.concat(F.lit(" u"), did.cast("string"), F.lit("@ex"),
                 (did % 7).cast("string"), F.lit(".com")),
    ).otherwise("")
    ip = F.when(
        did % 4 == 0,
        F.concat(F.lit(" 10."), (did % 256).cast("string"), F.lit(".0."),
                 (did % 100).cast("string")),
    ).otherwise("")
    phone = F.when(
        did % 5 == 0,
        F.concat(F.lit(" +1 555-123-"),
                 F.lpad((did % 10000).cast("string"), 4, "0")),
    ).otherwise("")
    return d.withColumn("text", F.concat(F.col("text"), email, ip, phone))


@query(
    "q_pii_redact",
    f"""
    WITH planted AS (
      SELECT doc_id, {_SQL_PLANT} AS text FROM documents
    )
    SELECT doc_id,
           {privacy.sql_pii_count('text', 'email')} AS n_email,
           {privacy.sql_pii_count('text', 'ipv4')} AS n_ipv4,
           {privacy.sql_pii_count('text', 'phone')} AS n_phone,
           {privacy.sql_pii_count('text', 'email')}
             + {privacy.sql_pii_count('text', 'ipv4')}
             + {privacy.sql_pii_count('text', 'phone')} AS n_pii,
           {sql_h60(privacy.sql_redact('text'))} AS redacted_h
    FROM planted
    """,
    doc="PII audit + redaction: per-document email/IP/phone match "
    "counts and the hash of the fully redacted text (so the gate "
    "verifies the replacement bytes, not just the counts). Map-only "
    "regexp in the Java/RE2 common subset; the operator is "
    "operators/privacy.py pii_scrub, scale O(bytes).",
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _plant_pii(_docs(spark, sf_dir).select("doc_id", "text"))
    s = privacy.pii_scrub(d)
    return s.select(
        "doc_id", "n_email", "n_ipv4", "n_phone", "n_pii",
        h60(F.col("redacted")).alias("redacted_h"),
    )


# ------------------------------------------------------------------- Bloom
_BLOOM_M_WORDS = 64
_BLOOM_K = 4


def _sql_bloom_probe(m_words: int, k: int) -> str:
    m_bits = m_words * bl.BITS_PER_WORD
    pos = ", ".join(bl.sql_bloom_position("key", i, m_bits) for i in range(k))
    return f"""probes AS (
      SELECT key, unnest([{pos}]) AS p FROM cand
    ), pj AS (
      SELECT probes.key,
             CASE WHEN (coalesce(b.bits, 0)
                        & (CAST(1 AS BIGINT)
                           << CAST(p % {bl.BITS_PER_WORD} AS INTEGER))) <> 0
                  THEN 1 ELSE 0 END AS hit
      FROM probes LEFT JOIN bloom b
        ON b.word_idx = CAST(p // {bl.BITS_PER_WORD} AS BIGINT)
    ), ph AS (
      SELECT key, sum(hit) = {k} AS bloom_hit FROM pj GROUP BY key
    )"""


_SQL_BIGRAMS = (
    "SELECT DISTINCT unnest(list_transform(range(1, array_length(w)),"
    " i -> w[i] || ' ' || w[i + 1])) AS key"
    " FROM (SELECT string_split(text, ' ') AS w FROM documents"
    " WHERE source IS {op} 'src0')"
)


@query(
    "q_bloom_decontaminate",
    f"""
    WITH cand AS (
      {_SQL_BIGRAMS.format(op='DISTINCT FROM')}
    ), mem AS (
      {_SQL_BIGRAMS.format(op='NOT DISTINCT FROM')}
    ), bloom AS (
      {bl.sql_bloom_build_cte('SELECT key FROM mem', _BLOOM_M_WORDS, _BLOOM_K)}
    ), {_sql_bloom_probe(_BLOOM_M_WORDS, _BLOOM_K)}
    SELECT ph.key, ph.bloom_hit,
           (ph.bloom_hit AND mem.key IS NOT NULL) AS is_member
    FROM ph LEFT JOIN mem ON mem.key = ph.key
    """,
    doc="Bloom-prefiltered membership: build a 64-word (3968-bit, k=4) "
    "portable Bloom filter over the holdout bigram set (~900 keys at "
    "gate scale), probe every candidate bigram map-side, exact-verify "
    "only bloom survivors. The gate hashes per-key bloom verdicts "
    "INCLUDING false positives — both engines derive identical bits. "
    "This is the broadcastable decontamination pre-filter for key sets "
    "too large to ship exactly (filter size is m/8 bytes regardless of "
    "member count).",
)
def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    bigrams = d.select(F.split("text", " ").alias("__w"), "source").select(
        F.explode(
            F.expr(
                "CASE WHEN size(__w) < 2 THEN array()"
                " ELSE transform(sequence(0, size(__w) - 2),"
                " i -> concat(element_at(__w, i + 1), ' ', element_at(__w, i + 2)))"
                " END"
            )
        ).alias("key"),
        "source",
    )
    cand = (
        bigrams.where(~F.col("source").eqNullSafe("src0")).select("key").distinct()
    )
    mem = (
        bigrams.where(F.col("source").eqNullSafe("src0")).select("key").distinct()
    )
    out = bl.bloom_filter_keys(
        cand, "key", mem, "key", m_words=_BLOOM_M_WORDS, k=_BLOOM_K
    )
    return out.select("key", "bloom_hit", "is_member")


# ----------------------------------------------------------------- packing
_PACK_BUDGET = 128
_PACK_SHARDS = 8


def _span_ctes() -> str:
    """Shared oracle CTE chain: pack offsets -> per-doc sequence range
    -> exploded (doc, seq) span rows. One definition feeds both
    q_pack_spans and q_pack_segments so the span-intersection
    arithmetic can never diverge between them (the
    sql_temperature_wmap factoring pattern)."""
    return f"""d AS (
      SELECT doc_id,
             array_length(string_split(text, ' ')) + 1 AS n_tokens,
             {sql_h60("'shard:' || CAST(doc_id AS VARCHAR)")} % {_PACK_SHARDS}
               AS shard,
             {sql_h60("'pack:' || CAST(doc_id AS VARCHAR)")} AS ok
      FROM documents
    ), w AS (
      SELECT doc_id, n_tokens, shard,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY ok, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM d
    ), b AS (
      SELECT doc_id, n_tokens, shard, CAST(off AS BIGINT) AS off,
             CAST(off // {_PACK_BUDGET} AS BIGINT) AS s0,
             CAST((off + n_tokens - 1) // {_PACK_BUDGET} AS BIGINT) AS s1
      FROM w
    ), x AS (
      SELECT doc_id, shard, n_tokens, off, s0, s1,
             unnest(generate_series(s0, s1)) AS seq_idx
      FROM b
    )"""


def _nosplit_walk_ctes(d_extra: str = "") -> str:
    """Shared oracle CTE chain for the sequential next-fit bin walk
    (RECURSIVE CTE) — one definition feeds q_pack_nosplit and
    q_sft_loss_mask so the walk condition can never diverge.
    ``d_extra``: extra per-doc columns for the d CTE (the loss-mask
    oracle adds the prompt length)."""
    return f"""d AS (
      SELECT doc_id,
             array_length(string_split(text, ' ')) + 1 AS n_tokens,
             {d_extra}
             {sql_h60("'shard:' || CAST(doc_id AS VARCHAR)")} % {_PACK_SHARDS}
               AS shard,
             {sql_h60("'pack:' || CAST(doc_id AS VARCHAR)")} AS ok
      FROM documents
    ), o AS (
      SELECT doc_id, n_tokens, shard,
             row_number() OVER (PARTITION BY shard ORDER BY ok, doc_id)
               AS pack_rank
      FROM d
    ), walk AS (
      SELECT shard, pack_rank, doc_id, n_tokens,
             CAST(0 AS BIGINT) AS seq_idx,
             CAST(0 AS BIGINT) AS offset_in_seq,
             n_tokens AS fill
      FROM o WHERE pack_rank = 1
      UNION ALL
      SELECT o.shard, o.pack_rank, o.doc_id, o.n_tokens,
             CASE WHEN w.fill > 0 AND w.fill + o.n_tokens > {_PACK_BUDGET}
                  THEN w.seq_idx + 1 ELSE w.seq_idx END,
             CASE WHEN w.fill > 0 AND w.fill + o.n_tokens > {_PACK_BUDGET}
                  THEN 0 ELSE w.fill END,
             CASE WHEN w.fill > 0 AND w.fill + o.n_tokens > {_PACK_BUDGET}
                  THEN o.n_tokens ELSE w.fill + o.n_tokens END
      FROM o JOIN walk w
        ON o.shard = w.shard AND o.pack_rank = w.pack_rank + 1
    )"""


@query(
    "q_sequence_pack",
    f"""
    WITH d AS (
      SELECT doc_id,
             array_length(string_split(text, ' ')) + 1 AS n_tokens,
             {sql_h60("'shard:' || CAST(doc_id AS VARCHAR)")} % {_PACK_SHARDS}
               AS shard,
             {sql_h60("'pack:' || CAST(doc_id AS VARCHAR)")} AS ok
      FROM documents
    ), w AS (
      SELECT doc_id, n_tokens, shard,
             row_number() OVER (PARTITION BY shard ORDER BY ok, doc_id)
               AS pack_rank,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY ok, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM d
    )
    SELECT doc_id, n_tokens, shard, pack_rank,
           CAST(off // {_PACK_BUDGET} AS BIGINT) AS seq_idx,
           CAST(off % {_PACK_BUDGET} AS BIGINT) AS offset_in_seq
    FROM w
    """,
    doc="training-sequence packing (concat-and-chunk): deterministic "
    "shard assignment by hash, hash-order concatenation within shard, "
    "one window pass for the exclusive token offset, integer division "
    "for the context-window index. All-integer => bit-identical across "
    "engines and partitionings. One shuffle (by shard); shards bound "
    "window partitions at 100 TB.",
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.packing import pack_sequences

    return pack_sequences(
        _docs(spark, sf_dir), budget=_PACK_BUDGET, n_shards=_PACK_SHARDS,
        max_shard_rows=None,
    )


@query(
    "q_pack_spans",
    f"""
    WITH {_span_ctes()}
    SELECT shard, seq_idx, doc_id,
           CAST(seq_idx - s0 AS BIGINT) AS part,
           CAST(s1 - s0 + 1 AS BIGINT) AS n_parts,
           CAST(greatest(off, seq_idx * {_PACK_BUDGET})
                - seq_idx * {_PACK_BUDGET} AS BIGINT) AS start_in_seq,
           CAST(least(off + n_tokens, (seq_idx + 1) * {_PACK_BUDGET})
                - greatest(off, seq_idx * {_PACK_BUDGET}) AS BIGINT)
             AS len_in_seq
    FROM x
    """,
    doc="per-sequence document spans from the pack assignment — the "
    "block-diagonal attention-mask relation (attention must not cross "
    "doc boundaries inside a packed sequence): each doc explodes over "
    "exactly the sequences it touches (fan-out bounded by its own "
    "token mass), span = the integer intersection of the doc's token "
    "interval with the sequence's. No shuffle beyond the pack window "
    "itself; all-integer, so the DuckDB generate_series oracle "
    "replays every span bit-identically.",
)
def q_pack_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.packing import pack_doc_spans, pack_sequences

    packed = pack_sequences(
        _docs(spark, sf_dir), budget=_PACK_BUDGET, n_shards=_PACK_SHARDS,
        max_shard_rows=None,
    )
    return pack_doc_spans(packed, budget=_PACK_BUDGET)


@query(
    "q_pack_segments",
    f"""
    WITH {_span_ctes()}, sp AS (
      SELECT shard, seq_idx,
             CAST(greatest(off, seq_idx * {_PACK_BUDGET})
                  - seq_idx * {_PACK_BUDGET} AS BIGINT) AS start_in_seq,
             CAST(least(off + n_tokens, (seq_idx + 1) * {_PACK_BUDGET})
                  - greatest(off, seq_idx * {_PACK_BUDGET}) AS BIGINT)
               AS len_in_seq
      FROM x
    ), seg AS (
      SELECT shard, seq_idx, start_in_seq, len_in_seq,
             row_number() OVER (
               PARTITION BY shard, seq_idx ORDER BY start_in_seq
             ) - 1 AS seg
      FROM sp
    ), tok AS (
      SELECT shard, seq_idx, seg,
             start_in_seq + unnest(generate_series(1, len_in_seq)) - 1
               AS pos
      FROM seg
    )
    SELECT shard, seq_idx,
           CAST(count(DISTINCT seg) AS INTEGER) AS n_docs,
           count(*) AS n_tokens,
           string_agg(CAST(seg AS VARCHAR), ' ' ORDER BY pos)
             AS segment_ids
    FROM tok GROUP BY shard, seq_idx
    """,
    doc="token-aligned SEGMENT IDS for packed sequences — position p "
    "gets the 0-based in-sequence ordinal of the doc covering p, the "
    "segment_ids array a block-diagonal-attention loader feeds next "
    "to input_ids. The Spark side never explodes tokens (sort the "
    "budget-bounded spans in-row, array_repeat each id len times, "
    "flatten — O(budget) per output row); the ORACLE builds the same "
    "string from token-level generate_series rows — two different "
    "constructions agreeing bit-for-bit is the point of the "
    "differential. Space-joined output (the q_array_fns gate "
    "convention).",
)
def q_pack_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.packing import (
        pack_doc_spans,
        pack_segment_ids,
        pack_sequences,
    )

    packed = pack_sequences(
        _docs(spark, sf_dir), budget=_PACK_BUDGET, n_shards=_PACK_SHARDS,
        max_shard_rows=None,
    )
    return pack_segment_ids(pack_doc_spans(packed, budget=_PACK_BUDGET))


# ---------------------------------------------------------- unigram logprob
@query(
    "q_unigram_logprob",
    f"""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), freq AS (
      SELECT w, count(*) AS c FROM w GROUP BY w
    ), n AS (
      SELECT count(*) AS n FROM w
    ), scored AS (
      SELECT w.doc_id,
             CAST(floor(ln(freq.c * 1.0 / n.n) * 1000000 + 0.5) AS BIGINT)
               AS lp_micro
      FROM w JOIN freq USING (w) CROSS JOIN n
    )
    SELECT doc_id,
           count(*) AS n_words,
           CAST(sum(lp_micro) AS BIGINT) AS sum_lp_micro,
           {sql_fround('sum(lp_micro) * 1.0 / count(*) / 1000000', 4)}
             AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
    doc="corpus unigram-LM quality score: two-pass (global word "
    "frequencies, then per-document mean log-likelihood). Per-word "
    "log-probs are fixed-point micro-nats (BIGINT) so the per-doc sum "
    "is exact integer arithmetic — order-independent, hence portable; "
    "summing raw doubles would be partition-order-dependent. The freq "
    "join shuffles on word; low-probability docs are the filter "
    "candidates (boilerplate/garbage detection).",
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    w = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    freq = w.groupBy("w").agg(F.count("*").alias("c"))
    n = w.select(F.count("*").alias("n"))
    scored = (
        w.join(freq, "w")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.floor(F.log(F.col("c") / F.col("n")) * 1000000 + F.lit(0.5))
            .cast("long")
            .alias("lp_micro"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum("lp_micro").cast("long").alias("sum_lp_micro"),
        fround(F.sum("lp_micro") * 1.0 / F.count("*") / 1000000, 4).alias(
            "avg_logprob"
        ),
    )


# ------------------------------------------------------------------- BPE
@query(
    "q_bpe_pairs",
    """
    WITH wf AS (
      SELECT w AS word, count(*) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
      ) WHERE length(w) > 0 GROUP BY 1
    ), p AS (
      SELECT word[i:i] AS a, word[i + 1:i + 1] AS b, freq
      FROM wf, unnest(range(1, length(word))) AS t(i)
    ), agg AS (
      SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt FROM p GROUP BY a, b
    ), ranked AS (
      SELECT a, b, cnt,
             row_number() OVER (ORDER BY cnt DESC, a, b) AS rnk
      FROM agg
    )
    SELECT a, b, cnt, rnk FROM ranked WHERE rnk <= 20
    """,
    doc="BPE training statistics (iteration 1): frequency-weighted "
    "adjacent-character pair counts over the word-collapsed corpus, "
    "top-20 by (count, pair) — the argmax relation every merge "
    "iteration recomputes. The full distributed trainer "
    "(operators/bpe.py bpe_train) is differentially verified against "
    "a pure-Python reference in tests/test_bpe.py (merge tables and "
    "tokenizations match exactly, incl. on the fixture corpus); this "
    "gate pins the one engine-portable relation of the loop. Scale: "
    "the corpus collapses to (word, freq) once — iterations touch "
    "vocab-sized data only.",
)
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from huckli_spark.operators.bpe import pair_counts, word_freqs

    words = word_freqs(_docs(spark, sf_dir)).select(
        "word",
        F.expr("filter(split(word, ''), x -> x <> '')").alias("syms"),
        "freq",
    )
    pc = pair_counts(words)
    top = pc.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(20)
    rk = F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")))
    return top.withColumn("rnk", rk)


# ----------------------------------------------------- bigram LM quality
@query(
    "q_bigram_logprob",
    f"""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), big AS (
      SELECT doc_id,
             unnest(list_transform(range(1, array_length(w)),
                    i -> [w[i], w[i + 1]])) AS bg
      FROM base WHERE array_length(w) >= 2
    ), pairs AS (
      SELECT doc_id, bg[1] AS ctx, bg[2] AS nxt FROM big
    ), cb AS (
      SELECT ctx, nxt, count(*) AS c FROM pairs GROUP BY 1, 2
    ), cc AS (
      SELECT ctx, count(*) AS n FROM pairs GROUP BY 1
    ), vocab AS (
      SELECT count(DISTINCT x) AS v
      FROM (SELECT unnest(w) AS x FROM base)
    ), scored AS (
      -- add-one smoothed conditional log-prob, fixed-point micro-nats
      SELECT p.doc_id,
             CAST(floor(ln((cb.c + 1.0) / (cc.n + vocab.v))
                        * 1000000 + 0.5) AS BIGINT) AS lp_micro
      FROM pairs p
      JOIN cb ON cb.ctx = p.ctx AND cb.nxt = p.nxt
      JOIN cc ON cc.ctx = p.ctx
      CROSS JOIN vocab
    )
    SELECT doc_id,
           count(*) AS n_bigrams,
           CAST(sum(lp_micro) AS BIGINT) AS sum_lp_micro,
           {sql_fround('sum(lp_micro) * 1.0 / count(*) / 1000000', 4)}
             AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
    doc="bigram-LM quality score (add-one smoothed conditional "
    "P(w_i | w_{{i-1}})): the perplexity-style filter one step past "
    "q_unigram_logprob — boilerplate and scrambled text diverge from "
    "natural word order even when unigram frequencies look fine. "
    "Same portability discipline: per-bigram log-probs floor to micro-"
    "nat BIGINTs, per-doc sums are exact integer aggregation. Two "
    "count shuffles (bigram, context) + a vocab scalar; the scoring "
    "join shuffles on the context key.",
)
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    base = d.select("doc_id", F.split("text", " ").alias("w"))
    pairs = (
        base.where(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> struct(element_at(w, i) AS ctx,"
                    " element_at(w, i + 1) AS nxt))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.ctx", "p.nxt")
    )
    cb = pairs.groupBy("ctx", "nxt").agg(F.count("*").alias("c"))
    cc = pairs.groupBy("ctx").agg(F.count("*").alias("n"))
    vocab = base.select(F.explode("w").alias("x")).agg(
        F.count_distinct("x").alias("v")
    )
    scored = (
        pairs.join(cb, ["ctx", "nxt"])
        .join(cc, "ctx")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.floor(
                F.log((F.col("c") + 1.0) / (F.col("n") + F.col("v"))) * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("lp_micro"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("lp_micro").cast("long").alias("sum_lp_micro"),
        fround(F.sum("lp_micro") * 1.0 / F.count("*") / 1000000, 4).alias(
            "avg_logprob"
        ),
    )


# The merge table q_bpe_encode applies: trained once on the sf0.01
# documents fixture by operators/bpe.bpe_train (deterministic — count
# DESC, lexicographic tiebreak) and FROZEN here, because the gate
# query's job is to pin the APPLICATION path (the tokenizer serving
# path), not re-pay training per run. tests/test_bpe.py re-derives
# this table from the fixture and asserts it matches.
BPE_FIXTURE_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"),
    ("s", "t"), ("m", "er"), ("a", "t"), ("l", "u"),
]


def _bpe_encode_oracle() -> str:
    from huckli_spark.operators.bpe import sql_bpe_apply

    return sql_bpe_apply(
        "SELECT DISTINCT w AS word FROM ("
        "SELECT unnest(string_split(text, ' ')) AS w FROM documents"
        ") WHERE length(w) > 0",
        BPE_FIXTURE_MERGES,
    )


@query(
    "q_bpe_encode",
    _bpe_encode_oracle(),
    doc="BPE tokenizer APPLICATION: the frozen 8-merge table (trained "
    "on this fixture by the gated trainer) tokenizes the corpus "
    "vocabulary; output is every (word, pos, token) triple. The "
    "Spark side folds merges in-row (map-only skip-state machine); "
    "the oracle replays them RELATIONALLY (gaps-and-islands greedy "
    "leftmost) — a cross-formulation differential, not a transcript. "
    "Scale: tokenization of a 100 TB corpus is corpus-scan x in-row "
    "folds, zero shuffle; the vocab-level form here additionally "
    "collapses the corpus to distinct words first.",
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.bpe import bpe_apply

    words = (
        _docs(spark, sf_dir)
        .select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.length("word") > 0)
        .distinct()
        .select(F.col("word").alias("text"))
    )
    out = bpe_apply(words, BPE_FIXTURE_MERGES)
    return out.select(
        F.col("__w").alias("word"),
        F.posexplode("syms").alias("pos", "token"),
    ).select("word", F.col("pos").cast("int"), "token")


# ---------------------------------------------------------- DQ audit
# Declarative data-quality expectations (the dbt-test / Deequ
# constraint-suite pattern) evaluated in ONE audit pass per table:
# each check is a named aggregate returning (n_checked, n_violations)
# and the suite unions into a fixed report relation — the shape a
# warehouse CI gate consumes before promoting a snapshot.
@query(
    "q_dq_audit",
    """
    SELECT 'pk_unique' AS check_name, 'orders' AS table_name,
           CAST(count(*) AS BIGINT) AS n_checked,
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
             AS n_violations
    FROM orders
    UNION ALL
    SELECT 'fk_orders_customer', 'orders',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    UNION ALL
    SELECT 'fk_lineitem_orders', 'lineitem',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
    UNION ALL
    SELECT 'range_discount', 'lineitem',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'not_null_text', 'documents',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'accepted_event_types', 'events',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN event_type IN
                    ('view','click','purchase','signup','error')
                    THEN 0 ELSE 1 END) AS BIGINT)
    FROM events
    """,
    doc="declarative data-quality audit suite (the dbt-test / Deequ "
    "pattern): primary-key uniqueness, two referential-integrity "
    "checks, a value-range rule, a not-null rule and an "
    "accepted-values rule, unioned into one fixed report relation. "
    "Scale: each rule is one scan-aggregate; the FK checks are "
    "left joins against the (broadcastable) parent key sets — no "
    "rule materializes violating ROWS (counts only), so the audit's "
    "output is O(rules) regardless of table size. Violation-row "
    "drill-down is a follow-up filtered query per failing rule.",
)
def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _t(name):
        return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))

    orders, customer = _t("orders"), _t("customer")
    lineitem, docs = _t("lineitem"), _t("documents")
    events = _t("events").select("event_type")  # no ts: plain reader

    def row(check, table, checked, violations):
        return F.struct(
            F.lit(check).alias("check_name"),
            F.lit(table).alias("table_name"),
            checked.cast("long").alias("n_checked"),
            violations.cast("long").alias("n_violations"),
        )

    pk = orders.agg(
        row(
            "pk_unique", "orders", F.count("*"),
            F.count("*") - F.count_distinct("o_orderkey"),
        ).alias("r")
    )
    fk1 = (
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders.o_custkey == F.col("c_custkey"),
            "left",
        )
        .agg(
            row(
                "fk_orders_customer", "orders", F.count("*"),
                F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)),
            ).alias("r")
        )
    )
    fk2 = (
        lineitem.join(
            F.broadcast(orders.select("o_orderkey")),
            lineitem.l_orderkey == F.col("o_orderkey"),
            "left",
        )
        .agg(
            row(
                "fk_lineitem_orders", "lineitem", F.count("*"),
                F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)),
            ).alias("r")
        )
    )
    rng = lineitem.agg(
        row(
            "range_discount", "lineitem", F.count("*"),
            F.sum(
                F.when(
                    (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1
                ).otherwise(0)
            ),
        ).alias("r")
    )
    nn = docs.agg(
        row(
            "not_null_text", "documents", F.count("*"),
            F.sum(
                F.when(
                    F.col("text").isNull() | (F.col("text") == ""), 1
                ).otherwise(0)
            ),
        ).alias("r")
    )
    av = events.agg(
        row(
            "accepted_event_types", "events", F.count("*"),
            F.sum(
                F.when(
                    F.col("event_type").isin(
                        "view", "click", "purchase", "signup", "error"
                    ),
                    0,
                ).otherwise(1)
            ),
        ).alias("r")
    )
    out = pk
    for part in (fk1, fk2, rng, nn, av):
        out = out.unionAll(part)
    return out.select("r.*")


# ------------------------------------------------- group-aware split
# Train/val/test assignment by GROUP hash (all events of a user land
# in the same split) — the leakage guard q_hash_sample's row-level
# predicate cannot give: a user straddling train and eval leaks
# behavioral signal across the boundary.
@query(
    "q_group_split",
    f"""
    WITH assigned AS (
      SELECT event_type,
             CASE
               WHEN {sql_h60("'split:' || CAST(user_id AS VARCHAR)")} % 10 < 8
                 THEN 'train'
               WHEN {sql_h60("'split:' || CAST(user_id AS VARCHAR)")} % 10 = 8
                 THEN 'val'
               ELSE 'test' END AS split,
             user_id
      FROM events
    )
    SELECT split, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM assigned GROUP BY 1, 2
    """,
    doc="group-aware train/val/test split (80/10/10 by USER hash, not "
    "row hash): every event of a user lands in one split, so no "
    "behavioral leakage across the eval boundary — the split "
    "primitive for user-level models that q_hash_sample's row "
    "predicate cannot provide (disjointness asserted in tests). "
    "Deterministic on any engine/partitioning via the portable hash; "
    "map-side assignment, one aggregate shuffle.",
)
def q_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_type", "user_id"
    )
    hb = h60(F.concat(F.lit("split:"), F.col("user_id").cast("string"))) % 10
    split = (
        F.when(hb < 8, "train").when(hb == 8, "val").otherwise("test")
    )
    return (
        ev.select("event_type", "user_id", split.alias("split"))
        .groupBy("split", "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
        )
    )


# ------------------------------------------------ tokenizer fertility (r8)
def _fertility_oracle() -> str:
    from huckli_spark.operators.bpe import sql_bpe_apply

    tok_sql = sql_bpe_apply(
        "SELECT DISTINCT w AS word FROM ("
        "SELECT unnest(string_split(text, ' ')) AS w FROM documents"
        ") WHERE length(w) > 0",
        BPE_FIXTURE_MERGES,
    )
    return f"""
    WITH tok AS (
      SELECT word, CAST(count(*) AS BIGINT) AS n_tok
      FROM ({tok_sql}) GROUP BY word
    ), wl AS (
      SELECT lang, w AS word, CAST(count(*) AS BIGINT) AS cnt
      FROM (
        SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents
      ) WHERE length(w) > 0 GROUP BY 1, 2
    )
    SELECT wl.lang,
           CAST(sum(wl.cnt * tok.n_tok) AS BIGINT) AS total_tokens,
           CAST(sum(wl.cnt) AS BIGINT) AS total_words,
           CAST(floor(sum(wl.cnt * tok.n_tok) * 1000000.0
                      / sum(wl.cnt) + 0.5) AS BIGINT) AS fertility_micro
    FROM wl JOIN tok USING (word)
    GROUP BY wl.lang
    """


@query(
    "q_bpe_fertility",
    _fertility_oracle(),
    doc="tokenizer fertility by language — tokens-per-word under the "
    "frozen 8-merge BPE table, the standard metric for judging "
    "whether a tokenizer under-serves a language (high fertility = "
    "more tokens per word = worse compression and higher training "
    "cost for that language). The corpus collapses to its distinct "
    "vocabulary ONCE; the Arrow-batched tokenizer runs per distinct "
    "word, then occurrence-weighted per-language sums are exact "
    "integers (fertility floored to micro). The oracle replays the "
    "merges with the gaps-and-islands relational formulation — the "
    "same cross-formulation differential as q_bpe_encode, extended "
    "through the weighted aggregate. Scale: tokenization cost is "
    "vocab-sized, not corpus-sized; the weighting join is "
    "vocab-by-(lang,word) — both collapse before anything shuffles.",
)
def q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.bpe import bpe_apply

    docs = _docs(spark, sf_dir)
    wl = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("lang", "word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    vocab = wl.select("word").distinct().select(F.col("word").alias("text"))
    tok = (
        bpe_apply(vocab, BPE_FIXTURE_MERGES)
        .select(F.col("__w").alias("word"), F.size("syms").alias("__nt"))
        .groupBy("word")
        .agg(F.sum("__nt").cast("long").alias("n_tok"))
    )
    return (
        wl.join(tok, "word")
        .groupBy("lang")
        .agg(
            F.sum(F.col("cnt") * F.col("n_tok"))
            .cast("long")
            .alias("total_tokens"),
            F.sum("cnt").cast("long").alias("total_words"),
            F.floor(
                F.sum(F.col("cnt") * F.col("n_tok"))
                * F.lit(1000000.0)
                / F.sum("cnt")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("fertility_micro"),
        )
    )


# ------------------------------------------ CCNet-style LM buckets (r8)
@query(
    "q_ccnet_buckets",
    f"""
    WITH base AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    ), big AS (
      SELECT doc_id,
             unnest(list_transform(range(1, array_length(w)),
                    i -> [w[i], w[i + 1]])) AS bg
      FROM base WHERE array_length(w) >= 2
    ), pairs AS (
      SELECT doc_id, bg[1] AS ctx, bg[2] AS nxt FROM big
    ), cb AS (
      SELECT ctx, nxt, count(*) AS c FROM pairs GROUP BY 1, 2
    ), cc AS (
      SELECT ctx, count(*) AS n FROM pairs GROUP BY 1
    ), vocab AS (
      SELECT count(DISTINCT x) AS v
      FROM (SELECT unnest(w) AS x FROM base)
    ), scored AS (
      SELECT p.doc_id,
             CAST(floor(ln((cb.c + 1.0) / (cc.n + vocab.v))
                        * 1000000 + 0.5) AS BIGINT) AS lp_micro
      FROM pairs p
      JOIN cb ON cb.ctx = p.ctx AND cb.nxt = p.nxt
      JOIN cc ON cc.ctx = p.ctx
      CROSS JOIN vocab
    ), doc_lp AS (
      SELECT doc_id,
             CAST(floor(sum(lp_micro) * 1.0 / count(*) + 0.5)
                  AS BIGINT) AS avg_lp_micro
      FROM scored GROUP BY doc_id
    ), per_doc AS (
      SELECT d.doc_id, b.lang,
             CAST(array_length(b.w) AS BIGINT) AS n_words,
             d.avg_lp_micro
      FROM doc_lp d JOIN base b ON b.doc_id = d.doc_id
    ), tiled AS (
      SELECT lang, n_words, avg_lp_micro,
             ntile(3) OVER (
               PARTITION BY lang ORDER BY avg_lp_micro DESC, doc_id
             ) AS t
      FROM per_doc
    )
    SELECT lang,
           CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                  ELSE 'tail' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS words,
           CAST(min(avg_lp_micro) AS BIGINT) AS floor_lp_micro
    FROM tiled GROUP BY lang, t
    """,
    doc="CCNet-style language-model buckets (Wenzek et al. 2020, "
    "arXiv:1911.00359): per-language head/middle/tail terciles by "
    "bigram-LM score — CCNet trains KenLM per language and keeps the "
    "low-perplexity 'head' slice; this replays the split with the "
    "repo's add-one-smoothed bigram LM (q_bigram_logprob's exact "
    "micro-nat arithmetic), ranking docs per language by average "
    "log-prob as deterministic micro ints with doc_id tiebreaks. "
    "Output: per (lang, bucket) doc count, word volume, and the "
    "bucket's score floor — the cut table a per-language corpus "
    "release publishes. Scale: LM stats are two count shuffles + a "
    "vocab scalar; the tercile window partitions BY LANGUAGE (never "
    "one global sort); the decision table is 3 rows per language.",
)
def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from huckli_spark.operators.parallel import exploded, fan_out

    d = _docs(spark, sf_dir)
    base = d.select("doc_id", "lang", F.split("text", " ").alias("w"))
    # r13: the old form derived the corpus bigram explode THREE times
    # (cb, cc, scored), each on the scan's task count — one task for
    # single-row-group fixtures — and shuffled the full instance
    # stream through two joins. Now: explode ONCE, wide (fan_out +
    # the no-filter-inference exploded), collapse to distinct
    # (doc, bigram) with multiplicity m — shuffle fewer bytes (§2.2)
    # — and ride BOTH LM stats on one hash(ctx) exchange: the (ctx)
    # window partitioning satisfies the (ctx, nxt) window's
    # clustering, so Spark plans the second window sort-only.
    # Counts are exact (sum(m) over a group == count over instances),
    # so lp_micro and the oracle are bit-identical.
    pairs = exploded(
        fan_out(base.where(F.size("w") >= 2).select("doc_id", "w")),
        ["doc_id"],
        F.expr(
            "transform(sequence(1, size(w) - 1),"
            " i -> struct(element_at(w, i) AS ctx,"
            " element_at(w, i + 1) AS nxt))"
        ),
        "p",
    ).select("doc_id", "p.ctx", "p.nxt")
    pg = pairs.groupBy("doc_id", "ctx", "nxt").agg(
        F.count("*").alias("m")
    )
    vocab = exploded(fan_out(base.select("w")), [], F.col("w"), "x").agg(
        F.count_distinct("x").alias("v")
    )
    wcc = Window.partitionBy("ctx")
    wcb = Window.partitionBy("ctx", "nxt")
    scored = (
        pg.withColumn("n", F.sum("m").over(wcc))
        .withColumn("c", F.sum("m").over(wcb))
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "m",
            F.floor(
                F.log((F.col("c") + 1.0) / (F.col("n") + F.col("v"))) * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("lp_micro"),
        )
    )
    per_doc = (
        scored.groupBy("doc_id")
        .agg(
            F.floor(
                F.sum(F.col("m") * F.col("lp_micro")) * F.lit(1.0)
                / F.sum("m")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("avg_lp_micro")
        )
        .join(
            base.select(
                "doc_id", "lang", F.size("w").cast("long").alias("n_words")
            ),
            "doc_id",
        )
    )
    # round-8 continuation: the per-language tercile used
    # ntile OVER (PARTITION BY lang) — ONE task per language, i.e.
    # corpus/5 rows in a single task at scale. exact_ntile_grouped
    # is the distributed decomposition, hash-pinned bit-identical to
    # the partitioned-window NTILE (oracle below is unchanged).
    # r13: materialize per_doc (one row per doc) first — the ntile
    # decomposition references its input several times, and each
    # reference re-derived the whole LM-scoring pipeline above.
    from huckli_spark.operators.cache import eager_release
    from huckli_spark.operators.skew import exact_ntile_grouped

    tiled = exact_ntile_grouped(
        eager_release(per_doc), 3, score_col="avg_lp_micro",
        id_col="doc_id", group_col="lang", out_col="t",
    )
    bucket = (
        F.when(F.col("t") == 1, "head")
        .when(F.col("t") == 2, "middle")
        .otherwise("tail")
    )
    return tiled.groupBy("lang", "t").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("words"),
        F.min("avg_lp_micro").cast("long").alias("floor_lp_micro"),
    ).select(
        "lang",
        bucket.alias("bucket"),
        "n_docs",
        "words",
        "floor_lp_micro",
    )


# ------------------------------------------- unigram-LM tokenizer (Kudo)
# The SentencePiece-default trainer, as a pure-dataflow operator: see
# operators/unigram_lm.py for the algorithm and the 100 TB shape
# (corpus collapses to (word, freq) once; E-step is map-only via a
# broadcast map<piece,cost> row + in-row Viterbi folds; one
# vocab-sized shuffle per EM iteration). Both gates replay the WHOLE
# trainer in DuckDB — seeding, every unrolled Viterbi DP, pruning,
# M-step — via generated CTEs (the logreg/pagerank oracle pattern).
_UNI = dict(vocab_size=60, n_iters=2, max_piece_len=4)


@query(
    "q_unigram_tokenize",
    None,  # filled below: the generator needs the params tuple
    doc="unigram-LM (SentencePiece-style) tokenizer training, "
    "hard-EM with Viterbi E-step: final (piece, cost_micro, "
    "corpus_count) after 2 EM iterations at vocab_size=60 — the hash "
    "covers seeding, both EM iterations (integer micro-nat Viterbi, "
    "tie-break baked into the DP key), pruning, M-step smoothing, "
    "AND the final corpus segmentation. Differential twin: "
    "tests/test_unigram_lm.py trains the same corpora with a pure-"
    "Python reference.",
)
def q_unigram_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators import unigram_lm as U

    return U.unigram_table(_docs(spark, sf_dir), **_UNI)


@query(
    "q_unigram_encode",
    None,
    doc="per-document encoding under the trained unigram-LM table: "
    "(doc_id, n_tokens, cost_micro) — token count and total Viterbi "
    "cost per document. Per-word stats are computed ONCE on the "
    "distinct-word relation and joined back to the document word "
    "stream (never re-derived per occurrence); the oracle replays "
    "training + encoding end to end.",
)
def q_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators import unigram_lm as U

    d = _docs(spark, sf_dir)
    vocab = U.unigram_fit(d, **_UNI)
    stats = U.word_stats(U.word_table(d), vocab, _UNI["max_piece_len"])
    docw = (
        d.select(
            "doc_id", F.explode(F.split("text", " ")).alias("w")
        )
        .where(F.length("w") > 0)
        .select("doc_id", F.substring("w", 1, U.WCAP).alias("word"))
    )
    return (
        docw.join(stats, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("np").cast("long").alias("n_tokens"),
            F.sum("wcost").cast("long").alias("cost_micro"),
        )
    )


def _fill_unigram_oracles() -> None:
    from huckli_spark.operators import unigram_lm as U
    from huckli_spark.queries import _REGISTRY, QuerySpec

    for name, sql in (
        ("q_unigram_tokenize", U.unigram_oracle_sql(**_UNI)),
        ("q_unigram_encode", U.unigram_encode_oracle_sql(**_UNI)),
    ):
        old = _REGISTRY[name]
        _REGISTRY[name] = QuerySpec(
            name=name, build=old.build, oracle=sql, doc=old.doc
        )


_fill_unigram_oracles()


# ------------------------------------------------------ curriculum packing
@query(
    "q_curriculum_pack",
    f"""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), freq AS (
      SELECT w, count(*) AS c FROM w GROUP BY w
    ), n AS (
      SELECT count(*) AS n FROM w
    ), scored AS (
      SELECT w.doc_id,
             CAST(floor(ln(freq.c * 1.0 / n.n) * 1000000 + 0.5) AS BIGINT)
               AS lp_micro
      FROM w JOIN freq USING (w) CROSS JOIN n
    ), doc_score AS (
      SELECT doc_id,
             CAST(floor(sum(lp_micro) * 1.0 / count(*) + 0.5) AS BIGINT)
               AS score_micro
      FROM scored GROUP BY doc_id
    ), d AS (
      SELECT s.doc_id,
             array_length(string_split(t.text, ' ')) + 1 AS n_tokens,
             {sql_h60("'shard:' || CAST(s.doc_id AS VARCHAR)")}
               % {_PACK_SHARDS} AS shard,
             s.score_micro
      FROM doc_score s JOIN documents t ON t.doc_id = s.doc_id
    ), packed AS (
      SELECT doc_id, n_tokens, shard, score_micro,
             row_number() OVER (
               PARTITION BY shard ORDER BY score_micro DESC, doc_id)
               AS pack_rank,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY score_micro DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM d
    )
    SELECT doc_id, n_tokens, shard, score_micro, pack_rank,
           CAST(off // {_PACK_BUDGET} AS BIGINT) AS seq_idx,
           CAST(off % {_PACK_BUDGET} AS BIGINT) AS offset_in_seq
    FROM packed
    """,
    doc="CURRICULUM packing: per-doc unigram-LM quality score (exact "
    "micro-nat mean, q_unigram_logprob's arithmetic) ordering each "
    "shard best-first before the concat-and-chunk pass — shards stay "
    "hash-assigned (uniform across the curriculum), so every shard "
    "streams its own quality-descending curriculum. Same all-integer "
    "pack arithmetic as q_sequence_pack (one window pass, exclusive "
    "offset, integer division). Docs with no tokens never score and "
    "are excluded in both engines. Scale: score = one freq join; "
    "pack = one shuffle by shard.",
)
def q_curriculum_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.packing import pack_sequences

    d = _docs(spark, sf_dir)
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    freq = words.groupBy("w").agg(F.count("*").alias("c"))
    n = words.select(F.count("*").alias("n"))
    score = (
        words.join(freq, "w")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.floor(F.log(F.col("c") / F.col("n")) * 1000000 + F.lit(0.5))
            .cast("long")
            .alias("lp_micro"),
        )
        .groupBy("doc_id")
        .agg(
            F.floor(F.sum("lp_micro") * 1.0 / F.count("*") + F.lit(0.5))
            .cast("long")
            .alias("score_micro")
        )
    )
    scored_docs = d.select("doc_id", "text").join(score, "doc_id")
    packed = pack_sequences(
        scored_docs,
        budget=_PACK_BUDGET,
        n_shards=_PACK_SHARDS,
        order_cols=[F.desc("score_micro")],
        max_shard_rows=None,
    )
    return packed.join(score, "doc_id").select(
        "doc_id", "n_tokens", "shard", "score_micro", "pack_rank",
        "seq_idx", "offset_in_seq",
    )


@query(
    "q_maxmatch_compare",
    None,  # filled below (shares _UNI)
    doc="greedy MaxMatch (WordPiece-style longest-match) vs Viterbi "
    "tokenization under the SAME trained unigram table: per-doc "
    "token counts and total micro-nat costs for both rules. Viterbi "
    "cost <= greedy cost for every document BY CONSTRUCTION "
    "(Viterbi is exact) — the optimality-gap report that justifies "
    "the DP's extra work. Both walks are stateless in-row folds; "
    "the oracle replays training, the unrolled Viterbi DP, AND the "
    "unrolled greedy walk.",
)
def q_maxmatch_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators import unigram_lm as U

    d = _docs(spark, sf_dir)
    vocab = U.unigram_fit(d, **_UNI)
    words = U.word_table(d)
    L = _UNI["max_piece_len"]
    vstats = U.word_stats(words, vocab, L)
    gstats = U.maxmatch_stats(words, vocab, L)
    docw = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .where(F.length("w") > 0)
        .select("doc_id", F.substring("w", 1, U.WCAP).alias("word"))
    )
    return (
        docw.join(gstats, "word")
        .join(vstats, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("gn").cast("long").alias("greedy_n"),
            F.sum("gcost").cast("long").alias("greedy_cost_micro"),
            F.sum("np").cast("long").alias("viterbi_n"),
            F.sum("wcost").cast("long").alias("viterbi_cost_micro"),
        )
    )


def _fill_maxmatch_oracle() -> None:
    from huckli_spark.operators import unigram_lm as U
    from huckli_spark.queries import _REGISTRY, QuerySpec

    old = _REGISTRY["q_maxmatch_compare"]
    _REGISTRY["q_maxmatch_compare"] = QuerySpec(
        name=old.name,
        build=old.build,
        oracle=U.maxmatch_oracle_sql(**_UNI),
        doc=old.doc,
    )


@query(
    "q_release_diff",
    """
    WITH a AS (
      SELECT doc_id, text FROM documents
    ), b AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END
               AS text
      FROM documents WHERE doc_id % 5 <> 0
      UNION ALL
      SELECT doc_id + 1000000, 'new:' || CAST(doc_id AS VARCHAR)
      FROM documents WHERE doc_id % 11 = 0
    )
    SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
           CASE WHEN a.doc_id IS NULL THEN 'added'
                WHEN b.doc_id IS NULL THEN 'removed'
                WHEN md5(a.text) <> md5(b.text) THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM a FULL JOIN b ON a.doc_id = b.doc_id
    """,
    doc="release-to-release content diff (the governance step before "
    "publishing the next dataset version): every doc classified "
    "added/removed/changed/unchanged by FULL-OUTER joining the two "
    "versions on the doc key with md5(text) content fingerprints — "
    "one shuffle per side, narrow rows, never a content join. The "
    "candidate version is derived deterministically from the "
    "baseline (every 5th doc removed, every 7th changed, every 11th "
    "re-added under a new id) so the oracle replays it exactly; the "
    "same content_diff operator backs the release-diff CLI over real "
    "exported releases.",
)
def q_release_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.dedup import content_diff

    d = _docs(spark, sf_dir).select("doc_id", "text")
    changed = d.where(F.col("doc_id") % 5 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")).alias("text"),
    )
    added = d.where(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.lit("new:"), F.col("doc_id").cast("string")).alias("text"),
    )
    return content_diff(d, changed.unionByName(added))


@query(
    "q_pack_nosplit",
    f"""
    -- the sequential next-fit bin walk, replayed via RECURSIVE CTE
    WITH RECURSIVE {_nosplit_walk_ctes()}
    SELECT doc_id, n_tokens, shard, pack_rank, seq_idx, offset_in_seq,
           n_tokens > {_PACK_BUDGET} AS oversize
    FROM walk
    """,
    doc="NO-SPLIT training-sequence packing (the SFT variant: a doc "
    "never straddles a bin, so no attention mask spans a document "
    "boundary): greedy next-fit in the same deterministic per-shard "
    "hash order as q_sequence_pack; oversize docs get a bin of their "
    "own, flagged. The bin walk is inherently sequential per shard — "
    "THE applyInPandas case: bin state lives inside one Arrow pass "
    "per shard, shards run in parallel, shard row counts are bounded "
    "by the sharding design. The oracle replays the walk with a "
    "RECURSIVE CTE (depth = max docs per shard), so the gate proves "
    "the stateful Arrow pass bit-identical to the relational replay.",
)
def q_pack_nosplit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.packing import pack_sequences_nosplit

    return pack_sequences_nosplit(
        _docs(spark, sf_dir), budget=_PACK_BUDGET, n_shards=_PACK_SHARDS,
        max_shard_rows=None,
    )


@query(
    "q_sft_loss_mask",
    f"""
    -- the shared nosplit walk, extended with per-doc prompt lengths
    WITH RECURSIVE {_nosplit_walk_ctes(
        "array_length(string_split(text, ' ')) // 2 AS prompt,"
    )}, m AS (
      SELECT w.shard, w.seq_idx, w.offset_in_seq, w.n_tokens,
             least(greatest(d.prompt, 0), w.n_tokens) AS masked
      FROM walk w JOIN d ON d.doc_id = w.doc_id
    ), tok AS (
      SELECT shard, seq_idx,
             offset_in_seq + unnest(generate_series(1, n_tokens)) - 1
               AS pos,
             CASE WHEN unnest(generate_series(1, n_tokens)) <= masked
                  THEN '0' ELSE '1' END AS bit
      FROM m
    ), agg AS (
      SELECT shard, seq_idx,
             CAST(count(*) AS INTEGER) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
             CAST(sum(masked) AS BIGINT) AS masked_tokens
      FROM m GROUP BY shard, seq_idx
    ), msk AS (
      SELECT shard, seq_idx,
             string_agg(bit, ' ' ORDER BY pos) AS loss_mask
      FROM tok GROUP BY shard, seq_idx
    )
    SELECT a.shard, a.seq_idx, a.n_docs, a.n_tokens, a.masked_tokens,
           k.loss_mask
    FROM agg a JOIN msk k ON k.shard = a.shard AND k.seq_idx = a.seq_idx
    """,
    doc="COMPLETION-ONLY loss masks for SFT bins — instruction tuning "
    "masks the loss on prompt tokens and trains only on completions, "
    "so the loader needs a token-aligned 0/1 mask next to each "
    "no-split bin (prompt length here: half the doc's words, the "
    "fixture's instruction/response split; the EOS rides the "
    "completion side). Spark builds the mask with NO token explode "
    "(budget-bounded in-row array_repeat per doc — the "
    "pack_segment_ids bound); the oracle replays the recursive "
    "next-fit walk and assembles the identical string from "
    "token-level generate_series rows.",
)
def q_sft_loss_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.packing import sft_loss_masks

    d = _docs(spark, sf_dir).withColumn(
        "prompt_tokens", F.expr("size(split(text, ' ')) div 2")
    )
    return sft_loss_masks(
        d, budget=_PACK_BUDGET, n_shards=_PACK_SHARDS,
        max_shard_rows=None,
    )


@query(
    "q_fim_transform",
    f"""
    WITH b AS (
      SELECT doc_id, text, string_split(text, ' ') AS w,
             array_length(string_split(text, ' ')) AS n,
             {sql_h60("'fim:' || CAST(doc_id AS VARCHAR)")}
               % 1000000 AS pick,
             {sql_h60("'fim1:' || CAST(doc_id AS VARCHAR)")} AS h1,
             {sql_h60("'fim2:' || CAST(doc_id AS VARCHAR)")} AS h2
      FROM documents
    ), c AS (
      SELECT doc_id, text, w, n, pick,
             least(h1 % (n + 1), h2 % (n + 1)) AS lo,
             greatest(h1 % (n + 1), h2 % (n + 1)) AS hi
      FROM b
    )
    SELECT doc_id, pick < 500000 AS fim, CAST(n AS INTEGER) AS n_tokens,
           CASE WHEN pick < 500000 THEN array_to_string(
             ['<PRE>'] || w[1:lo] || ['<SUF>'] || w[hi+1:n]
               || ['<MID>'] || w[lo+1:hi], ' ')
           ELSE text END AS text_out
    FROM c
    """,
    doc="deterministic fill-in-the-middle transform (arXiv:2207.14255, "
    "PSM order): half the corpus rearranges as '<PRE> prefix <SUF> "
    "suffix <MID> middle' so the model learns infilling; apply draw "
    "and both cut points are portable-hash integers (same doc, same "
    "cuts, forever, partitioning-independent), spans are token-"
    "aligned whitespace slices (empty spans allowed, per the paper). "
    "Map-side only — no shuffle, no UDF, slice/concat in whole-stage "
    "codegen; the oracle replays every transformed document "
    "bit-identically via list slicing.",
)
def q_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.objectives import fim_transform

    return fim_transform(_docs(spark, sf_dir), rate=0.5)


_RESUME_STEP = 37


@query(
    "q_loader_steps",
    f"""
    WITH d AS (
      SELECT array_length(string_split(text, ' ')) + 1 AS n_tokens,
             {sql_h60("'shard:' || CAST(doc_id AS VARCHAR)")} % {_PACK_SHARDS}
               AS shard
      FROM documents
    ), c AS (
      SELECT shard,
             CAST((sum(n_tokens) + {_PACK_BUDGET - 1}) // {_PACK_BUDGET}
                  AS BIGINT) AS n
      FROM d GROUP BY shard
    ), s AS (
      SELECT shard, unnest(generate_series(0, n - 1)) AS seq_idx
      FROM c WHERE n > 0
    ), r AS (
      SELECT shard, seq_idx,
             row_number() OVER (ORDER BY seq_idx, shard) - 1 AS step
      FROM s
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(seq_idx AS BIGINT) AS seq_idx,
           CAST(step AS BIGINT) AS step
    FROM r WHERE step >= {_RESUME_STEP}
    """,
    doc="GLOBAL STEP MANIFEST + mid-run resume: the deterministic "
    "step -> (shard, seq) mapping a multi-worker loader consumes "
    "round-robin across shards, cut at resume step "
    f"{_RESUME_STEP}. Spark computes the rank CLOSED-FORM from the "
    "|shards|-sized sequence-count relation (step = sum_t min(n_t, "
    "seq) + straddle count, baked as an aggregate over the literal "
    "counts array) with the resume cut applied by DRIVER-SIDE binary "
    "search per shard BEFORE the explode — zero shuffle at any "
    "corpus size, skipped prefixes never enumerated; the oracle "
    "replays a naive row_number global sort + post-filter, so the "
    "gate proves closed-form == global sort bit-identically.",
)
def q_loader_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.packing import loader_steps, pack_sequences

    packed = pack_sequences(
        _docs(spark, sf_dir), budget=_PACK_BUDGET, n_shards=_PACK_SHARDS,
        max_shard_rows=None,
    )
    return loader_steps(
        packed, budget=_PACK_BUDGET, start_step=_RESUME_STEP
    )


@query(
    "q_pack_nosplit_ffd",
    f"""
    WITH RECURSIVE d AS (
      SELECT doc_id,
             array_length(string_split(text, ' ')) + 1 AS n_tokens,
             {sql_h60("'shard:' || CAST(doc_id AS VARCHAR)")} % {_PACK_SHARDS}
               AS shard,
             {sql_h60("'pack:' || CAST(doc_id AS VARCHAR)")} AS ok
      FROM documents
    ), o AS (
      SELECT doc_id, n_tokens, shard,
             row_number() OVER (PARTITION BY shard
                                ORDER BY n_tokens DESC, ok, doc_id)
               AS pack_rank
      FROM d
    ), walk AS (
      SELECT shard, pack_rank, doc_id, n_tokens,
             CAST(0 AS BIGINT) AS seq_idx,
             CAST(0 AS BIGINT) AS offset_in_seq,
             n_tokens AS fill
      FROM o WHERE pack_rank = 1
      UNION ALL
      SELECT o.shard, o.pack_rank, o.doc_id, o.n_tokens,
             CASE WHEN w.fill > 0 AND w.fill + o.n_tokens > {_PACK_BUDGET}
                  THEN w.seq_idx + 1 ELSE w.seq_idx END,
             CASE WHEN w.fill > 0 AND w.fill + o.n_tokens > {_PACK_BUDGET}
                  THEN 0 ELSE w.fill END,
             CASE WHEN w.fill > 0 AND w.fill + o.n_tokens > {_PACK_BUDGET}
                  THEN o.n_tokens ELSE w.fill + o.n_tokens END
      FROM o JOIN walk w
        ON o.shard = w.shard AND o.pack_rank = w.pack_rank + 1
    )
    SELECT doc_id, n_tokens, shard, pack_rank, seq_idx, offset_in_seq,
           n_tokens > {_PACK_BUDGET} AS oversize
    FROM walk
    """,
    doc="no-split packing, next-fit-DECREASING order (the classic "
    "bin-packing improvement SFT pipelines use to cut padding): the "
    "same sequential per-shard walk as q_pack_nosplit but longest "
    "doc first (n_tokens DESC, hash, id — fully deterministic). Same "
    "applyInPandas execution, same RECURSIVE-CTE oracle with the "
    "decreasing ORDER BY, so the gate pins the second walk order "
    "bit-identically too.",
)
def q_pack_nosplit_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.packing import pack_sequences_nosplit

    return pack_sequences_nosplit(
        _docs(spark, sf_dir), budget=_PACK_BUDGET, n_shards=_PACK_SHARDS,
        order="length", max_shard_rows=None,
    )


@query(
    "q_epoch_pack",
    f"""
    WITH k AS (
      SELECT doc_id, text,
             {sql_h60("'epoch:1:' || CAST(doc_id AS VARCHAR)")} AS key
      FROM documents
    ), p AS (
      SELECT doc_id, text,
             CAST(row_number() OVER (ORDER BY key, doc_id) AS BIGINT)
               AS pos
      FROM k
    ), d AS (
      SELECT doc_id, pos,
             array_length(string_split(text, ' ')) + 1 AS n_tokens,
             {sql_h60("'shard:' || CAST(doc_id AS VARCHAR)")}
               % {_PACK_SHARDS} AS shard
      FROM p
    ), w AS (
      SELECT doc_id, pos, n_tokens, shard,
             row_number() OVER (PARTITION BY shard ORDER BY pos, doc_id)
               AS pack_rank,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY pos, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS off
      FROM d
    )
    SELECT doc_id, pos, n_tokens, shard, pack_rank,
           CAST(off // {_PACK_BUDGET} AS BIGINT) AS seq_idx,
           CAST(off % {_PACK_BUDGET} AS BIGINT) AS offset_in_seq
    FROM w
    """,
    doc="shuffle-then-pack for one training epoch (epoch=1) — the "
    "pretraining dataloader composition (VERDICT r11 #5): the "
    "deterministic per-epoch global permutation (epoch_shuffle's "
    "two-phase distributed rank) becomes the within-shard "
    "concatenation order for the fixed-budget chunking "
    "(pack_sequences). Shards stay hash-assigned (a doc's shard "
    "never moves across epochs; only its place in the shard's "
    "stream re-mixes). All-integer end to end, so the oracle "
    "replays the epoch rank AND every (shard, seq, offset) "
    "bit-identically. Scale: one narrow extra shuffle (the rank's "
    "bucket exchange); pos threads through the pack projection, "
    "never re-joined against the corpus.",
)
def q_epoch_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.packing import epoch_pack

    return epoch_pack(
        _docs(spark, sf_dir), epoch=1, budget=_PACK_BUDGET,
        n_shards=_PACK_SHARDS, max_shard_rows=None,
    )


@query(
    "q_pack_emit",
    f"""
    WITH d AS (
      SELECT doc_id,
             list_append(string_split(text, ' '), '</s>') AS toks,
             {sql_h60("'shard:' || CAST(doc_id AS VARCHAR)")}
               % {_PACK_SHARDS} AS shard,
             {sql_h60("'pack:' || CAST(doc_id AS VARCHAR)")} AS ok
      FROM documents
    ), w AS (
      SELECT doc_id, toks, shard,
             coalesce(sum(len(toks)) OVER (
               PARTITION BY shard ORDER BY ok, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS off
      FROM d
    ), tok AS (
      SELECT doc_id, shard,
             off + generate_subscripts(toks, 1) - 1 AS gpos,
             unnest(toks) AS tok
      FROM w
    )
    SELECT shard, CAST(gpos // {_PACK_BUDGET} AS BIGINT) AS seq_idx,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           array_to_string(list(tok ORDER BY gpos), ' ') AS tokens
    FROM tok GROUP BY 1, 2
    """,
    doc="MATERIALIZED training sequences — the pipeline's final step: "
    "where q_sequence_pack assigns each doc a (shard, seq, offset), "
    "this emits the actual fixed-length token rows the dataloader "
    "reads (whitespace tokens + one EOS per doc, concat-and-chunk: a "
    "doc's tokens spill across the budget boundary; every sequence "
    "except a shard's last holds exactly budget tokens). Fully "
    "relational: the pack window's exclusive token offset, posexplode "
    "to per-token rows, position div budget, group-collect sorted "
    "in-row. The oracle replays it with generate_subscripts/unnest + "
    "ordered list() — token placement hash-matches "
    "element-for-element; the gate row emits tokens SPACE-JOINED "
    "(array_join both engines): the driver canonicalizer sorts with "
    "pandas over all columns and raw lists are unhashable (VERDICT "
    "r12 #1, the q_array_fns convention). "
    "Scale: the explode-to-token shuffle is the honest cost of "
    "re-chunking; rows are narrow and every reduce group is <= budget "
    "tokens, so no collect outgrows a row.",
)
def q_pack_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.packing import emit_sequences

    return emit_sequences(
        _docs(spark, sf_dir), budget=_PACK_BUDGET, n_shards=_PACK_SHARDS,
        max_shard_rows=None,
    ).withColumn("tokens", F.array_join("tokens", " "))


@query(
    "q_epoch_emit",
    f"""
    WITH k AS (
      SELECT doc_id, text,
             {sql_h60("'epoch:1:' || CAST(doc_id AS VARCHAR)")} AS key
      FROM documents
    ), p AS (
      SELECT doc_id, text,
             CAST(row_number() OVER (ORDER BY key, doc_id) AS BIGINT)
               AS pos
      FROM k
    ), d AS (
      SELECT doc_id, pos,
             list_append(string_split(text, ' '), '</s>') AS toks,
             {sql_h60("'shard:' || CAST(doc_id AS VARCHAR)")}
               % {_PACK_SHARDS} AS shard
      FROM p
    ), w AS (
      SELECT doc_id, toks, shard,
             coalesce(sum(len(toks)) OVER (
               PARTITION BY shard ORDER BY pos, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS off
      FROM d
    ), tok AS (
      SELECT doc_id, shard,
             off + generate_subscripts(toks, 1) - 1 AS gpos,
             unnest(toks) AS tok
      FROM w
    )
    SELECT shard, CAST(gpos // {_PACK_BUDGET} AS BIGINT) AS seq_idx,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           array_to_string(list(tok ORDER BY gpos), ' ') AS tokens
    FROM tok GROUP BY 1, 2
    """,
    doc="the full dataloader composition, end to end: per-epoch "
    "deterministic global shuffle (epoch 1's two-phase distributed "
    "rank) feeding MATERIALIZED fixed-length token sequences — what "
    "the trainer reads for epoch N. Same hash shards every epoch, "
    "re-mixed stream order, exactly-budget token rows. The oracle "
    "replays the epoch rank AND every token placement "
    "bit-identically; tokens emit space-joined (driver-canonicalizer "
    "convention, VERDICT r12 #1). Scale: epoch_pack's carry-through "
    "rank (no corpus re-join) + emit's narrow explode shuffle with "
    "budget-bounded reduce groups.",
)
def q_epoch_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.packing import epoch_emit

    return epoch_emit(
        _docs(spark, sf_dir), epoch=1, budget=_PACK_BUDGET,
        n_shards=_PACK_SHARDS, max_shard_rows=None,
    ).withColumn("tokens", F.array_join("tokens", " "))


@query(
    "q_pack_emit_nosplit",
    f"""
    WITH RECURSIVE d AS (
      SELECT doc_id,
             array_length(string_split(text, ' ')) + 1 AS n_tokens,
             {sql_h60("'shard:' || CAST(doc_id AS VARCHAR)")} % {_PACK_SHARDS}
               AS shard,
             {sql_h60("'pack:' || CAST(doc_id AS VARCHAR)")} AS ok
      FROM documents
    ), o AS (
      SELECT doc_id, n_tokens, shard,
             row_number() OVER (PARTITION BY shard ORDER BY ok, doc_id)
               AS pack_rank
      FROM d
    ), walk AS (
      SELECT shard, pack_rank, doc_id, n_tokens,
             CAST(0 AS BIGINT) AS seq_idx,
             CAST(0 AS BIGINT) AS offset_in_seq,
             n_tokens AS fill
      FROM o WHERE pack_rank = 1
      UNION ALL
      SELECT o.shard, o.pack_rank, o.doc_id, o.n_tokens,
             CASE WHEN w.fill > 0 AND w.fill + o.n_tokens > {_PACK_BUDGET}
                  THEN w.seq_idx + 1 ELSE w.seq_idx END,
             CASE WHEN w.fill > 0 AND w.fill + o.n_tokens > {_PACK_BUDGET}
                  THEN 0 ELSE w.fill END,
             CASE WHEN w.fill > 0 AND w.fill + o.n_tokens > {_PACK_BUDGET}
                  THEN o.n_tokens ELSE w.fill + o.n_tokens END
      FROM o JOIN walk w
        ON o.shard = w.shard AND o.pack_rank = w.pack_rank + 1
    ), placed AS (
      SELECT w.shard, w.seq_idx,
             w.n_tokens > {_PACK_BUDGET} AS oversize,
             w.doc_id,
             w.offset_in_seq
               + generate_subscripts(
                   list_append(string_split(t.text, ' '), '</s>'), 1)
               - 1 AS pos,
             unnest(list_append(string_split(t.text, ' '), '</s>'))
               AS tok
      FROM walk w JOIN documents t ON t.doc_id = w.doc_id
    )
    SELECT shard, seq_idx,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           max(oversize) AS oversize,
           array_to_string(list(tok ORDER BY pos), ' ') AS tokens
    FROM placed GROUP BY 1, 2
    """,
    doc="materialized NO-SPLIT (SFT) training sequences: every bin "
    "from the sequential next-fit walk becomes one row carrying the "
    "concatenated WHOLE documents — no token crosses a doc boundary "
    "mid-bin, so the row is directly usable with per-doc attention "
    "masks; an oversize doc's solo bin is flagged. The oracle replays "
    "the recursive-CTE walk, then places every token at "
    "offset_in_seq + ordinal and collects bins ordered — token "
    "placement hash-matches element-for-element; tokens emit "
    "space-joined (driver-canonicalizer convention, VERDICT r12 #1). "
    "Scale: the walk is the gated applyInPandas pass (shards bound "
    "memory), text returns via ONE corpus equi-join, and every "
    "reduce group is bin-sized.",
)
def q_pack_emit_nosplit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.packing import emit_sequences_nosplit

    return emit_sequences_nosplit(
        _docs(spark, sf_dir), budget=_PACK_BUDGET, n_shards=_PACK_SHARDS,
        max_shard_rows=None,
    ).withColumn("tokens", F.array_join("tokens", " "))


@query(
    "q_pack_fill_report",
    f"""
    WITH RECURSIVE d AS (
      SELECT doc_id,
             array_length(string_split(text, ' ')) + 1 AS n_tokens,
             {sql_h60("'shard:' || CAST(doc_id AS VARCHAR)")} % {_PACK_SHARDS}
               AS shard,
             {sql_h60("'pack:' || CAST(doc_id AS VARCHAR)")} AS ok
      FROM documents
    ), o AS (
      SELECT doc_id, n_tokens, shard,
             row_number() OVER (PARTITION BY shard ORDER BY ok, doc_id)
               AS pack_rank
      FROM d
    ), walk AS (
      SELECT shard, pack_rank, doc_id, n_tokens,
             CAST(0 AS BIGINT) AS seq_idx,
             n_tokens AS fill
      FROM o WHERE pack_rank = 1
      UNION ALL
      SELECT o.shard, o.pack_rank, o.doc_id, o.n_tokens,
             CASE WHEN w.fill > 0 AND w.fill + o.n_tokens > {_PACK_BUDGET}
                  THEN w.seq_idx + 1 ELSE w.seq_idx END,
             CASE WHEN w.fill > 0 AND w.fill + o.n_tokens > {_PACK_BUDGET}
                  THEN o.n_tokens ELSE w.fill + o.n_tokens END
      FROM o JOIN walk w
        ON o.shard = w.shard AND o.pack_rank = w.pack_rank + 1
    ), bins AS (
      SELECT shard, seq_idx, count(*) AS docs, sum(n_tokens) AS binfill,
             bool_or(n_tokens > {_PACK_BUDGET}) AS over
      FROM walk GROUP BY 1, 2
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_bins,
           CAST(sum(docs) AS BIGINT) AS n_docs,
           CAST(sum(binfill) AS BIGINT) AS tokens,
           CAST(sum(CASE WHEN over THEN 1 ELSE 0 END) AS BIGINT)
             AS oversize_bins,
           CAST(sum(CASE WHEN over THEN 0
                         ELSE {_PACK_BUDGET} - binfill END) AS BIGINT)
             AS padding_tokens,
           CAST((sum(binfill) * 1000000)
                // sum(CASE WHEN over THEN binfill
                            ELSE {_PACK_BUDGET} END) AS BIGINT)
             AS fill_ppm
    FROM bins GROUP BY 1
    """,
    doc="per-shard PADDING report for no-split packing — the metric "
    "the SFT packer exists to optimize (next-fit-decreasing is "
    "chosen over hash order exactly when this says so): bins, docs, "
    "token mass, oversize bins, padding tokens (budget - fill over "
    "non-oversize bins) and the fill rate in exact integer ppm. The "
    "oracle replays the recursive-CTE walk and the two-level "
    "aggregation; every sum is CAST back from DuckDB's HUGEINT. "
    "Scale: two map-side-combined groupBys over the assignment "
    "relation; the ppm stays integer because the double form loses "
    "exactness once tokens x 1e6 passes 2^53.",
)
def q_pack_fill_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.packing import (
        pack_sequences_nosplit,
        pack_stats_nosplit,
    )

    return pack_stats_nosplit(
        pack_sequences_nosplit(
            _docs(spark, sf_dir), budget=_PACK_BUDGET,
            n_shards=_PACK_SHARDS, max_shard_rows=None,
        ),
        budget=_PACK_BUDGET,
    )


@query(
    "q_pack_frag_report",
    f"""
    WITH d AS (
      SELECT doc_id,
             array_length(string_split(text, ' ')) + 1 AS n_tokens,
             {sql_h60("'shard:' || CAST(doc_id AS VARCHAR)")} % {_PACK_SHARDS}
               AS shard,
             {sql_h60("'pack:' || CAST(doc_id AS VARCHAR)")} AS ok
      FROM documents
    ), w AS (
      SELECT doc_id, n_tokens, shard,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY ok, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM d
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST((sum(n_tokens) + {_PACK_BUDGET} - 1) // {_PACK_BUDGET}
                AS BIGINT) AS n_seqs,
           CAST(sum(n_tokens) AS BIGINT) AS tokens,
           CAST(sum(CASE WHEN off % {_PACK_BUDGET} + n_tokens
                              > {_PACK_BUDGET}
                         THEN 1 ELSE 0 END) AS BIGINT) AS straddlers,
           CAST(sum(n_tokens)
                - {_PACK_BUDGET}
                  * ((sum(n_tokens) + {_PACK_BUDGET} - 1)
                     // {_PACK_BUDGET} - 1)
                AS BIGINT) AS tail_tokens,
           CAST((sum(CASE WHEN off % {_PACK_BUDGET} + n_tokens
                               > {_PACK_BUDGET}
                          THEN 1 ELSE 0 END) * 1000000)
                // count(*) AS BIGINT) AS frag_ppm
    FROM w GROUP BY 1
    """,
    doc="per-shard FRAGMENTATION report for split (concat-and-chunk) "
    "packing — the twin of q_pack_fill_report across the packing "
    "trade-off (no-split pads, split fragments): docs whose tokens "
    "straddle a budget boundary have their attention span cut, and "
    "this rate (exact integer ppm) is what a pipeline tunes budget "
    "and sharding against. n_seqs is the EMITTED count "
    "ceil(tokens/budget) — not the max starting seq, which "
    "undercounts a spilling last doc — and the tail fill follows: "
    "every sequence except the last is exactly full, so tail = "
    "tokens - budget x (n_seqs - 1). The oracle replays the offset "
    "window and both aggregations bit-identically. Scale: one "
    "map-side-combined groupBy over the assignment relation.",
)
def q_pack_frag_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.packing import (
        pack_frag_report,
        pack_sequences,
    )

    return pack_frag_report(
        pack_sequences(
            _docs(spark, sf_dir), budget=_PACK_BUDGET,
            n_shards=_PACK_SHARDS, max_shard_rows=None,
        ),
        budget=_PACK_BUDGET,
    )


def _bpe_pack_oracle() -> str:
    from huckli_spark.operators.bpe import sql_bpe_apply

    tok_sql = sql_bpe_apply(
        "SELECT DISTINCT w AS word FROM ("
        "SELECT unnest(string_split(text, ' ')) AS w FROM documents"
        ") WHERE length(w) > 0",
        BPE_FIXTURE_MERGES,
    )
    return f"""
    WITH tok AS (
      SELECT word, CAST(count(*) AS BIGINT) AS n_tok
      FROM ({tok_sql}) GROUP BY word
    ), dw AS (
      SELECT doc_id, w AS word FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents
      ) WHERE length(w) > 0
    ), dtok AS (
      SELECT doc_id, CAST(sum(tok.n_tok) + 1 AS BIGINT) AS n_tokens
      FROM dw JOIN tok USING (word) GROUP BY doc_id
    ), d AS (
      SELECT doc_id, n_tokens,
             {sql_h60("'shard:' || CAST(doc_id AS VARCHAR)")} % {_PACK_SHARDS}
               AS shard,
             {sql_h60("'pack:' || CAST(doc_id AS VARCHAR)")} AS ok
      FROM dtok
    ), w AS (
      SELECT doc_id, n_tokens, shard,
             row_number() OVER (PARTITION BY shard ORDER BY ok, doc_id)
               AS pack_rank,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY ok, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM d
    )
    SELECT doc_id, n_tokens, shard, pack_rank,
           CAST(off // {_PACK_BUDGET} AS BIGINT) AS seq_idx,
           CAST(off % {_PACK_BUDGET} AS BIGINT) AS offset_in_seq
    FROM w
    """


@query(
    "q_bpe_pack",
    _bpe_pack_oracle(),
    doc="MODEL-TOKEN-budget packing: a training context window is "
    "denominated in tokenizer tokens, not whitespace words, so the "
    "packer must budget what the model will actually see. The corpus "
    "collapses to its distinct vocabulary once, the frozen 8-merge "
    "BPE table tokenizes each word (Arrow-batched, map-only), "
    "per-doc counts come back via one occurrence join + sum, and "
    "pack_sequences consumes the PRECOMPUTED count column "
    "(n_tokens_col) — same hash shards, same window offsets, same "
    "integer arithmetic, new denomination. The oracle replays the "
    "merges relationally (gaps-and-islands — the cross-formulation "
    "differential), the occurrence sums, and every (shard, seq, "
    "offset). Scale: tokenize-once-per-distinct-word, one "
    "vocab-sized join, then the standard one-shuffle pack.",
)
def q_bpe_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.bpe import bpe_apply
    from huckli_spark.operators.packing import pack_sequences

    docs = _docs(spark, sf_dir)
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.length("word") > 0)
        .distinct()
        .select(F.col("word").alias("text"))
    )
    wc = bpe_apply(words, BPE_FIXTURE_MERGES).select(
        F.col("__w").alias("__word"), F.size("syms").alias("__wtok")
    )
    docw = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("__word")
        )
        .where(F.length("__word") > 0)
    )
    dtok = (
        docw.join(wc, "__word")
        .groupBy("doc_id")
        .agg(F.sum("__wtok").alias("bpe_tokens"))
    )
    return pack_sequences(
        dtok, budget=_PACK_BUDGET, n_shards=_PACK_SHARDS,
        n_tokens_col="bpe_tokens", max_shard_rows=None,
    )


_BATCH_SIZE = 32


@query(
    "q_length_batching",
    f"""
    WITH d AS (
      SELECT doc_id,
             array_length(string_split(text, ' ')) + 1 AS n_tokens,
             {sql_h60("'batch:' || CAST(doc_id AS VARCHAR)")} AS bk
      FROM documents
    ), r AS (
      SELECT doc_id, n_tokens,
             CAST(row_number() OVER (ORDER BY n_tokens, bk, doc_id)
                  AS BIGINT) AS rnk
      FROM d
    )
    SELECT doc_id, n_tokens, rnk,
           CAST((rnk - 1) // {_BATCH_SIZE} AS BIGINT) AS batch_id
    FROM r
    """,
    doc="LENGTH-BUCKETED batch formation — the padding minimizer on "
    "the BATCH axis (packing handles the sequence axis): a "
    "dynamic-batching dataloader pads every sequence in a batch to "
    "the batch max, so batches hold near-equal-length docs via a "
    "deterministic global rank ordered by (n_tokens, hash, id); the "
    "hash tiebreak keeps same-length docs mixed. The Spark side "
    "computes the rank TWO-PHASE (range-aligned (length, hash-sub) "
    "buckets + tiny prefix relation — no global sort, the "
    "epoch_shuffle discipline); the oracle replays it with a plain "
    "row_number, so the gate proves the distributed rank equals the "
    "naive one bit-identically.",
)
def q_length_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.packing import length_batches

    return length_batches(_docs(spark, sf_dir), batch_size=_BATCH_SIZE)


@query(
    "q_batch_pad_report",
    f"""
    WITH d AS (
      SELECT doc_id,
             array_length(string_split(text, ' ')) + 1 AS n_tokens,
             {sql_h60("'batch:' || CAST(doc_id AS VARCHAR)")} AS bk
      FROM documents
    ), r AS (
      SELECT n_tokens,
             row_number() OVER (ORDER BY n_tokens, bk, doc_id) AS rnk
      FROM d
    ), b AS (
      SELECT n_tokens, (rnk - 1) // {_BATCH_SIZE} AS batch_id FROM r
    )
    SELECT CAST(batch_id AS BIGINT) AS batch_id,
           CAST(count(*) AS BIGINT) AS n_seqs,
           CAST(sum(n_tokens) AS BIGINT) AS tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_len,
           CAST(max(n_tokens) * count(*) - sum(n_tokens) AS BIGINT)
             AS pad_tokens,
           CAST(((max(n_tokens) * count(*) - sum(n_tokens)) * 1000000)
                // (max(n_tokens) * count(*)) AS BIGINT) AS pad_ppm
    FROM b GROUP BY 1
    """,
    doc="per-batch PADDING report for length-bucketed batching — the "
    "metric the bucketing exists to optimize: pad = max_len x n_seqs "
    "- tokens per batch (every sequence pads to the batch max), rate "
    "in exact integer ppm. With length-sorted batches this stays "
    "near zero except where a batch spans a length step; the same "
    "report over a hash-ordered batching would show the unsorted "
    "baseline. The oracle replays rank, grouping and both exact "
    "integer aggregates. Scale: one map-side-combined groupBy over "
    "the assignment relation.",
)
def q_batch_pad_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.packing import (
        batch_pad_report,
        length_batches,
    )

    return batch_pad_report(
        length_batches(_docs(spark, sf_dir), batch_size=_BATCH_SIZE)
    )


_MIX_WEIGHTS = {
    "src1": 0.4,   # downsample
    "src3": 1.5,   # 1x + half the docs twice
    "src5": 2.5,   # 2x + half the docs a third time
    "src7": 0.0,   # dropped source
    "src9": 3.0,   # exact integer repetition
}


@query(
    "q_epoch_mix_shuffle",
    f"""
    WITH wmap(source, wm) AS (
      VALUES ('src1', 400000), ('src3', 1500000), ('src5', 2500000),
             ('src7', 0), ('src9', 3000000)
    ), c AS (
      SELECT d.doc_id, d.source, COALESCE(w.wm, 1000000) AS wm,
             {sql_h60("'mix:1:' || CAST(d.doc_id AS VARCHAR)")}
               % 1000000 AS pick
      FROM documents d LEFT JOIN wmap w ON w.source = d.source
    ), rep AS (
      SELECT doc_id, source,
             wm // 1000000
               + CASE WHEN pick < wm % 1000000 THEN 1 ELSE 0 END
               AS copies
      FROM c
    ), r AS (
      SELECT doc_id, source,
             CAST(unnest(generate_series(1, copies)) AS BIGINT) AS copy
      FROM rep WHERE copies >= 1
    ), k AS (
      SELECT doc_id, source, copy,
             CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR) || ':'
               || CAST(doc_id AS VARCHAR) || '#'
               || CAST(copy AS VARCHAR) AS mix_id
      FROM r
    )
    SELECT CAST(1 AS INTEGER) AS epoch, doc_id, source, copy,
           CAST(row_number() OVER (
             ORDER BY {sql_h60("'epoch:1:' || mix_id")}, mix_id
           ) AS BIGINT) AS pos
    FROM k
    """,
    doc="SOURCE-WEIGHTED per-epoch training order — the 'epochs per "
    "source' data-mixing knob of published pretraining recipes, "
    "composed with the deterministic epoch shuffle: each doc yields "
    "floor(w) copies plus one more when its per-(epoch, id) hash "
    "draw falls under frac(w) (weight 2.5 repeats half of src5 3x; "
    "0.4 downsamples src1; 0 drops src7; 3.0 repeats src9 exactly), "
    "then every copy gets a unique global position keyed on the "
    "INJECTIVE length-prefixed (id, copy) encoding — unambiguous "
    "even for string ids containing the delimiter (ADVICE r12 #3; "
    "the oracle replays the same prefix). All-integer micro-weight "
    "arithmetic, so the oracle "
    "replays every copy count AND every position bit-identically. "
    "Scale: the weight table bakes as a CASE literal, replication is "
    "a map-side explode, and the rank is epoch_shuffle's two-phase "
    "bucket form — no global sort, buckets auto-sized.",
)
def q_epoch_mix_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.packing import epoch_mix_shuffle

    return epoch_mix_shuffle(_docs(spark, sf_dir), _MIX_WEIGHTS, epoch=1)


_TEMP_ALPHA = 0.3

from huckli_spark.operators.mixture import sql_temperature_wmap as _sql_tw  # noqa: E402


@query(
    "q_temp_weights",
    f"""
    WITH per AS (
      SELECT source, count(*) AS n_docs,
             sum(array_length(string_split(text, ' '))) AS n_tokens
      FROM documents GROUP BY source
    ), t AS (
      SELECT sum(n_tokens) AS tot, max(n_tokens) AS mx FROM per
    )
    SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_tokens * 1000000 // tot AS BIGINT) AS share_ppm,
           CAST(floor(power(mx * 1.0 / n_tokens, {1.0 - _TEMP_ALPHA!r})
                      * 1000000 + 0.5) AS BIGINT) AS boost_micro
    FROM per CROSS JOIN t
    """,
    doc="mT5-style TEMPERATURE sampling weights (arXiv:1910.10683 "
    "§3.4.2): upsample source s by (n_max / n_s) ** (1 - alpha) so "
    "sampling probability tracks token-share ** alpha — the "
    "low-resource boost every multilingual/multi-domain pretraining "
    "recipe applies. Fixed-point outputs: exact integer share_ppm "
    "(decimal-widened against the 2^63/1e6 bigint ceiling) and "
    "boost_micro rounded at 1e-6 immediately after the one double "
    "power (the ln/exp micro discipline; the exponent embeds via "
    "repr so both engines raise to the identical double). Scale: one "
    "map-side aggregation to a |sources| relation + a broadcast "
    "one-row totals join.",
)
def q_temp_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.mixture import temperature_weights

    return temperature_weights(_docs(spark, sf_dir), alpha=_TEMP_ALPHA)


@query(
    "q_temp_mix",
    f"""
    WITH wmap AS (
      {_sql_tw(_TEMP_ALPHA)}
    ), c AS (
      SELECT d.doc_id, d.source, w.wm,
             {sql_h60("'mix:2:' || CAST(d.doc_id AS VARCHAR)")}
               % 1000000 AS pick
      FROM documents d JOIN wmap w ON w.source = d.source
    ), rep AS (
      SELECT doc_id, source,
             wm // 1000000
               + CASE WHEN pick < wm % 1000000 THEN 1 ELSE 0 END
               AS copies
      FROM c
    ), r AS (
      SELECT doc_id, source,
             CAST(unnest(generate_series(1, copies)) AS BIGINT) AS copy
      FROM rep WHERE copies >= 1
    ), k AS (
      SELECT doc_id, source, copy,
             CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR) || ':'
               || CAST(doc_id AS VARCHAR) || '#'
               || CAST(copy AS VARCHAR) AS mix_id
      FROM r
    )
    SELECT CAST(2 AS INTEGER) AS epoch, doc_id, source, copy,
           CAST(row_number() OVER (
             ORDER BY {sql_h60("'epoch:2:' || mix_id")}, mix_id
           ) AS BIGINT) AS pos
    FROM k
    """,
    doc="TEMPERATURE-SAMPLED epoch mix — q_temp_weights composed into "
    "the weighted epoch shuffle: the |sources| weight relation is "
    "collected driver-side (a dimension, never corpus-sized), lifts "
    "back to micro-ints bit-exactly (m/1e6 round-trips int(w*1e6+.5) "
    "below 2^51), and drives copy counts + the injective (id, copy) "
    "global rank. The oracle recomputes the weights in SQL and "
    "replays every copy count and position bit-identically — "
    "certifying the full low-resource-upsampling dataloader path, "
    "recipe knob to training order. Scale: weights bake as a CASE "
    "literal, replication is a map-side explode, rank is the "
    "two-phase bucket form.",
)
def q_temp_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.mixture import temperature_weight_map
    from huckli_spark.operators.packing import epoch_mix_shuffle

    d = _docs(spark, sf_dir)
    w = temperature_weight_map(d, alpha=_TEMP_ALPHA)
    return epoch_mix_shuffle(d, w, epoch=2)


@query(
    "q_epoch_mix_emit",
    f"""
    WITH wmap(source, wm) AS (
      VALUES ('src1', 400000), ('src3', 1500000), ('src5', 2500000),
             ('src7', 0), ('src9', 3000000)
    ), c AS (
      SELECT d.doc_id, d.text, COALESCE(w.wm, 1000000) AS wm,
             {sql_h60("'mix:1:' || CAST(d.doc_id AS VARCHAR)")}
               % 1000000 AS pick
      FROM documents d LEFT JOIN wmap w ON w.source = d.source
    ), rep AS (
      SELECT doc_id, text,
             wm // 1000000
               + CASE WHEN pick < wm % 1000000 THEN 1 ELSE 0 END
               AS copies
      FROM c
    ), r AS (
      SELECT doc_id, text,
             CAST(unnest(generate_series(1, copies)) AS BIGINT) AS copy
      FROM rep WHERE copies >= 1
    ), k AS (
      SELECT text,
             CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR) || ':'
               || CAST(doc_id AS VARCHAR) || '#'
               || CAST(copy AS VARCHAR) AS mix_id
      FROM r
    ), p AS (
      SELECT mix_id, text,
             CAST(row_number() OVER (
               ORDER BY {sql_h60("'epoch:1:' || mix_id")}, mix_id
             ) AS BIGINT) AS pos
      FROM k
    ), d2 AS (
      SELECT mix_id, pos,
             list_append(string_split(text, ' '), '</s>') AS toks,
             {sql_h60("'shard:' || mix_id")} % {_PACK_SHARDS} AS shard
      FROM p
    ), w2 AS (
      SELECT mix_id, toks, shard,
             coalesce(sum(len(toks)) OVER (
               PARTITION BY shard ORDER BY pos, mix_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS off
      FROM d2
    ), tok AS (
      SELECT mix_id, shard,
             off + generate_subscripts(toks, 1) - 1 AS gpos,
             unnest(toks) AS tok
      FROM w2
    )
    SELECT shard, CAST(gpos // {_PACK_BUDGET} AS BIGINT) AS seq_idx,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT mix_id) AS BIGINT) AS n_docs,
           array_to_string(list(tok ORDER BY gpos), ' ') AS tokens
    FROM tok GROUP BY 1, 2
    """,
    doc="the LAST seam of the pretraining dataloader (VERDICT r12 "
    "#6): source-weighted mixing composed into MATERIALIZED "
    "fixed-length token sequences — what the trainer reads for epoch "
    "1 of a weighted recipe. A weight-2.5 source's selected docs "
    "appear 3x in the token stream, each copy at its own "
    "deterministic position; the emit identity is the injective "
    "length-prefixed (id, copy) key, so copies hash-scatter to their "
    "own shards and n_docs counts mix INSTANCES. The oracle replays "
    "copy counts, positions, shard hashes and every token placement "
    "bit-identically; tokens emit space-joined (driver-canonicalizer "
    "convention, VERDICT r12 #1). Scale: text rides the mix explode "
    "and the rank's bucket exchange (no corpus re-join); the shard "
    "guard sums the copy expression map-side instead of counting the "
    "mixed relation.",
)
def q_epoch_mix_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.packing import epoch_mix_emit

    return epoch_mix_emit(
        _docs(spark, sf_dir), _MIX_WEIGHTS, epoch=1,
        budget=_PACK_BUDGET, n_shards=_PACK_SHARDS,
        max_shard_rows=None,
    ).withColumn("tokens", F.array_join("tokens", " "))


_fill_maxmatch_oracle()
