"""Corpus-quality parity queries: repetition signals, benchmark
decontamination, content-defined chunking.

These are the quality/safety primitives of an LLM training-data
pipeline beyond dedup proper: flag machine-generated repetition
(Gopher rule 3-style), detect eval-set leakage before training, and
segment documents into content-defined chunks so near-dup detection
works at sub-document granularity. Every output is differentially
gated against a DuckDB oracle computing identical arithmetic — the
portable md5-based 60-bit hash keeps even the chunk boundaries
bit-identical across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from huckli_spark.functions.portable import fround, h60, sql_fround, sql_h60
from huckli_spark.queries import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


# 1-based positional word relation, shared by the oracles below
# (generate_subscripts pairs with unnest index-aligned in DuckDB).
_WORDS_CTE = """words AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) AS pos,
             unnest(string_split(text, ' ')) AS w
      FROM documents
    )"""


@query(
    "q_repetition_stats",
    f"""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), sizes AS (
      SELECT doc_id,
             array_length(w) AS n_words,
             array_length(list_distinct(w)) AS n_distinct
      FROM base
    ), wc AS (
      SELECT doc_id, unnest(w) AS g FROM base
    ), topw AS (
      SELECT doc_id, max(c) AS top_w FROM (
        SELECT doc_id, g, count(*) AS c FROM wc GROUP BY 1, 2
      ) GROUP BY doc_id
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, array_length(w)),
                                   i -> w[i] || ' ' || w[i + 1])) AS g
      FROM base
    ), topb AS (
      SELECT doc_id, max(c) AS top_b, CAST(sum(c) AS BIGINT) AS n_bg FROM (
        SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2
      ) GROUP BY doc_id
    )
    SELECT s.doc_id,
           s.n_words,
           {sql_fround('s.n_distinct * 1.0 / s.n_words', 4)} AS distinct_ratio,
           {sql_fround('coalesce(t.top_w * 1.0 / s.n_words, 0.0)', 4)}
             AS top_word_frac,
           {sql_fround(
               'CASE WHEN b.n_bg > 0 THEN b.top_b * 1.0 / b.n_bg ELSE 0.0 END', 4
           )} AS top_bigram_frac
    FROM sizes s
    LEFT JOIN topw t ON t.doc_id = s.doc_id
    LEFT JOIN topb b ON b.doc_id = s.doc_id
    """,
    doc="per-document repetition signals (distinct-word ratio, top word/"
    "bigram frequency fractions — the Gopher-style quality rules); "
    "bigrams built document-locally, partial-agged shuffles.",
)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.textstats import repetition_stats

    return repetition_stats(_docs(spark, sf_dir))


@query(
    "q_decontaminate",
    f"""
    WITH {_WORDS_CTE}, sh AS (
      SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
      FROM words a
      JOIN words b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      JOIN words c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
    ), hd AS (
      SELECT doc_id FROM documents WHERE source IS NOT DISTINCT FROM 'src0'
    ), hold AS (
      SELECT DISTINCT {sql_h60('sh.shingle')} AS h
      FROM sh JOIN hd ON hd.doc_id = sh.doc_id
    ), cand AS (
      -- null-safe complement of the holdout (IS DISTINCT FROM keeps
      -- NULL-source docs as candidates, matching the Spark side)
      SELECT sh.doc_id, {sql_h60('sh.shingle')} AS h
      FROM sh
      JOIN documents d ON d.doc_id = sh.doc_id
      WHERE d.source IS DISTINCT FROM 'src0'
    ), sizes AS (
      SELECT doc_id, count(*) AS n_shingles FROM cand GROUP BY doc_id
    ), shared AS (
      SELECT c.doc_id, count(*) AS n_shared
      FROM cand c JOIN hold ON hold.h = c.h
      GROUP BY c.doc_id
    )
    SELECT s.doc_id, s.n_shingles,
           CAST(coalesce(sh2.n_shared, 0) AS BIGINT) AS n_shared,
           {sql_fround('coalesce(sh2.n_shared, 0) * 1.0 / s.n_shingles', 4)}
             AS containment
    FROM sizes s LEFT JOIN shared sh2 ON sh2.doc_id = s.doc_id
    """,
    doc="benchmark decontamination: per non-holdout document, the count "
    "and ratio of its 3-gram shingles occurring anywhere in the holdout "
    "(source='src0') corpus; holdout hashes broadcast, corpus never "
    "shuffles on text.",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.dedup import contamination

    docs = _docs(spark, sf_dir)
    # null-safe split: a NULL source is a candidate, not holdout
    holdout = docs.where(F.col("source").eqNullSafe("src0"))
    candidates = docs.where(~F.col("source").eqNullSafe("src0"))
    return contamination(candidates, holdout)


@query(
    "q_cdc_chunks",
    f"""
    WITH {_WORDS_CTE}, m AS (
      SELECT doc_id, pos, w,
             CASE WHEN pos = 1 OR {sql_h60('w')} % 8 = 0 THEN 1 ELSE 0 END AS b
      FROM words
    ), c AS (
      SELECT doc_id, pos, w,
             CAST(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS chunk_id
      FROM m
    ), ch AS (
      SELECT doc_id, chunk_id, string_agg(w, ' ' ORDER BY pos) AS chunk_text
      FROM c GROUP BY 1, 2
    ), hh AS (
      SELECT doc_id, chunk_id, {sql_h60('chunk_text')} AS h FROM ch
    ), d AS (
      SELECT doc_id, chunk_id, h, count(*) OVER (PARTITION BY h) AS dup FROM hh
    )
    SELECT doc_id, count(*) AS n_chunks,
           CAST(sum(CASE WHEN dup > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks
    FROM d GROUP BY doc_id
    """,
    doc="content-defined chunking (hash-gated boundaries, ~8-word "
    "expected chunks) + corpus-wide chunk-hash dedup counts per doc — "
    "the sub-document dedup granularity primitive.",
)
def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from huckli_spark.operators.textstats import cdc_chunks

    chunks = cdc_chunks(_docs(spark, sf_dir), boundary_mod=8)
    dup = F.count("*").over(Window.partitionBy("chunk_hash"))
    d = chunks.withColumn("dup", dup)
    return d.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(F.col("dup") > 1, 1).otherwise(0)).alias("n_dup_chunks"),
    )


@query(
    "q_mixture_sample",
    f"""
    WITH q AS (
      SELECT source, doc_id,
             {sql_h60('source')} % 40 + 10 AS quota,
             {sql_h60("'mix:' || source || ':' || CAST(doc_id AS VARCHAR)")} AS h
      FROM documents
    ), r AS (
      SELECT source, doc_id, quota,
             row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
      FROM q
    )
    SELECT doc_id, source, rk
    FROM r WHERE rk <= quota
    """,
    doc="exact-quota mixture sampling: per source, keep exactly "
    "quota(source) documents chosen by deterministic hash rank — the "
    "training-mix primitive where proportions must be EXACT, not "
    "rate-expected (contrast q_stratified_sample). Same rows survive "
    "on any engine or partitioning. Scale: one shuffle on source for "
    "the ranking window; at extreme per-source cardinality swap the "
    "full rank for an approx-quantile hash threshold refined per "
    "stratum.",
)
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from huckli_spark.functions.portable import h60

    d = _docs(spark, sf_dir)
    quota = h60(F.col("source")) % 40 + 10
    h = h60(F.concat(F.lit("mix:"), F.col("source"), F.lit(":"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    ranked = d.select(
        "doc_id", "source", quota.alias("quota"), h.alias("h")
    ).withColumn("rk", F.row_number().over(w).cast("long"))
    return ranked.where(F.col("rk") <= F.col("quota")).select("doc_id", "source", "rk")


@query(
    "q_shard_assign",
    f"""
    WITH s AS (
      SELECT {sql_h60("'shard:' || CAST(doc_id AS VARCHAR)")} % 16 AS shard,
             array_length(string_split(text, ' ')) AS n_tokens
      FROM documents
    )
    SELECT shard, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM s GROUP BY shard
    """,
    doc="deterministic shard assignment for training-data output: "
    "hash-mod sharding (scale-correct — no global ordering, no "
    "single-partition window) with per-shard doc and token balance "
    "stats; the gate verifies both the assignment and the balance "
    "accounting bit-identically across engines.",
)
def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.functions.portable import h60

    d = _docs(spark, sf_dir)
    shard = h60(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))) % 16
    return (
        d.select(
            shard.alias("shard"),
            F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        )
        .groupBy("shard")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("total_tokens"))
    )


@query(
    "q_char_entropy",
    f"""
    WITH chars AS (
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n,
             unnest(list_filter(string_split(text, ''), x -> x <> '')) AS c
      FROM documents
    ), per_char AS (
      SELECT doc_id, n, c, CAST(count(*) AS BIGINT) AS cnt
      FROM chars GROUP BY 1, 2, 3
    ), agg AS (
      SELECT doc_id, n,
             sum(CAST(floor(cnt * ln(cnt / n) * 1000000.0 + 0.5)
                      AS BIGINT)) AS s_micro,
             CAST(count(*) AS BIGINT) AS n_distinct_chars
      FROM per_char GROUP BY 1, 2
    )
    SELECT doc_id, n AS n_chars, n_distinct_chars,
           {sql_fround('-s_micro / 1000000.0 / n', 6)} AS entropy_nats
    FROM agg
    """,
    doc="per-document character Shannon entropy (nats) — the cheap "
    "gibberish/boilerplate detector for corpus admission: near-zero "
    "for padding runs, high for random noise; filter both tails. "
    "Each cnt*ln(cnt/n) term micro-rounds BEFORE the per-doc sum, so "
    "the aggregate is an exact integer sum — partition-order "
    "independent, hash-identical on any engine. Scale: one explode + "
    "map-combined groupBy with alphabet-bounded fan-in.",
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators import textstats

    return textstats.char_entropy(_docs(spark, sf_dir))


@query(
    "q_ngram_novelty",
    f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w) - 1),
                 i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS s
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      )
    ), df AS (
      SELECT s, count(*) AS n_docs FROM sh GROUP BY s
    )
    SELECT sh.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN df.n_docs = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique,
           {sql_fround(
        'sum(CASE WHEN df.n_docs = 1 THEN 1 ELSE 0 END) * 1.0 / count(*)', 6)}
             AS novelty
    FROM sh JOIN df USING (s)
    GROUP BY sh.doc_id
    """,
    doc="per-document n-gram novelty: the fraction of a doc's distinct "
    "word 3-gram shingles that occur in NO other document — the "
    "inverse-boilerplate signal (template/chrome-heavy docs score "
    "near 0, original prose near 1), the doc-level complement of the "
    "pairwise Jaccard dedup family. Exact integer ratio, frounded. "
    "Scale: distinct (doc, shingle) -> shingle-frequency groupBy -> "
    "join back — shingle keys hash to 8 bytes in the production "
    "variant (dedup.py convention) so the shuffle never carries text.",
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    sh = (
        d.select(
            "doc_id",
            F.explode(
                F.expr(
                    "CASE WHEN size(split(text, ' ')) < 3 THEN array() ELSE"
                    " transform(sequence(0, size(split(text, ' ')) - 3),"
                    " i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3)))"
                    " END"
                )
            ).alias("s"),
        )
        .distinct()
    )
    dfreq = sh.groupBy("s").agg(F.count("*").alias("n_docs"))
    uniq = F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0))
    return (
        sh.join(dfreq, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            uniq.cast("long").alias("n_unique"),
            fround(uniq * 1.0 / F.count("*"), 6).alias("novelty"),
        )
    )


# ------------------------------------------------------ segment-level dedup
# Sub-document exact dedup, the FineWeb/RefinedWeb "line dedup" pattern
# re-expressed for the fixture corpus (whose text has no newlines):
# each document splits into contiguous 3-word segments; a segment
# survives only in its FIRST corpus occurrence (min (doc_id, seg_idx),
# encoded as one integer keeper key so the winner is total-ordered);
# every document is then reconstructed from its surviving segments.
_SEG_WORDS = 3
_SEG_KEY = 100000  # keeper key = doc_id * _SEG_KEY + seg_idx


@query(
    "q_segment_dedup",
    f"""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), segs AS (
      SELECT doc_id, CAST(i AS BIGINT) AS seg_idx,
             array_to_string(
               w[(i*{_SEG_WORDS}+1):((i+1)*{_SEG_WORDS})], ' ') AS seg
      FROM base,
           UNNEST(range(0, CAST(ceil(array_length(w) / {_SEG_WORDS}.0) AS INT)))
             AS u(i)
    ), keep AS (
      SELECT {sql_h60("'seg:' || seg")} AS hseg,
             min(doc_id * {_SEG_KEY} + seg_idx) AS keeper
      FROM segs GROUP BY 1
    ), kept AS (
      SELECT s.doc_id, s.seg_idx, s.seg
      FROM segs s JOIN keep k
        ON {sql_h60("'seg:' || s.seg")} = k.hseg
       AND s.doc_id * {_SEG_KEY} + s.seg_idx = k.keeper
    ), per_doc AS (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(seg, ' ' ORDER BY seg_idx) AS kept_text
      FROM kept GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(ceil(array_length(b.w) / {_SEG_WORDS}.0) AS BIGINT)
             AS n_segments,
           CAST(coalesce(p.n_kept, 0) AS BIGINT) AS n_kept,
           p.kept_text
    FROM base b LEFT JOIN per_doc p ON p.doc_id = b.doc_id
    """,
    doc="segment-level exact dedup with document reconstruction (the "
    "FineWeb line-dedup pattern): 3-word segments hash to the portable "
    "60-bit key, each hash keeps only its first corpus occurrence "
    "(min integer keeper key — deterministic, no window), and every "
    "document re-assembles from its surviving segments in order. "
    "Scale: the shuffle carries (hash, keeper-key) pairs — 16 bytes "
    "per segment, never the segment text; the survivor join is on "
    "the same hash (one co-partitioned shuffle); reconstruction "
    "shuffles on doc_id once. At 100 TB this is exactly the "
    "digest-only-movement discipline of operators/dedup.py.",
)
def q_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.dedup import segment_dedup

    return segment_dedup(
        _docs(spark, sf_dir), seg_words=_SEG_WORDS, key_mult=_SEG_KEY
    )


# ---------------------------------------------------- word co-occurrence lift
# Association strength between word pairs: lift = P(w1,w2)/(P(w1)P(w2))
# = n_pair * N / (n1 * n2) on document-level distinct occurrence. PMI is
# ln(lift); the ranking is identical, and lift keeps every engine step
# exact (integer products through ONE IEEE division — no libm in the
# gate path). Minimum support keeps rare-pair noise out.
_PMI_MIN_SUPPORT = 50


@query(
    "q_pmi_cooccur",
    f"""
    WITH dw AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
      FROM documents
    ), nd AS (
      SELECT count(DISTINCT doc_id) AS n_docs FROM documents
    ), wf AS (
      SELECT w, count(*) AS nw FROM dw GROUP BY w
    ), p AS (
      SELECT a.w AS w1, b.w AS w2, count(*) AS n_pair
      FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.w < b.w
      GROUP BY 1, 2
      HAVING count(*) >= {_PMI_MIN_SUPPORT}
    ), scored AS (
      SELECT p.w1, p.w2, CAST(p.n_pair AS BIGINT) AS n_pair,
             {sql_fround(
                 'CAST(p.n_pair * nd.n_docs AS DOUBLE) / (f1.nw * f2.nw)', 6
             )} AS lift
      FROM p CROSS JOIN nd
      JOIN wf f1 ON f1.w = p.w1
      JOIN wf f2 ON f2.w = p.w2
    ), ranked AS (
      SELECT w1, w2, n_pair, lift,
             row_number() OVER (ORDER BY lift DESC, w1, w2) AS rnk
      FROM scored
    )
    SELECT w1, w2, n_pair, lift, CAST(rnk AS INT) AS rank
    FROM ranked WHERE rnk <= 20
    """,
    doc="word co-occurrence lift (the PMI ranking, libm-free): top-20 "
    "word pairs by observed-vs-independent document co-occurrence. "
    "Pair expansion is IN-ROW (per-document distinct word array "
    "exploded against itself), so the corpus never self-joins — the "
    "only shuffles are the (w1,w2) count aggregate and the two "
    "broadcast joins against the tiny word-frequency relation. Rank "
    "ties order on the ROUNDED lift then the pair, so top-k is "
    "hash-portable.",
)
def q_pmi_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    dw = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("w")
    )
    nd = docs.agg(F.count_distinct("doc_id").alias("n_docs"))
    wf = dw.groupBy("w").agg(F.count("*").alias("nw"))
    # in-row pair expansion: sorted distinct word array, then the
    # (i < j) cross of the array with itself — no corpus self-join
    ws = docs.select(
        "doc_id", F.array_sort(F.array_distinct(F.split("text", " "))).alias("ws")
    )
    pairs = (
        ws.select("doc_id", F.posexplode("ws").alias("i", "w1"), F.col("ws"))
        .select(
            "doc_id",
            "w1",
            F.explode(
                F.slice(
                    F.col("ws"), F.col("i") + 2, F.greatest(F.size("ws") - F.col("i") - 1, F.lit(0))
                )
            ).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_pair"))
        .where(F.col("n_pair") >= _PMI_MIN_SUPPORT)
    )
    f1 = wf.select(F.col("w").alias("w1"), F.col("nw").alias("n1"))
    f2 = wf.select(F.col("w").alias("w2"), F.col("nw").alias("n2"))
    scored = (
        pairs.crossJoin(F.broadcast(nd))
        .join(F.broadcast(f1), "w1")
        .join(F.broadcast(f2), "w2")
        .select(
            "w1",
            "w2",
            F.col("n_pair").cast("long").alias("n_pair"),
            fround(
                (F.col("n_pair") * F.col("n_docs")).cast("double")
                / (F.col("n1") * F.col("n2")),
                6,
            ).alias("lift"),
        )
    )
    wr = Window.orderBy(F.desc("lift"), F.asc("w1"), F.asc("w2"))
    return scored.withColumn("rank", F.row_number().over(wr).cast("int")).where(
        F.col("rank") <= 20
    )


# --------------------------------------------------- corpus BLEU (eval gate)
# Candidate = the document with every 5th word replaced by a
# deterministic doc-keyed token (both engines plant identically), so
# n-gram precisions are non-trivial; reference = the original text.
# BLEU+1 smoothing ((m+1)/(t+1)) keeps every log finite; the brevity
# penalty stays in log space — corpus BLEU needs NO exp() anywhere.
@query(
    "q_bleu_eval",
    """
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS ref FROM documents
      WHERE array_length(string_split(text, ' ')) >= 4
    ), pairs AS (
      SELECT doc_id, ref,
             list_transform(range(1, array_length(ref) + 1),
               i -> CASE WHEN (i - 1) % 5 = 0
                    THEN 'zz' || CAST(doc_id % 7 AS VARCHAR)
                    ELSE ref[i] END) AS cand
      FROM base
    ), cc AS (
      SELECT doc_id, n, gram, count(*) AS c FROM (
        SELECT doc_id, t.n AS n,
               array_to_string(cand[i + 1:i + t.n], ' ') AS gram
        FROM pairs, range(1, 5) t(n),
             unnest(range(0, greatest(array_length(cand) - t.n + 1, 0)))
               ix(i)
      ) GROUP BY 1, 2, 3
    ), rc AS (
      SELECT doc_id, n, gram, count(*) AS c FROM (
        SELECT doc_id, t.n AS n,
               array_to_string(ref[i + 1:i + t.n], ' ') AS gram
        FROM pairs, range(1, 5) t(n),
             unnest(range(0, greatest(array_length(ref) - t.n + 1, 0)))
               ix(i)
      ) GROUP BY 1, 2, 3
    ), matched AS (
      SELECT cc.n,
             CAST(sum(least(cc.c, coalesce(rc.c, 0))) AS BIGINT) AS m,
             CAST(sum(cc.c) AS BIGINT) AS t
      FROM cc LEFT JOIN rc
        ON rc.doc_id = cc.doc_id AND rc.n = cc.n AND rc.gram = cc.gram
      GROUP BY cc.n
    ), lens AS (
      SELECT CAST(sum(array_length(cand)) AS BIGINT) AS c_len,
             CAST(sum(array_length(ref)) AS BIGINT) AS r_len
      FROM pairs
    ), logp AS (
      SELECT n, m, t,
             CAST(floor(ln((m + 1.0) / (t + 1.0)) * 1000000 + 0.5)
                  AS BIGINT) AS lp_micro
      FROM matched
    )
    SELECT l.c_len, l.r_len,
           CAST(least(0, floor((1.0 - l.r_len * 1.0 / l.c_len) * 1000000
                               + 0.5)) AS BIGINT) AS bp_log_micro,
           CAST(sum(p.lp_micro) // 4
                + least(0, floor((1.0 - l.r_len * 1.0 / l.c_len)
                                 * 1000000 + 0.5)) AS BIGINT)
             AS log_bleu_micro,
           CAST(sum(CASE WHEN p.n = 1 THEN p.m END) AS BIGINT) AS m1,
           CAST(sum(CASE WHEN p.n = 1 THEN p.t END) AS BIGINT) AS t1,
           CAST(sum(CASE WHEN p.n = 4 THEN p.m END) AS BIGINT) AS m4,
           CAST(sum(CASE WHEN p.n = 4 THEN p.t END) AS BIGINT) AS t4
    FROM logp p CROSS JOIN lens l
    GROUP BY l.c_len, l.r_len
    """,
    doc="corpus-level BLEU in exact fixed point (the MT/eval-suite "
    "metric as dataflow): per-pair clipped n-gram matches (n=1..4) "
    "via one counts join, BLEU+1 smoothing so every log is finite, "
    "log-space brevity penalty — corpus BLEU needs no exp() at all, "
    "so micro-nat integers stay engine-portable. The gate plants a "
    "deterministic candidate (every 5th word replaced doc-keyed) "
    "against the original reference; output = corpus totals + "
    "log-BLEU. Scale: grams shuffle once on (doc, n, gram) digest-"
    "sized rows; everything downstream is 4 rows + a scalar pair.",
)
def q_bleu_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    base = d.select("doc_id", F.split("text", " ").alias("ref")).where(
        F.size("ref") >= 4
    )
    cand = F.expr(
        "transform(ref, (w, i) -> CASE WHEN i % 5 = 0"
        " THEN concat('zz', cast(doc_id % 7 as string)) ELSE w END)"
    )
    pairs = base.select("doc_id", "ref", cand.alias("cand"))

    def ngrams(col: str, side: str):
        return pairs.select(
            "doc_id",
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, 4), n ->"
                    f" CASE WHEN size({col}) >= n THEN"
                    f" transform(sequence(0, size({col}) - n),"
                    f" i -> named_struct('n', n, 'gram',"
                    f" concat_ws(' ', slice({col}, i + 1, n)))) ELSE"
                    " cast(array() as"
                    " array<struct<n:int,gram:string>>) END))"
                )
            ).alias("g"),
        ).select(
            "doc_id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram")
        ).groupBy("doc_id", "n", "gram").agg(
            F.count("*").alias(f"c_{side}")
        )
    cc = ngrams("cand", "c")
    rc = ngrams("ref", "r")
    matched = (
        cc.join(rc, ["doc_id", "n", "gram"], "left")
        .groupBy("n")
        .agg(
            F.sum(F.least(F.col("c_c"), F.coalesce(F.col("c_r"), F.lit(0))))
            .cast("long")
            .alias("m"),
            F.sum("c_c").cast("long").alias("t"),
        )
    )
    lens = pairs.agg(
        F.sum(F.size("cand")).cast("long").alias("c_len"),
        F.sum(F.size("ref")).cast("long").alias("r_len"),
    )
    logp = matched.select(
        "n",
        "m",
        "t",
        F.floor(
            F.log((F.col("m") + 1.0) / (F.col("t") + 1.0)) * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("lp_micro"),
    )
    bp = F.least(
        F.lit(0),
        F.floor(
            (F.lit(1.0) - F.col("r_len") * 1.0 / F.col("c_len")) * 1000000
            + F.lit(0.5)
        ),
    ).cast("long")
    return (
        logp.crossJoin(F.broadcast(lens))
        .groupBy("c_len", "r_len")
        .agg(
            F.max(bp).alias("bp_log_micro"),
            (
                F.expr("sum(lp_micro) div 4") + F.max(bp)
            ).cast("long").alias("log_bleu_micro"),
            F.sum(F.when(F.col("n") == 1, F.col("m"))).cast("long").alias("m1"),
            F.sum(F.when(F.col("n") == 1, F.col("t"))).cast("long").alias("t1"),
            F.sum(F.when(F.col("n") == 4, F.col("m"))).cast("long").alias("m4"),
            F.sum(F.when(F.col("n") == 4, F.col("t"))).cast("long").alias("t4"),
        )
    )


# ------------------------------------------------ ROUGE-1/2 (eval gate)
# Same planted candidate/reference pairs as q_bleu_eval; ROUGE-N adds
# the recall direction (fraction of REFERENCE n-grams recovered) and
# the F1 in floored integer micros — no logs, no exp, pure ratios.
@query(
    "q_rouge_eval",
    """
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS ref FROM documents
      WHERE array_length(string_split(text, ' ')) >= 4
    ), pairs AS (
      SELECT doc_id, ref,
             list_transform(range(1, array_length(ref) + 1),
               i -> CASE WHEN (i - 1) % 5 = 0
                    THEN 'zz' || CAST(doc_id % 7 AS VARCHAR)
                    ELSE ref[i] END) AS cand
      FROM base
    ), cc AS (
      SELECT doc_id, n, gram, count(*) AS c FROM (
        SELECT doc_id, t.n AS n,
               array_to_string(cand[i + 1:i + t.n], ' ') AS gram
        FROM pairs, range(1, 3) t(n),
             unnest(range(0, greatest(array_length(cand) - t.n + 1, 0)))
               ix(i)
      ) GROUP BY 1, 2, 3
    ), rc AS (
      SELECT doc_id, n, gram, count(*) AS c FROM (
        SELECT doc_id, t.n AS n,
               array_to_string(ref[i + 1:i + t.n], ' ') AS gram
        FROM pairs, range(1, 3) t(n),
             unnest(range(0, greatest(array_length(ref) - t.n + 1, 0)))
               ix(i)
      ) GROUP BY 1, 2, 3
    ), m AS (
      SELECT rc.n,
             CAST(sum(least(rc.c, coalesce(cc.c, 0))) AS BIGINT) AS match,
             CAST(sum(rc.c) AS BIGINT) AS t_ref
      FROM rc LEFT JOIN cc
        ON cc.doc_id = rc.doc_id AND cc.n = rc.n AND cc.gram = rc.gram
      GROUP BY rc.n
    ), tc AS (
      SELECT n, CAST(sum(c) AS BIGINT) AS t_cand FROM cc GROUP BY n
    )
    SELECT m.n, m.match, m.t_ref, tc.t_cand,
           CAST((m.match * 1000000) // m.t_ref AS BIGINT)
             AS recall_micro,
           CAST((m.match * 1000000) // tc.t_cand AS BIGINT)
             AS precision_micro,
           CAST((2 * m.match * 1000000) // (m.t_ref + tc.t_cand)
                AS BIGINT) AS f1_micro
    FROM m JOIN tc ON tc.n = m.n
    """,
    doc="corpus ROUGE-1/ROUGE-2: clipped n-gram matches in the "
    "RECALL direction (reference n-grams recovered by the "
    "candidate) plus precision and F1, all floored integer micros — "
    "ratio-only, so no transcendental portability surface at all. "
    "Same planted pairs as q_bleu_eval; together they gate both "
    "directions of the standard text-overlap eval suite. Scale: one "
    "counts join on (doc, n, gram); output is 2 rows.",
)
def q_rouge_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    base = d.select("doc_id", F.split("text", " ").alias("ref")).where(
        F.size("ref") >= 4
    )
    cand = F.expr(
        "transform(ref, (w, i) -> CASE WHEN i % 5 = 0"
        " THEN concat('zz', cast(doc_id % 7 as string)) ELSE w END)"
    )
    pairs = base.select("doc_id", "ref", cand.alias("cand"))

    def ngrams(col: str, side: str):
        return pairs.select(
            "doc_id",
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, 2), n ->"
                    f" CASE WHEN size({col}) >= n THEN"
                    f" transform(sequence(0, size({col}) - n),"
                    f" i -> named_struct('n', n, 'gram',"
                    f" concat_ws(' ', slice({col}, i + 1, n)))) ELSE"
                    " cast(array() as"
                    " array<struct<n:int,gram:string>>) END))"
                )
            ).alias("g"),
        ).select(
            "doc_id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram")
        ).groupBy("doc_id", "n", "gram").agg(
            F.count("*").alias(f"c_{side}")
        )

    cc = ngrams("cand", "c")
    rc = ngrams("ref", "r")
    m = (
        rc.join(cc, ["doc_id", "n", "gram"], "left")
        .groupBy("n")
        .agg(
            F.sum(F.least(F.col("c_r"), F.coalesce(F.col("c_c"), F.lit(0))))
            .cast("long")
            .alias("match"),
            F.sum("c_r").cast("long").alias("t_ref"),
        )
    )
    tc = cc.groupBy("n").agg(F.sum("c_c").cast("long").alias("t_cand"))
    return m.join(tc, "n").select(
        "n",
        "match",
        "t_ref",
        "t_cand",
        F.expr("(match * 1000000L) div t_ref").alias("recall_micro"),
        F.expr("(match * 1000000L) div t_cand").alias("precision_micro"),
        F.expr("(2 * match * 1000000L) div (t_ref + t_cand)").alias(
            "f1_micro"
        ),
    )


@query(
    "q_epoch_shuffle",
    f"""
    WITH k AS (
      SELECT e.epoch, d.doc_id,
             {sql_h60("'epoch:' || CAST(e.epoch AS VARCHAR) || ':'"
                      " || CAST(d.doc_id AS VARCHAR)")} AS key
      FROM documents d
      CROSS JOIN (SELECT 0 AS epoch UNION ALL SELECT 1) e
    )
    SELECT epoch, doc_id,
           CAST(row_number() OVER (
             PARTITION BY epoch ORDER BY key, doc_id) AS BIGINT) AS pos
    FROM k
    """,
    doc="deterministic per-epoch GLOBAL training-order permutation "
    "(the reproducible dataloader shuffle): every doc gets a unique "
    "1-based position per epoch from the portable 60-bit hash of "
    "(epoch, doc_id), computed WITHOUT a global sort — range-aligned "
    "hash buckets, per-bucket counts, exclusive prefix offsets over "
    "the tiny (epochs x buckets) relation, then offset + in-bucket "
    "rank (the distributed-prefix discipline of q_classifier_auc / "
    "q_hash_quantiles). The oracle computes the straight global "
    "row_number per epoch, so a hash-green row PROVES the two-phase "
    "decomposition equals the global rank bit-exactly. Scale: worst "
    "single-task window input is ~n/n_buckets hash-balanced rows; "
    "raise n_buckets with the corpus.",
)
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.packing import epoch_shuffle

    return epoch_shuffle(_docs(spark, sf_dir), epochs=2, n_buckets=256)
