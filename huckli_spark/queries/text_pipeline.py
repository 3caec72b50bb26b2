"""Text-analysis / deduplication parity queries over `documents`.

These are the large-scale training-data-pipeline operators (BASELINE
"north_star"): exact dedup, n-gram Jaccard near-dup, bag-of-words
fingerprinting, token counting, quality scoring, lexical profiling.
Each has a DuckDB oracle; the heavy-lifting implementations live in
``huckli_spark.operators`` — these queries are thin drivers over them
so the driver's correctness gate covers the operator code path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from huckli_spark.functions.portable import fround, sql_fround, sql_h60
from huckli_spark.operators import textstats
from huckli_spark.operators.dedup import exact_dup_stats, jaccard_pairs, bow_fingerprint
from huckli_spark.queries import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


# ---------------------------------------------------------------------------
# exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------
@query(
    "q_dedup_exact",
    """
    SELECT count(*) AS n_docs,
           count(DISTINCT md5(text)) AS n_unique,
           count(*) - count(DISTINCT md5(text)) AS n_dup_rows
    FROM documents
    """,
    doc="exact dedup stats: docs vs distinct content hashes. Scale: one "
    "hash-agg shuffle on a 128-bit digest, no text movement.",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dup_stats(_docs(spark, sf_dir), text_col="text")


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs
# ---------------------------------------------------------------------------
# Shared CTE chain: word-3-gram shingles -> sizes -> pairwise
# intersection counts (used by the pair query and the cluster query).
# The intersection joins on the portable 60-bit shingle hash, exactly
# like the Spark operator — same hash, same (negligible) collisions,
# identical results, 8-byte join keys on both engines.
_JACCARD_CTES = f"""words AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) AS pos,
             unnest(string_split(text, ' ')) AS w
      FROM documents
    ), sh AS (
      SELECT doc_id, {sql_h60("shingle_str")} AS shingle
      FROM (
        SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle_str
        FROM words a
        JOIN words b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        JOIN words c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
      )
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS n_common
      FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    ), jpairs AS (
      SELECT d1, d2
      FROM inter
      JOIN sizes s1 ON s1.doc_id = d1
      JOIN sizes s2 ON s2.doc_id = d2
      WHERE n_common * 1.0 / (s1.n + s2.n - n_common) >= 0.8
    )"""


@query(
    "q_ngram_jaccard",
    f"""
    WITH {_JACCARD_CTES}
    SELECT d1, d2,
           {sql_fround('n_common * 1.0 / (s1.n + s2.n - n_common)', 4)} AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.doc_id = d1
    JOIN sizes s2 ON s2.doc_id = d2
    WHERE n_common * 1.0 / (s1.n + s2.n - n_common) >= 0.8
    """,
    doc="word-3-gram Jaccard near-duplicate pairs at >= 0.8.",
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jaccard_pairs(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text", n=3, threshold=0.8
    )


# Containment (asymmetric) variant: Jaccard misses the quote/superset
# case — a short doc fully embedded in a long one has tiny Jaccard but
# containment ~1.0. Production dedup (SlimPajama-style) runs both.
@query(
    "q_containment_dup",
    f"""
    WITH {_JACCARD_CTES}
    SELECT d1, d2,
           {sql_fround('n_common * 1.0 / s1.n', 4)} AS cont_1_in_2,
           {sql_fround('n_common * 1.0 / s2.n', 4)} AS cont_2_in_1
    FROM inter
    JOIN sizes s1 ON s1.doc_id = d1
    JOIN sizes s2 ON s2.doc_id = d2
    WHERE greatest(n_common * 1.0 / s1.n, n_common * 1.0 / s2.n) >= 0.5
    """,
    doc="asymmetric shingle-set containment pairs: C(A|B) = "
    "|S(A) n S(B)| / |S(A)| per direction, kept when EITHER direction "
    "clears 0.5 — the quote-extraction / near-superset duplicates "
    "Jaccard structurally under-scores. Same inverted-index "
    "(shingle-hash self-join) plan, cost profile and skew guard as "
    "q_ngram_jaccard: one extra join column, no new shuffle. At "
    "100 TB, run with max_doc_freq set, exactly like the guarded "
    "Jaccard variant.",
)
def q_containment_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.dedup import containment_pairs

    return containment_pairs(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text",
        n=3, threshold=0.5,
    )


# Guarded variant: the stop-shingle skew guard (max_doc_freq) is the
# mandatory 100-TB setting (operators/dedup.py module notes) — an
# ultra-common shingle otherwise makes the inverted-index self-join
# quadratic in its posting-list length. The oracle mirrors the guard
# exactly (doc-freq filter BEFORE sizes and intersections). At the
# gate's sf0.01 the max shingle doc-freq is 7, so max_doc_freq=8 also
# proves the guard is result-neutral below its threshold: this output
# == q_ngram_jaccard's.
_GUARD_DF = 8

_JACCARD_GUARDED_CTES = f"""words AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) AS pos,
             unnest(string_split(text, ' ')) AS w
      FROM documents
    ), sh0 AS (
      SELECT doc_id, {sql_h60("shingle_str")} AS shingle
      FROM (
        SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle_str
        FROM words a
        JOIN words b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        JOIN words c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
      )
    ), freq AS (
      SELECT shingle, count(*) AS f FROM sh0 GROUP BY shingle
    ), sh AS (
      SELECT sh0.doc_id, sh0.shingle
      FROM sh0 JOIN freq USING (shingle) WHERE f <= {_GUARD_DF}
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS n_common
      FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    )"""


@query(
    "q_ngram_jaccard_guarded",
    f"""
    WITH {_JACCARD_GUARDED_CTES}
    SELECT d1, d2,
           {sql_fround('n_common * 1.0 / (s1.n + s2.n - n_common)', 4)} AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.doc_id = d1
    JOIN sizes s2 ON s2.doc_id = d2
    WHERE n_common * 1.0 / (s1.n + s2.n - n_common) >= 0.8
    """,
    doc="q_ngram_jaccard with the stop-shingle skew guard engaged "
    "(max_doc_freq=8): shingles in more than 8 docs are dropped before "
    "sizes and intersections on BOTH engines. The 100-TB-safe form of "
    "the operator, hash-gated.",
)
def q_ngram_jaccard_guarded(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jaccard_pairs(
        _docs(spark, sf_dir),
        id_col="doc_id",
        text_col="text",
        n=3,
        threshold=0.8,
        max_doc_freq=_GUARD_DF,
    )


# ---------------------------------------------------------------------------
# document fingerprinting (bag-of-words content signature)
# ---------------------------------------------------------------------------
@query(
    "q_fingerprint",
    """
    SELECT fingerprint, count(*) AS n_docs, min(doc_id) AS keeper
    FROM (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
               AS fingerprint
      FROM documents
    )
    GROUP BY fingerprint
    HAVING count(*) > 1
    """,
    doc="bag-of-words md5 fingerprint; clusters sharing a fingerprint are "
    "near-dups. Scale: map-side signature, one shuffle on the digest.",
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bow_fingerprint(_docs(spark, sf_dir), id_col="doc_id", text_col="text")


# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------
@query(
    "q_token_count",
    f"""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           {sql_fround("sum(len(string_split(text, ' '))) * 1.0 / count(*)", 4)} AS avg_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    """,
    doc="whitespace token counting per language partition.",
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.token_count_by(_docs(spark, sf_dir), group_col="lang")


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------
def quality_score_ctes(pre: str = "") -> str:
    """CTE ``{pre}q(doc_id, score)``: the heuristic quality score's
    DuckDB replay — ONE generator behind q_quality_score's oracle and
    the AUC eval (queries/curation.py), mirroring
    textstats.quality_score exactly."""
    return f"""{pre}scored AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             length(text) AS n_ch,
             length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
               AS n_punct,
             len(list_filter(string_split(text, ' '),
                 w -> w IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it')))
               AS n_stop
      FROM documents
    ), {pre}q AS (
      SELECT doc_id,
             CASE WHEN n_tokens >= 40 THEN 1.0 ELSE n_tokens / 40.0 END * 0.5
             + CASE WHEN n_tokens > 0
                    THEN (n_stop * 1.0 / n_tokens) * 2.0 ELSE 0 END * 0.3
             + CASE WHEN n_ch > 0
                    THEN (1.0 - n_punct * 1.0 / n_ch) ELSE 0 END * 0.2
               AS score
      FROM {pre}scored
    )"""


@query(
    "q_quality_score",
    f"""
    WITH {quality_score_ctes()}
    SELECT CASE WHEN score >= 0.8 THEN 'high'
                WHEN score >= 0.6 THEN 'medium'
                ELSE 'low' END AS quality,
           count(*) AS n,
           {sql_fround('avg(score)', 4)} AS avg_score
    FROM q
    GROUP BY 1
    """,
    doc="heuristic quality score (length/stopword/punctuation ratios) "
    "bucketed into classes.",
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = textstats.quality_score(_docs(spark, sf_dir), text_col="text")
    return (
        scored.select(
            F.when(F.col("score") >= 0.8, "high")
            .when(F.col("score") >= 0.6, "medium")
            .otherwise("low")
            .alias("quality"),
            "score",
        )
        .groupBy("quality")
        .agg(F.count("*").alias("n"), fround(F.avg("score"), 4).alias("avg_score"))
    )


# ---------------------------------------------------------------------------
# lexical profile (stand-in for language ID on this single-vocabulary
# fixture; the real n-gram language identifier is
# operators/textstats.py::language_id with its own unit tests)
# ---------------------------------------------------------------------------
@query(
    "q_lang_profile",
    f"""
    WITH w AS (
      SELECT lang, doc_id, unnest(string_split(text, ' ')) AS w
      FROM documents
    )
    SELECT lang,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS total_words,
           count(DISTINCT w) AS vocab,
           {sql_fround('count(DISTINCT w) * 1.0 / count(*)', 6)} AS type_token_ratio
    FROM w
    GROUP BY lang
    """,
    doc="per-language lexical profile: vocabulary size + type/token ratio.",
)
def q_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    w = docs.select("lang", "doc_id", F.explode(F.split("text", " ")).alias("w"))
    return w.groupBy("lang").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count("*").alias("total_words"),
        F.count_distinct("w").alias("vocab"),
        fround(F.count_distinct("w") / F.count("*"), 6).alias("type_token_ratio"),
    )


# ---------------------------------------------------------------------------
# composed corpus-prep pipeline (the flagship training-data workflow)
# ---------------------------------------------------------------------------
@query(
    "q_corpus_prep",
    f"""
    WITH filtered AS (
      SELECT doc_id, text, source, n_chars,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
      WHERE lang = 'en'
        AND n_chars BETWEEN 100 AND 20000
        AND len(string_split(text, ' ')) >= 20
    ), deduped AS (
      SELECT doc_id, source, n_chars, n_tokens FROM (
        SELECT doc_id, source, n_chars, n_tokens,
               row_number() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id) AS rn
        FROM filtered
      ) WHERE rn = 1
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           {sql_fround('sum(n_chars) * 1.0 / count(*)', 2)} AS avg_chars
    FROM deduped
    WHERE {sql_h60("CAST(doc_id AS VARCHAR)")} % 100 < 50
    GROUP BY source
    """,
    doc="composed training-data prep: language filter -> length/token "
    "quality gate -> exact dedup (keep lowest id per content hash) -> "
    "deterministic 50% hash sample -> per-source accounting. Scale "
    "shape: filters are scan-pushed, dedup shuffles only "
    "(digest, id, metadata) — never text — and the sample predicate "
    "is map-side.",
)
def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.functions.portable import h60
    from huckli_spark.operators.dedup import dedup_exact

    d = _docs(spark, sf_dir)
    filtered = (
        d.where(
            (F.col("lang") == "en")
            & F.col("n_chars").between(100, 20000)
            & (F.size(F.split("text", " ")) >= 20)
        )
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
            F.md5("text").alias("__digest"),
        )
    )
    deduped = dedup_exact(filtered, ["__digest"], order_col="doc_id")
    sampled = deduped.where(h60(F.col("doc_id").cast("string")) % 100 < 50)
    return sampled.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        # exact int sum ÷ exact int count — bit-identical to the oracle
        # (avg() accumulator order differs between engines).
        fround(F.sum("n_chars") * F.lit(1.0) / F.count("*"), 2).alias("avg_chars"),
    )


# ---------------------------------------------------------------------------
# text normalization (lowercase / strip punct / collapse whitespace)
# ---------------------------------------------------------------------------
@query(
    "q_text_normalize",
    f"""
    WITH n AS (
      SELECT lang, text,
             trim(regexp_replace(
               regexp_replace(lower(text), '[.,!?;:]', '', 'g'),
               ' +', ' ', 'g')) AS norm
      FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN norm <> text THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed,
           {sql_fround('sum(length(norm)) * 1.0 / sum(length(text))', 4)}
             AS len_ratio
    FROM n
    GROUP BY lang
    """,
    doc="canonical normalization (lower, strip punctuation, collapse "
    "spaces, trim) with per-language change accounting — the step "
    "before exact/near dedup in a training pipeline. Map stage + one "
    "combined-agg shuffle; len_ratio is an exact integer-sum ratio "
    "(one IEEE division, engine-portable).",
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = textstats.normalize_text(_docs(spark, sf_dir))
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("norm") != F.col("text"), 1).otherwise(0))
        .cast("long")
        .alias("n_changed"),
        fround(
            F.sum(F.length("norm")) * F.lit(1.0) / F.sum(F.length("text")), 4
        ).alias("len_ratio"),
    )


# ---------------------------------------------------------------------------
# length histogram (data-quality distribution snapshot)
# ---------------------------------------------------------------------------
@query(
    "q_length_histogram",
    """
    SELECT lang,
           CAST(n_chars // 2000 AS BIGINT) AS bucket,
           count(*) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY lang, bucket
    """,
    doc="document-length histogram per language (2000-char buckets) — "
    "the distribution snapshot a data-quality dashboard starts from. "
    "One combined-agg shuffle on (lang, bucket): O(langs x buckets) "
    "output at any corpus size.",
)
def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    bucket = F.floor(F.col("n_chars") / 2000).cast("long")
    return d.groupBy("lang", bucket.alias("bucket")).agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
# TF-IDF: distinctive terms per source
# ---------------------------------------------------------------------------
@query(
    "q_tfidf_terms",
    f"""
    WITH w AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ), tf AS (
      SELECT source, w, count(*) AS tf FROM w GROUP BY source, w
    ), df AS (
      SELECT w, count(DISTINCT source) AS df FROM w GROUP BY w
    ), n AS (
      SELECT count(DISTINCT source) AS n FROM documents
    ), scored AS (
      SELECT tf.source, tf.w,
             {sql_fround('tf * ln((n + 1.0) / (df + 1.0))', 6)} AS tfidf
      FROM tf JOIN df USING (w) CROSS JOIN n
    )
    SELECT source, w, tfidf, rnk FROM (
      SELECT source, w, tfidf,
             row_number() OVER (PARTITION BY source
                                ORDER BY tfidf DESC, w) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """,
    doc="TF-IDF distinctive terms (top 3 per source): term frequency "
    "per source x inverse source frequency, the classic corpus-"
    "characterization statistic. Scale: two combined-agg shuffles "
    "(term counts, source frequencies) + a broadcastable df join — "
    "nothing holds a full vocabulary in one task; ranking is "
    "per-source top-k over the scored relation.",
)
def q_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    w = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    tf = w.groupBy("source", "w").agg(F.count("*").alias("tf"))
    df_rel = w.groupBy("w").agg(F.count_distinct("source").alias("df"))
    n = d.select(F.count_distinct("source").alias("n"))
    scored = (
        tf.join(df_rel, "w")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "w",
            fround(
                F.col("tf") * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("tfidf"),
        )
    )
    win = Window.partitionBy("source").orderBy(F.desc("tfidf"), F.asc("w"))
    return (
        scored.withColumn("rnk", F.row_number().over(win))
        .where(F.col("rnk") <= 3)
        .select("source", "w", "tfidf", "rnk")
    )


# ---------------------------------------------------------------------------
# UDTF surface: context-window chunking (Python table function)
# ---------------------------------------------------------------------------
_CHUNK = 32  # words per training-window chunk


@query(
    "q_udtf_chunks",
    f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words
      FROM documents WHERE doc_id <= 100
    ), idx AS (
      SELECT doc_id, words,
             unnest(generate_series(0, (len(words) + {_CHUNK - 1}) // {_CHUNK} - 1)) AS i
      FROM w
    )
    SELECT doc_id,
           i AS chunk_idx,
           CAST(len(words[(i * {_CHUNK} + 1):((i + 1) * {_CHUNK})]) AS BIGINT) AS n_words,
           CAST(length(array_to_string(words[(i * {_CHUNK} + 1):((i + 1) * {_CHUNK})], ' ')) AS BIGINT)
             AS n_chars
    FROM idx
    """,
    doc="document chunking into fixed training windows (32 words) via "
    "a PYTHON UDTF in a LATERAL join — the PySpark table-function "
    "surface, exercised on the canonical LLM-pipeline op. The UDTF "
    "runs row-parallel (one doc in, ceil(words/32) rows out, no "
    "shuffle); the oracle re-derives the chunks with list slicing.",
)
def q_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    # no type hints on eval: postponed annotations break inference
    @udtf(returnType="chunk_idx bigint, n_words bigint, n_chars bigint")
    class ChunkDoc:
        def eval(self, text):
            if text is None:  # match the oracle: null text -> no rows
                return
            words = text.split(" ")
            for i in range(0, len(words), _CHUNK):
                chunk = words[i : i + _CHUNK]
                yield i // _CHUNK, len(chunk), len(" ".join(chunk))

    spark.udtf.register("chunk_doc", ChunkDoc)
    _docs(spark, sf_dir).createOrReplaceTempView("__docs_udtf")
    return spark.sql(
        """
        SELECT doc_id, c.chunk_idx, c.n_words, c.n_chars
        FROM __docs_udtf, LATERAL chunk_doc(text) c
        WHERE doc_id <= 100
        """
    )


# ---------------------------------------------------------------------------
# incremental dedup: a new batch screened against the existing corpus
# ---------------------------------------------------------------------------
@query(
    "q_dedup_incremental",
    f"""
    WITH words AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) AS pos,
             unnest(string_split(text, ' ')) AS w
      FROM documents
    ), sh AS (
      SELECT doc_id, {sql_h60("shingle_str")} AS shingle
      FROM (
        SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle_str
        FROM words a
        JOIN words b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        JOIN words c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
      )
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT x.doc_id AS d_new, y.doc_id AS d_corpus, count(*) AS n_common
      FROM sh x JOIN sh y ON x.shingle = y.shingle
      WHERE x.doc_id % 10 = 0 AND y.doc_id % 10 <> 0
      GROUP BY 1, 2
    )
    SELECT d_new, d_corpus,
           {sql_fround('n_common * 1.0 / (s1.n + s2.n - n_common)', 4)} AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.doc_id = d_new
    JOIN sizes s2 ON s2.doc_id = d_corpus
    WHERE n_common * 1.0 / (s1.n + s2.n - n_common) >= 0.8
    """,
    doc="incremental dedup: the 'new batch' (doc_id % 10 = 0 stands in "
    "for today's ingest) screened against the existing corpus for "
    "near-duplicates before admission — the production daily flow. "
    "Scale: the batch side's shingles broadcast into the inverted-"
    "index join; the corpus side (in production a materialized "
    "shingle-index table) never shuffles.",
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.dedup import jaccard_pairs_cross

    d = _docs(spark, sf_dir)
    new = d.where(F.col("doc_id") % 10 == 0)
    corpus = d.where(F.col("doc_id") % 10 != 0)
    return jaccard_pairs_cross(
        new, corpus, id_col="doc_id", text_col="text", n=3, threshold=0.8
    )


# ---------------------------------------------------------------------------
# stratified hash sampling (per-source rates, reproducible on any engine)
# ---------------------------------------------------------------------------
@query(
    "q_stratified_sample",
    f"""
    WITH s AS (
      SELECT source, doc_id,
             {sql_h60('source')} % 60 + 20 AS rate_pct,
             {sql_h60("source || ':' || CAST(doc_id AS VARCHAR)")} % 100 AS h
      FROM documents
    )
    SELECT source,
           CAST(min(rate_pct) AS BIGINT) AS rate_pct,
           count(*) AS n_kept
    FROM s
    WHERE h < rate_pct
    GROUP BY source
    """,
    doc="stratified sampling with per-source rates, both the rate and "
    "the keep decision derived from portable hashes — the same rows "
    "survive on any engine, partitioning, or cluster size (the "
    "data-mixture primitive: upsample rare sources, downsample "
    "dominant ones, reproducibly). Pure map predicate + one "
    "combined-agg shuffle.",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.functions.portable import h60

    d = _docs(spark, sf_dir)
    rate = h60(F.col("source")) % 60 + 20
    h = h60(F.concat_ws(":", F.col("source"), F.col("doc_id").cast("string"))) % 100
    return (
        d.select("source", rate.alias("rate_pct"), h.alias("h"))
        .where(F.col("h") < F.col("rate_pct"))
        .groupBy("source")
        .agg(
            F.min("rate_pct").cast("long").alias("rate_pct"),
            F.count("*").alias("n_kept"),
        )
    )


# ---------------------------------------------------------------------------
# BPE-ish regex tokenization (letters / digit runs / single punctuation)
# ---------------------------------------------------------------------------
# Space instead of \s in the class keeps the pattern identical across
# Java-regex (Spark) and RE2 (DuckDB) whitespace semantics.
_TOK_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@query(
    "q_token_count_regex",
    f"""
    WITH t AS (
      SELECT lang, regexp_extract_all(text, '{_TOK_RE}') AS toks
      FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(len(toks)) AS BIGINT) AS total_tokens,
           CAST(sum(len(list_filter(toks,
                 t -> regexp_matches(t, '^[^A-Za-z0-9]$')))) AS BIGINT)
             AS total_punct,
           {sql_fround('sum(len(toks)) * 1.0 / count(*)', 4)} AS avg_tokens
    FROM t
    GROUP BY lang
    """,
    doc="BPE-ish regex tokenizer (letter runs | digit runs | single "
    "punctuation) — the subword-friendly complement to whitespace "
    "token counting. Map-side extract, one combined shuffle.",
)
def q_token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.expr(f"regexp_extract_all(text, '{_TOK_RE}', 0)")
    t = d.select("lang", toks.alias("toks"))
    n_tok = F.size("toks")
    n_punct = F.expr("size(filter(toks, t -> t rlike '^[^A-Za-z0-9]$'))")
    return t.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tok).cast("long").alias("total_tokens"),
        F.sum(n_punct).cast("long").alias("total_punct"),
        fround(F.sum(n_tok) * F.lit(1.0) / F.count("*"), 4).alias("avg_tokens"),
    )


# ---------------------------------------------------------------------------
# winnowing-style rolling fingerprints (containment detection)
# ---------------------------------------------------------------------------
@query(
    "q_fingerprint_winnow",
    f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words
      FROM documents
      WHERE len(string_split(text, ' ')) >= 8
    ), fp AS (
      SELECT doc_id,
             list_transform(
               list_transform(generate_series(0, len(words) - 8),
                              i -> array_to_string(words[i+1:i+8], ' ')),
               s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)
             ) AS fps
      FROM w
    )
    SELECT doc_id,
           CAST(len(fps) AS BIGINT) AS n_windows,
           CAST(len(list_distinct(fps)) AS BIGINT) AS n_distinct,
           CAST(list_min(fps) AS BIGINT) AS min_fp
    FROM fp
    WHERE doc_id <= 100
    """,
    doc="rolling 8-word-window 60-bit fingerprints "
    "(operators.textstats.rolling_fingerprint): per-doc window count, "
    "distinct count, and the winnowing minimum — the containment-"
    "detection signature. Document-local higher-order expressions, "
    "zero shuffle; the oracle re-derives identical hashes via the "
    "portable md5 h60.",
)
def q_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).where(
        (F.size(F.split("text", " ")) >= 8) & (F.col("doc_id") <= 100)
    )
    fp = textstats.rolling_fingerprint(d, text_col="text", window=8)
    return fp.select(
        "doc_id",
        F.size("fingerprints").cast("long").alias("n_windows"),
        F.size(F.array_distinct("fingerprints")).cast("long").alias("n_distinct"),
        F.array_min("fingerprints").cast("long").alias("min_fp"),
    )


# ---------------------------------------------------------------------------
# near-dup clustering (transitive closure over jaccard pairs)
# ---------------------------------------------------------------------------
@query(
    "q_dup_clusters",
    f"""
    WITH RECURSIVE {_JACCARD_CTES},
    edges AS (
      SELECT d1 AS a, d2 AS b FROM jpairs
      UNION
      SELECT d2, d1 FROM jpairs
    ), reach AS (
      SELECT a AS node, a AS r FROM edges
      UNION
      SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b
    )
    SELECT node AS doc_id, min(r) AS cluster_id,
           CAST(node = min(r) AS BOOLEAN) AS is_keeper
    FROM reach GROUP BY node
    """,
    doc="transitive near-dup clusters: connected components over the "
    "jaccard>=0.8 pair graph via iterative min-label propagation "
    "(Spark) == recursive-CTE closure (oracle). cluster_id = smallest "
    "member; keeper = that member — the step that turns pair lists "
    "into a one-per-cluster dedup decision.",
)
def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.dedup import connected_components

    pairs = jaccard_pairs(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text", n=3, threshold=0.8
    )
    comp = connected_components(pairs)
    return comp.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper"),
    )


# ---------------------------------------------------------------------------
# composed keep-list: the end artifact of the near-dup family
# ---------------------------------------------------------------------------
@query(
    "q_dedup_keeplist",
    f"""
    WITH RECURSIVE {_JACCARD_CTES},
    edges AS (
      SELECT d1 AS a, d2 AS b FROM jpairs
      UNION
      SELECT d2, d1 FROM jpairs
    ), reach AS (
      SELECT a AS node, a AS r FROM edges
      UNION
      SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b
    ), drop_ids AS (
      SELECT node AS doc_id FROM reach GROUP BY node HAVING node <> min(r)
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM drop_ids)
    GROUP BY source
    """,
    doc="the dedup DECISION applied: near-dup pairs -> transitive "
    "clusters -> drop every non-keeper -> per-source accounting of the "
    "surviving corpus. This is the artifact a training pipeline ships. "
    "Scale: the drop set is O(duplicates) and broadcast into an "
    "anti-join against the corpus — the corpus itself never shuffles.",
)
def q_dedup_keeplist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.dedup import connected_components

    d = _docs(spark, sf_dir)
    pairs = jaccard_pairs(d, id_col="doc_id", text_col="text", n=3, threshold=0.8)
    comp = connected_components(pairs)
    drop = comp.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    kept = d.join(F.broadcast(drop), "doc_id", "left_anti")
    return kept.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage curve (tokenizer design)
# ---------------------------------------------------------------------------
@query(
    "q_vocab_coverage",
    """
    WITH wc AS (
      SELECT w, count(*) AS c FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
      ) GROUP BY w
    ), tot AS (
      SELECT sum(c) AS total FROM wc
    ), ranked AS (
      SELECT w, c,
             row_number() OVER (ORDER BY c DESC, w) AS rank,
             sum(c) OVER (ORDER BY c DESC, w ROWS UNBOUNDED PRECEDING)
               AS cum
      FROM wc
    ), t(pct) AS (VALUES (50), (75), (90), (95), (99)),
    sizes AS (
      SELECT pct, min(rank) AS vocab_size
      FROM ranked CROSS JOIN tot
      JOIN t ON cum * 100 >= pct * total
      GROUP BY pct
    )
    SELECT CAST(sizes.pct AS INT) AS pct,
           CAST(sizes.vocab_size AS BIGINT) AS vocab_size,
           CAST(r.cum AS BIGINT) AS tokens_covered
    FROM sizes JOIN ranked r ON r.rank = sizes.vocab_size
    """,
    doc="vocabulary coverage curve: the smallest frequency-ranked "
    "vocabulary prefix covering 50/75/90/95/99% of all token "
    "occurrences — the number that sizes a tokenizer's vocab (and "
    "measures corpus lexical diversity). All-integer arithmetic "
    "(cumulative count * 100 vs pct * total), ties broken on the "
    "word itself, so the curve is bit-portable. Scale: the corpus "
    "collapses to (word, count) in one map-combined groupBy — the "
    "only global-window pass runs over the VOCABULARY (millions of "
    "rows at web scale, not trillions of tokens), and the 5-target "
    "join is broadcast.",
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    total = wc.agg(F.sum("c").alias("total"))
    win = Window.orderBy(F.desc("c"), F.asc("w"))
    ranked = wc.withColumn("rank", F.row_number().over(win)).withColumn(
        "cum",
        F.sum("c").over(
            win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # JVM literal array, not createDataFrame: keeps the whole plan
    # Python-free (pinned in tests/test_plans.py)
    targets = (
        d.sparkSession.range(1)
        .select(
            F.explode(
                F.array(*[F.lit(p) for p in (50, 75, 90, 95, 99)])
            ).alias("pct")
        )
        .select(F.col("pct").cast("int"))
    )
    sizes = (
        ranked.crossJoin(F.broadcast(total))
        .join(
            F.broadcast(targets),
            F.col("cum") * 100 >= F.col("pct") * F.col("total"),
        )
        .groupBy("pct")
        .agg(F.min("rank").alias("vocab_size"))
    )
    return (
        sizes.join(
            ranked.select(F.col("rank"), F.col("cum")),
            sizes.vocab_size == F.col("rank"),
        )
        .select(
            F.col("pct").cast("int"),
            F.col("vocab_size").cast("long"),
            F.col("cum").cast("long").alias("tokens_covered"),
        )
    )


# ---------------------------------------------------------------------------
# frequency-capped dedup (keep at most K members per near-dup cluster)
# ---------------------------------------------------------------------------
@query(
    "q_dedup_cap",
    f"""
    WITH RECURSIVE {_JACCARD_CTES},
    edges AS (
      SELECT d1 AS a, d2 AS b FROM jpairs
      UNION
      SELECT d2, d1 FROM jpairs
    ), reach AS (
      SELECT a AS node, a AS r FROM edges
      UNION
      SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b
    ), comp AS (
      SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node
    )
    SELECT doc_id, cluster_id,
           CAST(row_number() OVER (
             PARTITION BY cluster_id ORDER BY doc_id) AS BIGINT)
             AS rank_in_cluster,
           (row_number() OVER (
             PARTITION BY cluster_id ORDER BY doc_id) <= 2) AS kept
    FROM comp
    """,
    doc="frequency-CAPPED near-dup dedup: keep at most K=2 members "
    "per transitive duplicate cluster (rank by doc_id within "
    "cluster) instead of exactly one — the soft-dedup policy "
    "pipelines use when limited duplication is wanted (e.g. "
    "up-weighting high-quality sources without unbounded repeats). "
    "Output = the full per-member decision table over the dup-pair "
    "membership (docs outside any pair are implicitly kept). Scale: "
    "the decision relation is O(duplicates), never corpus-sized; "
    "the cluster window partitions by cluster id.",
)
def q_dedup_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from huckli_spark.operators.dedup import connected_components

    pairs = jaccard_pairs(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text", n=3,
        threshold=0.8,
    )
    comp = connected_components(pairs)
    wr = Window.partitionBy("cluster_id").orderBy(F.asc("doc_id"))
    rk = F.row_number().over(wr).cast("long")
    return comp.select(
        "doc_id",
        "cluster_id",
        rk.alias("rank_in_cluster"),
        (rk <= 2).alias("kept"),
    )


# ---------------------------------------------------------------------------
# per-source overlap matrix (pairwise contamination report)
# ---------------------------------------------------------------------------
@query(
    "q_source_overlap",
    f"""
    WITH words AS (
      SELECT source, string_split(text, ' ') AS w FROM documents
    ), sh AS (
      SELECT DISTINCT source,
             {sql_h60('sh_str')} AS sh
      FROM (
        SELECT source,
               unnest(list_transform(
                 range(0, greatest(array_length(w) - 2, 0)),
                 i -> array_to_string(w[i + 1:i + 3], ' '))) AS sh_str
        FROM words WHERE array_length(w) >= 3
      )
    ), tot AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1
    ), p AS (
      SELECT x.source AS src_a, y.source AS src_b,
             CAST(count(*) AS BIGINT) AS shared
      FROM sh x JOIN sh y ON x.sh = y.sh AND x.source < y.source
      GROUP BY 1, 2
    )
    SELECT p.src_a, p.src_b, p.shared,
           ta.n AS n_a, tb.n AS n_b,
           CAST((p.shared * 1000000)
                // (ta.n + tb.n - p.shared) AS BIGINT) AS jaccard_micro,
           CAST((p.shared * 1000000)
                // least(ta.n, tb.n) AS BIGINT) AS containment_micro
    FROM p JOIN tot ta ON ta.source = p.src_a
    JOIN tot tb ON tb.source = p.src_b
    """,
    doc="pairwise SOURCE overlap matrix: distinct word-3-gram "
    "shingle digests per source, pair counts via one equi-join on "
    "the 60-bit digest, per-pair Jaccard + containment in floored "
    "integer micros — the cross-benchmark / cross-source "
    "contamination report a dataset release publishes (the "
    "one-vs-corpus form is q_decontaminate; this is the all-pairs "
    "matrix). Scale: the shuffle carries (source, digest) rows "
    "only; per-shingle pair fan-out is bounded by sources^2, and "
    "per-source totals broadcast (|sources| rows).",
)
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.functions.portable import h60
    from huckli_spark.operators.dedup import shingles

    d = _docs(spark, sf_dir)
    sh = (
        shingles(d, id_col="source", text_col="text", n=3)
        .select("source", h60(F.col("shingle")).alias("sh"))
        .distinct()
    )
    tot = sh.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    x = sh.select(F.col("source").alias("src_a"), "sh")
    y = sh.select(F.col("source").alias("src_b"), "sh")
    p = (
        x.join(y, "sh")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("long").alias("shared"))
    )
    ta = tot.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    tb = tot.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        p.join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .select(
            "src_a",
            "src_b",
            "shared",
            "n_a",
            "n_b",
            F.expr(
                "(shared * 1000000L) div (n_a + n_b - shared)"
            ).alias("jaccard_micro"),
            F.expr(
                "(shared * 1000000L) div least(n_a, n_b)"
            ).alias("containment_micro"),
        )
    )


# ---------------------------------------------------------------------------
# exact substring dedup (round 10): duplicated-span detection, the
# Spark-first form of suffix-array exact substring dedup
# ---------------------------------------------------------------------------
_SPAN_L = 3  # window length in words (fixture texts are short)

_SUBSTRING_ORACLE = f"""
    WITH words AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM documents
    ), gr AS (
      SELECT doc_id, u.pos AS pos, u.gram AS gram FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(0, greatest(array_length(w) - {_SPAN_L - 1}, 0)),
                 i -> struct_pack(
                   pos := i,
                   gram := array_to_string(w[i + 1:i + {_SPAN_L}], ' '))
               )) AS u
        FROM words)
    ), dup AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS n
        FROM gr) WHERE n >= 2
    ), marked AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (
               PARTITION BY doc_id ORDER BY pos) > {_SPAN_L}
             THEN 1 ELSE 0 END AS newgrp
      FROM dup
    ), grp AS (
      SELECT doc_id, pos,
             sum(newgrp) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
      FROM marked
    )
    SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + {_SPAN_L} AS BIGINT) AS span_end,
           CAST(count(*) AS BIGINT) AS n_windows
    FROM grp GROUP BY doc_id, gid
"""


@query(
    "q_substring_dedup",
    _SUBSTRING_ORACLE,
    doc="exact substring dedup — duplicated-span detection, the "
    "Spark-first re-expression of suffix-array substring dedup (Lee "
    "et al. 2022: remove any substring occurring verbatim more than "
    "once). Every L-word rolling window whose text occurs >= 2 times "
    "corpus-wide is duplicated; maximal runs of duplicated windows "
    "merge to half-open word spans [span_start, span_end) — the "
    "O(duplicated content) decision relation a pipeline cuts with. "
    "Scale: the corpus-sized gram relation shuffles ONCE (occurrence "
    "counts via a count window partitioned by the gram itself, not "
    "groupBy + join-back); span merging windows partition by "
    "document; all JVM built-ins (plan-pinned). The DuckDB oracle "
    "replays windows -> occurrence counts -> gap-merge identically.",
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.dedup import duplicate_spans

    return duplicate_spans(_docs(spark, sf_dir), window_len=_SPAN_L)


_CUT_ORACLE = f"""
    WITH words AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM documents
    ), gr AS (
      SELECT doc_id, u.pos AS pos, u.gram AS gram FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(0, greatest(array_length(w) - {_SPAN_L - 1}, 0)),
                 i -> struct_pack(
                   pos := i,
                   gram := array_to_string(w[i + 1:i + {_SPAN_L}], ' '))
               )) AS u
        FROM words)
    ), dup AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS n
        FROM gr) WHERE n >= 2
    ), marked AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (
               PARTITION BY doc_id ORDER BY pos) > {_SPAN_L}
             THEN 1 ELSE 0 END AS newgrp
      FROM dup
    ), grp AS (
      SELECT doc_id, pos,
             sum(newgrp) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
      FROM marked
    ), spans AS (
      SELECT doc_id, min(pos) AS s, max(pos) + {_SPAN_L} AS e
      FROM grp GROUP BY doc_id, gid
    ), sp AS (
      SELECT doc_id, list(struct_pack(s := s, e := e)) AS sl
      FROM spans GROUP BY doc_id
    ), affected AS (
      SELECT w.doc_id,
             list_filter(range(0, array_length(w.w)),
               i -> len(list_filter(sp.sl,
                 q -> i >= q.s AND i < q.e)) = 0) AS keep,
             w.w AS w
      FROM words w JOIN sp ON w.doc_id = sp.doc_id
    )
    SELECT doc_id,
           -- array_to_string([]) is NULL in DuckDB; Spark's
           -- array_join([]) is '' — coalesce for fully-cut docs
           coalesce(array_to_string(
             list_transform(keep, i -> w[i + 1]), ' '), '') AS text_cut,
           CAST(array_length(w) - array_length(keep) AS BIGINT)
             AS n_cut_words
    FROM affected
    UNION ALL
    SELECT w.doc_id,
           coalesce(array_to_string(w.w, ' '), '') AS text_cut,
           CAST(0 AS BIGINT) AS n_cut_words
    FROM words w
    WHERE w.doc_id NOT IN (SELECT doc_id FROM sp)
"""


@query(
    "q_substring_cut",
    _CUT_ORACLE,
    doc="exact-substring-dedup APPLICATION: remove every word covered "
    "by a q_substring_dedup span and rebuild the text (conservative "
    "all-occurrences policy — the decontamination-grade cut; keeping "
    "one canonical occurrence layers the components/cap machinery on "
    "top). Hash-gated on the rebuilt text itself, so the gate pins "
    "span boundaries, word indexing, and reconstruction exactly. "
    "Scale: spans aggregate to one array row per AFFECTED doc and "
    "join back on the doc key; the cut is a pure in-row two-arg "
    "lambda filter — the corpus never shuffles on anything "
    "data-sized.",
)
def q_substring_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.dedup import cut_duplicate_spans

    return cut_duplicate_spans(
        _docs(spark, sf_dir).select("doc_id", "text"), window_len=_SPAN_L
    ).select("doc_id", "text_cut", "n_cut_words")
