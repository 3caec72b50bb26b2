"""Text-analysis operators for training-data pipelines.

All hot-path expressions are JVM-side built-ins (split / filter /
regexp_replace / higher-order functions) — no Python UDFs — so they
stay inside whole-stage codegen and scale linearly with input bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from huckli_spark.functions.portable import fround
from huckli_spark.operators.parallel import exploded

# Stopword profiles for the heuristic language identifier. Small,
# high-frequency function words; enough to separate major languages on
# real prose (unit-tested in tests/test_textstats.py).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"),
    "es": ("el", "la", "los", "de", "y", "un", "una", "es", "que", "para"),
}

QUALITY_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
PUNCT_CLASS = "[.,!?;:]"


def _words(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def token_count_by(df: DataFrame, group_col: str, text_col: str = "text") -> DataFrame:
    """Token/char totals per group. One map-side-combined shuffle."""
    n_tokens = F.size(_words(text_col))
    # avg() accumulates in engine-specific order/precision; exact integer
    # sum ÷ exact integer count is a single IEEE division instead. Group
    # columns are non-null in the fixtures, so count(*) == count(col).
    agg = [
        F.count("*").alias("n_docs"),
        F.sum(n_tokens).alias("total_tokens"),
        fround(F.sum(n_tokens) * F.lit(1.0) / F.count("*"), 4).alias("avg_tokens"),
    ]
    if "n_chars" in df.columns:
        agg.append(F.sum("n_chars").alias("total_chars"))
    else:
        agg.append(F.sum(F.length(text_col)).alias("total_chars"))
    return df.groupBy(group_col).agg(*agg)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic doc-quality score in [0,1]: length (50%), stopword
    density (30%), punctuation cleanliness (20%).

    Mirrors the q_quality_score oracle exactly — any change here must
    change the SQL twin in queries/text_pipeline.py.
    """
    stoplist = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)
    n_tokens = F.size(_words(text_col))
    n_ch = F.length(text_col)
    n_punct = n_ch - F.length(F.regexp_replace(F.col(text_col), PUNCT_CLASS, ""))
    n_stop = F.expr(f"size(filter(split({text_col}, ' '), w -> w IN ({stoplist})))")

    length_part = F.when(n_tokens >= 40, F.lit(1.0)).otherwise(n_tokens / F.lit(40.0))
    stop_part = F.when(n_tokens > 0, (n_stop * F.lit(1.0) / n_tokens) * 2.0).otherwise(
        F.lit(0.0)
    )
    punct_part = F.when(n_ch > 0, F.lit(1.0) - n_punct * F.lit(1.0) / n_ch).otherwise(
        F.lit(0.0)
    )
    score = length_part * 0.5 + stop_part * 0.3 + punct_part * 0.2
    return df.withColumn("score", score)


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "predicted_lang") -> DataFrame:
    """Stopword-profile language identifier (n-gram-free heuristic).

    Counts hits against each language's function-word profile over
    lowercased words; argmax wins, alphabetical-first on ties, 'und'
    (undetermined) when no profile hits. Pure built-in expressions —
    scales as a single map stage.
    """
    words = F.split(F.lower(F.regexp_replace(F.col(text_col), r"[^\w\s']", " ")), r"\s+")
    scored = df.withColumn("__w", words)
    for lang, stops in STOPWORDS.items():
        stoplist = ", ".join(f"'{w}'" for w in stops)
        scored = scored.withColumn(
            f"__hits_{lang}", F.expr(f"size(filter(__w, w -> w IN ({stoplist})))")
        )
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"__hits_{lang}") for lang in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in langs:  # alphabetical => deterministic tie-break
        pred = pred.when(F.col(f"__hits_{lang}") == best, F.lit(lang))
    out = scored.withColumn(out_col, pred)
    return out.drop("__w", *[f"__hits_{lang}" for lang in langs])


def normalize_text(df: DataFrame, text_col: str = "text", out_col: str = "norm") -> DataFrame:
    """Canonical text normalization for dedup/training prep: lowercase,
    strip sentence punctuation, collapse runs of spaces, trim. Pure
    JVM expressions (map stage); the SQL twin in
    queries/text_pipeline.py::q_text_normalize mirrors each step (note
    DuckDB's regexp_replace needs the 'g' flag for global behavior,
    which Spark applies by default)."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), PUNCT_CLASS, ""), " +", " "
        )
    )
    return df.withColumn(out_col, norm)


def rolling_fingerprint(
    df: DataFrame, text_col: str = "text", window: int = 8, out_col: str = "fingerprints"
) -> DataFrame:
    """Winnowing-style document fingerprints: md5-based 60-bit hashes of
    each `window`-word shingle, keeping the per-document minimum per
    hash band — a compact signature for containment detection.
    Implemented with higher-order functions (no UDF)."""
    from huckli_spark.functions.portable import h60  # noqa: F401  (doc pointer)

    w = _words(text_col)
    shingles = F.expr(
        f"transform(sequence(0, size(split({text_col}, ' ')) - {window}),"
        f" i -> concat_ws(' ', slice(split({text_col}, ' '), i + 1, {window})))"
    )
    hashes = F.expr(
        "transform(__sh, s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint))"
    )
    out = (
        df.withColumn("__sh", F.when(F.size(w) >= window, shingles).otherwise(F.array()))
        .withColumn(out_col, hashes)
        .drop("__sh")
    )
    return out


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition signals (Gopher/RefinedWeb-style quality
    rules): word count, distinct-word ratio, top-word frequency
    fraction, top-bigram frequency fraction.

    Scale shape: bigrams are built DOCUMENT-LOCALLY (array transform —
    no self-join on position), then both gram relations partial-agg
    before their (id, gram) shuffle; per-doc output is one row. The
    two shuffles carry O(docs x distinct grams), never raw text.
    """
    base = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__w")
    ).select(
        F.col(id_col),
        F.col("__w"),
        # guard: sequence(0, -1) DESCENDS in Spark, so short docs need
        # an explicit empty-array branch
        F.expr(
            "CASE WHEN size(__w) < 2 THEN array()"
            " ELSE transform(sequence(0, size(__w) - 2),"
            " i -> concat(element_at(__w, i + 1), ' ', element_at(__w, i + 2)))"
            " END"
        ).alias("__bg"),
    )
    sizes = base.select(
        F.col(id_col),
        F.size("__w").alias("n_words"),
        F.size(F.array_distinct("__w")).alias("n_distinct"),
    )
    topw = (
        exploded(base, [F.col(id_col)], "__w", "g")
        .groupBy(id_col, "g")
        .count()
        .groupBy(id_col)
        .agg(F.max("count").alias("top_w"))
    )
    topb = (
        exploded(base, [F.col(id_col)], "__bg", "g")
        .groupBy(id_col, "g")
        .count()
        .groupBy(id_col)
        .agg(F.max("count").alias("top_b"), F.sum("count").alias("n_bg"))
    )
    out = sizes.join(topw, id_col, "left").join(topb, id_col, "left")
    return out.select(
        F.col(id_col),
        F.col("n_words"),
        fround(F.col("n_distinct") / F.col("n_words"), 4).alias("distinct_ratio"),
        fround(F.coalesce(F.col("top_w") / F.col("n_words"), F.lit(0.0)), 4).alias(
            "top_word_frac"
        ),
        fround(
            F.when(F.col("n_bg") > 0, F.col("top_b") / F.col("n_bg")).otherwise(0.0),
            4,
        ).alias("top_bigram_frac"),
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    boundary_mod: int = 8,
) -> DataFrame:
    """Content-defined chunking: a word starts a new chunk when its
    portable 60-bit hash is 0 mod ``boundary_mod`` (expected chunk
    length ~= boundary_mod words), so chunk boundaries survive
    insertions/deletions elsewhere in the document — the property that
    makes sub-document dedup robust, unlike fixed-width windows.
    Returns one row per (doc, chunk): (id, chunk_id, chunk_text,
    chunk_hash). Chunk ids are 1-based in document order.

    Scale shape: one shuffle on the doc id for the running boundary
    sum (windowed cumulative sum over word position), one partial-agg
    shuffle to assemble chunks. Chunk text never leaves the executor
    side.
    """
    from pyspark.sql import Window

    from huckli_spark.functions.portable import h60

    w = Window.partitionBy(id_col).orderBy("pos")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    words = df.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w")
    )
    marked = words.withColumn(
        "b",
        F.when((F.col("pos") == 0) | (h60(F.col("w")) % boundary_mod == 0), 1).otherwise(
            0
        ),
    ).withColumn("chunk_id", F.sum("b").over(run))
    chunks = (
        marked.groupBy(id_col, "chunk_id")
        .agg(
            F.array_join(
                F.expr("transform(array_sort(collect_list(struct(pos, w))), x -> x.w)"),
                " ",
            ).alias("chunk_text")
        )
    )
    return chunks.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.col("chunk_text"),
        h60(F.col("chunk_text")).alias("chunk_hash"),
    )


def char_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document character-level Shannon entropy — the classic
    cheap gibberish/boilerplate signal (near-zero for repeated
    padding, ~4.1 nats/char ceiling for uniform random text): low
    outliers are machine junk, and it complements the word-level
    repetition stats.

    Portability: per-(doc, char) counts are exact ints; each char's
    cnt*ln(cnt/n) term rounds to micro units INDIVIDUALLY and the
    per-doc sum is then an integer sum — order-independent, so
    partitioning cannot perturb the result (the z-score/fixed-point
    discipline). Output entropy = -S_micro / 1e6 / n, frounded.

    Scale: one explode + map-side-combined groupBy over (doc, char)
    — alphabet-bounded fan-in. The in-row alternative (sorted-chars
    fold) avoids the shuffle entirely but needs a per-doc sequential
    double fold; this form keeps every float one-rounding-from-int.
    """
    chars = df.select(
        F.col(id_col),
        F.length(text_col).cast("bigint").alias("n"),
        F.explode(F.expr(f"filter(split({text_col}, ''), x -> x <> '')"))
        .alias("c"),
    )
    per_char = chars.groupBy(id_col, "n", "c").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    term = F.floor(
        F.col("cnt") * F.log(F.col("cnt") / F.col("n")) * 1000000.0 + 0.5
    ).cast("bigint")
    agg = per_char.groupBy(id_col, "n").agg(
        F.sum(term).alias("s_micro"),
        F.count("*").cast("bigint").alias("n_distinct_chars"),
    )
    from huckli_spark.functions.portable import fround

    return agg.select(
        F.col(id_col),
        F.col("n").alias("n_chars"),
        "n_distinct_chars",
        fround(-F.col("s_micro") / 1000000.0 / F.col("n"), 6).alias(
            "entropy_nats"
        ),
    )


# Gopher/MassiveText document-filter rule set (Rae et al. 2021,
# arXiv:2112.11446 Appendix A1.1): the published thresholds, applied
# per document. The required-stopword list is the paper's.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_STOP_HITS = 2


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    min_words: int = GOPHER_MIN_WORDS,
) -> DataFrame:
    """Per-document Gopher rule verdicts: the measured signals plus
    one boolean per published rule and the conjunction (``passes``).

    Every signal is computed in-row from the split-word array (sum of
    word lengths, alphabetic-word fraction, '#'/'...' symbol counts,
    distinct-stopword hits) with ratios floored to micro ints once —
    portable and partition-free. Scale: pure map stage, zero shuffle,
    whole-stage codegen end to end; at 100 TB this is the first,
    cheapest gate in the filter chain (run it before anything that
    shuffles).
    """
    w = f"split({text_col}, ' ')"
    stop_arr = "array(" + ", ".join(f"'{s}'" for s in stopwords) + ")"
    sig = df.select(
        F.col(id_col),
        F.expr(f"size({w})").cast("bigint").alias("n_words"),
        F.expr(f"aggregate(transform({w}, x -> length(x)), 0L, (a, x) -> a + x)")
        .alias("__chars"),
        F.expr(f"size(filter({w}, x -> x rlike '[a-zA-Z]'))")
        .cast("bigint")
        .alias("__alpha"),
        # '#' and '…'/'...' occurrences anywhere in the text
        (
            F.length(text_col)
            - F.length(F.regexp_replace(F.col(text_col), "#", ""))
            + (
                F.length(text_col)
                - F.length(F.regexp_replace(F.col(text_col), r"\.\.\.", ""))
            )
            / F.lit(3)
        )
        .cast("bigint")
        .alias("__symbols"),
        F.expr(f"size(array_intersect(array_distinct({w}), {stop_arr}))")
        .cast("bigint")
        .alias("stop_hits"),
    )
    mean_len = F.floor(
        F.col("__chars") * F.lit(1000000.0) / F.col("n_words") + F.lit(0.5)
    ).cast("bigint")
    alpha = F.floor(
        F.col("__alpha") * F.lit(1000000.0) / F.col("n_words") + F.lit(0.5)
    ).cast("bigint")
    symr = F.floor(
        F.col("__symbols") * F.lit(1000000.0) / F.col("n_words") + F.lit(0.5)
    ).cast("bigint")
    out = sig.select(
        id_col,
        "n_words",
        mean_len.alias("mean_word_len_micro"),
        alpha.alias("alpha_frac_micro"),
        symr.alias("symbol_ratio_micro"),
        "stop_hits",
    )
    r_wc = (F.col("n_words") >= min_words) & (
        F.col("n_words") <= GOPHER_MAX_WORDS
    )
    r_ml = (
        F.col("mean_word_len_micro") >= int(GOPHER_MIN_MEAN_LEN * 1000000)
    ) & (F.col("mean_word_len_micro") <= int(GOPHER_MAX_MEAN_LEN * 1000000))
    r_al = F.col("alpha_frac_micro") > int(GOPHER_MIN_ALPHA_FRAC * 1000000)
    r_sy = F.col("symbol_ratio_micro") < int(GOPHER_MAX_SYMBOL_RATIO * 1000000)
    r_st = F.col("stop_hits") >= GOPHER_MIN_STOP_HITS
    return out.select(
        "*",
        r_wc.alias("r_wordcount"),
        r_ml.alias("r_meanlen"),
        r_al.alias("r_alpha"),
        r_sy.alias("r_symbol"),
        r_st.alias("r_stopwords"),
        (r_wc & r_ml & r_al & r_sy & r_st).alias("passes"),
    )


def sql_gopher_ctes(
    source: str = "documents",
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    prefix: str = "g_",
) -> str:
    """DuckDB CTE twin of gopher_rules over ``source`` (a table name
    or prior CTE with doc_id + text). Emits ``{prefix}m`` holding
    doc_id plus the five micro-int signals; compose rule verdicts with
    ``sql_gopher_passes``."""
    stop_sql = "[" + ", ".join(f"'{s}'" for s in stopwords) + "]"
    return f"""{prefix}sig AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_words,
             list_sum(list_transform(string_split(text, ' '),
                                     x -> length(x))) AS chars,
             len(list_filter(string_split(text, ' '),
                             x -> regexp_matches(x, '[a-zA-Z]'))) AS alpha,
             (length(text) - length(replace(text, '#', '')))
               + (length(text) - length(regexp_replace(text, '\\.\\.\\.',
                                                       '', 'g'))) / 3
               AS symbols,
             len(list_intersect(list_distinct(string_split(text, ' ')),
                                {stop_sql})) AS stop_hits
      FROM {source}
    ), {prefix}m AS (
      SELECT doc_id,
             CAST(n_words AS BIGINT) AS n_words,
             CAST(floor(chars * 1000000.0 / n_words + 0.5) AS BIGINT)
               AS mean_word_len_micro,
             CAST(floor(alpha * 1000000.0 / n_words + 0.5) AS BIGINT)
               AS alpha_frac_micro,
             CAST(floor(symbols * 1000000.0 / n_words + 0.5) AS BIGINT)
               AS symbol_ratio_micro,
             CAST(stop_hits AS BIGINT) AS stop_hits
      FROM {prefix}sig
    )"""


def sql_gopher_passes(min_words: int = GOPHER_MIN_WORDS) -> str:
    """The rule-conjunction boolean over a ``sql_gopher_ctes`` m-CTE's
    columns (thresholds are the paper's; micro-int comparisons)."""
    return (
        f"((n_words >= {min_words} AND n_words <= {GOPHER_MAX_WORDS})"
        " AND (mean_word_len_micro >= 3000000"
        " AND mean_word_len_micro <= 10000000)"
        " AND (alpha_frac_micro > 800000)"
        " AND (symbol_ratio_micro < 100000)"
        f" AND (stop_hits >= {GOPHER_MIN_STOP_HITS}))"
    )
