"""Distributed BPE (byte-pair-encoding) tokenizer training.

The canonical subword-vocabulary algorithm (Sennrich et al. 2016; the
GPT-2 tokenizer is its byte-level variant): start from characters,
repeatedly merge the most frequent adjacent symbol pair, record the
merge order — the merge table IS the tokenizer.

Distribution shape (the part that matters at 100 TB):
- The corpus collapses to a (word, freq) relation ONCE — pair
  statistics are weighted by word frequency, so all later iterations
  touch vocab-sized data (hundreds of thousands of rows), not corpus-
  sized. This is exactly how production BPE trainers scale.
- Each iteration: pair counts = one map-side-combined groupBy over
  the word table; the argmax pair is a bounded driver top-1 (count
  DESC, then lexicographic pair — fully deterministic); the merge
  applies as an in-row fold (higher-order aggregate expression,
  leftmost-first non-overlapping, standard BPE semantics). One
  shuffle per merge, word table persisted per iteration.

Verification: tests train the SAME corpus with a pure-Python
single-node reference (`bpe_train_local`) and assert merge-table and
tokenization equality — the distributed/local differential. The
iteration-1 pair statistics are additionally SQL-oracle-gated
(q_bpe_pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): the corpus collapsed for BPE statistics."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _chars_expr(col: str) -> str:
    """symbols = the word's characters (split-by-empty keeps order)."""
    return f"filter(split({col}, ''), x -> x <> '')"


def pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-symbol pair frequencies, freq-weighted.
    ``words`` must carry (syms array<string>, freq)."""
    pairs = F.expr(
        "CASE WHEN size(syms) < 2 THEN array() ELSE "
        "transform(sequence(1, size(syms) - 1),"
        " i -> named_struct('a', element_at(syms, i),"
        " 'b', element_at(syms, i + 1))) END"
    )
    return (
        words.select(F.explode(pairs).alias("p"), "freq")
        .groupBy("p.a", "p.b")
        .agg(F.sum("freq").alias("cnt"))
    )


def _merge_expr(a: str, b: str) -> str:
    """In-row leftmost-first non-overlapping merge of pair (a, b)."""
    qa, qb = a.replace("'", "\\'"), b.replace("'", "\\'")
    return (
        "aggregate(sequence(1, size(syms)),"
        " named_struct('out', cast(array() AS array<string>), 'skip', false),"
        " (st, i) -> CASE"
        " WHEN st.skip THEN named_struct('out', st.out, 'skip', false)"
        f" WHEN i < size(syms) AND element_at(syms, i) = '{qa}'"
        f" AND element_at(syms, i + 1) = '{qb}'"
        f" THEN named_struct('out', concat(st.out, array('{qa}{qb}')),"
        " 'skip', true)"
        " ELSE named_struct('out', concat(st.out, array(element_at(syms, i))),"
        " 'skip', false) END,"
        " st -> st.out)"
    )


def bpe_train(
    df: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Train ``n_merges`` BPE merges. Returns (merge table in rank
    order, final (word, syms, freq) DataFrame)."""
    words = word_freqs(df, text_col).select(
        "word", F.expr(_chars_expr("word")).alias("syms"), "freq"
    )
    words = words.persist()
    words.count()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(words)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        nxt = words.select(
            "word", F.expr(_merge_expr(a, b)).alias("syms"), "freq"
        ).persist()
        nxt.count()
        words.unpersist()
        words = nxt
    return merges, words


def bpe_apply(
    df: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Tokenize text with a trained merge table: per-word char split,
    then each merge folds in rank order as a stepwise column rewrite —
    all in-row expressions, map-only (the tokenizer serving path)."""
    out = df.select(
        "*", F.explode(F.split(F.col(text_col), " ")).alias("__w")
    ).where(F.length("__w") > 0)
    out = out.withColumn("syms", F.expr(_chars_expr("__w")))
    for a, b in merges:
        out = out.withColumn("syms", F.expr(_merge_expr(a, b)))
    return out


# -------------------------------------------------------- local reference
def bpe_train_local(
    word_freq: dict[str, int], n_merges: int = 8
) -> tuple[list[tuple[str, str]], dict[str, list[str]]]:
    """Pure-Python single-node BPE — the differential reference the
    distributed trainer must match exactly (same tiebreak)."""
    words = {w: list(w) for w in word_freq}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            f = word_freq[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
        merges.append(best)
        a, b = best
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words
