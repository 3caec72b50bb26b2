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
    """(word, freq): the corpus collapsed for BPE statistics.
    fan_out: the explode is the corpus-sized map stage (the
    word_table/shingle_array discipline; no-op on wide layouts)."""
    from huckli_spark.operators.parallel import fan_out

    return (
        fan_out(df.select(F.col(text_col)))
        .select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
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
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    checkpoint_every: int = 10,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Train ``n_merges`` BPE merges. Returns (merge table in rank
    order, final (word, syms, freq) DataFrame).

    Real tokenizers run thousands of merges, but ``persist`` only
    truncates RECOMPUTATION — the logical plan still deepens by one
    ``_merge_expr`` projection per merge, and each level references
    ``syms`` ~6 times, so Catalyst's plan handling (canonicalization
    for cache lookup, UI plan strings) blows up superlinearly:
    measured on the sf0.01 fixture, 15 uncheckpointed merges took
    47 s and 20 merges OOMed an 8 GiB driver outright.
    ``localCheckpoint`` every ``checkpoint_every`` merges CUTS the
    lineage (the PCA / PageRank / BFS discipline in this repo),
    bounding plan depth by the interval regardless of merge count —
    30 merges in 8 s at interval 10, flat per-merge wall to 300
    (SCALE_PROBE_bpe_merges.json). The checkpointed blocks double as
    the persisted copy. Merge OUTPUT is unchanged — tests pin
    local-reference equality across checkpoint boundaries."""
    words = word_freqs(df, text_col).select(
        "word", F.expr(_chars_expr("word")).alias("syms"), "freq"
    )
    words = words.persist()
    words.count()
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
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
        )
        if (i + 1) % checkpoint_every == 0:
            nxt = nxt.localCheckpoint()  # eager; cuts lineage
        else:
            nxt = nxt.persist()
            nxt.count()
        words.unpersist()
        words = nxt
    return merges, words


def _apply_merges_local(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Leftmost-first non-overlapping merge application, rank order —
    the same loop ``bpe_train_local`` uses."""
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_apply(
    df: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Tokenize text with a trained merge table (the tokenizer serving
    path): one Arrow-batched ``mapInPandas`` pass, merges closed over
    (broadcast with the task), per-batch distinct-word memoization.

    Why not in-row JVM expressions: a single merge folds fine (the
    trainer does exactly that per iteration), but CHAINING n merge
    folds nests an expression that references its input ~5x per level
    — Catalyst's projection collapse inlines it to 5^n nodes and
    analysis blows up long before execution (measured: 8 merges never
    finished planning). A rank-ordered merge loop is inherently
    sequential per word; Python-per-Arrow-batch with memoization is
    the honest scale shape (production swaps in a native tokenizer
    behind this same seam). Map-only: zero shuffle, corpus never
    moves."""
    import pandas as pd

    out_schema = (
        f"{', '.join(f'{f.name} {f.dataType.simpleString()}' for f in df.schema.fields)},"
        " __w string, syms array<string>"
    )
    cols = [f.name for f in df.schema.fields]

    def run(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                vals = dict(zip(cols, rec))
                text = vals[text_col]
                if text is None or (isinstance(text, float)):
                    continue  # null text: no words (matches split(NULL))
                for w in str(text).split(" "):
                    if not w:
                        continue
                    if w not in cache:
                        cache[w] = _apply_merges_local(w, merges)
                    rows.append({**vals, "__w": w, "syms": cache[w]})
            if rows:
                yield pd.DataFrame(rows, columns=cols + ["__w", "syms"])

    return df.mapInPandas(run, out_schema)


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


def sql_bpe_apply(word_query: str, merges: list[tuple[str, str]]) -> str:
    """DuckDB oracle for ``bpe_apply`` over a distinct-word relation —
    an INDEPENDENT formulation on purpose: where the Spark side folds
    each merge in-row (``_merge_expr``'s skip-state machine), the SQL
    replays it relationally as gaps-and-islands: candidate positions
    (s[i]=a AND s[i+1]=b) form islands of consecutive i; greedy
    leftmost non-overlapping = keep the odd-numbered members of each
    island; the following symbol of every kept member is dropped.
    Matching outputs are therefore a true cross-formulation
    differential, not two transcripts of one algorithm.

    ``word_query`` must yield one column ``word``. Returns a full
    SELECT producing (word, pos, token)."""

    def q(s: str) -> str:
        return s.replace("'", "''")

    parts = [
        f"""wt0 AS (
          SELECT word,
                 list_transform(range(1, len(word) + 1), i -> word[i]) AS syms
          FROM ({word_query})
        )"""
    ]
    for k, (a, b) in enumerate(merges):
        parts.append(
            f"""s{k} AS (
          SELECT word, generate_subscripts(syms, 1) AS i, unnest(syms) AS s
          FROM wt{k}
        ), c{k} AS (
          SELECT word, i, s,
                 coalesce(s = '{q(a)}'
                   AND lead(s) OVER (PARTITION BY word ORDER BY i) = '{q(b)}',
                   false) AS cand
          FROM s{k}
        ), g{k} AS (
          SELECT word, i, s, cand,
                 CASE WHEN cand THEN
                   i - row_number() OVER (PARTITION BY word, cand ORDER BY i)
                 END AS grp
          FROM c{k}
        ), m{k} AS (
          SELECT word, i, s,
                 cand AND (row_number()
                   OVER (PARTITION BY word, grp ORDER BY i) % 2 = 1) AS m
          FROM g{k}
        ), wt{k + 1} AS (
          SELECT word,
                 list(CASE WHEN m THEN s || '{q(b)}' ELSE s END ORDER BY i)
                   AS syms
          FROM (
            SELECT word, i, s, m,
                   lag(m, 1, false) OVER (PARTITION BY word ORDER BY i)
                     AS prev_m
            FROM m{k}
          ) WHERE NOT prev_m
          GROUP BY word
        )"""
        )
    last = f"wt{len(merges)}"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT word, CAST(i - 1 AS INT) AS pos, s AS token
        FROM (SELECT word, generate_subscripts(syms, 1) AS i,
                     unnest(syms) AS s
              FROM {last})"""
    )
