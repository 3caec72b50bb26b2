"""Retrieval scoring for training-data and RAG pipelines: BM25,
reciprocal-rank fusion, and token-window chunking.

A corpus engine that dedups/filters documents also has to RANK them —
mining hard negatives, building retrieval training pairs, picking the
context chunks that go into a prompt. The reference delegates all
querying to DuckDB and has no retrieval layer; these operators add it
Spark-first:

- ``bm25_score``: Okapi BM25 over a fixed query-term list. Term
  frequencies are per-row ``size(filter(words, ...))`` expressions
  (map-only); the corpus statistics (N, avgdl, per-term df) reduce to
  ONE broadcast row. No inverted index is materialized — at 100 TB
  the scoring pass stays a single scan + singleton broadcast join.
- ``rrf_fuse``: reciprocal-rank fusion of two rankings (the standard
  hybrid lexical+vector combiner, k=60). Pure rank arithmetic —
  portable because ranks are exact integers and the two 1/(k+r)
  terms are summed in a fixed order.
- ``chunk_windows``: overlapping token windows (RAG chunking).
  Map-only explode of per-document start offsets; deterministic
  chunk ids.

Portability: scores round through ``fround`` before any ranking, ties
break on document id — the discipline every ranked gate query here
uses (see q_tfidf_terms).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from huckli_spark.functions.portable import fround

BM25_K1 = 1.2
BM25_B = 0.75


def _tf_expr(words_col: str, term: str) -> str:
    t = term.replace("'", "''")
    return f"size(filter({words_col}, x -> x = '{t}'))"


def bm25_stats(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ONE-row corpus statistics relation (n, sdl, df0..dfk) — the
    frozen index half of BM25. Computed over the reference corpus
    once; scoring (batch or streaming) broadcasts it."""
    w = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__w")
    ).withColumn("__dl", F.size("__w"))
    aggs = [
        F.count("*").alias("n"),
        F.sum(F.col("__dl").cast("bigint")).alias("sdl"),
    ] + [
        F.sum(
            F.when(F.expr(_tf_expr("__w", t)) > 0, 1).otherwise(0)
        ).alias(f"df{i}")
        for i, t in enumerate(terms)
    ]
    return w.agg(*aggs)


def bm25_score(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    stats: Optional[DataFrame] = None,
) -> DataFrame:
    """(id, score_bm25) for every document with at least one query
    term. Corpus stats (N, avgdl via exact integer token sum, df per
    term) come from one aggregate broadcast as a single row; scoring
    is then map-only. The arithmetic expression shape is mirrored
    exactly by ``sql_bm25`` so both engines produce identical doubles
    before the shared fround.

    ``stats``: pass a precomputed ``bm25_stats`` row to score against
    FROZEN index statistics — the production serving shape (and the
    streaming one: a document stream scores map-only against the
    static broadcast stats; the global aggregate never runs on the
    stream). Default recomputes stats from ``docs``."""
    w = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__w")
    ).withColumn("__dl", F.size("__w"))
    if stats is None:
        stats = bm25_stats(docs, terms, id_col, text_col)
    scored = w.crossJoin(F.broadcast(stats))
    # avgdl = exact integer sum / count — no partition-order float sum
    contribs = []
    for i, t in enumerate(terms):
        tf = _tf_expr("__w", t)
        idf = f"ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5))"
        denom = (
            f"({tf} + {k1!r} * (1.0 - {b!r} + {b!r} * __dl"
            f" / (cast(sdl AS double) / n)))"
        )
        contribs.append(f"({idf} * ({tf} * ({k1!r} + 1.0)) / {denom})")
    return (
        scored.select(
            F.col(id_col),
            fround(F.expr(" + ".join(contribs)), 6).alias("score_bm25"),
        )
        .where(F.col("score_bm25") > 0)
    )


def sql_bm25(
    doc_query: str,
    terms: list[str],
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    """DuckDB CTE text: ``bm(id, score_bm25)`` — the exact expression
    twin of bm25_score. ``doc_query`` must yield (id_col, text)."""

    def tf(i: int) -> str:
        t = terms[i].replace("'", "''")
        return f"len(list_filter(__w, x -> x = '{t}'))"

    dfs = ", ".join(
        f"sum(CASE WHEN {tf(i)} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms))
    )
    contribs = []
    for i in range(len(terms)):
        idf = f"ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5))"
        denom = (
            f"({tf(i)} + {k1!r} * (1.0 - {b!r} + {b!r} * __dl"
            f" / (CAST(sdl AS DOUBLE) / n)))"
        )
        contribs.append(f"({idf} * ({tf(i)} * ({k1!r} + 1.0)) / {denom})")
    from huckli_spark.functions.portable import sql_fround

    score = sql_fround(" + ".join(contribs), 6)
    return f"""w AS (
      SELECT {id_col}, string_split(text, ' ') AS __w,
             len(string_split(text, ' ')) AS __dl
      FROM ({doc_query})
    ), stats AS (
      SELECT count(*) AS n, sum(CAST(__dl AS BIGINT)) AS sdl, {dfs} FROM w
    ), bm AS (
      SELECT * FROM (
        SELECT {id_col}, {score} AS score_bm25
        FROM w CROSS JOIN stats
      ) WHERE score_bm25 > 0
    )"""


RRF_K = 60


def rrf_fuse(
    rank_a: DataFrame,
    rank_b: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = RRF_K,
) -> DataFrame:
    """Fuse two (id, rank) lists: rrf = 1/(k+rank_a) + 1/(k+rank_b),
    absent list contributes 0. Output (id, rrf_score) — callers rank
    with an id tiebreak. Full outer join on id: both lists are top-n
    bounded, so this is broadcast-sized at any corpus scale."""
    a = rank_a.select(F.col(id_col), F.col(rank_col).alias("__ra"))
    bdf = rank_b.select(F.col(id_col), F.col(rank_col).alias("__rb"))
    return a.join(bdf, id_col, "full_outer").select(
        F.col(id_col),
        fround(
            F.coalesce(1.0 / (F.lit(k) + F.col("__ra")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(k) + F.col("__rb")), F.lit(0.0)),
            9,
        ).alias("rrf_score"),
    )


def chunk_windows(
    docs: DataFrame,
    window: int = 40,
    stride: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token windows: chunk c of a document starts at
    token c*stride and spans up to ``window`` tokens (the final
    chunks run short — every token lands in >= 1 chunk; with
    stride < window each interior token lands in ceil(window/stride)
    chunks). Map-only: explode of an in-row start-offset sequence."""
    if not (0 < stride <= window):
        raise ValueError(f"need 0 < stride <= window, got {stride}/{window}")
    w = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__w")
    ).where(F.size("__w") > 0)
    return w.select(
        F.col(id_col),
        F.posexplode(
            F.expr(f"sequence(0, size(__w) - 1, {stride})")
        ).alias("chunk_idx", "start_tok"),
        F.col("__w"),
    ).select(
        F.col(id_col),
        "chunk_idx",
        "start_tok",
        F.expr(f"size(slice(__w, start_tok + 1, {window}))").alias("n_tok"),
        F.expr(
            f"array_join(slice(__w, start_tok + 1, {window}), ' ')"
        ).alias("chunk_text"),
    )


MMR_K = 5
MMR_TOPN = 20


def mmr_rerank(
    cand: DataFrame,
    pair: DataFrame,
    k: int = MMR_K,
) -> DataFrame:
    """Maximal-marginal-relevance re-rank (lambda=0.5): greedily pick
    the candidate maximizing relevance minus its max similarity to the
    already-picked set — the standard result-diversification step after
    ANN retrieval. With lambda=0.5 the argmax of
    0.5*rel - 0.5*maxsim is the argmax of (rel_micro - maxsim_micro),
    so the whole selection runs on EXACT INTEGERS (micro fixed-point)
    with id tiebreaks — bit-portable, PageRank-style.

    ``cand``: (query_id, cid, rel_micro) — the bounded top-n retrieval
    result. ``pair``: (query_id, a, b, sim_micro) for every ordered
    candidate pair a != b of a query. Returns (query_id, cid,
    mmr_rank, score_micro) with score at selection time (rank 1's
    score is its relevance).

    Scale shape: the candidate set is top-n bounded per query (n~20),
    so every step's joins move O(queries * n) rows; the k greedy
    steps unroll as k dataflow stages over the persisted candidate /
    pair relations — no driver loop over data, no UDF."""
    from pyspark.sql import Window

    cand = cand.persist()
    pair = pair.persist()
    w1 = Window.partitionBy("query_id").orderBy(
        F.desc("rel_micro"), F.asc("cid")
    )
    sel = (
        cand.withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") == 1)
        .select(
            "query_id",
            "cid",
            F.lit(1).alias("mmr_rank"),
            F.col("rel_micro").alias("score_micro"),
        )
    )
    for t in range(2, k + 1):
        remaining = cand.join(
            sel.select("query_id", "cid"), ["query_id", "cid"], "left_anti"
        )
        maxsim = (
            pair.join(
                sel.select("query_id", F.col("cid").alias("b")),
                ["query_id", "b"],
            )
            .groupBy("query_id", "a")
            .agg(F.max("sim_micro").alias("maxsim_micro"))
        )
        wt = Window.partitionBy("query_id").orderBy(
            F.desc("score_micro"), F.asc("cid")
        )
        pick = (
            remaining.join(
                maxsim,
                (remaining.query_id == maxsim.query_id)
                & (remaining.cid == maxsim.a),
            )
            .select(
                remaining.query_id,
                "cid",
                (F.col("rel_micro") - F.col("maxsim_micro")).alias(
                    "score_micro"
                ),
            )
            .withColumn("__rn", F.row_number().over(wt))
            .where(F.col("__rn") == 1)
            .select(
                "query_id", "cid", F.lit(t).alias("mmr_rank"), "score_micro"
            )
        )
        sel = sel.unionByName(pick)
    return sel
