"""Retrieval parity queries: BM25, hybrid rank fusion, RAG chunking.

Scores are doubles built from exact integers (tf, df, N, ranks,
exact-integer token sums) through expression trees mirrored verbatim
in the DuckDB oracles, rounded with fround before ranking, ties on
id — the same portability discipline as q_tfidf_terms.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from huckli_spark.functions.portable import fround, sql_fround
from huckli_spark.operators import retrieval as rt
from huckli_spark.operators.simsearch import cosine
from huckli_spark.queries import query

BM25_TERMS = ["spark", "join", "filter"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


# ------------------------------------------------------------------- BM25
@query(
    "q_bm25_topk",
    f"""
    WITH {rt.sql_bm25("SELECT doc_id, text FROM documents", BM25_TERMS)}
    SELECT doc_id, score_bm25, CAST(rnk AS INT) AS rank FROM (
      SELECT doc_id, score_bm25,
             row_number() OVER (ORDER BY score_bm25 DESC, doc_id) AS rnk
      FROM bm
    ) WHERE rnk <= 10
    """,
    doc="Okapi BM25 top-10 for the query terms "
    f"{BM25_TERMS} (k1=1.2, b=0.75): per-doc term frequencies are "
    "in-row filter() counts (map-only), corpus stats (N, exact-"
    "integer-sum avgdl, per-term df) reduce to ONE broadcast row — "
    "the lexical half of hybrid retrieval with no inverted index "
    "materialized. At 100 TB the scoring pass is a single corpus "
    "scan + singleton broadcast; the top-k is a bounded window.",
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    bm = rt.bm25_score(_docs(spark, sf_dir), BM25_TERMS)
    w = Window.orderBy(F.desc("score_bm25"), F.asc("doc_id"))
    return (
        bm.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 10)
        .select("doc_id", "score_bm25", "rank")
    )


# ------------------------------------------------- reciprocal-rank fusion
_COS = (
    "list_dot_product(qv, nv)"
    " / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv)))"
)


@query(
    "q_rrf_fusion",
    f"""
    WITH {rt.sql_bm25("SELECT doc_id, text FROM documents", BM25_TERMS)},
    lex AS (
      SELECT doc_id, row_number() OVER (ORDER BY score_bm25 DESC, doc_id)
               AS rank
      FROM bm QUALIFY rank <= 50
    ), q AS (
      SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
    ), sims AS (
      SELECT vec_id AS doc_id, {sql_fround(_COS, 6)} AS cos_sim
      FROM (SELECT vec_id, embedding::DOUBLE[] AS nv
            FROM embeddings WHERE vec_id <> 0) CROSS JOIN q
    ), vec AS (
      SELECT doc_id, row_number() OVER (ORDER BY cos_sim DESC, doc_id)
               AS rank
      FROM sims QUALIFY rank <= 50
    ), fused AS (
      SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
             {sql_fround(
                 'coalesce(1.0 / (60 + lex.rank), 0.0)'
                 ' + coalesce(1.0 / (60 + vec.rank), 0.0)', 9)}
               AS rrf_score
      FROM lex FULL OUTER JOIN vec ON vec.doc_id = lex.doc_id
    )
    SELECT doc_id, rrf_score, CAST(rnk AS INT) AS rank FROM (
      SELECT doc_id, rrf_score,
             row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rnk
      FROM fused
    ) WHERE rnk <= 10
    """,
    doc="hybrid retrieval: BM25 top-50 (lexical) fused with cosine "
    "top-50 against the vec_id=0 query embedding (vector) by "
    "reciprocal-rank fusion (k=60) — the standard zero-tuning "
    "combiner for hybrid search. Rank lists are bounded (top-n), so "
    "the fusion join is broadcast-sized at any corpus scale; scores "
    "are 1/(k+rank) sums over exact integer ranks in fixed order.",
)
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, emb = _docs(spark, sf_dir), _emb(spark, sf_dir)
    wl = Window.orderBy(F.desc("score_bm25"), F.asc("doc_id"))
    lex = (
        rt.bm25_score(docs, BM25_TERMS)
        .withColumn("rank", F.row_number().over(wl))
        .where(F.col("rank") <= 50)
        .select("doc_id", "rank")
    )
    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("__qv"))
    sims = (
        emb.where(F.col("vec_id") != 0)
        .select(F.col("vec_id").alias("doc_id"), F.col("embedding").alias("__nv"))
        .crossJoin(F.broadcast(q))
        .select("doc_id", fround(cosine("__qv", "__nv"), 6).alias("cos_sim"))
    )
    wv = Window.orderBy(F.desc("cos_sim"), F.asc("doc_id"))
    vec = (
        sims.withColumn("rank", F.row_number().over(wv))
        .where(F.col("rank") <= 50)
        .select("doc_id", "rank")
    )
    fused = rt.rrf_fuse(lex, vec)
    wf = Window.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(wf).cast("int"))
        .where(F.col("rank") <= 10)
        .select("doc_id", "rrf_score", "rank")
    )


# ------------------------------------------------------- RAG chunk windows
@query(
    "q_chunk_windows",
    """
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS __w FROM documents
      WHERE len(string_split(text, ' ')) > 0
    ), starts AS (
      SELECT doc_id, __w, unnest(range(0, len(__w), 30)) AS start_tok
      FROM w
    )
    SELECT doc_id,
           CAST(start_tok // 30 AS INT) AS chunk_idx,
           CAST(start_tok AS INT) AS start_tok,
           CAST(len(__w[start_tok + 1 : start_tok + 40]) AS INT) AS n_tok,
           array_to_string(__w[start_tok + 1 : start_tok + 40], ' ')
             AS chunk_text
    FROM starts
    """,
    doc="RAG chunking: overlapping 40-token windows at stride 30 "
    "(10-token overlap), deterministic (doc_id, chunk_idx) keys, the "
    "short final windows kept so every token is covered. Map-only: "
    "the start-offset sequence explodes in-row — a 100 TB corpus "
    "chunks in one scan with zero shuffle. chunk_text itself is "
    "hash-gated, so the slicing arithmetic is pinned end to end.",
)
def q_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = rt.chunk_windows(_docs(spark, sf_dir), window=40, stride=30)
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("int"),
        F.col("start_tok").cast("int"),
        F.col("n_tok").cast("int"),
        "chunk_text",
    )


# --------------------------------------------------- MMR diversification
def _mmr_oracle() -> str:
    micro = (
        "CAST(floor((list_dot_product({a}, {b})"
        " / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b}))))"
        " * 1000000.0 + 0.5) AS BIGINT)"
    )
    parts = [
        """q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 10
    ), c AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings
    ), rel AS (
      SELECT query_id, cid, rel_micro FROM (
        SELECT q.query_id, c.cid,
               """
        + micro.format(a="q.qv", b="c.cv")
        + """ AS rel_micro,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY """
        + micro.format(a="q.qv", b="c.cv")
        + """ DESC, c.cid
               ) AS rn
        FROM q CROSS JOIN c WHERE c.cid <> q.query_id
      ) WHERE rn <= 20
    ), pairs AS (
      SELECT r1.query_id, r1.cid AS a, r2.cid AS b,
             """
        + micro.format(a="ca.cv", b="cb.cv")
        + """ AS sim_micro
      FROM rel r1
      JOIN rel r2 ON r2.query_id = r1.query_id AND r2.cid <> r1.cid
      JOIN c ca ON ca.cid = r1.cid
      JOIN c cb ON cb.cid = r2.cid
    ), s1 AS (
      SELECT query_id, cid, 1 AS mmr_rank, rel_micro AS score_micro
      FROM (
        SELECT query_id, cid, rel_micro,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rel_micro DESC, cid) AS rn
        FROM rel
      ) WHERE rn = 1
    )"""
    ]
    for t in range(2, 6):
        prev_union = " UNION ALL ".join(
            f"SELECT query_id, cid FROM s{i}" for i in range(1, t)
        )
        parts.append(
            f"""sel{t} AS ({prev_union}),
    ms{t} AS (
      SELECT p.query_id, p.a AS cid, max(p.sim_micro) AS maxsim_micro
      FROM pairs p JOIN sel{t} s
        ON s.query_id = p.query_id AND s.cid = p.b
      GROUP BY 1, 2
    ), s{t} AS (
      SELECT query_id, cid, {t} AS mmr_rank, score_micro FROM (
        SELECT r.query_id, r.cid,
               r.rel_micro - m.maxsim_micro AS score_micro,
               row_number() OVER (PARTITION BY r.query_id
                                  ORDER BY r.rel_micro - m.maxsim_micro DESC,
                                           r.cid) AS rn
        FROM rel r
        JOIN ms{t} m ON m.query_id = r.query_id AND m.cid = r.cid
        WHERE NOT EXISTS (
          SELECT 1 FROM sel{t} s
          WHERE s.query_id = r.query_id AND s.cid = r.cid
        )
      ) WHERE rn = 1
    )"""
        )
    final = " UNION ALL ".join(f"SELECT * FROM s{i}" for i in range(1, 6))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
    SELECT query_id, cid, CAST(mmr_rank AS INT) AS mmr_rank, score_micro
    FROM ({final})"""
    )


@query(
    "q_mmr_rerank",
    _mmr_oracle(),
    doc="MMR result diversification (lambda=0.5, k=5 over top-20 "
    "cosine candidates for 10 queries): greedy relevance-minus-"
    "redundancy selection, run entirely on exact micro-integer "
    "similarities with id tiebreaks — every selection step is "
    "bit-portable, and the oracle unrolls the same 5 greedy steps "
    "relationally. Scale: candidates are top-n bounded per query, so "
    "each of the k dataflow stages moves O(queries x n) rows; no "
    "driver loop touches data, no UDF.",
)
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = _emb(spark, sf_dir)
    q = em.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qv")
    )
    c = em.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("__nv"))
    micro = F.floor(cosine("__qv", "__nv") * 1000000.0 + 0.5).cast("bigint")
    w = Window.partitionBy("query_id").orderBy(F.desc("rel_micro"), F.asc("cid"))
    cand = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("cid") != F.col("query_id"))
        .select("query_id", "cid", micro.alias("rel_micro"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 20)
        .select("query_id", "cid", "rel_micro")
    )
    ca = c.select(F.col("cid").alias("a"), F.col("__nv").alias("__qv"))
    cb = c.select(F.col("cid").alias("b"), F.col("__nv"))
    pair = (
        cand.select("query_id", F.col("cid").alias("a"))
        .join(
            cand.select(F.col("query_id").alias("__q2"), F.col("cid").alias("b")),
            F.col("query_id") == F.col("__q2"),
        )
        .where(F.col("a") != F.col("b"))
        .join(ca, "a")
        .join(cb, "b")
        .select(
            "query_id", "a", "b",
            F.floor(cosine("__qv", "__nv") * 1000000.0 + 0.5)
            .cast("bigint").alias("sim_micro"),
        )
    )
    out = rt.mmr_rerank(cand, pair, k=5)
    return out.select(
        "query_id", "cid", F.col("mmr_rank").cast("int"), "score_micro"
    )


# ------------------------------------------------- hard-negative mining
@query(
    "q_hard_negatives",
    f"""
    WITH {rt.sql_bm25("SELECT doc_id, text FROM documents", BM25_TERMS)},
    lex AS (
      SELECT doc_id, score_bm25,
             row_number() OVER (ORDER BY score_bm25 DESC, doc_id) AS lex_rank
      FROM bm QUALIFY lex_rank <= 20
    ), q AS (
      SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
    ), sims AS (
      SELECT vec_id AS doc_id, {sql_fround(_COS, 6)} AS cos_sim
      FROM (SELECT vec_id, embedding::DOUBLE[] AS nv
            FROM embeddings WHERE vec_id <> 0) CROSS JOIN q
    ), gold AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS rn
        FROM sims
      ) WHERE rn <= 5
    )
    SELECT lex.doc_id, lex.score_bm25,
           CAST(lex.lex_rank AS INT) AS lex_rank,
           coalesce(sims.cos_sim, 0.0) AS cos_sim
    FROM lex
    LEFT JOIN sims ON sims.doc_id = lex.doc_id
    WHERE lex.doc_id NOT IN (SELECT doc_id FROM gold)
    """,
    doc="hard-negative mining for retrieval training pairs: documents "
    "that rank top-20 LEXICALLY (BM25) but are NOT in the semantic "
    "gold set (exact cosine top-5 for the query embedding) — the "
    "lexically-plausible-but-wrong examples contrastive training "
    "needs. Pure composition of the gated BM25 + cosine rankers with "
    "a bounded anti-join; at 100 TB both rank lists are top-n "
    "bounded, so mining negatives per query moves O(n) rows.",
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, emb = _docs(spark, sf_dir), _emb(spark, sf_dir)
    wl = Window.orderBy(F.desc("score_bm25"), F.asc("doc_id"))
    lex = (
        rt.bm25_score(docs, BM25_TERMS)
        .withColumn("lex_rank", F.row_number().over(wl).cast("int"))
        .where(F.col("lex_rank") <= 20)
    )
    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("__qv"))
    sims = (
        emb.where(F.col("vec_id") != 0)
        .select(F.col("vec_id").alias("doc_id"), F.col("embedding").alias("__nv"))
        .crossJoin(F.broadcast(q))
        .select("doc_id", fround(cosine("__qv", "__nv"), 6).alias("cos_sim"))
    )
    wv = Window.orderBy(F.desc("cos_sim"), F.asc("doc_id"))
    gold = (
        sims.withColumn("rn", F.row_number().over(wv))
        .where(F.col("rn") <= 5)
        .select("doc_id")
    )
    return (
        lex.join(gold, "doc_id", "left_anti")
        .join(sims, "doc_id", "left")
        .select(
            "doc_id",
            "score_bm25",
            "lex_rank",
            F.coalesce(F.col("cos_sim"), F.lit(0.0)).alias("cos_sim"),
        )
    )
