"""MinHash-LSH and SimHash parity queries with full SQL oracles.

The sketches are engine-portable by construction (md5-based 60-bit
hashing — see operators/sketch.py), so even the probabilistic LSH
candidate sets are bit-identical between the Spark operator and the
DuckDB oracle; the correctness gate covers the whole sketch pipeline,
not just the verified output.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from huckli_spark.functions.portable import fround, sql_fround, sql_h60
from huckli_spark.operators import sketch
from huckli_spark.queries import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _minhash_common_ctes() -> str:
    """Shared WITH-clause body: shingles -> hashes -> K-permutation
    signatures -> band sigs -> LSH candidates -> sizes/intersections.
    One source of truth for MINHASH_P/K/BANDS/ROWS and the permutation
    formula — both minhash oracles append their own SELECT tail."""
    p = sketch.MINHASH_P
    mins = ",\n             ".join(
        f"min((h * {2 * k + 3} + {7919 * k + 1}) % {p}) AS mh{k}"
        for k in range(sketch.MINHASH_K)
    )
    band_selects = []
    for band in range(sketch.MINHASH_BANDS):
        cols = [f"mh{band * sketch.MINHASH_ROWS + r}" for r in range(sketch.MINHASH_ROWS)]
        concat = " || ',' || ".join(cols)
        band_selects.append(
            f"SELECT doc_id, {band} AS band, {sql_h60(concat)} AS band_sig FROM sig"
        )
    bands = "\n      UNION ALL\n      ".join(band_selects)
    return f"""words AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) AS pos,
             unnest(string_split(text, ' ')) AS w
      FROM documents
    ), sh AS (
      SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
      FROM words a
      JOIN words b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      JOIN words c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
    ), h AS (
      SELECT doc_id, {sql_h60('shingle')} % {p} AS h FROM sh
    ), sig AS (
      SELECT doc_id, {mins}
      FROM h GROUP BY doc_id
    ), bands AS (
      {bands}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
                   AND a.doc_id < b.doc_id
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS n_common
      FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    )"""


def _minhash_oracle() -> str:
    return f"""
    WITH {_minhash_common_ctes()}
    SELECT c.d1, c.d2,
           {sql_fround('i.n_common * 1.0 / (s1.n_sh + s2.n_sh - i.n_common)', 4)}
             AS jaccard
    FROM cand c
    JOIN inter i ON i.d1 = c.d1 AND i.d2 = c.d2
    JOIN sizes s1 ON s1.doc_id = c.d1
    JOIN sizes s2 ON s2.doc_id = c.d2
    WHERE i.n_common * 1.0 / (s1.n_sh + s2.n_sh - i.n_common) >= 0.9
    """


@query(
    "q_dedup_minhash",
    _minhash_oracle(),
    doc="MinHash(16)+LSH(4x4) candidates, exact-Jaccard verified at 0.9.",
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketch.minhash_dedup_pairs(_docs(spark, sf_dir), threshold=0.9)


def _minhash_estimate_oracle() -> str:
    agree = " + ".join(
        f"(CASE WHEN a.mh{k} = b.mh{k} THEN 1 ELSE 0 END)"
        for k in range(sketch.MINHASH_K)
    )
    return f"""
    WITH {_minhash_common_ctes()},
    est AS (
      SELECT c.d1, c.d2,
             {sql_fround(f'({agree}) / {float(sketch.MINHASH_K)}', 4)} AS est_jaccard
      FROM cand c
      JOIN sig a ON a.doc_id = c.d1
      JOIN sig b ON b.doc_id = c.d2
    )
    SELECT e.d1, e.d2, e.est_jaccard,
           coalesce(
             {sql_fround('i.n_common * 1.0 / (s1.n_sh + s2.n_sh - i.n_common)', 4)},
             0.0) AS jaccard
    FROM est e
    LEFT JOIN inter i ON i.d1 = e.d1 AND i.d2 = e.d2
    LEFT JOIN sizes s1 ON s1.doc_id = e.d1
    LEFT JOIN sizes s2 ON s2.doc_id = e.d2
    """


@query(
    "q_minhash_estimate",
    _minhash_estimate_oracle(),
    doc="the MinHash ESTIMATOR itself, gated: for every LSH candidate "
    "pair, the signature-agreement fraction (whose expectation is the "
    "true Jaccard) alongside the exact value — estimator quality is an "
    "engine-portable, hash-checked result, not a claim.",
)
def q_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketch.minhash_estimate_pairs(_docs(spark, sf_dir))


def _simhash_oracle() -> str:
    bits = sketch.SIMHASH_BITS
    sums = ",\n             ".join(
        f"sum(((h >> {j}) & 1) * 2 - 1) AS s{j}" for j in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(bits)
    )
    return f"""
    WITH w AS (
      SELECT DISTINCT doc_id, w FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
      )
    ), h AS (
      SELECT doc_id, {sql_h60('w')} AS h FROM w
    ), sums AS (
      SELECT doc_id, {sums}
      FROM h GROUP BY doc_id
    ), sig AS (
      SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM sums
    )
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """


@query(
    "q_dedup_simhash",
    _simhash_oracle(),
    doc="60-bit SimHash pairs within Hamming distance 3 (banded join == "
    "brute force by pigeonhole, so the O(n²) oracle matches exactly).",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketch.simhash_pairs(_docs(spark, sf_dir), max_hamming=3)


@query(
    "q_minhash_recall",
    f"""
    WITH {_minhash_common_ctes()},
    truth AS (
      SELECT i.d1, i.d2
      FROM inter i
      JOIN sizes s1 ON s1.doc_id = i.d1
      JOIN sizes s2 ON s2.doc_id = i.d2
      WHERE i.n_common * 1.0 / (s1.n_sh + s2.n_sh - i.n_common) >= 0.9
    ), hits AS (
      SELECT t.d1, t.d2 FROM truth t JOIN cand c ON c.d1 = t.d1 AND c.d2 = t.d2
    )
    SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
           CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST((SELECT count(*) FROM hits) AS BIGINT) AS n_hits,
           {sql_fround(
               'CASE WHEN (SELECT count(*) FROM truth) = 0 THEN 1.0 '
               'ELSE (SELECT count(*) FROM hits) * 1.0 '
               '/ (SELECT count(*) FROM truth) END', 4
           )} AS recall
    """,
    doc="sketch-quality evaluation (the dedup twin of q_ann_recall): "
    "recall of the MinHash-LSH candidate set against the exact-Jaccard "
    "ground truth at threshold 0.9, plus the candidate volume that "
    "bought it. Both sides and the recall arithmetic are deterministic "
    "and engine-portable, so the evaluation itself is hash-gated — "
    "the production monitoring op for tuning bands/rows against a "
    "corpus sample.",
)
def q_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from huckli_spark.operators import dedup
    from huckli_spark.operators.cache import eager_release, persist_scope

    docs = _docs(spark, sf_dir)
    with persist_scope() as s:
        truth = dedup.jaccard_pairs(docs, threshold=0.9, scope=s).select("d1", "d2")
        cand = sketch.minhash_candidates(docs, scope=s)
        hits = truth.join(cand, ["d1", "d2"], "inner")
        out = (
            truth.agg(F.count("*").alias("n_true"))
            .crossJoin(cand.agg(F.count("*").alias("n_candidates")))
            .crossJoin(hits.agg(F.count("*").alias("n_hits")))
            .select(
                "n_true",
                "n_candidates",
                "n_hits",
                fround(
                    F.when(F.col("n_true") == 0, 1.0).otherwise(
                        F.col("n_hits") * 1.0 / F.col("n_true")
                    ),
                    4,
                ).alias("recall"),
            )
        )
        return eager_release(out)
