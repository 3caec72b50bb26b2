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
from pyspark.sql import functions as F

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


def sql_simhash_sig_ctes(pre: str = "", where: str = "") -> str:
    """CTEs {pre}sig(doc_id, simhash): the 60-bit text-SimHash
    DuckDB replay — ONE generator behind q_dedup_simhash's oracle
    and the cross-modal composition (multimodal_parity), so the two
    can never drift (the ADVICE r09 #3 discipline applied to the
    signature itself). ``where`` restricts the document source
    (e.g. the paired-subset cut)."""
    bits = sketch.SIMHASH_BITS
    sums = ",\n             ".join(
        f"sum(((h >> {j}) & 1) * 2 - 1) AS s{j}" for j in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(bits)
    )
    return f"""{pre}w AS (
      SELECT DISTINCT doc_id, w FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents {where}
      )
    ), {pre}h AS (
      SELECT doc_id, {sql_h60('w')} AS h FROM {pre}w
    ), {pre}sums AS (
      SELECT doc_id, {sums}
      FROM {pre}h GROUP BY doc_id
    ), {pre}sig AS (
      SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM {pre}sums
    )"""


def _simhash_oracle() -> str:
    return f"""
    WITH {sql_simhash_sig_ctes()}
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


# ------------------------------------------------------------ portable HLL
# HyperLogLog with ENGINE-PORTABLE registers: q_kmv_distinct's doc
# calls native HLL "engine-specific, rows-only gate" — this query
# removes that caveat by building the registers from the shared md5
# hash with pure string/integer ops, so the sketch itself (and the
# estimate derived from it) hash-matches the oracle. m=64 buckets
# (p=6, from the first two hex chars), rank rho = leading zero BITS of
# the 52-bit suffix + 1, computed nibble-wise: 4 bits per leading '0'
# hex char plus a CASE on the first non-zero nibble. The harmonic sum
# is the exact BIGINT sum of 2^(53-rho) (zero registers contribute
# 2^53), so only the final alpha*m^2/S division — and the rare
# linear-counting ln() branch — touch doubles.
_HLL_M = 64
_HLL_ALPHA = 0.709  # alpha_64, Flajolet et al. 2007
_HLL_POW53 = float(1 << 53)


def _sql_hll_rho(suffix: str) -> str:
    stripped = f"ltrim({suffix}, '0')"
    return f"""CASE WHEN {stripped} = '' THEN 53
      ELSE (13 - length({stripped})) * 4
           + CASE WHEN substr({stripped}, 1, 1) IN ('8','9','a','b','c','d','e','f') THEN 0
                  WHEN substr({stripped}, 1, 1) IN ('4','5','6','7') THEN 1
                  WHEN substr({stripped}, 1, 1) IN ('2','3') THEN 2
                  ELSE 3 END
           + 1 END"""


@query(
    "q_hll_registers",
    f"""
    WITH h AS (
      SELECT l_returnflag, md5('hll:' || CAST(l_orderkey AS VARCHAR)) AS hx
      FROM lineitem
    ), r AS (
      SELECT l_returnflag,
             CAST(('0x' || substr(hx, 1, 2)) AS BIGINT) % {_HLL_M} AS bucket,
             {_sql_hll_rho("substr(hx, 3, 13)")} AS rho
      FROM h
    ), regs AS (
      SELECT l_returnflag, bucket, max(rho) AS register
      FROM r GROUP BY 1, 2
    ), s AS (
      SELECT l_returnflag,
             count(*) AS n_buckets,
             CAST(sum(CAST(power(2.0, 53 - register) AS BIGINT)) AS BIGINT)
               + ({_HLL_M} - count(*)) * CAST(9007199254740992 AS BIGINT)
               AS harm,
             {_HLL_M} - count(*) AS zeros
      FROM regs GROUP BY 1
    ), ex AS (
      SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_exact FROM lineitem
      GROUP BY 1
    )
    SELECT s.l_returnflag,
           CAST(s.n_buckets AS BIGINT) AS n_buckets,
           CAST(ex.n_exact AS BIGINT) AS n_exact,
           {sql_fround(
               f'CASE WHEN {_HLL_ALPHA}e0 * {_HLL_M * _HLL_M} * {_HLL_POW53:.1f}'
               f' / s.harm <= 2.5 * {_HLL_M} AND s.zeros > 0'
               f' THEN {_HLL_M} * ln({_HLL_M} * 1.0 / s.zeros)'
               f' ELSE {_HLL_ALPHA}e0 * {_HLL_M * _HLL_M} * {_HLL_POW53:.1f}'
               f' / s.harm END', 2
           )} AS hll_estimate
    FROM s JOIN ex USING (l_returnflag)
    """,
    doc="HyperLogLog distinct-count sketch with engine-portable "
    "registers (m=64): bucket and rank both derive from the shared "
    "md5 hex, the harmonic mean accumulates as an EXACT integer sum "
    "of powers of two, and the small-range linear-counting branch is "
    "implemented per the published algorithm. Scale: registers are "
    "the whole shuffle — at most |groups| x 64 rows regardless of "
    "input size, mergeable across partitions/streams (max is "
    "associative), which is why HLL is the 100 TB cardinality "
    "workhorse. Estimate accuracy ~1.04/sqrt(64) = 13%, asserted "
    "against n_exact in tests.",
)
def q_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: F401  (module convention)

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    hx = F.md5(F.concat(F.lit("hll:"), F.col("l_orderkey").cast("string")))
    # TRIM(LEADING) is a plain JVM string op — measured 2.3x cheaper
    # than the equivalent regexp_replace('^0+') at sf0.1, same output
    stripped = F.expr("trim(LEADING '0' FROM substring(hx, 3, 13))")
    first = F.substring(stripped, 1, 1)
    rho = (
        F.when(stripped == "", F.lit(53))
        .otherwise(
            (13 - F.length(stripped)) * 4
            + F.when(first.isin(*"89abcdef"), 0)
            .when(first.isin(*"4567"), 1)
            .when(first.isin("2", "3"), 2)
            .otherwise(3)
            + 1
        )
    )
    r = li.select("l_returnflag", hx.alias("hx")).select(
        "l_returnflag",
        (
            F.conv(F.substring("hx", 1, 2), 16, 10).cast("long") % _HLL_M
        ).alias("bucket"),
        rho.alias("rho"),
    )
    regs = r.groupBy("l_returnflag", "bucket").agg(F.max("rho").alias("register"))
    s = regs.groupBy("l_returnflag").agg(
        F.count("*").alias("n_buckets"),
        (
            F.sum(F.pow(F.lit(2.0), 53 - F.col("register")).cast("long"))
            + (_HLL_M - F.count("*")) * F.lit(1 << 53)
        ).alias("harm"),
        (_HLL_M - F.count("*")).alias("zeros"),
    )
    ex = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("n_exact")
    )
    raw = F.lit(_HLL_ALPHA * _HLL_M * _HLL_M) * F.lit(_HLL_POW53) / F.col("harm")
    est = F.when(
        (raw <= 2.5 * _HLL_M) & (F.col("zeros") > 0),
        F.lit(float(_HLL_M)) * F.log(_HLL_M * 1.0 / F.col("zeros")),
    ).otherwise(raw)
    return s.join(ex, "l_returnflag").select(
        "l_returnflag",
        F.col("n_buckets").cast("long").alias("n_buckets"),
        F.col("n_exact").cast("long").alias("n_exact"),
        fround(est, 2).alias("hll_estimate"),
    )
