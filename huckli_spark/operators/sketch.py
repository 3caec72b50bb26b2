"""Sketch-based near-duplicate detection: MinHash+LSH and SimHash.

Both sketches are fully deterministic and engine-portable: the base
hash is the 60-bit md5 prefix (functions.portable.h60), so the DuckDB
oracles in queries/dedup_sketch.py compute bit-identical signatures.

Scale design (100 TB):
- Signatures are one map stage + one groupBy(doc) — the only wide op.
- Candidate generation joins on (band, signature) buckets, never on
  raw content: shuffle volume is O(#docs × #bands), independent of
  document size.
- MinHash verification re-computes exact Jaccard for candidates only
  (semi-join pushdown on the shingle table).
- SimHash banding is exact, not probabilistic: splitting a 16-bit
  signature into 4 chunks guarantees (pigeonhole) that any pair within
  Hamming distance 3 shares a chunk — banded output == brute force.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from huckli_spark.functions.portable import fround, h60
from huckli_spark.operators.dedup import shingles

# MinHash parameters — mirrored verbatim in the SQL oracle.
MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
MINHASH_K = 16
MINHASH_BANDS = 4
MINHASH_ROWS = 4  # K = BANDS * ROWS


def _perm_params(k: int) -> tuple[int, int]:
    """Fixed odd multiplier / offset per permutation (deterministic,
    coprime-ish with P; magnitudes keep a*h < 2^63)."""
    return (2 * k + 3, 7_919 * k + 1)


def _signature_from_hashes(hashed: DataFrame, id_col: str) -> DataFrame:
    aggs = []
    for k in range(MINHASH_K):
        a, b = _perm_params(k)
        aggs.append(F.min((F.col("h") * a + b) % MINHASH_P).alias(f"mh{k}"))
    return hashed.groupBy(id_col).agg(*aggs)


def minhash_signature(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, mh0..mh{K-1}) MinHash signature over word-n-gram shingles."""
    sh = shingles(df, id_col, text_col, n=n)
    return _signature_from_hashes(
        sh.select(F.col(id_col), (h60(F.col("shingle")) % MINHASH_P).alias("h")), id_col
    )


def minhash_bands(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, band, band_sig) — md5 over each band's row values."""
    parts = []
    for band in range(MINHASH_BANDS):
        cols = [f"mh{band * MINHASH_ROWS + r}" for r in range(MINHASH_ROWS)]
        parts.append(
            sig.select(
                F.col(id_col),
                F.lit(band).alias("band"),
                F.md5(F.concat_ws(",", *cols)).alias("band_sig"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _candidates_from_bands(bands: DataFrame, id_col: str) -> DataFrame:
    a = bands.select(F.col(id_col).alias("d1"), "band", "band_sig")
    b = bands.select(F.col(id_col).alias("d2"), "band", "band_sig")
    return (
        a.join(b, ["band", "band_sig"])
        .where(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )


def minhash_candidates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct candidate pairs (d1 < d2) sharing any LSH band bucket."""
    bands = minhash_bands(minhash_signature(df, id_col, text_col, n), id_col)
    return _candidates_from_bands(bands, id_col)


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.9,
) -> DataFrame:
    """MinHash-LSH near-dup pipeline: candidates from band buckets,
    then exact-Jaccard verification restricted to candidates.
    Returns (d1, d2, jaccard) with jaccard >= threshold."""
    # one shared shingle relation for signature, sizes, and verification
    # (persisted: three consumers, one scan+explode+distinct)
    sh = shingles(df, id_col, text_col, n=n).persist()
    # signature is one narrow row per doc and feeds 4 band projections
    sig = _signature_from_hashes(
        sh.select(F.col(id_col), (h60(F.col("shingle")) % MINHASH_P).alias("h")), id_col
    ).persist()
    cand = _candidates_from_bands(minhash_bands(sig, id_col), id_col).persist()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))

    # verification: restrict both shingle sides to candidate docs first
    # (at scale the candidate set is a tiny fraction of the corpus, so
    # the verify self-join touches almost nothing)
    cand_ids = cand.select(F.col("d1").alias(id_col)).union(
        cand.select(F.col("d2").alias(id_col))
    ).distinct()
    sh_c = sh.join(F.broadcast(cand_ids), id_col, "left_semi")
    a = sh_c.select(F.col(id_col).alias("d1"), "shingle")
    b = sh_c.select(F.col(id_col).alias("d2"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("d1") < F.col("d2"))
        .join(cand, ["d1", "d2"], "left_semi")
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("n_common"))
    )
    s1 = sizes.select(F.col(id_col).alias("d1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col(id_col).alias("d2"), F.col("n_sh").alias("n2"))
    jac = F.col("n_common") * 1.0 / (F.col("n1") + F.col("n2") - F.col("n_common"))
    return (
        inter.join(s1, "d1")
        .join(s2, "d2")
        .where(jac >= threshold)
        .select("d1", "d2", fround(jac, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
SIMHASH_BITS = 16


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash) — 16-bit SimHash over distinct lowercase words.
    Bit j is set iff sum over words of (2*bit_j(h60(word)) - 1) > 0."""
    w = df.select(
        F.col(id_col), F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("w")
    )
    hashed = w.select(F.col(id_col), h60(F.col("w")).alias("h"))
    aggs = [
        F.sum((F.shiftright(F.col("h"), j).bitwiseAND(1)) * 2 - 1).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    sums = hashed.groupBy(id_col).agg(*aggs)
    sig = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig + term
    return sums.select(F.col(id_col), sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs within Hamming distance ``max_hamming``, via exact
    pigeonhole banding: 4 chunks of 4 bits — any pair with <= 3
    differing bits shares at least one chunk, so the banded join loses
    nothing vs brute force (and the brute-force SQL oracle matches)."""
    sig = simhash(df, id_col, text_col).persist()  # 4 chunk projections
    n_chunks = 4
    chunk_bits = SIMHASH_BITS // n_chunks
    parts = []
    for c in range(n_chunks):
        chunk = F.shiftright(F.col("simhash"), c * chunk_bits).bitwiseAND(
            (1 << chunk_bits) - 1
        )
        parts.append(
            sig.select(F.col(id_col), F.col("simhash"), F.lit(c).alias("chunk_id"), chunk.alias("chunk"))
        )
    bands = parts[0]
    for p in parts[1:]:
        bands = bands.unionByName(p)
    a = bands.select(F.col(id_col).alias("d1"), F.col("simhash").alias("h1"), "chunk_id", "chunk")
    b = bands.select(F.col(id_col).alias("d2"), F.col("simhash").alias("h2"), "chunk_id", "chunk")
    cand = (
        a.join(b, ["chunk_id", "chunk"])
        .where(F.col("d1") < F.col("d2"))
        .select("d1", "d2", "h1", "h2")
        .distinct()
    )
    ham = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return (
        cand.withColumn("hamming", ham.cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("d1", "d2", "hamming")
    )
