"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline; ``lsh_assign`` gives the
scale path (random-hyperplane signatures → candidate buckets). Dot
products run as JVM higher-order functions (zip_with + aggregate in
DOUBLE, sequential left-fold) — deterministic and identical to the
DuckDB oracle's list_dot_product accumulation; no Python in the loop.

Scale design (100 TB corpus, millions of queries):
- queries are broadcast; the corpus side never shuffles for the join.
- top-k uses a window per query id over the candidate set; for huge
  query sets switch to the two-phase per-partition heap variant.
- LSH signatures are computed map-side from deterministic
  md5-seeded hyperplanes; bucket join replaces the cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from huckli_spark.functions.portable import fround


def _as_double(col) -> Column:
    return F.expr(f"transform({col}, x -> cast(x AS double))")


def dot(a: str, b: str) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x AS double) * cast(y AS double)),"
        f" cast(0.0 AS double), (acc, v) -> acc + v)"
    )


def l2_norm(a: str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: str, b: str) -> Column:
    # dot / (|a| * |b|) — mirrored exactly by the SQL oracle
    # (list_dot_product / (sqrt * sqrt)); keep the operand shape in sync.
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, cos_sim, rank); rank is computed on
    the portably-rounded similarity with neighbor-id tiebreak, so
    ordering is deterministic across engines.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nv")
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            fround(cosine("__qv", "__nv"), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """All pairs (d1 < d2) with cosine >= threshold — the exact
    embedding near-dup baseline. O(n²): use ``lsh_assign`` buckets to
    prefilter at scale."""
    a = df.select(F.col(id_col).alias("d1"), F.col(vec_col).alias("__a"))
    b = df.select(F.col(id_col).alias("d2"), F.col(vec_col).alias("__b"))
    return (
        a.crossJoin(b)
        .where(F.col("d1") < F.col("d2"))
        .withColumn("cos_sim", fround(cosine("__a", "__b"), 6))
        .where(F.col("cos_sim") >= threshold)
        .select("d1", "d2", "cos_sim")
    )


def lsh_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    dim: int = 64,
    seed: str = "huckli",
) -> DataFrame:
    """Random-hyperplane LSH signature per vector (deterministic:
    plane components derive from md5(seed, plane, coord), mapped to
    [-1, 1]). Vectors with equal signatures are near-dup candidates;
    join on ``bucket`` replaces the O(n²) cross product."""
    planes = [
        [_md5_unit(seed, p, i) for i in range(dim)] for p in range(n_planes)
    ]
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        arr = "array(" + ", ".join(f"cast({v!r} AS double)" for v in plane) + ")"
        d = F.expr(
            f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> cast(x AS double) * y),"
            f" cast(0.0 AS double), (acc, v) -> acc + v)"
        )
        sig = sig + F.when(d > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return df.select(F.col(id_col), F.col(vec_col), sig.alias("bucket"))


def _md5_unit(seed: str, plane: int, coord: int) -> float:
    """Deterministic pseudo-random value in [-1, 1] from md5."""
    import hashlib

    h = hashlib.md5(f"{seed}:{plane}:{coord}".encode()).hexdigest()
    return int(h[:15], 16) / float(16**15) * 2.0 - 1.0
