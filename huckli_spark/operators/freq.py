"""Count-min sketch: bounded-memory frequency estimation.

Exact per-item counts over a 100 TB corpus need a shuffle keyed by
item — fine once, but continuous pipelines (per-hour heavy hitters,
token-frequency monitors) want a *mergeable, fixed-size* summary. The
count-min sketch is the standard answer: a d x w counter matrix;
item x increments one counter per row (bucket = hash_i(x)); the
estimate is the MIN over its d counters — always >= the true count,
with overestimate bounded by N*e/w at probability 1-(1/2)^d.

Everything is portable integer arithmetic over the md5-based h60
hash, so the DuckDB oracle rebuilds the identical sketch and the gate
hashes estimates AND their overestimation error. Sketch rows are
(row, bucket, cnt) — trivially mergeable by summing matching cells
(the merge-equals-rebuild property is unit-tested), which is what
makes it the streaming/rollup-friendly counterpart to exact topk.

Scale shape: the build is one groupBy over d x w cells — output
bounded at d*w rows no matter the input cardinality; the probe joins
each query item's d cells against the (broadcastable) sketch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from huckli_spark.functions.portable import h60, sql_h60

CMS_D = 4
CMS_W = 256


def _bucket(key: Column, row: int, w: int) -> Column:
    return F.pmod(h60(F.concat(F.lit(f"cm{row}:"), key)), F.lit(w))


def cms_build(
    df: DataFrame, key_col: str, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Build the sketch: (row, bucket, cnt), at most d*w rows."""
    cells = F.array(
        *[
            F.struct(F.lit(r).alias("row"), _bucket(F.col(key_col), r, w).alias("bucket"))
            for r in range(d)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .select("c.row", "c.bucket")
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    items: DataFrame,
    sketch: DataFrame,
    key_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
    out_col: str = "est",
) -> DataFrame:
    """Append the count-min estimate for every item (min over d cells).

    ``d``/``w`` MUST match the build call — mismatched geometry reads
    the wrong cells and can UNDERestimate, voiding the one-sided error
    guarantee.

    The sketch is broadcast (<= d*w rows); absent cells count 0 —
    reachable only for items never inserted, where 0 is exact.
    """
    probes = F.array(
        *[
            F.struct(F.lit(r).alias("row"), _bucket(F.col(key_col), r, w).alias("bucket"))
            for r in range(d)
        ]
    )
    e = items.select(F.col(key_col), F.explode(probes).alias("c")).select(
        key_col, "c.row", "c.bucket"
    )
    j = e.join(F.broadcast(sketch), ["row", "bucket"], "left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0))
    )
    return j.groupBy(key_col).agg(F.min("cnt").alias(out_col))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (d, w): cell-wise sum."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Top-k items by count-min estimate, with exact counts alongside.

    Output (key, est, true_cnt, overestimate) — the overestimate
    column IS the sketch-quality evaluation, and est >= true_cnt is a
    structural invariant. Candidate set = distinct keys (on a real
    stream the candidates come from a Misra-Gries-style running list;
    here the point is the sketch arithmetic, which the oracle must
    reproduce exactly).
    """
    from pyspark.sql import Window

    sketch = cms_build(df, key_col, d, w)
    truth = df.groupBy(key_col).agg(F.count("*").alias("true_cnt"))
    est = cms_estimate(truth.select(key_col), sketch, key_col, d, w)
    scored = truth.join(est, key_col).select(
        key_col,
        "est",
        "true_cnt",
        (F.col("est") - F.col("true_cnt")).alias("overestimate"),
    )
    # distributed top-k first (TakeOrderedAndProject — no global sort),
    # then rank the k survivors with a window over k rows only
    top = scored.orderBy(F.desc("est"), F.asc(key_col)).limit(k)
    rk = F.row_number().over(Window.orderBy(F.desc("est"), F.asc(key_col)))
    return top.withColumn("rnk", rk)


# ------------------------------------------------------------------ SQL twins
def sql_cms_bucket(expr: str, row: int, w: int) -> str:
    seeded = f"'cm{row}:' || ({expr})"
    return f"{sql_h60(seeded)} % {w}"


def sql_cms_build_cte(key_query: str, d: int = CMS_D, w: int = CMS_W) -> str:
    """CTE body producing (row, bucket, cnt) identical to cms_build.
    ``key_query`` must yield one column named ``key``."""
    arms = " UNION ALL ".join(
        f"SELECT {r} AS row, {sql_cms_bucket('key', r, w)} AS bucket FROM src"
        for r in range(d)
    )
    return f"""
      WITH src AS ({key_query}), cells AS ({arms})
      SELECT row, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2
    """
