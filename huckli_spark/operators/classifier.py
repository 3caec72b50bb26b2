"""Fixed-point logistic-regression text classifier (fastText/CCNet
style quality-domain filter).

LLM pipelines gate raw text with a tiny linear classifier over
bag-of-words features (CCNet's fastText LM-filter, GPT-3's
quality-classifier selection). This is that operator as pure Spark
dataflow, trained by batch gradient descent under the repo's exact
fixed-point discipline (``operators/clustering.py`` precedent):

* Features: binary presence of hashed unigram buckets (portable
  60-bit md5 hash into ``B`` buckets), mean-centered per bucket with
  an exact-integer mean — centering decorrelates the always-on
  common-vocabulary buckets from the bias and cuts the iterations
  needed from ~40 to ~8 (measured on the fixture corpus) — plus an
  uncentered bias term. The per-doc relation is built map-only: the
  bucket-presence set is an in-row array, the dense (doc, dim) rows
  explode from a sequence literal, and membership is an in-row
  array_contains — no join to materialize features.
* Sigmoid: the rational squashing p = 0.5 * (1 + z / (1 + |z|)) —
  plain IEEE-754 +,*,/,abs only, so Spark and DuckDB produce
  bit-identical probabilities (no trust in matching exp()
  implementations across engines).
* Every iteration: z is an exact integer dot product, p floors to
  micro once, the gradient is an exact integer sum, and the weight
  update floors once — so training is bit-identical on any engine,
  partitioning, or executor count, and the DuckDB oracle replays all
  iterations as generated CTEs (``sql_logreg``).

Scale: the feature relation is (B+1) rows per doc (B=64 default —
bounded fan-out, not corpus-quadratic); each GD iteration is a
broadcast join (B+1 weight rows) plus ONE map-combined full-corpus
aggregate down to B+1 gradient cells the driver folds into the next
iteration's weights — the kmeans_fit pattern, with identical 100 TB
behavior (corpus scanned per iteration, never shuffled on a
data-sized key; driver holds B+1 cells). Cache the feature relation
in production to avoid the re-scan per iteration.

Reference parity note: the reference engine has no ML layer; this
extends the LLM-pipeline surface mandated by the project brief.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from huckli_spark.functions.portable import sql_h60

MICRO = 1_000_000
B_DEFAULT = 64  # hash buckets; bias is dim B
LR_DEFAULT = 16.0
ITER_DEFAULT = 8


def logreg_features(
    docs: DataFrame,
    label: F.Column,
    buckets: int = B_DEFAULT,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int | None = None,
) -> DataFrame:
    """(doc_id, y, dim, x_micro): mean-centered binary hashed-unigram
    presence features in exact micro ints, plus the uncentered bias
    row (dim = ``buckets``)."""
    # in-row bucket-presence set; the md5-based h60 hash as a SQL
    # expression so it stays inside whole-stage codegen
    h = "cast(conv(substring(md5(t), 1, 15), 16, 10) AS long)"
    base = docs.select(
        F.col(id_col),
        label.cast("int").alias("y"),
        F.expr(
            f"array_distinct(transform(split({text_col}, ' '),"
            f" t -> int({h} % {buckets})))"
        ).alias("__b"),
    )
    raw = base.select(
        id_col,
        "y",
        F.explode(F.expr(f"sequence(0, {buckets - 1})")).alias("dim"),
        F.col("__b"),
    ).select(
        id_col,
        "y",
        "dim",
        F.when(F.expr("array_contains(__b, dim)"), F.lit(MICRO))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("x_raw"),
    )
    if n is None:
        n = docs.count()
    mu = raw.groupBy("dim").agg(
        F.floor(F.sum("x_raw").cast("double") / F.lit(float(n)) + F.lit(0.5))
        .cast("long")
        .alias("mu")
    )
    centered = raw.join(F.broadcast(mu), "dim").select(
        id_col,
        "y",
        "dim",
        (F.col("x_raw") - F.col("mu")).alias("x_micro"),
    )
    bias = base.select(
        F.col(id_col),
        "y",
        F.lit(buckets).cast("int").alias("dim"),
        F.lit(MICRO).cast("long").alias("x_micro"),
    )
    return centered.unionByName(bias)


def _p_micro(z_int: F.Column) -> F.Column:
    """Rational sigmoid on z = z_int / 1e12, floored to micro."""
    z = z_int.cast("double") / F.lit(1.0e12)
    p = F.lit(0.5) * (F.lit(1.0) + z / (F.lit(1.0) + F.abs(z)))
    return F.floor(p * F.lit(float(MICRO)) + F.lit(0.5)).cast("long")


def _scores(feats: DataFrame, w: list[int], id_col: str) -> DataFrame:
    """(doc_id, y, p_micro) for a fixed weight vector (broadcast)."""
    spark = feats.sparkSession
    # JVM-side LocalRelation (not a Python RDD): the weights are
    # literals, so the scoring plan stays pure codegen + broadcast
    vals = ", ".join(f"({d}, {int(v)}L)" for d, v in enumerate(w))
    wdf = spark.sql(f"SELECT col1 AS dim, col2 AS w FROM VALUES {vals}")
    z = (
        feats.join(F.broadcast(wdf), "dim")
        .groupBy(id_col, "y")
        .agg(F.sum(F.col("w") * F.col("x_micro")).alias("__z"))
    )
    return z.select(id_col, "y", _p_micro(F.col("__z")).alias("p_micro"))


def logreg_fit(
    feats: DataFrame,
    dims: int,
    n: int,
    iterations: int = ITER_DEFAULT,
    lr: float = LR_DEFAULT,
    id_col: str = "doc_id",
) -> list[int]:
    """Batch GD, exact fixed-point; returns micro-int weights.

    Update: w_j -= floor(lr * grad_j / (n * 1e6) + 0.5) where
    grad_j = sum_docs (p_micro - y*1e6) * x_micro_j is an exact
    integer aggregate. Dims with no feature rows keep their weight.
    """
    w = [0] * dims
    for _ in range(iterations):
        p = _scores(feats, w, id_col)
        grads = (
            p.join(feats, [id_col, "y"])
            .groupBy("dim")
            .agg(
                F.sum(
                    (F.col("p_micro") - F.col("y") * F.lit(MICRO))
                    * F.col("x_micro")
                ).alias("g")
            )
            .collect()
        )
        gmap = {r["dim"]: r["g"] for r in grads}
        w = [
            w[j] - int(math.floor(lr * gmap.get(j, 0) / (n * MICRO) + 0.5))
            for j in range(dims)
        ]
    return w


def logreg_table(
    docs: DataFrame,
    label: F.Column,
    buckets: int = B_DEFAULT,
    iterations: int = ITER_DEFAULT,
    lr: float = LR_DEFAULT,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train + score: (doc_id, p_micro, pred, is_target) under the
    final weights — the full training dynamics are observable through
    the scores, so the hash gate pins every iteration."""
    n = docs.count()
    feats = logreg_features(docs, label, buckets, id_col, text_col, n=n)
    w = logreg_fit(
        feats, dims=buckets + 1, n=n, iterations=iterations, lr=lr
    )
    return _scores(feats, w, id_col).select(
        F.col(id_col),
        "p_micro",
        (F.col("p_micro") >= F.lit(MICRO // 2)).alias("pred"),
        (F.col("y") == 1).alias("is_target"),
    )


def sql_logreg(
    label_pred: str,
    buckets: int = B_DEFAULT,
    iterations: int = ITER_DEFAULT,
    lr: float = LR_DEFAULT,
) -> str:
    """DuckDB oracle replaying feature centering and every GD
    iteration as generated CTEs over ``documents``."""
    sig = (
        "CAST(floor((0.5 * (1 + (z/1000000000000.0)"
        " / (1 + abs(z/1000000000000.0)))) * 1000000 + 0.5) AS BIGINT)"
    )
    hb = f"CAST({sql_h60('t')} % {buckets} AS INT)"
    parts = [
        f"""base AS (
          SELECT doc_id, CAST(({label_pred}) AS INT) AS y,
                 list_distinct(list_transform(string_split(text, ' '),
                               t -> {hb})) AS b
          FROM documents
        ), nn AS (SELECT count(*) AS n FROM base),
        raw AS (
          SELECT doc_id, y, CAST(unnest(range({buckets})) AS INT) AS dim,
                 b
          FROM base
        ), raw2 AS (
          SELECT doc_id, y, dim,
                 CASE WHEN list_contains(b, dim)
                      THEN {MICRO} ELSE 0 END AS x_raw
          FROM raw
        ), mu AS (
          SELECT dim,
                 CAST(floor(CAST(sum(x_raw) AS DOUBLE) / nn.n + 0.5)
                      AS BIGINT) AS mu
          FROM raw2 CROSS JOIN nn GROUP BY dim, nn.n
        ), feats AS MATERIALIZED (
          SELECT doc_id, y, dim, x_raw - mu AS x
          FROM raw2 JOIN mu USING (dim)
          UNION ALL
          SELECT doc_id, y, {buckets} AS dim, {MICRO} AS x FROM base
        ),
        w0 AS (
          SELECT CAST(unnest(range({buckets + 1})) AS INT) AS dim,
                 CAST(0 AS BIGINT) AS w
        )"""
    ]
    for i in range(iterations):
        parts.append(
            f"""p{i} AS MATERIALIZED (
              SELECT doc_id, y, {sig} AS p FROM (
                SELECT f.doc_id, f.y, CAST(sum(w.w * f.x) AS BIGINT) AS z
                FROM feats f JOIN w{i} w USING (dim) GROUP BY 1, 2
              )
            ), g{i} AS MATERIALIZED (
              SELECT f.dim,
                     CAST(sum((p{i}.p - p{i}.y * {MICRO}) * f.x) AS BIGINT)
                       AS grad
              FROM p{i} JOIN feats f USING (doc_id, y)
              GROUP BY 1
            ), w{i + 1} AS MATERIALIZED (
              SELECT w.dim,
                     w.w - CAST(floor({lr} * coalesce(g.grad, 0)
                                      / (nn.n * {MICRO}.0) + 0.5)
                                AS BIGINT) AS w
              FROM w{i} w LEFT JOIN g{i} g USING (dim) CROSS JOIN nn
            )"""
        )
    last = f"w{iterations}"
    return f"""
    WITH {','.join(parts)},
    zf AS (
      SELECT f.doc_id, f.y, CAST(sum(w.w * f.x) AS BIGINT) AS z
      FROM feats f JOIN {last} w USING (dim) GROUP BY 1, 2
    )
    SELECT doc_id, {sig} AS p_micro,
           ({sig} >= 500000) AS pred,
           (y = 1) AS is_target
    FROM zf
    """


# ---------------------------------------------------------------------------
# Held-out evaluation (train split -> score everything)
# ---------------------------------------------------------------------------
def logreg_holdout_table(
    docs: DataFrame,
    label: F.Column,
    train: F.Column,
    buckets: int = B_DEFAULT,
    iterations: int = ITER_DEFAULT,
    lr: float = LR_DEFAULT,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train on the ``train`` subset only, score EVERY doc:
    (doc_id, is_train, p_micro, pred, is_target). Leakage-free by
    construction: the per-bucket centering means AND the gradient
    sums see only training rows; held-out rows are scored with the
    frozen weights — the held-out accuracy is the number a production
    filter is actually deployed on."""
    h = "cast(conv(substring(md5(t), 1, 15), 16, 10) AS long)"
    base = docs.select(
        F.col(id_col),
        label.cast("int").alias("y"),
        train.cast("boolean").alias("is_train"),
        F.expr(
            f"array_distinct(transform(split({text_col}, ' '),"
            f" t -> int({h} % {buckets})))"
        ).alias("__b"),
    )
    raw = base.select(
        id_col,
        "y",
        "is_train",
        F.explode(F.expr(f"sequence(0, {buckets - 1})")).alias("dim"),
        F.col("__b"),
    ).select(
        id_col,
        "y",
        "is_train",
        "dim",
        F.when(F.expr("array_contains(__b, dim)"), F.lit(MICRO))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("x_raw"),
    )
    n_train = base.where("is_train").count()
    mu = (
        raw.where("is_train")
        .groupBy("dim")
        .agg(
            F.floor(
                F.sum("x_raw").cast("double") / F.lit(float(n_train))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("mu")
        )
    )
    centered = raw.join(F.broadcast(mu), "dim").select(
        id_col,
        "y",
        "is_train",
        "dim",
        (F.col("x_raw") - F.col("mu")).alias("x_micro"),
    )
    bias = base.select(
        F.col(id_col),
        "y",
        "is_train",
        F.lit(buckets).cast("int").alias("dim"),
        F.lit(MICRO).cast("long").alias("x_micro"),
    )
    feats = centered.unionByName(bias)

    # training loop over the train rows only
    w = [0] * (buckets + 1)
    tfeats = feats.where("is_train").drop("is_train")
    for _ in range(iterations):
        p = _scores(tfeats, w, id_col)
        grads = (
            p.join(tfeats, [id_col, "y"])
            .groupBy("dim")
            .agg(
                F.sum(
                    (F.col("p_micro") - F.col("y") * F.lit(MICRO))
                    * F.col("x_micro")
                ).alias("g")
            )
            .collect()
        )
        gmap = {r["dim"]: r["g"] for r in grads}
        w = [
            w[j]
            - int(math.floor(lr * gmap.get(j, 0) / (n_train * MICRO) + 0.5))
            for j in range(buckets + 1)
        ]

    spark = docs.sparkSession
    vals = ", ".join(f"({d}, {int(v)}L)" for d, v in enumerate(w))
    wdf = spark.sql(f"SELECT col1 AS dim, col2 AS w FROM VALUES {vals}")
    z = (
        feats.join(F.broadcast(wdf), "dim")
        .groupBy(id_col, "y", "is_train")
        .agg(F.sum(F.col("w") * F.col("x_micro")).alias("__z"))
    )
    return z.select(
        F.col(id_col),
        "is_train",
        _p_micro(F.col("__z")).alias("p_micro"),
        (_p_micro(F.col("__z")) >= F.lit(MICRO // 2)).alias("pred"),
        (F.col("y") == 1).alias("is_target"),
    )


def sql_logreg_holdout(
    label_pred: str,
    train_pred: str,
    buckets: int = B_DEFAULT,
    iterations: int = ITER_DEFAULT,
    lr: float = LR_DEFAULT,
) -> str:
    """DuckDB oracle for logreg_holdout_table: centering means and
    gradient sums over the train subset only; scoring over all."""
    sig = (
        "CAST(floor((0.5 * (1 + (z/1000000000000.0)"
        " / (1 + abs(z/1000000000000.0)))) * 1000000 + 0.5) AS BIGINT)"
    )
    hb = f"CAST({sql_h60('t')} % {buckets} AS INT)"
    parts = [
        f"""base AS (
          SELECT doc_id, CAST(({label_pred}) AS INT) AS y,
                 CAST(({train_pred}) AS BOOLEAN) AS is_train,
                 list_distinct(list_transform(string_split(text, ' '),
                               t -> {hb})) AS b
          FROM documents
        ), nn AS (SELECT count(*) AS n FROM base WHERE is_train),
        raw2 AS (
          SELECT doc_id, y, is_train, dim,
                 CASE WHEN list_contains(b, dim)
                      THEN {MICRO} ELSE 0 END AS x_raw
          FROM (
            SELECT doc_id, y, is_train,
                   CAST(unnest(range({buckets})) AS INT) AS dim, b
            FROM base
          )
        ), mu AS (
          SELECT dim,
                 CAST(floor(CAST(sum(x_raw) AS DOUBLE) / nn.n + 0.5)
                      AS BIGINT) AS mu
          FROM raw2 CROSS JOIN nn WHERE is_train GROUP BY dim, nn.n
        ), feats AS MATERIALIZED (
          SELECT doc_id, y, is_train, dim, x_raw - mu AS x
          FROM raw2 JOIN mu USING (dim)
          UNION ALL
          SELECT doc_id, y, is_train, {buckets} AS dim, {MICRO} AS x
          FROM base
        ),
        w0 AS (
          SELECT CAST(unnest(range({buckets + 1})) AS INT) AS dim,
                 CAST(0 AS BIGINT) AS w
        )"""
    ]
    for i in range(iterations):
        parts.append(
            f"""p{i} AS MATERIALIZED (
              SELECT doc_id, y, {sig} AS p FROM (
                SELECT f.doc_id, f.y, CAST(sum(w.w * f.x) AS BIGINT) AS z
                FROM feats f JOIN w{i} w USING (dim)
                WHERE f.is_train GROUP BY 1, 2
              )
            ), g{i} AS MATERIALIZED (
              SELECT f.dim,
                     CAST(sum((p{i}.p - p{i}.y * {MICRO}) * f.x) AS BIGINT)
                       AS grad
              FROM p{i} JOIN feats f USING (doc_id, y)
              WHERE f.is_train
              GROUP BY 1
            ), w{i + 1} AS MATERIALIZED (
              SELECT w.dim,
                     w.w - CAST(floor({lr} * coalesce(g.grad, 0)
                                      / (nn.n * {MICRO}.0) + 0.5)
                                AS BIGINT) AS w
              FROM w{i} w LEFT JOIN g{i} g USING (dim) CROSS JOIN nn
            )"""
        )
    last = f"w{iterations}"
    return f"""
    WITH {','.join(parts)},
    zf AS (
      SELECT f.doc_id, f.is_train, f.y, CAST(sum(w.w * f.x) AS BIGINT) AS z
      FROM feats f JOIN {last} w USING (dim) GROUP BY 1, 2, 3
    )
    SELECT doc_id, is_train, {sig} AS p_micro,
           ({sig} >= 500000) AS pred,
           (y = 1) AS is_target
    FROM zf
    """


def auc_exact(
    scored: DataFrame,
    score_col: str = "score_micro",
    label_col: str = "y",
) -> DataFrame:
    """Exact ROC-AUC as the Mann-Whitney rank statistic over an
    INTEGER score column — the ranking-quality eval a quality-filter
    pipeline runs on its scorer. Ties take average ranks; everything
    stays integer until the final division by doubling the rank sum:

        2*U = sum over distinct scores s of  p_s * (2*L_s + c_s + 1)
              - n_pos * (n_pos + 1)
        AUC = 2*U / (2 * n_pos * n_neg)

    (c_s = docs at s, p_s = positives at s, L_s = docs strictly
    below s). Returns ONE row (n_pos, n_neg, u_times_2, auc).

    Scale: one map-side-combined groupBy to the distinct-score
    histogram, then the two-phase DISTRIBUTED exclusive prefix from
    operators.skew (micro-int score domains can approach corpus
    cardinality, so no single-partition ordered window — the ADVICE
    r08 #2 discipline), then one global aggregate."""
    from huckli_spark.functions.portable import fround
    from huckli_spark.operators.skew import _exclusive_prefix

    hist = (
        scored.select(
            F.col(score_col).alias("__s"),
            F.col(label_col).cast("long").alias("__y"),
        )
        .groupBy("__s")
        .agg(F.count("*").alias("__c"), F.sum("__y").alias("__p"))
        # the prefix consumes (and drops) its weight column — carry a
        # copy for the rank algebra downstream
        .withColumn("__c2", F.col("__c"))
    )
    pref = _exclusive_prefix(hist, F.asc("__s"), "__c2", "__L")
    agg = pref.agg(
        F.sum("__p").cast("long").alias("n_pos"),
        (F.sum("__c") - F.sum("__p")).cast("long").alias("n_neg"),
        F.sum(
            F.col("__p") * (2 * F.col("__L") + F.col("__c") + F.lit(1))
        ).cast("long").alias("__r2"),
    )
    u2 = F.col("__r2") - F.col("n_pos") * (F.col("n_pos") + 1)
    return agg.select(
        "n_pos",
        "n_neg",
        u2.cast("long").alias("u_times_2"),
        fround(
            u2 / (2.0 * F.col("n_pos") * F.col("n_neg")), 6
        ).alias("auc"),
    )
