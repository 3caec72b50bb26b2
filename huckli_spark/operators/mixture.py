"""DoReMi-style domain-mixture optimization (arXiv:2305.10429,
Group DRO form) in exact fixed-point.

LLM pretraining corpora mix domains (web/books/code/...) with weights
that strongly affect downstream quality. DoReMi tunes them WITHOUT
training the big model: train a small reference model, then train a
small proxy under Group DRO — each round the proxy continues training
with examples reweighted by the current domain weights, per-domain
EXCESS loss (proxy - reference, clipped at 0) moves the weights
multiplicatively toward the domains the proxy handles worst, and the
smoothed trajectory average is the tuned mixture.

This operator is that loop over the repo's fixed-point logistic
classifier (:mod:`huckli_spark.operators.classifier`) as the
model class:

* Reference = the uniform-weight logreg (``logreg_fit``).
* Proxy = the same features, trained by WEIGHTED batch GD — gradient
  cells are exact integer sums of lambda_milli(domain) * (p - y) * x,
  the denominator is the exact integer sum of per-doc weights, so
  weighted training stays bit-identical across engines/partitionings.
* Loss = per-doc log-loss in micro-nats: -floor(ln(p_y)*1e6 + 0.5)
  with p_y clamped to [1, 1e6-1] micro (the rational sigmoid can
  saturate); the per-domain mean is a floor division of two exact
  integers.
* Weight update = LINEARIZED multiplicative weights,
  lam' = lam * (1 + eta * excess) in floored integer milli/micro
  arithmetic — the first-order form of DoReMi's exponentiated
  gradient, chosen for the same reason the classifier's sigmoid is
  rational: no trust in matching exp() across engines. Normalization
  to milli (sum ~1000, floor division) and uniform smoothing
  (DoReMi's (1-c)*lam + c*u) are integer too.

Scale: every aggregate lands on bounded relations — (buckets+1)
gradient cells, |domains| loss rows, |domains| weight rows; the
corpus is scanned once per inner GD step / loss pass and never
shuffled on a data-sized key (the kmeans_fit / logreg_fit pattern).
Driver state is w (buckets+1 ints) and lambda (|domains| ints). At
100 TB the integer gradient sums exceed BIGINT around 1e19 row-units;
swap the sum to decimal(38,0) as kmeans_fit does (documented, not a
plan change).

The reference engine has no ML layer; this extends the LLM-pipeline
surface mandated by the project brief. Oracle: ``sql_doremi``
replays reference training, every DRO round (weighted GD iterations,
per-domain losses, the multiplicative update, normalization,
smoothing) as generated CTEs — the logreg/pagerank oracle pattern.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from huckli_spark.functions.portable import sql_h60
from huckli_spark.operators.classifier import (
    MICRO,
    _p_micro,
    _scores,
    logreg_features,
    logreg_fit,
)


def _loss_micro(p_col: F.Column, y_col: F.Column) -> F.Column:
    """Per-doc log-loss in micro-nats from micro p and int y."""
    py = F.when(y_col == 1, p_col).otherwise(F.lit(MICRO) - p_col)
    py = F.greatest(F.least(py, F.lit(MICRO - 1)), F.lit(1))
    return (
        -F.floor(F.log(py.cast("double") / F.lit(float(MICRO))) * MICRO
                 + F.lit(0.5))
    ).cast("long")


def _domain_means(scored: DataFrame, dom: DataFrame) -> dict:
    """{domain: (n_docs, mean_loss_micro)} from a (doc_id, y,
    p_micro) scoring relation."""
    rows = (
        scored.join(dom, "doc_id")
        .select("dom", _loss_micro(F.col("p_micro"), F.col("y")).alias("l"))
        .groupBy("dom")
        .agg(F.count("*").alias("n"), F.sum("l").alias("s"))
        .collect()
    )
    return {r["dom"]: (r["n"], r["s"] // r["n"]) for r in rows}


def _weighted_fit_step(
    feats: DataFrame,
    dom: DataFrame,
    w: list,
    lam: dict,
    lr: float,
    id_col: str = "doc_id",
) -> list:
    """One weighted batch-GD step: w_j -= floor(lr * g_j / (den *
    1e6) + 0.5) with g_j = sum lam_milli(dom) * (p - y*1e6) * x and
    den = sum of per-doc lam_milli — all exact integers."""
    from huckli_spark.operators.unigram_lm import _sql_str

    spark = feats.sparkSession
    # backslash-then-quote escaping (ADVICE r08 #4): Spark's default
    # string-literal parser is backslash-escaped, so the previous
    # quote-doubling corrupted domains containing backslashes
    vals = ", ".join(
        f"({_sql_str(str(d))}, {int(v)}L)" for d, v in sorted(lam.items())
    )
    ldf = spark.sql(f"SELECT col1 AS dom, col2 AS lam FROM VALUES {vals}")
    p = _scores(feats, w, id_col)
    weighted = (
        p.join(dom, id_col)
        .join(F.broadcast(ldf), "dom")
        .select(id_col, "y", "lam", "p_micro")
    )
    grads = (
        weighted.join(feats, [id_col, "y"])
        .groupBy("dim")
        .agg(
            F.sum(
                F.col("lam")
                * (F.col("p_micro") - F.col("y") * F.lit(MICRO))
                * F.col("x_micro")
            ).alias("g")
        )
        .collect()
    )
    den = weighted.agg(F.sum("lam").alias("d")).collect()[0]["d"]
    gmap = {r["dim"]: r["g"] for r in grads}
    return [
        w[j] - int(math.floor(lr * gmap.get(j, 0) / (den * MICRO) + 0.5))
        for j in range(len(w))
    ]


def doremi_mixture(
    docs: DataFrame,
    label: F.Column,
    domain_col: str = "lang",
    buckets: int = 64,
    ref_iters: int = 4,
    rounds: int = 3,
    inner_iters: int = 2,
    lr: float = 16.0,
    eta_milli: int = 2000,
    smooth_milli: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Run the DRO loop; returns the FULL trajectory relation
    (round, dom, n_docs, lam_in_milli, excess_micro, lam_out_milli)
    — hashing it pins reference training, every weighted proxy step,
    every loss pass, and every weight update."""
    spark = docs.sparkSession
    n = docs.count()
    feats = logreg_features(docs, label, buckets, id_col, text_col, n=n)
    feats = feats.persist()
    dom = docs.select(id_col, F.col(domain_col).alias("dom"))
    try:
        # reference: uniform-weight training + frozen per-domain loss
        w_ref = logreg_fit(feats, dims=buckets + 1, n=n,
                           iterations=ref_iters, lr=lr)
        ref_means = _domain_means(_scores(feats, w_ref, id_col), dom)
        domains = sorted(ref_means)
        d_count = len(domains)
        lam = {d: 1000 // d_count for d in domains}
        uni = smooth_milli // d_count

        w = [0] * (buckets + 1)
        out = []
        for r in range(rounds):
            for _ in range(inner_iters):
                w = _weighted_fit_step(feats, dom, w, lam, lr, id_col)
            prox_means = _domain_means(_scores(feats, w, id_col), dom)
            excess = {
                d: max(prox_means[d][1] - ref_means[d][1], 0)
                for d in domains
            }
            raw = {
                d: (lam[d] * (MICRO + (eta_milli * excess[d]) // 1000))
                // MICRO
                for d in domains
            }
            tot = sum(raw.values())
            nxt = {
                d: ((1000 - smooth_milli) * ((1000 * raw[d]) // tot))
                // 1000
                + uni
                for d in domains
            }
            for d in domains:
                out.append(
                    (r, d, ref_means[d][0], lam[d], excess[d], nxt[d])
                )
            lam = nxt
        return spark.createDataFrame(
            out,
            "round int, dom string, n_docs bigint, lam_in_milli bigint,"
            " excess_micro bigint, lam_out_milli bigint",
        )
    finally:
        feats.unpersist()


# ------------------------------------------------------------- oracle SQL
def sql_doremi(
    label_pred: str,
    domain_col: str = "lang",
    buckets: int = 64,
    ref_iters: int = 4,
    rounds: int = 3,
    inner_iters: int = 2,
    lr: float = 16.0,
    eta_milli: int = 2000,
    smooth_milli: int = 100,
) -> str:
    """DuckDB replay of the whole DRO loop over ``documents``. The
    feature/GD CTE shapes mirror ``classifier.sql_logreg``; weighted
    iterations join the lam{r} relation, losses clamp + ln in
    micro-nats, and the update/normalize/smooth arithmetic is the
    same floored-integer sequence as the operator."""
    sig = (
        "CAST(floor((0.5 * (1 + (z/1000000000000.0)"
        " / (1 + abs(z/1000000000000.0)))) * 1000000 + 0.5) AS BIGINT)"
    )
    hb = f"CAST({sql_h60('t')} % {buckets} AS INT)"
    loss = (
        "-CAST(floor(ln(greatest(least(CASE WHEN y = 1 THEN p"
        f" ELSE {MICRO} - p END, {MICRO - 1}), 1) * 1.0 / {MICRO})"
        f" * {MICRO} + 0.5) AS BIGINT)"
    )
    parts = [
        f"""base AS (
          SELECT doc_id, CAST(({label_pred}) AS INT) AS y,
                 list_distinct(list_transform(string_split(text, ' '),
                               t -> {hb})) AS b
          FROM documents
        ), nn AS (SELECT count(*) AS n FROM base),
        dom AS (SELECT doc_id, {domain_col} AS dom FROM documents),
        nd AS (SELECT count(DISTINCT dom) AS d FROM dom),
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
        rw0 AS (
          SELECT CAST(unnest(range({buckets + 1})) AS INT) AS dim,
                 CAST(0 AS BIGINT) AS w
        )"""
    ]
    # reference chain (uniform weights)
    for i in range(ref_iters):
        parts.append(
            f"""rp{i} AS MATERIALIZED (
              SELECT doc_id, y, {sig} AS p FROM (
                SELECT f.doc_id, f.y, CAST(sum(w.w * f.x) AS BIGINT) AS z
                FROM feats f JOIN rw{i} w USING (dim) GROUP BY 1, 2
              )
            ), rg{i} AS MATERIALIZED (
              SELECT f.dim,
                     CAST(sum((rp{i}.p - rp{i}.y * {MICRO}) * f.x)
                          AS BIGINT) AS grad
              FROM rp{i} JOIN feats f USING (doc_id, y)
              GROUP BY 1
            ), rw{i + 1} AS MATERIALIZED (
              SELECT w.dim,
                     w.w - CAST(floor({lr} * coalesce(g.grad, 0)
                                      / (nn.n * {MICRO}.0) + 0.5)
                                AS BIGINT) AS w
              FROM rw{i} w LEFT JOIN rg{i} g USING (dim) CROSS JOIN nn
            )"""
        )
    # frozen reference per-domain means
    parts.append(
        f"""refm AS MATERIALIZED (
          SELECT d.dom, count(*) AS n_docs,
                 CAST(sum(l) // count(*) AS BIGINT) AS mean_l
          FROM (
            SELECT doc_id, {loss} AS l FROM (
              SELECT doc_id, y, {sig} AS p FROM (
                SELECT f2.doc_id, f2.y,
                       CAST(sum(w.w * f2.x) AS BIGINT) AS z
                FROM feats f2 JOIN rw{ref_iters} w USING (dim)
                GROUP BY 1, 2
              )
            )
          ) x JOIN dom d USING (doc_id)
          GROUP BY 1
        ),
        lam0 AS (
          SELECT dom, CAST(1000 // nd.d AS BIGINT) AS lam
          FROM (SELECT DISTINCT dom FROM dom) CROSS JOIN nd
        ),
        pw0_0 AS (
          SELECT CAST(unnest(range({buckets + 1})) AS INT) AS dim,
                 CAST(0 AS BIGINT) AS w
        )"""
    )
    for r in range(rounds):
        for i in range(inner_iters):
            parts.append(
                f"""pp{r}_{i} AS MATERIALIZED (
              SELECT doc_id, y, {sig} AS p FROM (
                SELECT f.doc_id, f.y, CAST(sum(w.w * f.x) AS BIGINT) AS z
                FROM feats f JOIN pw{r}_{i} w USING (dim) GROUP BY 1, 2
              )
            ), pg{r}_{i} AS MATERIALIZED (
              SELECT f.dim,
                     CAST(sum(l.lam * (p.p - p.y * {MICRO}) * f.x)
                          AS BIGINT) AS grad
              FROM pp{r}_{i} p
              JOIN dom d USING (doc_id)
              JOIN lam{r} l USING (dom)
              JOIN feats f USING (doc_id, y)
              GROUP BY 1
            ), pden{r}_{i} AS (
              SELECT CAST(sum(l.lam) AS BIGINT) AS den
              FROM base b JOIN dom d USING (doc_id)
              JOIN lam{r} l USING (dom)
            ), pw{r}_{i + 1} AS MATERIALIZED (
              SELECT w.dim,
                     w.w - CAST(floor({lr} * coalesce(g.grad, 0)
                                      / (pden{r}_{i}.den * {MICRO}.0)
                                      + 0.5) AS BIGINT) AS w
              FROM pw{r}_{i} w LEFT JOIN pg{r}_{i} g USING (dim)
              CROSS JOIN pden{r}_{i}
            )"""
            )
        parts.append(
            f"""proxm{r} AS MATERIALIZED (
          SELECT d.dom,
                 CAST(sum(l) // count(*) AS BIGINT) AS mean_l
          FROM (
            SELECT doc_id, {loss} AS l FROM (
              SELECT doc_id, y, {sig} AS p FROM (
                SELECT f2.doc_id, f2.y,
                       CAST(sum(w.w * f2.x) AS BIGINT) AS z
                FROM feats f2 JOIN pw{r}_{inner_iters} w USING (dim)
                GROUP BY 1, 2
              )
            )
          ) x JOIN dom d USING (doc_id)
          GROUP BY 1
        ),
        exc{r} AS MATERIALIZED (
          SELECT p.dom, greatest(p.mean_l - r.mean_l, 0) AS excess
          FROM proxm{r} p JOIN refm r ON r.dom = p.dom
        ),
        rawl{r} AS MATERIALIZED (
          SELECT l.dom,
                 (l.lam * ({MICRO} + (CAST({eta_milli} AS BIGINT)
                  * e.excess) // 1000)) // {MICRO} AS rl
          FROM lam{r} l JOIN exc{r} e USING (dom)
        ),
        lam{r + 1} AS MATERIALIZED (
          SELECT dom,
                 CAST(((1000 - {smooth_milli})
                       * ((1000 * rl) // tot.t)) // 1000
                      + {smooth_milli} // nd.d AS BIGINT) AS lam
          FROM rawl{r}
          CROSS JOIN (SELECT sum(rl) AS t FROM rawl{r}) tot
          CROSS JOIN nd
        ),
        pw{r + 1}_0 AS (SELECT dim, w FROM pw{r}_{inner_iters})"""
        )
    sel = "\n    UNION ALL\n".join(
        f"""    SELECT {r} AS round, e.dom, m.n_docs,
           li.lam AS lam_in_milli, e.excess AS excess_micro,
           lo.lam AS lam_out_milli
    FROM exc{r} e JOIN refm m ON m.dom = e.dom
    JOIN lam{r} li ON li.dom = e.dom
    JOIN lam{r + 1} lo ON lo.dom = e.dom"""
        for r in range(rounds)
    )
    return "WITH " + ",\n".join(parts) + "\n" + sel


# ------------------------------------------------- temperature sampling
def temperature_weights(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.3,
    n_tokens_col: "str | None" = None,
) -> DataFrame:
    """mT5-style TEMPERATURE sampling weights (arXiv:1910.10683 §3.4.2
    / arXiv:2010.11934): sample source ``s`` with probability
    proportional to ``p_s ** alpha`` where ``p_s`` is the source's
    token share — ``alpha = 1`` keeps the natural mix, ``alpha -> 0``
    flattens toward uniform, boosting low-resource sources. Expressed
    as the mixer's "epochs per source" knob: relative to the LARGEST
    source (which keeps weight 1.0 — no downsampling), source ``s``
    upsamples by ``(n_max / n_s) ** (1 - alpha)``.

    Token mass is whitespace tokens from ``text_col`` (or a
    precomputed ``n_tokens_col`` for model-token accounting, the
    q_bpe_pack discipline). Output is fixed-point: ``share_ppm`` is
    the exact integer token share, ``boost_micro`` the weight in
    micros ``floor(x * 1e6 + 0.5)`` — the one double ``power`` is
    rounded immediately at 1e-6, the ln/exp micro-nat discipline used
    across the repo, so a DuckDB oracle replays it (q_temp_weights).

    Scale: one map-side-combined aggregation to a |sources|-sized
    relation, then a broadcast one-row totals join — the corpus is
    scanned once and never shuffled on a data-sized key. Returns
    (<source_col>, n_docs, n_tokens, share_ppm, boost_micro).
    """
    if not (0.0 <= alpha <= 1.0):
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    tok = (
        F.col(n_tokens_col).cast("long")
        if n_tokens_col
        else F.size(F.split(F.col(text_col), " ")).cast("long")
    )
    per = df.groupBy(source_col).agg(
        F.count("*").alias("n_docs"), F.sum(tok).alias("n_tokens")
    )
    tot = per.agg(
        F.sum("n_tokens").alias("__tot"), F.max("n_tokens").alias("__max")
    )
    exp = 1.0 - alpha
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            source_col,
            "n_docs",
            "n_tokens",
            # decimal(38,0) widen before the ppm lift: at 100 TB a
            # source's token mass passes 2^63 / 1e6, where a bigint
            # multiply would overflow (DuckDB's sum is HUGEINT
            # already); div on decimals returns bigint
            F.expr(
                "(cast(n_tokens as decimal(38,0)) * 1000000) div __tot"
            ).alias("share_ppm"),
            F.floor(
                F.pow(F.col("__max") / F.col("n_tokens"), F.lit(exp))
                * F.lit(1_000_000)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("boost_micro"),
        )
    )


def temperature_weight_map(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.3,
    n_tokens_col: "str | None" = None,
) -> "dict[str, float]":
    """Driver-side weight dict for :func:`epoch_mix_shuffle` /
    ``epoch_mix_emit`` from :func:`temperature_weights` — the collect
    is the |sources| dimension relation, never corpus-sized. Values
    are ``boost_micro / 1e6``; the mixer's ``int(w * 1e6 + 0.5)``
    lift round-trips that exactly for any micro below 2^51, so the
    oracle-replayed micro weights equal the served ones bit-for-bit.
    """
    rows = temperature_weights(
        df, source_col=source_col, text_col=text_col, alpha=alpha,
        n_tokens_col=n_tokens_col,
    ).collect()
    if any(r[source_col] is None for r in rows):
        # a None key would crash the mixer's CASE-literal build with
        # an opaque TypeError, and `source == NULL` never matches a
        # row anyway — fail here with an actionable message
        raise ValueError(
            f"{source_col!r} contains NULLs; fill or filter the "
            "source column before temperature mixing"
        )
    return {r[source_col]: r["boost_micro"] / 1_000_000 for r in rows}


def sql_temperature_wmap(alpha: float, table: str = "documents") -> str:
    """DuckDB CTE body replaying :func:`temperature_weights` over
    ``table`` as ``(source, wm)`` — shared by the q_temp_weights and
    q_temp_mix oracles. The exponent is embedded via ``repr`` so both
    engines raise to the IDENTICAL double (1 - 0.3 is not 0.7 in
    binary)."""
    exp = repr(1.0 - alpha)
    return f"""
      SELECT source,
             CAST(floor(power(mx * 1.0 / n_tokens, {exp}) * 1000000
                        + 0.5) AS BIGINT) AS wm
      FROM (
        SELECT source, sum(array_length(string_split(text, ' ')))
                 AS n_tokens,
               max(sum(array_length(string_split(text, ' '))))
                 OVER () AS mx
        FROM {table} GROUP BY source
      )
    """
