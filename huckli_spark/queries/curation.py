"""Curation parity queries — the selection layer of an LLM
training-data pipeline, downstream of the syntactic dedup / quality
signals elsewhere in this registry:

* SemDeDup family: pairwise (q_semdedup), transitive components
  (q_semdedup_clusters), two-level skew-bounded (q_semdedup_two_level),
  incremental vs a frozen quantizer (q_semdedup_incremental).
* DSIR importance resampling (q_dsir_select).
* Fixed-point logistic-regression quality classifier
  (q_logreg_quality) + leakage-free held-out eval (q_logreg_holdout).
* Gopher/MassiveText rule filter (q_gopher_rules).
* Cluster-balanced diversity sampling (q_diversity_sample).
* Embedding drift monitor (q_embedding_drift).
* The composed end-to-end chain (q_curation_pipeline).

Every oracle replays the full computation relationally in DuckDB —
k-means trainings via the shared CTE chains, GD iterations as
generated CTEs, hashed-ngram distributions from the portable 60-bit
md5 hash. See ``operators/curation.py`` / ``operators/classifier.py``
for the papers and the 100 TB notes. Streaming twins live in
``queries/streaming_parity.py`` (q_stream_quality_gate,
q_stream_semdedup_screen, q_stream_dsir).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from huckli_spark.functions.portable import fround, sql_fround

from huckli_spark.operators.classifier import sql_logreg, sql_logreg_holdout
from huckli_spark.operators.curation import (
    dsir_select,
    semdedup,
    sql_diversity_sample,
    sql_semdedup_components,
    sql_semdedup_two_level,
    sql_dsir_select,
    sql_semdedup,
    sql_semdedup_incremental,
)
from huckli_spark.operators.textstats import (
    sql_gopher_ctes,
    sql_gopher_passes,
)
from huckli_spark.queries import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


_TAU = 0.45  # fixture similarity ceiling ~0.51 (see q_dedup_embed_cosine)


@query(
    "q_semdedup",
    sql_semdedup(k=8, iterations=2, tau=_TAU),
    doc="SemDeDup (arXiv:2303.09540): exact fixed-point k-means "
    "clusters the embeddings, then cosine near-dup detection runs "
    "only within clusters — the pairwise stage is bounded by the "
    "largest cluster, never O(n^2) on the corpus. Output is one "
    "keep/drop row per vector (vec_id, cid, is_dup); a vector is a "
    "dup iff a lower-id same-cluster member has fround(cos,6) >= "
    f"{_TAU}. The oracle replays the whole chain: training "
    "iterations, integer argmin assignment, pair scan. Scale: "
    "training is map-only + k*dim driver cells; the self-join "
    "shuffles on cid only, so raising k (paper: ~100k clusters at "
    "web scale) keeps per-cluster work constant.",
)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return semdedup(_emb(spark, sf_dir), k=8, iterations=2, tau=_TAU)


# F.col needs an active SparkContext in this PySpark build, and this
# module is imported by all_queries() possibly before any session
# exists (e.g. pytest collection) — build the Column lazily.
def _dsir_target() -> F.Column:
    return F.col("lang") == "en"


_DSIR_TARGET_SQL = "lang = 'en'"


@query(
    "q_dsir_select",
    sql_dsir_select(_DSIR_TARGET_SQL, keep=100),
    doc="DSIR (arXiv:2302.03169): hashed-ngram importance resampling. "
    "Unigram+bigram features hash (portable 60-bit md5) into 256 "
    "buckets; target (lang='en') vs raw bucket distributions give "
    "per-bucket log ratios floored to micro-nats; per-doc weights "
    "are exact integer dot products; the top-100 (weight desc, "
    "doc_id asc) are selected via a broadcast scalar threshold. "
    "Scale: one corpus explode, ONE 256-row conditional-sum groupBy, "
    "a 256-row broadcast back, and a TakeOrdered threshold — the "
    "corpus never shuffles on a data-sized key.",
)
def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dsir_select(_docs(spark, sf_dir), _dsir_target(), keep=100)


# Training target: a lexical property ("mentions spark or sql") the
# hashed features can genuinely learn. The fixture's lang labels are
# RANDOM w.r.t. text (all five langs share the identical 31-word
# vocabulary — verified), so they are unlearnable by any classifier;
# in production the label comes from a curated quality set (CCNet:
# Wikipedia vs raw CommonCrawl). Measured on this fixture: 87%
# training accuracy vs a 77% majority baseline.
def _lr_label() -> F.Column:
    # F.expr needs an active session — build lazily at query build time
    return F.expr(
        "array_contains(split(text, ' '), 'spark')"
        " OR array_contains(split(text, ' '), 'sql')"
    )


_LR_LABEL_SQL = (
    "list_contains(string_split(text, ' '), 'spark')"
    " OR list_contains(string_split(text, ' '), 'sql')"
)


@query(
    "q_logreg_quality",
    sql_logreg(_LR_LABEL_SQL),
    doc="fastText/CCNet-style quality-domain classifier: logistic "
    "regression over mean-centered binary hashed bag-of-words "
    "features (portable 60-bit md5 hash, 64 buckets + bias), trained "
    "by 8 batch-GD iterations in exact fixed-point — integer dot "
    "products, a rational (exp-free) sigmoid floored to micro once "
    "per doc, integer gradient sums, floored weight updates. The "
    "oracle replays centering and every iteration as generated CTEs, "
    "so the hash gate pins the full training dynamics, not just the "
    "final scores. Learns for real: 87% training accuracy vs 77% "
    "majority baseline on the fixture. Scale: features are map-only "
    "(in-row presence array, B+1 rows/doc); per iteration ONE "
    "broadcast join (65 weight rows) + ONE map-combined 65-cell "
    "gradient aggregate; driver holds 65 weights (kmeans_fit "
    "pattern).",
)
def q_logreg_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.classifier import logreg_table

    return logreg_table(_docs(spark, sf_dir), _lr_label())


# The published required-stopword list ({the, be, to, of, and, that,
# have, with} — the operator default) is degenerate on this fixture:
# its 31-word vocabulary contains only 'the', so every doc would fail
# the >=2 rule and `passes` would pin false. The gate uses the
# fixture's two function words so the conjunction actually varies;
# production uses the operator default.
_GSTOP = ("the", "a")


@query(
    "q_gopher_rules",
    f"""
    WITH {sql_gopher_ctes(stopwords=_GSTOP, prefix='')}
    SELECT *,
           (n_words >= 50 AND n_words <= 100000) AS r_wordcount,
           (mean_word_len_micro >= 3000000
            AND mean_word_len_micro <= 10000000) AS r_meanlen,
           (alpha_frac_micro > 800000) AS r_alpha,
           (symbol_ratio_micro < 100000) AS r_symbol,
           (stop_hits >= 2) AS r_stopwords,
           {sql_gopher_passes()} AS passes
    FROM m
    """,
    doc="Gopher/MassiveText document-filter rules (arXiv:2112.11446 "
    "A1.1): per-doc measured signals (word count, mean word length, "
    "alphabetic-word fraction, #/ellipsis symbol ratio, required-"
    "stopword hits) with one boolean verdict per published rule and "
    "the conjunction. All ratios floor to micro ints once — portable "
    "and partition-free. Stopword list adapted to the fixture's "
    "function words (see _GSTOP note); thresholds are the paper's. "
    "Scale: pure map stage, zero shuffle, whole-stage codegen end to "
    "end — the first, cheapest gate in a 100 TB filter chain.",
)
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.textstats import gopher_rules

    return gopher_rules(_docs(spark, sf_dir), stopwords=_GSTOP)


@query(
    "q_diversity_sample",
    sql_diversity_sample(k=8, iterations=2),
    doc="cluster-balanced diversity sampling: after dedup, keep "
    "ceil(sqrt(cluster_size)) members per k-means cluster in a "
    "deterministic hash-ranked order — sqrt allocation over-samples "
    "small clusters (coverage) relative to proportional sampling. "
    "One row per vector with the full decision (rank, quota verdict) "
    "so the gate hashes the selection process, not just the sample. "
    "The oracle replays the fixed-point training, the exact-integer "
    "assignment, and the ranked quota cut. Scale: window partitioned "
    "by cluster — at production k the per-partition work is "
    "cluster-sized, never corpus-sized.",
)
def q_diversity_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.curation import diversity_sample

    return diversity_sample(_emb(spark, sf_dir), k=8, iterations=2)


def _curation_pipeline_oracle() -> str:
    from huckli_spark.operators.curation import (
        DSIR_FINAL_SELECT,
        sql_dsir_ctes,
        sql_semdedup_ctes,
    )

    return (
        "\n    WITH "
        + sql_semdedup_ctes(k=8, iterations=2, tau=_TAU)
        + """,
    keepers AS (
      SELECT vec_id AS doc_id FROM m
      WHERE vec_id NOT IN (SELECT vec_id FROM dups)
    ), sdocs AS (
      SELECT d.* FROM documents d JOIN keepers USING (doc_id)
    ),
    """
        + sql_gopher_ctes(source="sdocs", stopwords=_GSTOP, prefix="g_")
        + f""",
    qdocs AS (
      SELECT doc_id FROM g_m WHERE {sql_gopher_passes()}
    ), pool AS (
      SELECT d.* FROM documents d JOIN qdocs USING (doc_id)
    ),
    """
        + sql_dsir_ctes(_DSIR_TARGET_SQL, keep=50, source="pool")
        + DSIR_FINAL_SELECT
    )


@query(
    "q_curation_pipeline",
    _curation_pipeline_oracle(),
    doc="the END-TO-END curation pipeline as ONE gated query — the "
    "curation counterpart of q_hybrid_retrieval: SemDeDup drops "
    "semantic near-dups (fixed-point k-means + within-cluster "
    "cosine), the Gopher rule conjunction gates quality on the "
    "survivors, and DSIR importance-ranks the surviving pool against "
    "the lang='en' target with a top-50 threshold selection. The "
    "oracle replays the WHOLE chain relationally: k-means training, "
    "integer assignment, the dup pair scan, every rule signal, the "
    "hashed-ngram distributions and the threshold cut — one hash "
    "covers the full pipeline's composition semantics (each stage "
    "sees exactly the prior stage's survivors). Scale: each stage "
    "keeps its own probe-verified shape; the inter-stage joins are "
    "keep-list semi-joins on doc_id (digest-sized relations, "
    "broadcastable at any corpus scale).",
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.textstats import gopher_rules

    docs = _docs(spark, sf_dir)
    sd = semdedup(_emb(spark, sf_dir), k=8, iterations=2, tau=_TAU)
    keepers = sd.where(~F.col("is_dup")).select(
        F.col("vec_id").alias("doc_id")
    )
    sdocs = docs.join(keepers, "doc_id")
    qdocs = (
        gopher_rules(sdocs, stopwords=_GSTOP)
        .where("passes")
        .select("doc_id")
    )
    pool = docs.join(qdocs, "doc_id")
    # lazy form: the pipeline's composed plan stays inspectable and
    # the surviving pool is small enough that the threshold branch's
    # re-derivation is cheap
    return dsir_select(pool, _dsir_target(), keep=50, materialize=False)


@query(
    "q_semdedup_incremental",
    sql_semdedup_incremental(
        "vec_id < 400", "vec_id >= 400", k=8, iterations=2, tau=_TAU
    ),
    doc="incremental SemDeDup — the corpus-growth shape: the coarse "
    "quantizer trains on the EXISTING corpus only (vec_id < 400, "
    "frozen between periodic retrains), the new batch (vec_id >= "
    "400) assigns map-only, and each new vector is screened against "
    "existing same-cluster members (corpus always wins) AND against "
    "lower-id batch members. Output: per-batch-vector verdicts with "
    "the dup source split out (dup_vs_corpus / dup_in_batch). The "
    "oracle replays training on the existing subset plus both "
    "screening passes. Scale: training amortizes across batches; "
    "screening is |batch| x cluster-density, never corpus-quadratic.",
)
def q_semdedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.curation import semdedup_incremental

    emb = _emb(spark, sf_dir)
    return semdedup_incremental(
        emb.where(F.col("vec_id") < 400),
        emb.where(F.col("vec_id") >= 400),
        k=8,
        iterations=2,
        tau=_TAU,
    )


_DRIFT_SPLIT = 250  # fixture snapshots: vec_id < 250 = reference


@query(
    "q_embedding_drift",
    f"""
    WITH vm AS (
      SELECT vec_id,
             CAST(generate_subscripts(embedding::DOUBLE[], 1) - 1 AS INT)
               AS dim,
             CAST(floor(unnest(embedding::DOUBLE[]) * 1000000 + 0.5)
                  AS BIGINT) AS val,
             (vec_id < {_DRIFT_SPLIT}) AS is_ref
      FROM embeddings
    ), agg AS (
      SELECT dim,
             CAST(sum(CASE WHEN is_ref THEN val ELSE 0 END) AS BIGINT)
               AS rsum,
             CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS rn,
             CAST(sum(CASE WHEN is_ref THEN val * val ELSE 0 END) AS BIGINT)
               AS rssq,
             CAST(sum(CASE WHEN is_ref THEN 0 ELSE val END) AS BIGINT)
               AS csum,
             CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS cn
      FROM vm GROUP BY 1
    )
    SELECT dim,
           CAST(floor(rsum * 1.0 / rn + 0.5) AS BIGINT) AS ref_mean_micro,
           CAST(floor(csum * 1.0 / cn + 0.5) AS BIGINT) AS cur_mean_micro,
           {sql_fround("abs(csum * 1.0 / cn - rsum * 1.0 / rn) / (sqrt((rn * rssq - rsum * rsum) * 1.0) / rn)", 4)}
             AS z_shift,
           ({sql_fround("abs(csum * 1.0 / cn - rsum * 1.0 / rn) / (sqrt((rn * rssq - rsum * rsum) * 1.0) / rn)", 4)} > 0.1)
             AS flagged
    FROM agg
    """,
    doc="embedding distribution drift monitor: per-dimension exact "
    "fixed-point moments of a reference snapshot (vec_id < 250) vs "
    "the current corpus, standardized mean shift z = |d_mean| / "
    "ref_std with the variance numerator kept as the exact integer "
    "n*ssq - sum^2 (one sqrt + one division — single IEEE ops, "
    "portable). The production check before retraining quantizers / "
    "classifiers on a grown corpus: a flagged dim means the frozen "
    "index's geometry has drifted. Scale: ONE map-combined groupBy to "
    "dim-count rows (conditional sums fold both snapshots in one "
    "pass); nothing else touches the corpus.",
)
def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    vm = emb.select(
        F.col("vec_id"),
        (F.col("vec_id") < _DRIFT_SPLIT).alias("is_ref"),
        F.posexplode(
            F.expr("transform(embedding, x -> cast(x AS double))")
        ).alias("dim", "v"),
    ).select(
        "vec_id",
        "is_ref",
        F.col("dim").cast("int").alias("dim"),
        F.floor(F.col("v") * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("val"),
    )
    agg = vm.groupBy("dim").agg(
        F.sum(F.when(F.col("is_ref"), F.col("val")).otherwise(0))
        .cast("long")
        .alias("rsum"),
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0))
        .cast("long")
        .alias("rn"),
        F.sum(
            F.when(F.col("is_ref"), F.col("val") * F.col("val")).otherwise(0)
        )
        .cast("long")
        .alias("rssq"),
        F.sum(F.when(F.col("is_ref"), 0).otherwise(F.col("val")))
        .cast("long")
        .alias("csum"),
        F.sum(F.when(F.col("is_ref"), 0).otherwise(1))
        .cast("long")
        .alias("cn"),
    )
    ref_mean = F.col("rsum") * F.lit(1.0) / F.col("rn")
    cur_mean = F.col("csum") * F.lit(1.0) / F.col("cn")
    std = (
        F.sqrt(
            (F.col("rn") * F.col("rssq") - F.col("rsum") * F.col("rsum"))
            * F.lit(1.0)
        )
        / F.col("rn")
    )
    z = fround(F.abs(cur_mean - ref_mean) / std, 4)
    return agg.select(
        "dim",
        F.floor(ref_mean + F.lit(0.5)).cast("long").alias("ref_mean_micro"),
        F.floor(cur_mean + F.lit(0.5)).cast("long").alias("cur_mean_micro"),
        z.alias("z_shift"),
        (z > F.lit(0.1)).alias("flagged"),
    )


@query(
    "q_logreg_holdout",
    sql_logreg_holdout(_LR_LABEL_SQL, "doc_id % 5 <> 0"),
    doc="held-out evaluation of the fixed-point classifier: train on "
    "the 80% split (doc_id % 5 <> 0) ONLY — centering means and "
    "gradient sums never see held-out rows, leakage-free by "
    "construction — then score every doc with the frozen weights. "
    "The held-out accuracy is the number a production filter is "
    "deployed on — measured 84.0% vs a 75.0% held-out majority "
    "baseline (train 86.8%). The oracle replays the split training "
    "end to end. "
    "Same scale shape as q_logreg_quality (map-only features, 65-cell "
    "gradient aggregates).",
)
def q_logreg_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.classifier import logreg_holdout_table

    return logreg_holdout_table(
        _docs(spark, sf_dir), _lr_label(), F.expr("doc_id % 5 <> 0")
    )


@query(
    "q_semdedup_clusters",
    sql_semdedup_components(k=8, iterations=2, tau=_TAU),
    doc="component-based SemDeDup — the paper's actual formulation: "
    "within-cluster near-dup pairs form a graph, each connected "
    "component is one semantic-duplicate group, exactly one member "
    "(smallest id) survives. Fixes the pairwise rule's chain "
    "artifact (a~b, b~c, a!~c: pairwise drops b AND c; components "
    "keep a as the one representative of the chain). Spark solves "
    "the dup-only pair graph via union-find/label-propagation "
    "(connected_components); the oracle is the recursive-CTE "
    "closure over the replayed training + pair scan. Scale: the "
    "pair graph holds only duplicates — orders of magnitude smaller "
    "than the corpus.",
)
def q_semdedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.curation import semdedup_components

    return semdedup_components(_emb(spark, sf_dir), k=8, iterations=2, tau=_TAU)


@query(
    "q_semdedup_two_level",
    sql_semdedup_two_level(k=4, k2=4, iterations=2, tau=_TAU),
    doc="two-level (hierarchical) SemDeDup — the skew mitigation made "
    "concrete: a top-level 4-means splits the corpus, EVERY top "
    "cluster trains its own 4-means over its members, and the pair "
    "stage runs within (cid, sub_cid) cells — bounded by the largest "
    "SUB-cluster even when the top level is skewed. The oracle "
    "replays all 5 trainings (top + 4 sub-chains, the per-subspace "
    "PQ oracle pattern) and the cell-local pair scan. Trade "
    "documented: dup recall at sub-cluster boundaries, same as "
    "raising k.",
)
def q_semdedup_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.curation import semdedup_two_level

    return semdedup_two_level(
        _emb(spark, sf_dir), k=4, k2=4, iterations=2, tau=_TAU
    )


@query(
    "q_data_card",
    f"""
    WITH {sql_gopher_ctes(stopwords=_GSTOP, prefix="dc_")},
    verdicts AS (
      SELECT doc_id, {sql_gopher_passes()} AS passes FROM dc_m
    ), per_doc AS (
      SELECT d.source, d.doc_id, d.lang,
             len(string_split(d.text, ' ')) AS n_tok,
             md5(d.text) AS th,
             v.passes
      FROM documents d JOIN verdicts v USING (doc_id)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(*) - count(DISTINCT th) AS BIGINT) AS n_exact_dups,
           CAST(sum(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quality_pass,
           CAST(floor(sum(CASE WHEN passes THEN 1 ELSE 0 END)
                      * 1000000.0 / count(*) + 0.5) AS BIGINT)
             AS pass_rate_micro
    FROM per_doc
    GROUP BY source
    """,
    doc="per-source data card — the corpus report a dataset release "
    "ships with: document/token counts, language spread, exact-"
    "duplicate count (md5 text collisions within the source), and "
    "the Gopher-rule quality pass rate, one row per source. Composes "
    "the rule verdicts (map-only) with a single per-source aggregate; "
    "ratios floor to micro ints once. Scale: one scan through the "
    "verdict map stage, ONE map-combined groupBy to source-count "
    "rows; the distinct-hash dedup count shuffles digests only.",
)
def q_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.textstats import gopher_rules

    docs = _docs(spark, sf_dir)
    verdicts = gopher_rules(docs, stopwords=_GSTOP).select(
        "doc_id", "passes"
    )
    per_doc = docs.join(verdicts, "doc_id").select(
        "source",
        "lang",
        F.size(F.split("text", " ")).alias("n_tok"),
        F.md5("text").alias("th"),
        "passes",
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.count_distinct("lang").cast("long").alias("n_langs"),
        (F.count("*") - F.count_distinct("th"))
        .cast("long")
        .alias("n_exact_dups"),
        F.sum(F.when(F.col("passes"), 1).otherwise(0))
        .cast("long")
        .alias("n_quality_pass"),
        F.floor(
            F.sum(F.when(F.col("passes"), 1).otherwise(0))
            * F.lit(1000000.0)
            / F.count("*")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("pass_rate_micro"),
    )


# ---------------------------------------------------------------------------
# Contrastive triplet mining (round 8)
# ---------------------------------------------------------------------------
_TRIPLET_TAU_MICRO = 450_000  # fround(cos, 6) >= 0.45, as exact micro ints


def _triplets_oracle() -> str:
    from huckli_spark.operators.curation import sql_semdedup_ctes

    cos = (
        "list_dot_product(a.e, b.e)"
        " / (sqrt(list_dot_product(a.e, a.e))"
        " * sqrt(list_dot_product(b.e, b.e)))"
    )
    return f"""
    WITH {sql_semdedup_ctes(8, 2, 0.45)},
    pairs AS (
      SELECT a.vec_id AS anchor, b.vec_id AS other,
             CAST(floor(({cos}) * 1000000.0 + 0.5) AS BIGINT) AS sim_micro
      FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id <> b.vec_id
    ), pos AS (
      SELECT anchor, other AS positive, sim_micro AS pos_sim_micro,
             row_number() OVER (
               PARTITION BY anchor ORDER BY sim_micro DESC, other
             ) AS rn
      FROM pairs WHERE sim_micro >= {_TRIPLET_TAU_MICRO}
    ), neg AS (
      SELECT anchor, other AS negative, sim_micro AS neg_sim_micro,
             row_number() OVER (
               PARTITION BY anchor ORDER BY sim_micro DESC, other
             ) AS rn
      FROM pairs WHERE sim_micro < {_TRIPLET_TAU_MICRO}
    )
    SELECT p.anchor, p.positive, n.negative,
           p.pos_sim_micro, n.neg_sim_micro
    FROM pos p JOIN neg n ON n.anchor = p.anchor AND n.rn = 1
    WHERE p.rn = 1
    """


@query(
    "q_training_triplets",
    _triplets_oracle(),
    doc="contrastive triplet mining for embedding-model training "
    "(SimCSE/DPR-style dataset construction): within each k-means "
    "cluster, every anchor that has a semantic near-dup pairs its "
    "highest-cosine duplicate as the POSITIVE and its highest-cosine "
    "same-cluster NON-duplicate as the hard NEGATIVE — close enough "
    "to be confusable, below the dup threshold, exactly the examples "
    "contrastive losses need. All similarities are exact micro "
    "integers; ties break on id. The oracle replays the quantizer "
    "training and both rank windows. Scale: pairs key on cid only "
    "(cluster-bounded, the SemDeDup discipline) and each anchor "
    "keeps two rows — output is O(n), never O(n^2).",
)
def q_training_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # perf shape + the round-8 norm-hoist/struct-max rewrite live in
    # operators.curation.mine_triplets (extracted round 9 so the
    # scale probe can vary k — the cluster-geometry knob)
    from huckli_spark.operators.curation import mine_triplets

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return mine_triplets(emb, k=8, iterations=2,
                         tau_micro=_TRIPLET_TAU_MICRO)


# ---------------------------------------------------------------------------
# Quality-vs-token-budget curve (round 8)
# ---------------------------------------------------------------------------
_QB_SCORE_SQL = """
    scored AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             length(text) AS n_ch,
             length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
               AS n_punct,
             len(list_filter(string_split(text, ' '),
                 w -> w IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it')))
               AS n_stop
      FROM documents
    ), q AS (
      SELECT doc_id, n_tokens,
             CAST(floor((
               CASE WHEN n_tokens >= 40 THEN 1.0 ELSE n_tokens / 40.0 END * 0.5
               + CASE WHEN n_tokens > 0
                      THEN (n_stop * 1.0 / n_tokens) * 2.0 ELSE 0 END * 0.3
               + CASE WHEN n_ch > 0
                      THEN (1.0 - n_punct * 1.0 / n_ch) ELSE 0 END * 0.2
             ) * 1000000.0 + 0.5) AS BIGINT) AS score_micro
      FROM scored
    )
"""


@query(
    "q_quality_budget",
    f"""
    WITH {_QB_SCORE_SQL},
    tiled AS (
      SELECT doc_id, n_tokens, score_micro,
             ntile(10) OVER (ORDER BY score_micro DESC, doc_id) AS decile
      FROM q
    ), per AS (
      SELECT CAST(decile AS INT) AS decile,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS tokens,
             CAST(min(score_micro) AS BIGINT) AS min_score_micro
      FROM tiled GROUP BY decile
    )
    SELECT decile, n_docs, tokens,
           CAST(sum(tokens) OVER (ORDER BY decile) AS BIGINT) AS cum_tokens,
           min_score_micro
    FROM per
    """,
    doc="quality-vs-token-budget curve — the data-selection decision "
    "artifact: docs rank into deciles by the heuristic quality score "
    "(micro-int, so the order is exact on both engines; ties on "
    "doc_id), and each decile reports docs, tokens, CUMULATIVE "
    "tokens and its score floor — read off 'train on the top X "
    "deciles' directly against a token budget. The Spark side uses "
    "skew.exact_ntile — the distributed-ranking decomposition "
    "(score-domain-bounded histogram + per-score-group windows), "
    "bit-identical to NTILE over (score DESC, doc_id) but with NO "
    "single-partition global sort; the oracle uses plain NTILE, so "
    "the hash match PROVES the decomposition. The decision table "
    "stays 10 rows at any corpus size.",
)
def q_quality_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from huckli_spark.operators.skew import exact_ntile
    from huckli_spark.operators.textstats import quality_score

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    q = quality_score(docs).select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.floor(F.col("score") * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("score_micro"),
    )
    per = (
        exact_ntile(
            q, 10, score_col="score_micro", id_col="doc_id", out_col="decile"
        )
        .groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("tokens"),
            F.min("score_micro").cast("long").alias("min_score_micro"),
        )
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return per.select(
        "decile",
        "n_docs",
        "tokens",
        F.sum("tokens").over(wc).cast("long").alias("cum_tokens"),
        "min_score_micro",
    )


# ------------------------------------------------ DoReMi domain mixture
@query(
    "q_doremi_mixture",
    None,  # filled below (the generator shares _LR_LABEL_SQL)
    doc="DoReMi-style domain-mixture optimization (arXiv:2305.10429, "
    "Group DRO): reference logreg trained uniform, proxy logreg "
    "continued per round under domain-weighted batch GD, per-domain "
    "EXCESS log-loss (micro-nats, clamped sigmoid) drives a "
    "linearized multiplicative-weights update with floor-integer "
    "normalization and uniform smoothing. Output = the full "
    "(round, domain) trajectory, so the hash pins reference "
    "training, every weighted proxy step, every loss pass, and "
    "every lambda update. Domains = lang (5). Scale: all aggregates "
    "land on bounded relations (B+1 gradient cells, |domains| loss/ "
    "weight rows); the corpus is scanned per inner step, never "
    "shuffled on a data-sized key.",
)
def q_doremi_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.mixture import doremi_mixture

    label = F.expr(
        "array_contains(split(text, ' '), 'spark')"
        " OR array_contains(split(text, ' '), 'sql')"
    )
    return doremi_mixture(_docs(spark, sf_dir), label)


def _fill_doremi_oracle() -> None:
    from huckli_spark.operators.mixture import sql_doremi
    from huckli_spark.queries import _REGISTRY, QuerySpec

    old = _REGISTRY["q_doremi_mixture"]
    _REGISTRY["q_doremi_mixture"] = QuerySpec(
        name=old.name,
        build=old.build,
        oracle=sql_doremi(_LR_LABEL_SQL),
        doc=old.doc,
    )


_fill_doremi_oracle()


# ---------------------------------------------------------------------------
# exact ROC-AUC of the quality scorer (round 10): the ranking-quality
# eval a filter pipeline runs before trusting a scorer's threshold.
# ---------------------------------------------------------------------------
def _auc_oracle() -> str:
    from huckli_spark.queries.text_pipeline import quality_score_ctes

    sm = f"CAST(floor({sql_fround('score', 6)} * 1000000 + 0.5) AS BIGINT)"
    return f"""
    WITH {quality_score_ctes()},
    s AS (
      SELECT {sm} AS sm,
             CASE WHEN list_contains(string_split(d.text, ' '), 'spark')
                  THEN 1 ELSE 0 END AS y
      FROM q JOIN documents d USING (doc_id)
    ), hist AS (
      SELECT sm, count(*) AS c, sum(y) AS p FROM s GROUP BY 1
    ), pref AS (
      SELECT sm, c, p,
             coalesce(sum(c) OVER (ORDER BY sm
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS L
      FROM hist
    ), agg AS (
      SELECT CAST(sum(p) AS BIGINT) AS n_pos,
             CAST(sum(c) - sum(p) AS BIGINT) AS n_neg,
             CAST(sum(p * (2 * L + c + 1)) AS BIGINT) AS r2
      FROM pref
    )
    SELECT n_pos, n_neg,
           CAST(r2 - n_pos * (n_pos + 1) AS BIGINT) AS u_times_2,
           {sql_fround(
               '(r2 - n_pos * (n_pos + 1)) / (2.0 * n_pos * n_neg)', 6
           )} AS auc
    FROM agg
    """


@query(
    "q_classifier_auc",
    _auc_oracle(),
    doc="exact ROC-AUC (Mann-Whitney rank statistic, average ranks on "
    "ties) of the heuristic quality score against the learnable "
    "contains-'spark' label — the ranking-quality eval run on a "
    "filter's scorer before trusting its threshold. Scores lift to "
    "micro-integers so tie groups are exact; the doubled rank sum "
    "keeps every intermediate an integer (order-free), and only the "
    "final AUC divides. Scale: one distinct-score histogram + the "
    "two-phase DISTRIBUTED exclusive prefix (micro-int domains can "
    "approach corpus cardinality — no single-partition ordered "
    "window) + one global aggregate. The oracle replays the scorer "
    "(shared quality_score_ctes generator), the histogram, the "
    "prefix, and the rank algebra.",
)
def q_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.classifier import auc_exact
    from huckli_spark.operators.textstats import quality_score

    scored = quality_score(_docs(spark, sf_dir), text_col="text")
    s = scored.select(
        F.floor(fround(F.col("score"), 6) * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("score_micro"),
        F.array_contains(F.split(F.col("text"), " "), "spark")
        .cast("long")
        .alias("y"),
    )
    return auc_exact(s)


# ---------------------------------------------------------------------------
# calibration curve of the held-out classifier (round 10): AUC says
# the scorer RANKS; calibration says its probabilities MEAN something
# — the standard eval pair before a filter threshold ships.
# ---------------------------------------------------------------------------
def _calibration_oracle() -> str:
    # fixed-width reliability bins over the HELD-OUT scores: bin =
    # min(p_micro div 100000, 9) — pure integer arithmetic, and the
    # whole holdout oracle (training included) nests as a subquery
    return f"""
    SELECT CAST(least(p_micro // 100000, 9) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pos,
           CAST(sum(p_micro) AS BIGINT) AS sum_p_micro,
           {sql_fround('sum(p_micro) / (count(*) * 1000000.0)', 6)}
             AS mean_p,
           {sql_fround(
               'sum(CASE WHEN is_target THEN 1 ELSE 0 END) * 1.0 '
               '/ count(*)', 6
           )} AS frac_pos
    FROM ({sql_logreg_holdout(_LR_LABEL_SQL, "doc_id % 5 <> 0")}) s
    WHERE NOT is_train
    GROUP BY 1
    """


@query(
    "q_calibration_curve",
    _calibration_oracle(),
    doc="reliability diagram of the held-out classifier — the eval "
    "pair-partner of q_classifier_auc: AUC certifies the scorer "
    "RANKS, calibration certifies its probabilities MEAN something "
    "before a threshold ships. Held-out scores (the leakage-free "
    "q_logreg_holdout training, reused via its oracle generator "
    "nesting as a subquery) drop into fixed-width micro-integer "
    "probability bins (bin = min(p_micro div 100000, 9) — pure "
    "integer arithmetic, no NTILE), each bin reporting n, positives, "
    "the exact integer probability mass, and the rounded "
    "mean-predicted vs empirical-positive rates. Scale: the training "
    "is the gated fixed-point GD (gradient cells bounded by buckets); "
    "the curve is one map-side-combined groupBy over held-out rows.",
)
def q_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.classifier import logreg_holdout_table

    scores = logreg_holdout_table(
        _docs(spark, sf_dir), _lr_label(), F.expr("doc_id % 5 <> 0")
    ).where(~F.col("is_train"))
    return (
        scores.select(
            F.least(
                (F.col("p_micro") / 100000).cast("long"), F.lit(9)
            ).alias("bin"),
            "p_micro",
            F.col("is_target").cast("int").alias("y"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
            F.sum("p_micro").cast("long").alias("sum_p_micro"),
            fround(
                F.sum("p_micro") / (F.count("*") * 1000000.0), 6
            ).alias("mean_p"),
            fround(F.sum("y") * 1.0 / F.count("*"), 6).alias("frac_pos"),
        )
    )


# ---------------------------------------------------------------------------
# operating-point sweep (round 10): the third leg of the scorer-eval
# suite — AUC (ranks), calibration (probabilities), and now the
# threshold table a filter's cutoff is actually chosen from.
# ---------------------------------------------------------------------------
def _threshold_sweep_oracle() -> str:
    return f"""
    SELECT CAST(t.t AS BIGINT) AS thresh_micro,
           CAST(sum(CASE WHEN p_micro >= t.t AND is_target
                         THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN p_micro >= t.t AND NOT is_target
                         THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN p_micro < t.t AND is_target
                         THEN 1 ELSE 0 END) AS BIGINT) AS fn
    FROM ({sql_logreg_holdout(_LR_LABEL_SQL, "doc_id % 5 <> 0")}) s
    CROSS JOIN (SELECT (range + 1) * 100000 AS t FROM range(9)) t
    WHERE NOT is_train
    GROUP BY 1
    """


@query(
    "q_threshold_sweep",
    _threshold_sweep_oracle(),
    doc="operating-point table of the held-out classifier — the third "
    "leg of the scorer-eval suite (q_classifier_auc ranks, "
    "q_calibration_curve probabilities, this picks the CUTOFF): for "
    "each of nine micro-integer thresholds 0.1..0.9, the exact "
    "(tp, fp, fn) confusion counts over held-out rows — precision/"
    "recall/F1 derive exactly from these integers downstream, so the "
    "gate hashes pure counts. Scale: scores broadcast-join the "
    "9-row threshold relation (a constant-size expansion), one "
    "map-side-combined groupBy. The oracle nests the leakage-free "
    "holdout training as a subquery (shared generator).",
)
def q_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.classifier import logreg_holdout_table

    scores = logreg_holdout_table(
        _docs(spark, sf_dir), _lr_label(), F.expr("doc_id % 5 <> 0")
    ).where(~F.col("is_train"))
    thresholds = (
        scores.sparkSession.range(9)
        .select(((F.col("id") + 1) * 100000).cast("long").alias("thresh_micro"))
    )
    hit = F.col("p_micro") >= F.col("thresh_micro")
    pos = F.col("is_target")
    return (
        scores.crossJoin(F.broadcast(thresholds))
        .groupBy("thresh_micro")
        .agg(
            F.sum((hit & pos).cast("int")).cast("long").alias("tp"),
            F.sum((hit & ~pos).cast("int")).cast("long").alias("fp"),
            F.sum((~hit & pos).cast("int")).cast("long").alias("fn"),
        )
    )
