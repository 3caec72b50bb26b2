"""Empirical scaling probe for the dedup / ANN family (VERDICT r04 #3).

SCALE.md's shuffle inventory is a design argument; this tool measures.
It replicates the sf0.1 ``documents`` / ``embeddings`` fixtures at
1x / 3x / 10x with *decorrelated* copies — every word in copy *i* is
salted with a per-copy token, and every embedding coordinate is
deterministically perturbed — so near-duplicate density per row stays
constant across scales. (A naive N-way union would make every doc an
exact dup of its N-1 clones and the pair count would grow O(N^2) for
structural reasons, telling us nothing about the engine.)

For each scale it runs the four heaviest pipelines (MinHash+LSH,
guarded n-gram Jaccard, SimHash, IVF ANN), and records wall seconds
plus per-run shuffle-write / input bytes scraped from the Spark UI
REST API (the same numbers the History Server shows on a cluster).

Output: one JSON blob on stdout + ``SCALE_PROBE.json`` at the repo
root; the summarized table lives in SCALE.md.

Usage: python tools/scale_probe.py [--scales 1,3,10] [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from huckli_spark.session import get_spark
from huckli_spark.operators import (
    bloom,
    retrieval,
    clustering,
    curation,
    dedup,
    freq,
    packing,
    privacy,
    simsearch,
    sketch,
)


def _pq_adc_pipeline(emb: DataFrame) -> int:
    """fixed 100-query ADC search over the scaled corpus' codes."""
    cbs = simsearch.pq_codebooks(emb)
    codes = simsearch.pq_encode(emb, cbs)
    queries = emb.where(F.col("vec_id") < 100)
    return simsearch.pq_adc_topk(codes, queries, cbs, k=5).count()


def _bloom_pipeline(docs: DataFrame) -> int:
    """bigram membership vs the first source as holdout (mirrors
    q_bloom_decontaminate's shape at probe scale)."""
    bigrams = docs.select(F.split("text", " ").alias("__w"), "source").select(
        F.explode(
            F.expr(
                "CASE WHEN size(__w) < 2 THEN array()"
                " ELSE transform(sequence(0, size(__w) - 2),"
                " i -> concat(element_at(__w, i + 1), ' ', element_at(__w, i + 2)))"
                " END"
            )
        ).alias("key"),
        "source",
    )
    cand = bigrams.where("source <> 'src0'").select("key").distinct()
    mem = bigrams.where("source = 'src0'").select("key").distinct()
    return bloom.bloom_filter_keys(cand, "key", mem, "key").count()

def _bm25_topk_pipeline(docs: DataFrame) -> int:
    """q_bm25_topk's exact shape over the term-preserving fixture:
    returns the scored-set size (the growing quantity); the wall
    includes materializing the global top-10 through the rank
    window."""
    from pyspark.sql import Window

    bm = retrieval.bm25_score(docs, BM25_PROBE_TERMS)
    w = Window.orderBy(F.desc("score_bm25"), F.asc("doc_id"))
    top = (
        bm.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
    )
    n_scored, _top10 = bm.count(), top.collect()
    return n_scored


WORK = "/tmp/huckli_scale_probe"


# ---------------------------------------------------------------- REST metrics
def _rest(spark: SparkSession, path: str):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=10) as r:
        return json.load(r)


def _app_id(spark: SparkSession) -> str:
    return spark.sparkContext.applicationId


def _max_stage_id(spark: SparkSession) -> int:
    stages = _rest(spark, f"applications/{_app_id(spark)}/stages")
    return max((s["stageId"] for s in stages), default=-1)


def _stage_totals(spark: SparkSession, after_stage: int) -> dict:
    """Sum shuffle/input bytes over stages with stageId > after_stage."""
    stages = _rest(spark, f"applications/{_app_id(spark)}/stages?status=complete")
    tot = {"shuffle_write_bytes": 0, "shuffle_read_bytes": 0, "input_bytes": 0}
    for s in stages:
        if s["stageId"] > after_stage:
            tot["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
            tot["shuffle_read_bytes"] += s.get("shuffleReadBytes", 0)
            tot["input_bytes"] += s.get("inputBytes", 0)
    return tot


# ---------------------------------------------------------------- fixtures
def _scaled_documents(spark: SparkSession, base: DataFrame, scale: int) -> str:
    """Union `scale` decorrelated copies; returns the parquet path."""
    path = f"{WORK}/x{scale}/documents.parquet"
    if os.path.exists(path):
        return path
    parts = []
    for i in range(scale):
        c = base.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            # salt every word with a copy token: shingles of copy i share
            # nothing with copy j, so dup density per row is scale-invariant
            (
                F.col("text")
                if i == 0
                else F.regexp_replace(F.col("text"), r"(\S+)", rf"$1c{i}")
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(path)
    return path


def _scaled_events(spark: SparkSession, base: DataFrame, scale: int) -> str:
    """Union `scale` decorrelated event copies: users and event ids
    shift per copy (so per-user event density — the quantity that
    drives window state and attribution pair counts — stays constant
    across scales), timestamps/values/types unchanged."""
    path = f"{WORK}/x{scale}/events.parquet"
    if os.path.exists(path):
        return os.path.dirname(path)
    parts = []
    for i in range(scale):
        parts.append(
            base.select(
                (F.col("event_id") + F.lit(i * 1_000_000_000)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(i * 1_000_000)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    out.repartition(32).write.mode("overwrite").parquet(path)
    return os.path.dirname(path)


def _hll_users(spark: SparkSession, ev_dir: str) -> int:
    """q_hll_registers' register-build shape over the scaled events'
    user_id (the fixture query keys on lineitem; the scaled relation
    here is events, so the probe re-derives the same dataflow)."""
    ev = spark.read.parquet(f"{ev_dir}/events.parquet")
    hx = F.md5(F.concat(F.lit("hll:"), F.col("user_id").cast("string")))
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
    regs = (
        ev.select("event_type", hx.alias("hx"))
        .select(
            "event_type",
            (F.conv(F.substring("hx", 1, 2), 16, 10).cast("long") % 64).alias(
                "bucket"
            ),
            rho.alias("rho"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("register"))
    )
    return regs.count()


BM25_PROBE_TERMS = ["spark", "join", "filter"]


def _scaled_documents_keepterms(
    spark: SparkSession, base: DataFrame, scale: int
) -> str:
    """Like _scaled_documents, but the BM25 probe terms survive the
    per-copy salting — so the MATCH SET grows with scale and the
    scoring + rank-limit window path is stressed, not just the scan
    (VERDICT r6 #4: the fully-salted fixture held out_rows constant
    and never exercised top-k over a growing scored set)."""
    path = f"{WORK}/x{scale}/documents_keepterms.parquet"
    if os.path.exists(path):
        return path
    keep = ", ".join(f"'{t}'" for t in BM25_PROBE_TERMS)
    parts = []
    for i in range(scale):
        text = (
            F.col("text")
            if i == 0
            else F.expr(
                "array_join(transform(split(text, ' '), w -> "
                f"CASE WHEN w IN ({keep}) THEN w"
                f" ELSE concat(w, 'c{i}') END), ' ')"
            )
        )
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                text.alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(path)
    return path


def _scaled_embeddings(spark: SparkSession, base: DataFrame, scale: int) -> str:
    path = f"{WORK}/x{scale}/embeddings.parquet"
    if os.path.exists(path):
        return path
    parts = []
    for i in range(scale):
        c = base.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, j: x + F.lit(float(i)) * 0.01 * ((j % 7).cast("double") - 3.0),
            ).alias("embedding"),
            "label",
        )
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(path)
    return path


# ---------------------------------------------------------------- pipelines
def _run(spark: SparkSession, name: str, fn, repeats: int, only=None) -> dict:
    if only is not None and name not in only:
        return None
    best = None
    for _ in range(repeats):
        mark = _max_stage_id(spark)
        t0 = time.monotonic()
        out_rows = fn()
        wall = time.monotonic() - t0
        m = _stage_totals(spark, mark)
        rec = {"wall_s": round(wall, 3), "out_rows": out_rows, **m}
        if best is None or rec["wall_s"] < best["wall_s"]:
            best = rec
    return best


def probe(scales, repeats: int, only=None) -> dict:
    spark = get_spark(app_name="scale_probe")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb0 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    results: dict = {"sf_dir": sf_dir, "scales": {}}
    for scale in scales:
        dpath = _scaled_documents(spark, docs0, scale)
        epath = _scaled_embeddings(spark, emb0, scale)
        docs = spark.read.parquet(dpath)
        emb = spark.read.parquet(epath)
        n_docs, n_emb = docs.count(), emb.count()
        queries = emb.where(F.col("vec_id") < 100)  # fixed query set, all scales

        runs = {}
        runs["minhash"] = _run(
            spark,
            "minhash",
            lambda: sketch.minhash_dedup_pairs(docs, threshold=0.9).count(),
            repeats,
            only,
        )
        runs["ngram_jaccard_guarded"] = _run(
            spark,
            "ngram_jaccard_guarded",
            lambda: dedup.jaccard_pairs(
                docs, threshold=0.8, max_doc_freq=max(50, n_docs // 100)
            ).count(),
            repeats,
            only,
        )
        runs["simhash"] = _run(
            spark,
            "simhash",
            lambda: sketch.simhash_pairs(docs, max_hamming=3).count(),
            repeats,
            only,
        )
        runs["ivf_ann"] = _run(
            spark,
            "ivf_ann",
            lambda: simsearch.ivf_topk(
                emb, queries, n_centroids=8, nprobe=2, k=5
            ).count(),
            repeats,
            only,
        )
        # round-5 additions: map-only scrub, bloom membership, packing,
        # count-min — expected shapes: pii linear wall / zero shuffle;
        # bloom + cms shuffle O(distinct keys); packing one shard window
        runs["pii_scrub"] = _run(
            spark,
            "pii_scrub",
            lambda: privacy.pii_scrub(docs).agg(F.sum("n_pii")).collect()
            and docs.count(),
            repeats,
            only,
        )
        runs["bloom_membership"] = _run(
            spark,
            "bloom_membership",
            lambda: _bloom_pipeline(docs),
            repeats,
            only,
        )
        runs["sequence_pack"] = _run(
            spark,
            "sequence_pack",
            # aggregate over seq_idx so Catalyst cannot prune the window
            # (a bare count() would drop the whole pack computation)
            lambda: packing.pack_sequences(docs, budget=512, n_shards=32)
            .agg(F.max("seq_idx"), F.count("*"))
            .collect()[0][1],
            repeats,
            only,
        )
        # events family: the scaled dir is a full fixture dir for
        # events-only registry queries, so the probes run the EXACT
        # gated query plans
        ev_dir = _scaled_events(
            spark, spark.read.parquet(f"{sf_dir}/events.parquet"), scale
        )
        from huckli_spark.queries import all_queries

        _q = all_queries()
        runs["attribution"] = _run(
            spark,
            "attribution",
            # aggregate over credit_micro so Catalyst cannot prune the
            # window/credit pipeline (count() keeps only the group
            # keys and optimizes the windows away — measured: the
            # "query" then shuffles 2 records instead of the matched
            # pair set; same pitfall as the sequence_pack probe)
            lambda: int(
                _q["q_attribution"]
                .build(spark, ev_dir)
                .agg(F.sum("credit_micro"), F.sum("n_touches"))
                .collect()[0][1]
            ),
            repeats,
            only,
        )
        runs["event_transitions"] = _run(
            spark,
            "event_transitions",
            lambda: _q["q_event_transitions"].build(spark, ev_dir).count(),
            repeats,
            only,
        )
        runs["pca_power"] = _run(
            spark,
            "pca_power",
            # the corpus-touched-once claim: the covariance aggregate
            # scales with rows, the 8 squaring rounds run on the d^2
            # relation regardless — wall should barely move; embeddings
            # dir doubles as a fixture dir for the registry query
            lambda: _q["q_pca_power"]
            .build(spark, os.path.dirname(epath))
            .agg(F.sum(F.abs(F.col("loading_micro"))))
            .collect()[0][0],
            repeats,
            only,
        )
        runs["hll_user_registers"] = _run(
            spark,
            "hll_user_registers",
            # bounded-sketch claim: register relation <= groups x 64
            # rows at ANY input size (here: distinct user cardinality
            # grows 10x, the shuffle does not)
            lambda: _hll_users(spark, ev_dir),
            repeats,
            only,
        )
        runs["segment_dedup"] = _run(
            spark,
            "segment_dedup",
            # sum of reconstructed-text lengths so Catalyst cannot prune
            # the string_agg reconstruction (a bare count() would)
            lambda: dedup.segment_dedup(docs)
            .agg(F.sum(F.length("kept_text")), F.sum("n_kept"))
            .collect()[0][1],
            repeats,
            only,
        )
        runs["countmin_topk"] = _run(
            spark,
            "countmin_topk",
            lambda: freq.cms_heavy_hitters(
                docs.select(F.explode(F.split("text", " ")).alias("w")), "w", k=20
            ).count(),
            repeats,
            only,
        )
        runs["fuzzy_join_guarded"] = _run(
            spark,
            "fuzzy_join_guarded",
            # doc-level near-title matching: first 5 words as the "title";
            # the variant-frequency guard is what keeps this linear
            lambda: dedup.fuzzy_pairs(
                docs.select(
                    "doc_id",
                    F.expr(
                        "array_join(slice(split(text, ' '), 1, 5), ' ')"
                    ).alias("name"),
                ),
                str_col="name",
                max_variant_freq=max(50, n_docs // 100),
            ).count(),
            repeats,
            only,
        )
        runs["pq_encode"] = _run(
            spark,
            "pq_encode",
            lambda: simsearch.pq_encode(
                emb, simsearch.pq_codebooks(emb)
            ).count(),
            repeats,
            only,
        )
        runs["pq_adc"] = _run(
            spark,
            "pq_adc",
            lambda: _pq_adc_pipeline(emb),
            repeats,
            only,
        )
        runs["bm25"] = _run(
            spark,
            "bm25",
            # corpus scan + singleton broadcast; agg keeps the score
            # expression alive (a bare count() would prune it)
            lambda: retrieval.bm25_score(docs, ["spark", "join", "filter"])
            .agg(F.count("*"), F.sum("score_bm25"))
            .collect()[0][0],
            repeats,
            only,
        )
        runs["bm25_topk_growing"] = _run(
            spark,
            "bm25_topk_growing",
            # terms preserved in every copy -> scored set grows with
            # scale; runs the FULL q_bm25_topk shape (score + global
            # top-10 rank window). out_rows = scored-set size (must
            # scale ~linearly); the rank path must stay a pushed-down
            # partial top-k (plan-pinned in tests/test_plans.py).
            lambda: _bm25_topk_pipeline(
                spark.read.parquet(
                    _scaled_documents_keepterms(spark, docs0, scale)
                )
            ),
            repeats,
            only,
        )
        runs["chunk_windows"] = _run(
            spark,
            "chunk_windows",
            # aggregate over n_tok AND chunk_text length so the slice
            # + join expressions cannot be pruned
            lambda: retrieval.chunk_windows(docs)
            .agg(F.count("*"), F.sum("n_tok"),
                 F.sum(F.length("chunk_text")))
            .collect()[0][0],
            repeats,
            only,
        )
        runs["pq_trained_train"] = _run(
            spark,
            "pq_trained_train",
            # the 8-subspace k-means training cost (k=16, 2 iterations)
            lambda: len(simsearch.pq_codebooks_trained(emb, iterations=2)),
            repeats,
            only,
        )
        runs["kmeans"] = _run(
            spark,
            "kmeans",
            lambda: clustering.kmeans_table(emb, k=8, iterations=3).count(),
            repeats,
            only,
        )
        runs["semdedup"] = _run(
            spark,
            "semdedup",
            # SemDeDup's operating discipline: k scales with the corpus
            # so cluster size (and the per-cluster quadratic pair term)
            # stays constant — the probe's k = 8 * scale mirrors the
            # paper's ~1k-doc clusters at any corpus size. agg keeps
            # the is_dup expression alive.
            lambda: curation.semdedup(
                emb, k=8 * scale, iterations=2, tau=0.45
            )
            .agg(F.count("*"), F.sum(F.col("is_dup").cast("int")))
            .collect()[0][0],
            repeats,
            only,
        )
        # SCREENING cost with a frozen quantizer: the first 200 base
        # vectors are the batch at every scale, the scaled corpus is
        # "existing", centroids precomputed OUTSIDE the timer (the
        # production amortization). k scales with the corpus so
        # cluster density is constant -> the screening joins should
        # stay ~flat while the corpus grows 10x.
        if only is None or "semdedup_incremental_screen" in only:
            _frozen_cents = clustering.kmeans_fit(
                emb, k=8 * scale, iterations=2
            )
            _screen_batch = emb.where(F.col("vec_id") < 200)
            runs["semdedup_incremental_screen"] = _run(
                spark,
                "semdedup_incremental_screen",
                lambda: curation.semdedup_incremental(
                    emb, _screen_batch, tau=0.45, cents=_frozen_cents
                )
                .agg(F.count("*"), F.sum(F.col("is_dup").cast("int")))
                .collect()[0][0],
                repeats,
                only,
            )
        runs["logreg_train"] = _run(
            spark,
            "logreg_train",
            # full fixed-point GD training (8 iterations, 64 buckets)
            # on the scaled corpus; per-iteration cost is one corpus
            # scan down to 65 gradient cells — expect ~linear wall
            lambda: (
                lambda df: len(
                    __import__(
                        "huckli_spark.operators.classifier",
                        fromlist=["logreg_table"],
                    ).logreg_table(
                        df,
                        F.expr(
                            "array_contains(split(text, ' '), 'spark')"
                        ),
                    ).collect()
                )
            )(docs),
            repeats,
            only,
        )
        runs["dsir"] = _run(
            spark,
            "dsir",
            # hashed-ngram scoring: one explode + 256-bucket agg +
            # broadcast join; salted copies shift the bucket
            # distributions but not the plan shape
            lambda: curation.dsir_select(
                docs, F.col("lang") == "en", keep=100
            )
            .agg(
                F.count("*"),
                F.sum("w_micro"),
                F.sum(F.col("selected").cast("int")),
            )
            .collect()[0][0],
            repeats,
            only,
        )
        runs = {k: v for k, v in runs.items() if v is not None}
        results["scales"][str(scale)] = {
            "n_docs": n_docs,
            "n_emb": n_emb,
            "runs": runs,
        }
        print(f"== scale x{scale}: {json.dumps(runs)}", file=sys.stderr)

    # linearity summary: wall and shuffle ratios vs the 1x run
    base = results["scales"][str(scales[0])]["runs"]
    summary = {}
    for q in base:
        summary[q] = {
            str(s): {
                "wall_ratio": round(
                    results["scales"][str(s)]["runs"][q]["wall_s"]
                    / max(base[q]["wall_s"], 1e-9),
                    2,
                ),
                "shuffle_ratio": round(
                    results["scales"][str(s)]["runs"][q]["shuffle_write_bytes"]
                    / max(base[q]["shuffle_write_bytes"], 1),
                    2,
                ),
                "rows_ratio": round(
                    results["scales"][str(s)]["runs"][q]["out_rows"]
                    / max(base[q]["out_rows"], 1),
                    2,
                ),
            }
            for s in scales
        }
    results["summary_vs_1x"] = summary
    results["loadavg"] = os.getloadavg()
    return results


# ---------------------------------------------------------------- graph probe
def _skewed_edges(spark: SparkSession, scale: int) -> str:
    """Deterministic power-law-ish graph: a fixed 20k-node universe
    with 5% of edge endpoints pinned to 5 hub nodes, edge count
    scaled — so hub DEGREE grows linearly with scale (the regime
    where id-oriented triangle counting squares the celebrity wedge
    fan-out while degree orientation bounds it by sqrt(m))."""
    path = f"{WORK}/graph_x{scale}/edges.parquet"
    if os.path.exists(path):
        return path
    m, n, hubs = 100_000 * scale, 20_000, 5
    # hub ids scattered mid-range (hash), so id orientation cannot
    # accidentally help by making hubs sinks
    raw = spark.range(m).select(
        F.when(
            (F.col("id") % 20) == 0,
            (F.abs(F.xxhash64(F.col("id"), F.lit(7))) % hubs) * 3943 + 2500,
        )
        .otherwise(F.abs(F.xxhash64(F.col("id"), F.lit(1))) % n)
        .alias("u"),
        (F.abs(F.xxhash64(F.col("id"), F.lit(2))) % n).alias("v"),
    )
    edges = (
        raw.where("u <> v")
        .select(
            F.least("u", "v").alias("s1"), F.greatest("u", "v").alias("s2")
        )
        .distinct()
    )
    edges.repartition(32).write.mode("overwrite").parquet(path)
    return path


def graph_probe(scales, repeats: int) -> dict:
    from huckli_spark.operators.graph import triangles_per_node

    spark = get_spark(app_name="graph_probe")
    results: dict = {"scales": {}}
    for scale in scales:
        edges = spark.read.parquet(_skewed_edges(spark, scale))
        n_edges = edges.count()
        top_deg = (
            edges.select(F.col("s1").alias("v"))
            .unionAll(edges.select(F.col("s2").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("d"))
            .agg(F.max("d"))
            .collect()[0][0]
        )
        runs = {}
        for name, flag in (("id_oriented", False), ("degree_oriented", True)):
            runs[name] = _run(
                spark,
                name,
                lambda flag=flag: triangles_per_node(
                    edges, orient_by_degree=flag
                )
                .agg(F.count("*"), F.sum("n_triangles"))
                .collect()[0][1],
                repeats,
                None,
            )
        # the two variants must agree on the total triangle count
        assert (
            runs["id_oriented"]["out_rows"]
            == runs["degree_oriented"]["out_rows"]
        ), runs
        # round-7 additions: iterative per-vertex ops on the same
        # skewed graph — LPA (count shuffle + top-1 window per round)
        # and multi-source BFS from the 5 hub ids (frontier joins)
        from huckli_spark.operators.graph import bfs_layers, label_propagation

        runs["label_prop"] = _run(
            spark,
            "label_prop",
            lambda: label_propagation(edges, iterations=4)
            .agg(F.count("*"), F.count_distinct("label"))
            .collect()[0][0],
            repeats,
            None,
        )
        hub_seeds = spark.createDataFrame(
            [(h * 3943 + 2500,) for h in range(5)], "v: long"
        )
        runs["bfs_hubs"] = _run(
            spark,
            "bfs_hubs",
            lambda: bfs_layers(edges, hub_seeds, hops=3).count(),
            repeats,
            None,
        )
        results["scales"][str(scale)] = {
            "n_edges": n_edges,
            "max_degree": top_deg,
            "runs": runs,
        }
        print(f"== graph x{scale}: {json.dumps(runs)}", file=sys.stderr)
    results["loadavg"] = os.getloadavg()
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,3,10")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--keep-fixtures", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma-separated pipeline names to run")
    ap.add_argument("--graph", action="store_true",
                    help="run the skewed-graph triangle probe instead")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    only = set(args.only.split(",")) if args.only else None
    try:
        if args.graph:
            res = graph_probe(scales, args.repeats)
        else:
            res = probe(scales, args.repeats, only)
    finally:
        if not args.keep_fixtures:
            shutil.rmtree(WORK, ignore_errors=True)
    # partial (--only) runs must not clobber the full probe record
    if args.graph:
        fname = "SCALE_PROBE_graph.json"
    elif only is None:
        fname = "SCALE_PROBE.json"
    else:
        # name partial runs by pipeline so they never clobber an
        # earlier partial record (the r6 bm25 probe is load-bearing)
        fname = f"SCALE_PROBE_partial_{'_'.join(sorted(only))}.json"
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       fname)
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res.get("summary_vs_1x", res["scales"]), indent=1))


if __name__ == "__main__":
    main()
