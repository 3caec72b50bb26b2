#!/usr/bin/env python
"""MaxSim serving-path scaling probe (round 11, re-based round 12 on
the budgeted default).

maxsim_topk_ivf's scale claim: the exact path scores |tokens| x
|members| pairs (corpus-linear per token), while the IVF serving path
scores only the shortlist — so at fixed cell geometry the serving
path's advantage must WIDEN with the corpus. Probe both paths at
1x / 10x a clustered corpus (32 two-token queries, 64 coarse cells,
nprobe=2 -> shortlist ~6% of members), after a warmup pass so JIT
doesn't masquerade as scaling. `wall_s_serve` is the SERVING DEFAULT
(PLAID budget 64x k, centroid-evidence ranking — what
q_ann_maxsim_serve runs); the uncapped exact-within-probes arm is
recorded separately. Records wall, recall@5 (of the budgeted serve vs
exact), the realized shortlist fraction, and the recall-vs-budget
sweep at 10x. Writes SCALE_PROBE_maxsim_serve.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from huckli_spark.operators import simsearch
from huckli_spark.session import get_spark

BASE_MEMBERS = 20_000
DIM = 64
PER_DOC = 4
K_CENT = 64
NPROBE = 2
N_TOKENS = 64  # 32 queries x 2 tokens


def members_df(spark, n):
    """Clustered member vectors, deterministic id arithmetic.

    Docs lean toward one of 64 directions; the first 64 vectors (the
    sampled coarse quantizer AND the query tokens) each take a
    DISTINCT direction so the quantizer spans the direction space —
    the well-trained-quantizer regime the serving claim assumes."""
    axis = (
        f"cast(case when vec_id < {N_TOKENS} then vec_id % {K_CENT}"
        f" else (vec_id div {PER_DOC}) % {K_CENT} end as int)"
    )
    comp = (
        f"transform(sequence(0, {DIM - 1}), j -> cast("
        f" (case when j = {axis} then 4.0 else 0.2 end)"
        f" + ((vec_id * 13 + j * 7) % 11) / 23.0 as float))"
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(f"id div {PER_DOC}").alias("doc_id"),
        F.expr(comp).alias("embedding"),
    ).localCheckpoint(eager=True)


def _paths(spark, n):
    mem = members_df(spark, n)
    tokens = mem.where(F.col("vec_id") < N_TOKENS).select(
        F.expr("vec_id div 2").alias("query_id"),
        F.col("vec_id").alias("token_id"),
        "embedding",
    ).localCheckpoint(eager=True)
    cents = simsearch.ivf_centroids(mem, n_centroids=K_CENT)
    posting = (
        simsearch.ivf_assign(mem, cents, nprobe=1)
        .select("vec_id", F.expr(f"vec_id div {PER_DOC}").alias("doc_id"),
                "cid")
        .localCheckpoint(eager=True)
    )
    return mem, tokens, cents, posting


def main() -> None:
    spark = get_spark(app_name="maxsim_serve_probe")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JIT both plan shapes once at small scale
    wm, wt, wc, wp = _paths(spark, 2_000)
    simsearch.maxsim_topk(wm.select("doc_id", "embedding"), wt, k=5).count()
    simsearch.maxsim_topk_ivf(wm, wt, wc, wp, k=5, nprobe=NPROBE).count()
    simsearch.maxsim_topk_ivf(wm, wt, wc, wp, k=5, nprobe=NPROBE,
                              max_candidates=64 * 5).count()
    wm.unpersist()

    results: dict = {
        "dim": DIM, "per_doc": PER_DOC, "k_centroids": K_CENT,
        "nprobe": NPROBE, "n_tokens": N_TOKENS,
    }
    for mult in (1, 10):
        n = BASE_MEMBERS * mult
        mem, tokens, cents, posting = _paths(spark, n)

        t0 = time.perf_counter()
        exact = simsearch.maxsim_topk(
            mem.select("doc_id", "embedding"), tokens, k=5
        ).collect()
        wall_exact = time.perf_counter() - t0

        # the SERVING DEFAULT: PLAID candidate budget 64x k with
        # centroid-evidence ranking (what q_ann_maxsim_serve runs)
        t0 = time.perf_counter()
        served = simsearch.maxsim_topk_ivf(
            mem, tokens, cents, posting, k=5, nprobe=NPROBE,
            max_candidates=64 * 5,
        ).collect()
        wall_serve = time.perf_counter() - t0

        # the uncapped exact-within-probes arm (opt-in; plain
        # equi-join on the candidate side since ADVICE r11 #3)
        t0 = time.perf_counter()
        simsearch.maxsim_topk_ivf(
            mem, tokens, cents, posting, k=5, nprobe=NPROBE
        ).collect()
        wall_serve_uncapped = time.perf_counter() - t0

        ep = {(r.query_id, r.doc_id) for r in exact}
        sp = {(r.query_id, r.doc_id) for r in served}
        recall = len(ep & sp) / len(ep)
        # realized shortlist: candidate (query, doc) pairs / all pairs
        probe_cells = (
            simsearch.ivf_assign(tokens, cents, id_col="token_id",
                                 nprobe=NPROBE)
            .select("token_id", "cid")
            .join(tokens.select("token_id", "query_id"), "token_id")
            .select("query_id", "cid").distinct()
        )
        cand = (
            posting.join(probe_cells, "cid")
            .select("query_id", "doc_id").distinct().count()
        )
        total = (N_TOKENS // 2) * (n // PER_DOC)
        results[f"{mult}x"] = {
            "members": n,
            "wall_s_exact": round(wall_exact, 3),
            "wall_s_serve": round(wall_serve, 3),
            "wall_s_serve_uncapped": round(wall_serve_uncapped, 3),
            "recall_at_5": round(recall, 3),
            "shortlist_frac": round(cand / total, 4),
        }
        if mult == 10:
            # recall vs the PLAID candidate budget (VERDICT r11 #3):
            # the budgeted arm is the serving DEFAULT, so measure what
            # the cap costs at the largest probe scale — hit-ranked
            # candidates, top-C per query rerank
            budgets = {}
            for c in (16, 64, 320):
                t0 = time.perf_counter()
                got = simsearch.maxsim_topk_ivf(
                    mem, tokens, cents, posting, k=5, nprobe=NPROBE,
                    max_candidates=c,
                ).collect()
                bw = time.perf_counter() - t0
                bp = {(r.query_id, r.doc_id) for r in got}
                budgets[str(c)] = {
                    "wall_s": round(bw, 3),
                    "recall_at_5_vs_exact": round(len(ep & bp) / len(ep), 3),
                }
            results["recall_vs_budget_10x"] = budgets
            print(f"budgets: {budgets}", flush=True)
        print(f"{mult}x: {results[f'{mult}x']}", flush=True)
        mem.unpersist()
    r1, r10 = results["1x"], results["10x"]
    results["ratio_10x_over_1x"] = {
        "exact_wall": round(r10["wall_s_exact"] / r1["wall_s_exact"], 3),
        "serve_wall": round(r10["wall_s_serve"] / r1["wall_s_serve"], 3),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_PROBE_maxsim_serve.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
