"""Late-interaction MaxSim: the IVF-shortlist serving path must be
gated against the exact path — full-probe serving is bit-identical,
reduced-probe serving keeps high recall, and the plan never falls
back to a cross product or a corpus broadcast."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from huckli_spark.operators import simsearch
from huckli_spark.operators.ann_index import load_ann_index, save_ann_index


def _corpus(spark, n_docs=24, per_doc=4, dim=16):
    # clustered member vectors: docs in the same residue class share a
    # direction, so coarse cells are meaningful
    rows = []
    for d in range(n_docs):
        for j in range(per_doc):
            vid = d * per_doc + j
            base = [1.0 if (k % 4) == (d % 4) else 0.1 for k in range(dim)]
            rows.append(
                (d, vid, [base[k] + 0.01 * ((vid * 7 + k) % 5) for k in range(dim)])
            )
    return spark.createDataFrame(
        rows, "doc_id long, vec_id long, embedding array<float>"
    )


@pytest.fixture(scope="module")
def fixture(spark, tmp_path_factory):
    members = _corpus(spark)
    tokens = members.where(F.col("vec_id") < 6).select(
        F.expr("vec_id div 3").alias("query_id"),
        F.col("vec_id").alias("token_id"),
        "embedding",
    )
    cents = simsearch.ivf_centroids(members, n_centroids=8)
    path = str(tmp_path_factory.mktemp("maxsim") / "index")
    save_ann_index(
        path, cents, codebooks=None,
        posting=simsearch.ivf_assign(members, cents, nprobe=1).select(
            "vec_id", "cid"
        ),
    )
    frozen, _, _, posting = load_ann_index(path, spark)
    return members, tokens, frozen, posting


def _rows(df):
    return {
        (r.query_id, r.doc_id, r.score_micro, r.rank) for r in df.collect()
    }


def test_full_probe_equals_exact_path(spark, fixture):
    # nprobe = k: the shortlist is the whole corpus, so the serving
    # path must reproduce the exact path BIT-identically (same shared
    # _maxsim_regroup arithmetic, same integer scores, same ranks)
    members, tokens, frozen, posting = fixture
    exact = simsearch.maxsim_topk(
        members.select("doc_id", "embedding"), tokens, k=5
    )
    served = simsearch.maxsim_topk_ivf(
        members, tokens, frozen, posting, k=5, nprobe=len(frozen)
    )
    assert _rows(served) == _rows(exact)


def test_reduced_probe_recall(spark, fixture):
    # nprobe=2 of 8 cells: every served hit must carry the exact
    # path's score (the rerank IS exact), and recall@5 stays high on
    # the clustered fixture
    members, tokens, frozen, posting = fixture
    exact = _rows(
        simsearch.maxsim_topk(
            members.select("doc_id", "embedding"), tokens, k=5
        )
    )
    served = _rows(
        simsearch.maxsim_topk_ivf(
            members, tokens, frozen, posting, k=5, nprobe=2
        )
    )
    exact_scores = {(q, d): s for q, d, s, _ in exact}
    for q, d, s, _ in served:
        if (q, d) in exact_scores:
            assert s == exact_scores[(q, d)]  # exact rerank, no approx score
    exact_pairs = {(q, d) for q, d, _, _ in exact}
    served_pairs = {(q, d) for q, d, _, _ in served}
    recall = len(exact_pairs & served_pairs) / len(exact_pairs)
    assert recall >= 0.6, f"recall@5 {recall:.2f}"


def test_serving_plan_no_cartesian_no_corpus_broadcast(spark, fixture):
    members, tokens, frozen, posting = fixture
    df = simsearch.maxsim_topk_ivf(
        members, tokens, frozen, posting, k=5, nprobe=2
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan  # the exact path's crossJoin shape
    assert "BroadcastHashJoin" in plan, plan  # probe cells + token bag broadcast


def test_doc_keyed_posting_arm_matches_member_keyed(spark, fixture):
    # production layout: the store carries the doc key, so candidate
    # generation skips the member join — results must be identical to
    # the member-keyed fallback arm at every nprobe
    members, tokens, frozen, posting = fixture
    doc_posting = posting.join(
        members.select("vec_id", "doc_id"), "vec_id"
    )
    for nprobe in (2, len(frozen)):
        a = _rows(simsearch.maxsim_topk_ivf(
            members, tokens, frozen, posting, k=5, nprobe=nprobe
        ))
        b = _rows(simsearch.maxsim_topk_ivf(
            members, tokens, frozen, doc_posting, k=5, nprobe=nprobe
        ))
        assert a == b


def test_candidate_budget_caps_and_converges(spark, fixture):
    # PLAID ndocs budget: at most C candidate docs rerank per query
    # (deterministic: stage-one hit count desc, doc asc), and a budget
    # >= the shortlist reproduces the uncapped result exactly
    members, tokens, frozen, posting = fixture
    capped = simsearch.maxsim_topk_ivf(
        members, tokens, frozen, posting, k=5, nprobe=2, max_candidates=3
    )
    assert capped.groupBy("query_id").count().agg(
        F.max("count")
    ).collect()[0][0] <= 3
    uncapped = _rows(simsearch.maxsim_topk_ivf(
        members, tokens, frozen, posting, k=5, nprobe=2
    ))
    big_budget = _rows(simsearch.maxsim_topk_ivf(
        members, tokens, frozen, posting, k=5, nprobe=2,
        max_candidates=10_000,
    ))
    assert big_budget == uncapped
    # the rerank stays exact under the cap: every doc appearing in
    # both runs carries the identical integer score (capping changes
    # WHICH docs rerank, never their scores)
    uncapped_scores = {(q, d): s for q, d, s, _ in uncapped}
    overlap = 0
    for q, d, s, _ in _rows(capped):
        if (q, d) in uncapped_scores:
            assert uncapped_scores[(q, d)] == s
            overlap += 1
    assert overlap > 0  # non-vacuous


def _logical_broadcast_hints(df) -> int:
    # join-strategy hints survive into the optimized logical plan as
    # `rightHint=(strategy=broadcast)` / leftHint markers on the Join
    # nodes — count them there, where AQE's runtime size decisions
    # can't leak in
    return df._jdf.queryExecution().optimizedPlan().toString().lower(
    ).count("strategy=broadcast")


def test_uncapped_arm_never_plan_broadcasts_candidates(spark, fixture):
    # ADVICE r11 #3: with max_candidates=None the candidate set is
    # queries x all probed-cell docs — a corpus fraction — so the plan
    # must NOT carry a broadcast hint on the rerank's candidate side
    # (only the probe list and the query token bag stay hinted). The
    # budgeted arm adds exactly the one extra hint the PLAID bound
    # justifies.
    members, tokens, frozen, posting = fixture
    uncapped = simsearch.maxsim_topk_ivf(
        members, tokens, frozen, posting, k=5, nprobe=2
    )
    capped = simsearch.maxsim_topk_ivf(
        members, tokens, frozen, posting, k=5, nprobe=2, max_candidates=64
    )
    n_unc = _logical_broadcast_hints(uncapped)
    n_cap = _logical_broadcast_hints(capped)
    assert n_cap == n_unc + 1, (n_unc, n_cap)
