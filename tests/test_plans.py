"""Physical-plan regression tests (scale discipline).

Correctness says the query returns the right rows; these assert it
returns them with the right PLAN — filters and projections reach the
parquet scan, small dimensions broadcast, top-k never global-sorts,
non-equi banding stays a broadcast nested loop. A regression here is
invisible at fixture scale and catastrophic at 100 TB.
"""

from __future__ import annotations

import re

import pytest

from huckli_spark.queries import all_queries
from tests.conftest import SF_SMALL


def _plan(spark, name: str) -> str:
    df = all_queries()[name].build(spark, SF_SMALL)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


EXPECTATIONS = {
    # predicate + column pushdown reach the scan
    "q_scan_project": [
        r"PushedFilters: \[IsNotNull\(l_quantity\), GreaterThan\(l_quantity",
        r"ReadSchema: .*l_orderkey",
    ],
    # time-range predicates push down in the ts column's physical
    # domain — nanos long (partition-pruning analog, A2/A3)
    "q_filter_timerange": [r"PushedFilters: .*GreaterThanOrEqual\(ts,\d+"],
    # small dim side broadcasts; the fact side must not shuffle for it
    "q_broadcast_dim_join": [r"BroadcastHashJoin"],
    "q_window_rank": [r"BroadcastHashJoin", r"Window"],
    # semi/anti joins plan as such (not inner + dedup)
    "q_semi_anti_join": [r"LeftSemi", r"LeftAnti"],
    # top-k is a per-partition heap + driver merge, not a global sort
    "q_topk": [r"TakeOrderedAndProject"],
    # band join: tiny band table broadcast, non-equi as nested loop
    "q_range_join": [r"BroadcastNestedLoopJoin"],
    # partial (map-side) aggregation before the exchange
    "q_group_sum": [r"HashAggregate"],
    # LSH ANN: bucket join is an equi-join (hash/broadcast), and the
    # tiny query side broadcasts — no cross product anywhere
    "q_ann_lsh": [r"Broadcast(Hash|NestedLoop)Join"],
    # correlated EXISTS decorrelates to a semi join — never a per-row
    # subquery execution
    "q_exists_subquery": [r"LeftSemi"],
    # correlated scalar subquery decorrelates to aggregate + join
    "q_correlated_scalar": [r"HashAggregate"],
    # IVF ANN: probe side broadcasts onto the posting lists (equi-join
    # on cid) — assignment itself is map-only, no cross product
    "q_ann_ivf": [r"BroadcastHashJoin"],
    # TPC-H Q3 shape: filtered dim broadcasts, top-k never global-sorts
    "q_multi_join_topk": [r"BroadcastHashJoin", r"TakeOrderedAndProject"],
    # TPC-H Q5 shape: the region->nation->customer dim chain broadcasts
    "q_region_revenue": [r"BroadcastHashJoin"],
    # keep-list: the O(duplicates) drop set broadcasts into an
    # anti-join; the corpus side must not shuffle for it
    "q_dedup_keeplist": [r"LeftAnti", r"Broadcast"],
    # MaxSim late interaction: the token bag broadcasts onto the
    # member scan (the cosine_topk payload idiom), and both regroup
    # stages partial-aggregate map-side before their exchanges; the
    # corpus is never shuffled for the join itself
    "q_ann_maxsim": [r"Broadcast(Hash|NestedLoop)Join", r"HashAggregate"],
    # MaxSim SERVING shape (PLAID): probe cells + token bag broadcast
    # as hash joins; the exact path's corpus-vs-bag nested-loop shape
    # must NOT appear (dedicated no-cartesian assertions live in
    # tests/test_maxsim.py). The serving DEFAULT is the budgeted arm
    # (VERDICT r11 #3): the hit-ranked candidate cap's row_number
    # window must be present in the plan — it is what bounds the
    # rerank broadcast at any corpus size.
    "q_ann_maxsim_serve": [
        r"BroadcastHashJoin", r"HashAggregate", r"row_number",
    ],
    # epoch shuffle-then-pack: the offsets relation broadcasts into
    # the rank join and the pack window is partition-local (the
    # no-global-sort / no-SortMergeJoin absences are pinned in
    # tests/test_governance.py TestEpochPack)
    "q_epoch_pack": [r"BroadcastHashJoin", r"Window"],
    # materialized sequences: posexplode (Generate) feeding the
    # budget-bounded group-collect
    "q_pack_emit": [r"Generate", r"Aggregate"],
    "q_epoch_emit": [r"Generate", r"BroadcastHashJoin", r"Window"],
    # whole-doc SFT emission: the Arrow walk (ArrowEvalPython-free
    # elsewhere — FlatMapGroupsInPandas is the one sanctioned Python
    # stage), the text equi-join, and the bin collect
    "q_pack_emit_nosplit": [
        r"FlatMapGroupsInPandas", r"Generate", r"Aggregate",
    ],
    # source-weighted mixing: replication is a map-side explode
    # (Generate) and the rank's offsets broadcast
    "q_epoch_mix_shuffle": [r"Generate", r"BroadcastHashJoin"],
    # weighted mixing composed into materialized sequences: the mix
    # explode + token posexplode (Generate), the rank's offsets
    # broadcast, the pack offset window, and the budget-bounded
    # group-collect; the text rides the bucket exchange, so no
    # corpus-key SortMergeJoin may appear (asserted below)
    "q_epoch_mix_emit": [
        r"Generate", r"BroadcastHashJoin", r"Window", r"Aggregate",
    ],
}

# queries whose scale contract is the ABSENCE of a cross product —
# the LSH candidate generation must stay an equi-join on (band, sig)


def _assert_no_cartesian(plan: str):
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def _lazy_plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_embed_lsh_no_cartesian(spark):
    # build the LAZY form: the gated query materializes eagerly, which
    # would hide the join plan behind an ExistingRDD scan
    import os

    from huckli_spark.operators.simsearch import cosine_pairs_lsh

    em = spark.read.parquet(os.path.join(SF_SMALL, "embeddings.parquet"))
    df = cosine_pairs_lsh(em, threshold=0.45, materialize=False)
    _assert_no_cartesian(_lazy_plan(spark, df))


def test_guarded_jaccard_no_cartesian(spark):
    import os

    from huckli_spark.operators.dedup import jaccard_pairs

    docs = spark.read.parquet(os.path.join(SF_SMALL, "documents.parquet"))
    df = jaccard_pairs(docs, max_doc_freq=8, materialize=False)
    _assert_no_cartesian(_lazy_plan(spark, df))


def test_incremental_dedup_broadcasts_the_batch_side(spark):
    # the new-batch shingles must broadcast into the inverted-index
    # join — the corpus side never shuffles for the screen
    import os

    from pyspark.sql import functions as F
    from huckli_spark.operators.dedup import jaccard_pairs_cross

    docs = spark.read.parquet(os.path.join(SF_SMALL, "documents.parquet"))
    df = jaccard_pairs_cross(
        docs.where(F.col("doc_id") % 10 == 0),
        docs.where(F.col("doc_id") % 10 != 0),
        materialize=False,
    )
    plan = _lazy_plan(spark, df)
    _assert_no_cartesian(plan)
    assert "BroadcastHashJoin" in plan, plan
    # every join must broadcast the small side — a sort-merge join
    # here means the corpus shuffles to serve a tiny candidate set
    assert "SortMergeJoin" not in plan, plan


def test_length_batching_no_global_sort(spark):
    # the global length rank must be the two-phase form: tiny offsets
    # relation broadcast back, per-(length, sub) window — never a
    # corpus-wide global sort
    import re as _re

    plan = _plan(spark, "q_length_batching")
    _assert_no_cartesian(plan)
    assert "BroadcastHashJoin" in plan, plan
    assert not _re.search(r"Sort\b.*global=true", plan), plan
    assert "Python" not in plan, plan


def test_epoch_mix_emit_no_corpus_rejoin(spark):
    # the text must ride the mix explode and the rank's bucket
    # exchange — a corpus-key SortMergeJoin (or any cross product)
    # would mean the positions were re-joined against the corpus
    plan = _plan(spark, "q_epoch_mix_emit")
    _assert_no_cartesian(plan)
    assert "SortMergeJoin" not in plan, plan
    assert "Python" not in plan, plan  # fully relational emission


@pytest.mark.parametrize("name", sorted(EXPECTATIONS))
def test_plan_shape(spark, name):
    plan = _plan(spark, name)
    for pat in EXPECTATIONS[name]:
        assert re.search(pat, plan), f"{name}: expected /{pat}/ in plan:\n{plan}"


def test_topk_has_no_global_sort(spark):
    # TakeOrderedAndProject subsumes the sort; a Sort + Exchange pair
    # would mean a full cluster-wide sort for 10 rows
    plan = _plan(spark, "q_topk")
    assert "TakeOrderedAndProject" in plan
    assert not re.search(r"\bSort\b.*global=true", plan)


def test_group_sum_single_shuffle(spark):
    # TPC-H Q1 shape: exactly one shuffle (partial agg -> exchange ->
    # final agg); a second exchange means partial aggregation was lost
    plan = _plan(spark, "q_group_sum")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_window_frame_single_shuffle(spark):
    # three window expressions over the same (partition, order) spec
    # must collapse into one Window node fed by one Exchange; a second
    # exchange means the specs diverged and the data shuffles twice
    plan = _plan(spark, "q_window_frame")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1


def test_latest_per_key_no_global_sort(spark):
    # DISTINCT ON / argmax: per-group row_number, never a global sort
    plan = _plan(spark, "q_latest_per_key")
    assert not re.search(r"Sort\b.*global=true", plan)


def test_asof_join_single_shuffle(spark):
    # union + window composition: one hash exchange on user_id; a
    # range-probe join here would be a nested loop over events
    plan = _plan(spark, "q_asof_join")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2  # union sides
    assert "NestedLoop" not in plan


def test_contamination_broadcasts_holdout(spark):
    # the holdout (benchmark) shingle set must broadcast; the candidate
    # corpus streams map-side — a sort-merge join here would shuffle
    # the whole corpus to screen against a few MB of eval hashes
    import os

    from pyspark.sql import functions as F

    from huckli_spark.operators.dedup import contamination

    docs = spark.read.parquet(os.path.join(SF_SMALL, "documents.parquet"))
    df = contamination(
        docs.where(F.col("source") != "src0"),
        docs.where(F.col("source") == "src0"),
    )
    plan = _lazy_plan(spark, df)
    _assert_no_cartesian(plan)
    assert "BroadcastHashJoin" in plan, plan


def test_cdc_chunks_single_doc_shuffle(spark):
    # the running boundary sum and the chunk assembly must share ONE
    # exchange on the doc id (the window's partitioning feeds the
    # groupBy) — a second full shuffle would double the cost of the
    # heaviest stage at corpus scale
    import os

    from huckli_spark.operators.textstats import cdc_chunks

    import re

    docs = spark.read.parquet(os.path.join(SF_SMALL, "documents.parquet"))
    plan = _lazy_plan(spark, cdc_chunks(docs))
    n_exchanges = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_exchanges == 1, f"{n_exchanges} doc-key exchanges\n{plan}"


class TestRound5Plans:
    """Plan pins for the round-5 operators — the discipline that
    caught the ADC re-evaluation bug (SCALE.md probe note)."""

    def test_pii_scrub_is_map_only(self, spark):
        plan = _plan(spark, "q_pii_redact")
        assert "Exchange" not in plan  # pure regexp projection
        assert "Python" not in plan    # JVM regex, no UDF

    def test_sequence_pack_single_exchange(self, spark):
        df = all_queries()["q_sequence_pack"].build(spark, SF_SMALL)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
        plan = df._jdf.queryExecution().explainString(mode)
        # one shuffle (the shard window), nothing else
        assert plan.count("Exchange") == 1
        assert "hashpartitioning(shard" in plan
        assert "Python" not in plan

    def test_bloom_joins_all_broadcast(self, spark):
        plan = _plan(spark, "q_bloom_decontaminate")
        assert "SortMergeJoin" not in plan
        assert "BroadcastHashJoin" in plan

    def test_pq_encode_no_shuffle_no_python(self, spark):
        plan = _plan(spark, "q_pq_encode")
        assert "Exchange" not in plan
        assert "Python" not in plan

    def test_pq_adc_tables_on_broadcast_side(self, spark):
        plan = _plan(spark, "q_pq_adc")
        # the pair join is a broadcast nested loop (inequality cond)...
        assert "BroadcastNestedLoopJoin" in plan
        # ...and the distance tables are evaluated in the broadcast
        # build-side project, NOT in the post-join projection: the
        # aggregate( fold text must appear before the join node, and
        # the post-join output must reference __tab lookups only
        join_pos = plan.find("BroadcastNestedLoopJoin")
        assert "__tab" in plan
        assert "element_at" in plan

    def test_countmin_topk_no_global_sort(self, spark):
        plan = _plan(spark, "q_countmin_topk")
        assert "TakeOrderedAndProject" in plan

    def test_pagerank_rank_vectors_broadcast(self, spark):
        plan = _plan(spark, "q_pagerank")
        # edge-to-rank joins broadcast the rank vector every iteration
        assert "SortMergeJoin" not in plan


class TestRound6Plans:
    """Plan pins for the round-6 retrieval/audit operators."""

    def test_bm25_no_corpus_shuffle(self, spark):
        plan = _plan(spark, "q_bm25_topk")
        # corpus scan + singleton stats broadcast; the only sort is
        # the bounded top-k
        assert "BroadcastNestedLoopJoin" in plan
        assert "hashpartitioning" not in plan, plan
        assert "Python" not in plan

    def test_bm25_topk_rank_limit_pushed(self, spark):
        # VERDICT r6 #4: the global top-10 window must NOT sort the
        # whole scored set on one partition — Spark's rank-limit
        # pushdown (LimitPushDownThroughWindow) turns it into a
        # per-partition partial top-k + bounded TakeOrderedAndProject
        # feeding the Window. If this pin breaks, the BM25 ranking
        # path has a single-partition global sort again.
        plan = _plan(spark, "q_bm25_topk")
        assert "TakeOrderedAndProject" in plan, plan

    def test_chunk_windows_map_only(self, spark):
        plan = _plan(spark, "q_chunk_windows")
        assert "Exchange" not in plan
        assert "Python" not in plan

    def test_profile_table_single_scan(self, spark):
        plan = _plan(spark, "q_profile_table")
        # ONE pass: exactly one parquet scan (one file-index location
        # in the formatted details) feeds every metric, no joins —
        # the multi-distinct Expand fans the single scan out instead
        assert plan.count("Location: InMemoryFileIndex") == 1, plan
        assert "Join" not in plan

    def test_char_entropy_no_python(self, spark):
        plan = _plan(spark, "q_char_entropy")
        assert "Python" not in plan

    def test_triangle_equi_joins(self, spark):
        plan = _plan(spark, "q_triangle_count")
        # the wedge/closing joins must be equi-joins (shuffled or
        # broadcast by size), never nested-loop products
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


class TestRound7Plans:
    """Plan pins for the round-7 additions."""

    def test_containment_mirrors_jaccard_shape(self, spark):
        # same inverted-index self-join skeleton as q_ngram_jaccard:
        # equi-joins on the shingle hash, never a nested-loop product
        plan = _plan(spark, "q_containment_dup")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Python" not in plan

    def test_kcore_equi_joins_only(self, spark):
        plan = _plan(spark, "q_kcore")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_vocab_coverage_single_corpus_pass(self, spark):
        # the corpus collapses to (word, count) once; the 5-target
        # join rides on a broadcast, not a shuffle of the vocab
        plan = _plan(spark, "q_vocab_coverage")
        assert "Python" not in plan
        assert "CartesianProduct" not in plan

    def test_tpch_q17_decorrelated(self, spark):
        # the correlated scalar subquery must lower to an aggregate
        # join (RewriteCorrelatedScalarSubquery), never a per-row
        # nested-loop re-execution
        plan = _plan(spark, "q_tpch_q17")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_tpch_q22_anti_join(self, spark):
        # NOT EXISTS lowers to an anti join with the date filter
        # pushed below it
        plan = _plan(spark, "q_tpch_q22")
        assert "LeftAnti" in plan or "left_anti" in plan, plan
        assert "CartesianProduct" not in plan

    def test_pq_refine_shortlist_join_bounded(self, spark):
        # the refine stage joins the bounded shortlist against the
        # corpus; queries broadcast — no all-pairs product
        plan = _plan(spark, "q_pq_refine_recall")
        assert "CartesianProduct" not in plan


class TestRound7ClosingPlans:
    """Plan pins for the round-7 closing analytics/corpus wave."""

    def test_event_transitions_totals_broadcast(self, spark):
        plan = _plan(spark, "q_event_transitions")
        # one user_id window shuffle + bounded |types|^2 agg; the
        # per-src totals ride a broadcast, and nothing drops to Python
        assert "BroadcastHashJoin" in plan
        assert "Python" not in plan
        assert "CartesianProduct" not in plan

    def test_mad_outliers_stats_broadcast(self, spark):
        # both the median and the MAD relation (5 rows each) must come
        # back onto the row stream as broadcasts, never a shuffle join
        plan = _plan(spark, "q_mad_outliers")
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert "Python" not in plan

    def test_timeseries_fill_bounds_broadcast_only(self, spark):
        plan = _plan(spark, "q_timeseries_fill")
        # the only nested-loop is the singleton bounds row crossJoin
        assert "CartesianProduct" not in plan
        assert "Python" not in plan

    def test_common_neighbors_equi_joins_only(self, spark):
        plan = _plan(spark, "q_common_neighbors")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Python" not in plan

    def test_segment_dedup_no_python_no_product(self, spark):
        plan = _plan(spark, "q_segment_dedup")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Python" not in plan

    def test_pmi_no_corpus_self_join(self, spark):
        # pair expansion is in-row: every join in the plan is a
        # broadcast (word-frequency / singleton n_docs), so the corpus
        # relation itself is never on both sides of a shuffle join
        plan = _plan(spark, "q_pmi_cooccur")
        assert "SortMergeJoin" not in plan
        assert "ShuffledHashJoin" not in plan
        assert "Python" not in plan

    def test_hll_registers_bounded_shuffle(self, spark):
        plan = _plan(spark, "q_hll_registers")
        assert "BroadcastHashJoin" in plan
        assert "Python" not in plan
        assert "CartesianProduct" not in plan

    def test_attribution_single_user_shuffle_join(self, spark):
        # purchases join touches as an equi-join on user_id (time
        # window as post-join filter) — never a nested-loop range probe
        plan = _plan(spark, "q_attribution")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Python" not in plan

    def test_kmv_set_ops_bounded_relations(self, spark):
        # sketches and theta are bounded; the only nested loops are
        # broadcast singletons (theta/exact rows)
        plan = _plan(spark, "q_kmv_set_ops")
        assert "CartesianProduct" not in plan
        assert "Python" not in plan

    def test_bfs_frontier_equi_joins_only(self, spark):
        plan = _plan(spark, "q_bfs_layers")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Python" not in plan

    def test_dq_audit_fk_checks_broadcast(self, spark):
        # parent key sets ride broadcasts; no rule materializes
        # violating rows (aggregates only)
        plan = _plan(spark, "q_dq_audit")
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "Python" not in plan

    def test_group_split_map_side_assignment(self, spark):
        plan = _plan(spark, "q_group_split")
        assert "Join" not in plan  # pure scan -> hash -> aggregate
        assert "Python" not in plan

    def test_pca_corpus_touched_once(self, spark):
        # the only corpus-sized work is the covariance aggregate; the
        # squaring rounds run on d x d relations (localCheckpoint'd,
        # so the plan shows no cartesian/python anywhere)
        plan = _plan(spark, "q_pca_power")
        assert "CartesianProduct" not in plan
        assert "Python" not in plan

    def test_winsorize_cuts_broadcast(self, spark):
        plan = _plan(spark, "q_winsorize")
        assert "BroadcastHashJoin" in plan
        assert "Python" not in plan

    def test_label_prop_equi_joins_only(self, spark):
        plan = _plan(spark, "q_label_prop")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Python" not in plan

    def test_cms_join_size_bounded_sketches(self, spark):
        plan = _plan(spark, "q_cms_join_size")
        assert "CartesianProduct" not in plan
        assert "Python" not in plan

    def test_anomaly_days_single_rollup_pass(self, spark):
        plan = _plan(spark, "q_anomaly_days")
        assert "Join" not in plan  # rollup -> window, no joins at all
        assert "Python" not in plan

    def test_ship_lag_orders_broadcast(self, spark):
        plan = _plan(spark, "q_ship_lag")
        assert "BroadcastHashJoin" in plan
        assert "Python" not in plan

    def test_rfm_single_customer_aggregate(self, spark):
        plan = _plan(spark, "q_rfm_segments")
        assert "CartesianProduct" not in plan
        assert "Python" not in plan


class TestCurationPlans:
    """Plan pins for the curation wave (SemDeDup / DSIR)."""

    def test_semdedup_cluster_bounded_pairs(self, spark):
        # the pairwise stage must key on cid (equi-join) — never a
        # nested-loop over the corpus — and stay fully JVM-side; the
        # kept/dropped join-back and pair join may shuffle (bounded by
        # cluster sizes), but no product and no Python anywhere
        plan = _plan(spark, "q_semdedup")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Python" not in plan

    def test_dsir_broadcast_stats_and_takeordered_threshold(self, spark):
        # the 256-bucket log-ratio table must ride a broadcast back
        # onto the per-doc counts (never a shuffle join on bucket),
        # and the keep-threshold must be TakeOrdered (per-partition
        # top-k + driver merge), never a global Sort. Inspect the LAZY
        # operator plan — the gate query materializes eagerly
        # (operators.cache lifecycle), so its registry plan is a
        # scratch scan.
        from pyspark.sql import functions as F

        from huckli_spark.operators.curation import dsir_select

        docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        df = dsir_select(
            docs, F.col("lang") == "en", keep=100, materialize=False
        )
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(mode)
        assert "BroadcastHashJoin" in plan
        assert "TakeOrderedAndProject" in plan
        assert "CartesianProduct" not in plan
        assert "Python" not in plan
        # every nested loop is a broadcast singleton row: the totals
        # scalar (appears twice — the threshold branch re-derives the
        # weights relation) and the threshold row itself
        assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) <= 3
        assert "BroadcastNestedLoopJoin Cross BuildRight" in plan

    def test_gopher_rules_map_only(self, spark):
        # the cheapest gate in the chain must stay a pure map stage:
        # no exchange, no join, no Python anywhere
        plan = _plan(spark, "q_gopher_rules")
        assert "Exchange" not in plan
        assert "Join" not in plan
        assert "Python" not in plan

    def test_curation_pipeline_no_product_no_python(self, spark):
        # inter-stage keep-lists are equi-joins on doc_id; the only
        # nested loops are the DSIR singleton broadcasts
        plan = _plan(spark, "q_curation_pipeline")
        assert "CartesianProduct" not in plan
        assert "Python" not in plan

    def test_semdedup_incremental_equi_joins_only(self, spark):
        plan = _plan(spark, "q_semdedup_incremental")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Python" not in plan

    def test_embedding_drift_single_aggregate(self, spark):
        # one conditional-sum groupBy to dim rows; no join at all
        plan = _plan(spark, "q_embedding_drift")
        assert "Join" not in plan
        assert "Python" not in plan

    def test_diversity_sample_cluster_partitioned_window(self, spark):
        # the rank window partitions BY CLUSTER (never a single global
        # partition) and sizes ride a broadcast
        plan = _plan(spark, "q_diversity_sample")
        assert "Window" in plan
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "Python" not in plan

    def test_logreg_scoring_broadcast_weights_no_python(self, spark):
        # the final-score plan (training already folded into weight
        # literals): features are map-only in-row expressions, the
        # 65-row weight relation rides a broadcast, nothing drops to
        # Python, no nested loop anywhere
        plan = _plan(spark, "q_logreg_quality")
        assert "BroadcastHashJoin" in plan
        assert "Python" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestTpchBatteryPlans:
    """Plan pins for the round-8 TPC-H completion (Q1-Q5, Q9, Q12,
    Q16, Q20, Q21): the shapes these queries exist to exercise must
    survive in the physical plan."""

    def test_q1_single_exchange_wide_agg(self, spark):
        # pricing summary: one scan, partial agg, ONE exchange on the
        # two group keys; the date filter reaches the parquet scan
        plan = _plan(spark, "q_tpch_q1")
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
        assert re.search(r"PushedFilters: .*LessThanOrEqual\(l_shipdate", plan)
        assert "Python" not in plan

    def test_q2_correlated_min_decorrelates(self, spark):
        # the correlated scalar MIN must plan as aggregate + join —
        # never a per-row subquery; dims broadcast
        plan = _plan(spark, "q_tpch_q2")
        assert "HashAggregate" in plan
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_q3_topk_never_global_sorts(self, spark):
        plan = _plan(spark, "q_tpch_q3")
        assert "TakeOrderedAndProject" in plan
        assert "BroadcastHashJoin" in plan

    def test_q4_exists_plans_as_semi_join(self, spark):
        # non-equi correlated EXISTS -> left semi carrying the date
        # condition, not a subquery per order
        plan = _plan(spark, "q_tpch_q4")
        assert "LeftSemi" in plan
        assert "CartesianProduct" not in plan

    def test_q5_snowflake_dims_broadcast(self, spark):
        # region/nation/supplier/customer broadcast; no cross product
        # despite the 6-way FROM list
        plan = _plan(spark, "q_tpch_q5")
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_q16_not_in_stays_bounded(self, spark):
        # NOT IN over a nullable-free dim column plans as an anti join
        # (null-aware variants degrade to BNLJ only when the column is
        # nullable AND the optimizer can't prove otherwise; either way
        # the build side is the 100-row supplier dim — assert no
        # CartesianProduct and a distinct-count aggregate)
        plan = _plan(spark, "q_tpch_q16")
        assert "CartesianProduct" not in plan
        assert "HashAggregate" in plan

    def test_q21_one_groupby_over_order_supplier(self, spark):
        # the decorrelated form: no lineitem self-join — lineitem is
        # scanned once, aggregated twice, supplier broadcasts
        plan = _plan(spark, "q_tpch_q21")
        # lineitem + orders + supplier, each exactly once
        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 3, plan
        assert "TakeOrderedAndProject" in plan
        assert "CartesianProduct" not in plan


class TestRound8CompositionPlans:
    def test_triplets_cluster_keyed_no_python(self, spark):
        # SQL pair form: pair stage keys on cid (the SemDeDup
        # discipline): no product, no Python — and since the round-8
        # rewrite the rank-1 picks are conditional struct-max
        # aggregates, so the O(n·cluster) pair relation is never
        # window-sorted (no Window operator at all) and reduces
        # map-side (partial HashAggregate before the anchor exchange).
        # Inspect the LAZY form — the gated query materializes eagerly
        # (cache discipline), so its registry plan is a scratch scan.
        import os

        from huckli_spark.operators.curation import mine_triplets

        emb = spark.read.parquet(
            os.path.join(SF_SMALL, "embeddings.parquet")
        )
        df = mine_triplets(
            emb, k=8, iterations=2, materialize=False, pair_form="sql"
        )
        plan = _lazy_plan(spark, df)
        assert "CartesianProduct" not in plan
        assert "Python" not in plan
        assert "Window" not in plan, plan
        # struct-typed max buffers aren't hash-aggregable, so the picks
        # compile to SortAggregate — partial + final, so the pair
        # relation still combines map-side before the anchor exchange
        assert len(re.findall(r"SortAggregate|HashAggregate", plan)) >= 2, plan

    def test_triplets_arrow_cluster_keyed_single_python_stage(self, spark):
        # r13 default: the within-cluster pair scan is ONE keyed Arrow
        # stage (applyInPandas on cid — guide §4.2): the corpus ships
        # once per side, no O(n·cluster) pair relation, no product, no
        # window; exactly one Python boundary.
        import os

        from huckli_spark.operators.curation import mine_triplets

        emb = spark.read.parquet(
            os.path.join(SF_SMALL, "embeddings.parquet")
        )
        df = mine_triplets(emb, k=8, iterations=2, materialize=False)
        plan = _lazy_plan(spark, df)
        assert "CartesianProduct" not in plan
        assert "Window" not in plan, plan
        assert len(
            re.findall(r"\(\d+\) FlatMapGroupsInPandas", plan)
        ) == 1, plan

    def test_quality_budget_no_global_ntile(self, spark):
        # the decile assignment must use exact_ntile's decomposition:
        # no ntile() global window anywhere — the corpus-sized
        # row_number window partitions by the score group, and the
        # only unpartitioned window runs over the score-domain-bounded
        # histogram relation (post-aggregate)
        plan = _plan(spark, "q_quality_budget")
        assert "ntile" not in plan, plan
        assert "Python" not in plan
        m = re.search(
            r"row_number\(\)[^\n]*windowspecdefinition\(([^,]*),", plan
        )
        assert m and "score_micro" in m.group(1), plan

    def test_fertility_python_only_on_vocab_side(self, spark):
        # the Arrow tokenizer runs AFTER the distinct-word collapse:
        # the corpus-sized (lang, word) branch must stay JVM-only, so
        # exactly one Python stage appears (the vocab tokenizer)
        plan = _plan(spark, "q_bpe_fertility")
        assert plan.count("ArrowEvalPython") + plan.count("MapInPandas") >= 1
        assert "CartesianProduct" not in plan


class TestUnigramLmPlans:
    def test_estep_map_only_and_jvm(self, spark):
        # the Viterbi E-step: vocab travels as ONE broadcast row
        # (BroadcastNestedLoopJoin against a single-row side is a
        # broadcast payload, not a product) and the whole DP is
        # in-row JVM folds — no Python stage anywhere; the only
        # word-table movement is the piece-count groupBy exchange
        from huckli_spark.operators.unigram_lm import (
            piece_counts,
            unigram_fit,
            word_table,
        )
        from tests.conftest import SF_SMALL

        docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        vocab = unigram_fit(docs, vocab_size=40, n_iters=1)
        plan = _lazy_plan(
            spark, piece_counts(word_table(docs), vocab, 4)
        )
        assert "Python" not in plan
        assert "CartesianProduct" not in plan
        # partial (map-side combined) aggregation before the exchange
        assert plan.count("HashAggregate") >= 2

    def test_tokenize_gate_no_python(self, spark):
        # NOTE: unigram_fit localCheckpoints each trained vocab, so
        # the gate's visible plan starts at the checkpointed table —
        # the training-internal shapes are pinned by the tests below
        plan = _plan(spark, "q_unigram_tokenize")
        assert "Python" not in plan
        assert "CartesianProduct" not in plan

    def test_prune_is_takeordered(self, spark):
        # multi-char pruning is a TakeOrdered cut, never a global sort
        from huckli_spark.operators.unigram_lm import (
            _candidate_pieces,
            _keep_top,
            word_table,
        )
        from tests.conftest import SF_SMALL

        docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        cand = _candidate_pieces(word_table(docs), 4)
        plan = _lazy_plan(spark, _keep_top(cand, "score", 60, 20))
        assert "TakeOrderedAndProject" in plan
        assert "Python" not in plan


class TestDoremiPlans:
    def test_weighted_step_broadcast_small_relations(self, spark):
        # one weighted GD step: the lambda table and the weight
        # vector are broadcast VALUES relations; the corpus-sized
        # feature relation is never shuffled on a data-sized key
        # beyond the doc-keyed score join; no Python anywhere
        from pyspark.sql import functions as F

        from huckli_spark.operators.classifier import logreg_features
        from huckli_spark.operators.mixture import _weighted_fit_step
        from tests.conftest import SF_SMALL

        docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        label = F.expr("array_contains(split(text, ' '), 'spark')")
        feats = logreg_features(docs, label, 64, n=500)
        dom = docs.select("doc_id", F.col("lang").alias("dom"))
        # reproduce the step's gradient relation lazily
        from huckli_spark.operators.classifier import MICRO, _scores

        p = _scores(feats, [0] * 65, "doc_id")
        ldf = spark.sql(
            "SELECT col1 AS dom, col2 AS lam FROM VALUES"
            " ('de', 200L), ('en', 200L), ('es', 200L),"
            " ('fr', 200L), ('zh', 200L)"
        )
        weighted = (
            p.join(dom, "doc_id")
            .join(F.broadcast(ldf), "dom")
            .select("doc_id", "y", "lam", "p_micro")
        )
        g = (
            weighted.join(feats, ["doc_id", "y"])
            .groupBy("dim")
            .agg(
                F.sum(
                    F.col("lam")
                    * (F.col("p_micro") - F.col("y") * F.lit(MICRO))
                    * F.col("x_micro")
                ).alias("g")
            )
        )
        plan = _lazy_plan(spark, g)
        assert "Python" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan


class TestCcnetPlans:
    def test_ccnet_no_partitioned_ntile(self, spark):
        # round-8 continuation: the per-language tercile must use the
        # grouped exact-rank decomposition — a partitioned-window
        # ntile runs each language in ONE task (corpus/5 rows at
        # scale). The only corpus-sized window partitions by
        # (lang, score group).
        plan = _plan(spark, "q_ccnet_buckets")
        assert "ntile" not in plan, plan
        m = re.findall(
            r"row_number\(\)[^\n]*windowspecdefinition\(([^)]*?),"
            r" avg_lp_micro", plan
        )
        assert m, plan


class TestContinuationWave2Plans:
    def test_curriculum_pack_shard_partitioned_window(self, spark):
        # the pack window must partition by shard (the parallelism
        # knob) — no global window, no Python
        plan = _plan(spark, "q_curriculum_pack")
        assert "Python" not in plan
        assert "CartesianProduct" not in plan
        assert re.search(
            r"row_number\(\)[^\n]*windowspecdefinition\(shard", plan
        ), plan

    def test_dedup_cap_window_partitions_by_cluster(self, spark):
        # (connected_components at fixture scale takes the
        # small_graph_max driver path, which plans its result as a
        # local Python relation — expected; the cap window is the
        # thing under test here)
        plan = _plan(spark, "q_dedup_cap")
        m = re.search(
            r"row_number\(\)[^\n]*windowspecdefinition\(cluster_id", plan
        )
        assert m, plan
        assert "CartesianProduct" not in plan

    def test_media_dedup_cap_window_partitions_by_cluster(self, spark):
        # the media-fingerprint cap (r10): same contract as
        # q_dedup_cap — decision window partitioned by (kind,
        # cluster), never a global sort; the banded pair shapes are
        # pinned per-modality in TestImageDedupPlan /
        # TestAudioVideoDedupPlans (components take the driver
        # union-find path at fixture scale, planning a local relation)
        plan = _plan(spark, "q_media_dedup_cap")
        m = re.search(
            r"row_number\(\)[^\n]*windowspecdefinition\(kind[^\n]*cluster_id",
            plan,
        )
        assert m, plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_hash_quantiles_sample_is_takeordered(self, spark):
        # the ONLY corpus-sized operation is the bottom-k TakeOrdered;
        # every window runs on the 1024-row sample
        plan = _plan(spark, "q_hash_quantiles")
        assert "TakeOrderedAndProject" in plan
        assert "Python" not in plan
        assert "CartesianProduct" not in plan


class TestEvalMetricPlans:
    def test_source_overlap_digest_join_broadcast_totals(self, spark):
        # the pair join keys on the 60-bit shingle digest (equi),
        # per-source totals broadcast; no Python, no product
        plan = _plan(spark, "q_source_overlap")
        assert "Python" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan

    def test_bleu_counts_join_no_product(self, spark):
        # clipped-match computation is ONE left equi-join on
        # (doc, n, gram); the only cross join carries the 1-row
        # corpus-lengths relation
        plan = _plan(spark, "q_bleu_eval")
        assert "Python" not in plan
        assert "CartesianProduct" not in plan


class TestStreamAnnServePlan:
    def test_posting_side_never_forced_broadcast(self, spark, tmp_path):
        # VERDICT r08 "What's wrong #1": the frozen posting relation is
        # corpus-sized (every vector + its cid), so the serve join must
        # carry NO broadcast hint. Pin: with the size-bound broadcast
        # disabled, the batch analog of the stream-static join plans as
        # a shuffled join — a hint would force BroadcastHashJoin
        # regardless of the threshold, so its absence here proves the
        # plan is the scale-safe one.
        import os

        from pyspark.sql import functions as F

        from huckli_spark.operators import simsearch
        from huckli_spark.queries.streaming_parity import ann_serve_scored

        emb = spark.read.parquet(os.path.join(SF_SMALL, "embeddings.parquet"))
        cents = [
            (cid, [float(cid + j) for j in range(64)]) for cid in range(4)
        ]
        idx = str(tmp_path / "posting")
        simsearch.ivf_assign(emb, cents, nprobe=1).select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("__nv"),
            F.col("cid"),
        ).write.partitionBy("cid").parquet(idx)
        posting = spark.read.parquet(idx).select(
            "neighbor_id", "__nv", F.col("cid").cast("int").alias("cid")
        )
        q = simsearch.ivf_assign(
            emb.where(F.col("vec_id") < 20), cents, nprobe=2
        ).select(
            F.col("vec_id").alias("query_id"),
            F.col("cid"),
            F.col("embedding").alias("__qv"),
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = ann_serve_scored(q, posting)
            mode = (
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
            plan = df._jdf.queryExecution().explainString(mode)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "BroadcastHashJoin" not in plan, plan
        assert "BroadcastExchange" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "Python" not in plan, plan


class TestStreamMaxsimServePlan:
    def test_posting_side_never_forced_broadcast(self, spark, tmp_path):
        # same contract as TestStreamAnnServePlan: the frozen member
        # posting store is corpus-sized, so maxsim_stream_scored must
        # carry NO broadcast hint — with the size-bound broadcast
        # disabled the join must plan shuffled
        import os

        from pyspark.sql import functions as F

        from huckli_spark.operators import simsearch
        from huckli_spark.queries.streaming_parity import maxsim_stream_scored

        emb = spark.read.parquet(os.path.join(SF_SMALL, "embeddings.parquet"))
        cents = [
            (cid, [float(cid + j) for j in range(64)]) for cid in range(4)
        ]
        idx = str(tmp_path / "posting")
        simsearch.ivf_assign(emb, cents, nprobe=1).select(
            F.col("vec_id").alias("member_id"),
            F.col("embedding").alias("__nv"),
            F.col("cid"),
        ).write.partitionBy("cid").parquet(idx)
        posting = spark.read.parquet(idx).select(
            "member_id", "__nv", F.col("cid").cast("int").alias("cid")
        )
        probes = simsearch.ivf_assign(
            emb.where(F.col("vec_id") < 8), cents, nprobe=2
        ).select(
            F.expr("vec_id div 2").alias("query_id"),
            F.col("vec_id").alias("token_id"),
            F.col("cid"),
            F.col("embedding").alias("__qv"),
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = maxsim_stream_scored(probes, posting)
            mode = (
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
            plan = df._jdf.queryExecution().explainString(mode)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "BroadcastHashJoin" not in plan, plan
        assert "BroadcastExchange" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "Python" not in plan, plan


class TestImageDedupPlan:
    def test_banded_join_never_all_pairs(self, spark):
        # the pair stage must be the pigeonhole equi-join on 15-bit
        # chunks — no cross product anywhere; Python appears ONLY as
        # the Arrow decode/hash stage (the legitimate codec path)
        plan = _plan(spark, "q_image_dedup")
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan), plan
        # decode/hash rides Arrow batches, never row-at-a-time UDFs
        # ADVICE r09 #2: this is the real pin — row-at-a-time Python
        # never appears; Arrow stages (MapInPandas decode) are allowed
        assert "BatchEvalPython" not in plan, plan


class TestAudioVideoDedupPlans:
    def test_audio_banded_join_never_all_pairs(self, spark):
        plan = _plan(spark, "q_audio_dedup")
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan

    def test_video_frame_hash_equi_join(self, spark):
        plan = _plan(spark, "q_video_dedup")
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        # map-side partial count before the (d1, d2) exchange
        assert "HashAggregate" in plan, plan


class TestStreamImageDedupPlan:
    def test_cross_screen_equi_join_no_product(self, spark):
        # batch analog of the stream-static screen: chunk equi-join,
        # no product, no broadcast hint on the corpus side (with the
        # size bound off it must plan as a shuffled join)
        from huckli_spark.operators.sketch import simhash_pairs_cross

        ns = spark.createDataFrame(
            [(i, (i * 37) % (1 << 60)) for i in range(10)],
            "doc_id long, simhash long",
        )
        cs = spark.createDataFrame(
            [(i + 100, (i * 91) % (1 << 60)) for i in range(50)],
            "doc_id long, simhash long",
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _lazy_plan(spark, simhash_pairs_cross(ns, cs))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "BroadcastExchange" not in plan, plan
        assert re.search(r"(SortMergeJoin|ShuffledHashJoin)", plan), plan


class TestStreamScd2LookupPlan:
    def test_shipped_pit_join_equi_key_never_range_product(self, spark):
        # pin the SHIPPED builder (pit_lookup — the same function the
        # streaming query runs): the equi key must keep the plan a
        # hash/merge join with a residual interval filter; losing the
        # key would silently degrade to a BNLJ range product
        from huckli_spark.queries.warehouse_ops import pit_lookup

        ev = spark.createDataFrame(
            [(i, i % 3) for i in range(30)], "k long, as_of long"
        )
        hist = spark.createDataFrame(
            [(i, 100 + i, 0, None) for i in range(30)]
            + [(i, 200 + i, 1, 2) for i in range(0, 30, 3)],
            "k long, v long, valid_from long, valid_to long",
        )
        plan = _lazy_plan(spark, pit_lookup(ev, hist))
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert re.search(
            r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan
        ), plan


class TestCrossmodalDedupPlan:
    def test_pair_outer_join_banded_sides_no_product(self, spark):
        # both pair relations are the banded builders (pinned above);
        # the cross-modal composition must stay an equi OUTER join on
        # the pair key — no product, no BNLJ anywhere in the tree
        plan = _plan(spark, "q_crossmodal_dedup")
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "FullOuter" in plan, plan


class TestStreamVideoDedupPlan:
    def test_shipped_screen_join_shuffled_never_broadcast(self, spark):
        # pin the SHIPPED join builder (video_screen_hits — the same
        # function the streaming query runs), not a self-built analog:
        # corpus side is corpus-sized, so with the AQE size bound off
        # the screen must plan as a shuffled equi-join on fhash
        from huckli_spark.queries.multimodal_parity import (
            video_screen_hits,
        )

        ns = spark.createDataFrame(
            [(i, (i * 37) % (1 << 60)) for i in range(10)],
            "new_id long, fhash long",
        )
        cs = spark.createDataFrame(
            [(i + 100, (i * 91) % (1 << 60)) for i in range(50)],
            "dup_of long, fhash long",
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _lazy_plan(spark, video_screen_hits(ns, cs))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "BroadcastExchange" not in plan, plan
        # (no Python-absence assert: the local test relations scan via
        # a python-converted source; the shipped query's only Python
        # is the legitimate Arrow decode upstream of these inputs)
        assert re.search(r"(SortMergeJoin|ShuffledHashJoin)", plan), plan


class TestSubstringDedupPlans:
    def test_span_detection_single_gram_shuffle_jvm_only(self, spark):
        # the corpus-sized gram relation must shuffle ONCE (count
        # window partitioned by the gram itself — no groupBy +
        # join-back double shuffle); span merge windows partition by
        # doc; everything JVM
        plan = _plan(spark, "q_substring_dedup")
        assert "Python" not in plan
        assert "CartesianProduct" not in plan
        assert re.search(
            r"count\(1\)[^\n]*windowspecdefinition\(gram", plan
        ), plan
        # gram appears as a partitioning key exactly once: the count
        # window's exchange. doc-side exchanges don't key on gram.
        assert plan.count("hashpartitioning(gram") == 1, plan

    def test_cut_join_keys_on_doc_never_data_sized(self, spark):
        # the span-array join back to the corpus keys on the doc id;
        # the in-row cut lambda adds no Python stage
        plan = _plan(spark, "q_substring_cut")
        assert "Python" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_stream_screen_semi_join_not_broadcast_hinted(self, spark):
        # lazy batch twin of the screen join: LEFT SEMI on the gram,
        # corpus side carries NO broadcast hint (it is corpus-sized;
        # with the AQE size bound off nothing may broadcast)
        import os

        from pyspark.sql import functions as F

        from huckli_spark.queries.streaming_parity import _SUBSTR_SPLIT

        docs = spark.read.parquet(
            os.path.join(SF_SMALL, "documents.parquet")
        )
        w = "filter(split(text, ' '), x -> x <> '')"
        grams = (
            "transform(sequence(1, size(__words) - 2),"
            " i -> array_join(slice(__words, i, 3), ' '))"
        )

        def ww(df):
            return df.select(
                "doc_id", F.expr(w).alias("__words")
            ).where(F.size("__words") >= 3)

        corpus = ww(docs.where(F.col("doc_id") >= _SUBSTR_SPLIT)).select(
            F.explode(F.expr(grams)).alias("gram")
        )
        new = ww(docs.where(F.col("doc_id") < _SUBSTR_SPLIT)).select(
            "doc_id", F.posexplode(F.expr(grams)).alias("pos", "gram")
        )
        joined = new.join(corpus, "gram", "left_semi")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _lazy_plan(spark, joined)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "BroadcastHashJoin" not in plan, plan
        assert re.search(r"(SortMergeJoin|ShuffledHashJoin)[^\n]*LeftSemi",
                         plan), plan


class TestIvfAppendPlan:
    def test_serve_joins_loaded_posting_broadcasting_probes(self, spark):
        # serving from the appended store: probes broadcast onto the
        # cid-keyed posting scan (the q_ann_ivf_trained shape); no
        # product anywhere; the posting side reads from parquet
        plan = _plan(spark, "q_ann_ivf_append")
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert re.search(r"Scan parquet\b[^\n]*", plan), plan
