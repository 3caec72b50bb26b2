"""Fixed-point k-means tests: recovers planted clusters, exact-integer
invariants, partitioning invariance, empty-cluster persistence — and
the payoff test: k-means-trained PQ codebooks beat sampled ones on
clustered data."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from huckli_spark.operators import clustering as km
from huckli_spark.operators import simsearch as ss


def _clustered(spark, n_clusters=4, per=40, dim=64, spread=0.05, seed=3):
    """Vectors around n_clusters well-separated centers. The first
    n_clusters ids are one vector from each cluster (so lowest-id
    init starts near distinct clusters — Lloyd's refines from there).
    """
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim) * 2.0
    rows = []
    vid = 0
    for c in range(n_clusters):  # ids 0..k-1: one seed per cluster
        rows.append((vid, c, centers[c] + rng.randn(dim) * spread))
        vid += 1
    for c in range(n_clusters):
        for _ in range(per - 1):
            rows.append((vid, c, centers[c] + rng.randn(dim) * spread))
            vid += 1
    data = [
        (int(i), int(true), [float(x) for x in v.astype("float32")])
        for i, true, v in rows
    ]
    return spark.createDataFrame(
        data, "vec_id long, true_cluster int, embedding array<float>"
    )


class TestKMeans:
    def test_recovers_planted_clusters(self, spark):
        df = _clustered(spark)
        cents = km.kmeans_fit(df, k=4, iterations=3)
        got = km.kmeans_assign(df, cents)
        joined = df.select("vec_id", "true_cluster").join(got, "vec_id")
        # every learned cluster maps 1:1 onto one true cluster
        purity = (
            joined.groupBy("cid", "true_cluster").count()
            .groupBy("cid").agg(F.max("count").alias("maj"),
                                F.sum("count").alias("tot"))
            .agg(F.sum("maj"), F.sum("tot")).collect()[0]
        )
        assert purity[0] == purity[1] == 160  # perfect separation

    def test_partitioning_invariance(self, spark):
        df = _clustered(spark, seed=9)
        a = km.kmeans_fit(df.repartition(1), k=4, iterations=3)
        b = km.kmeans_fit(df.repartition(64), k=4, iterations=3)
        assert a == b

    def test_centroids_are_integers_near_truth(self, spark):
        df = _clustered(spark, spread=0.01, seed=5)
        cents = km.kmeans_fit(df, k=4, iterations=3)
        assert all(isinstance(v, int) for c in cents for v in c)
        # trained centroid ~= cluster mean (within spread + rounding)
        rows = {r["vec_id"]: (r["true_cluster"], r["embedding"])
                for r in df.collect()}
        got = km.kmeans_assign(df, cents).collect()
        by_cid: dict[int, list[int]] = {}
        for r in got:
            by_cid.setdefault(r["cid"], []).append(r["vec_id"])
        for cid, members in by_cid.items():
            mean = np.mean([rows[m][1] for m in members], axis=0)
            trained = np.array(cents[cid]) / 1e6
            assert float(np.max(np.abs(mean - trained))) < 0.02

    def test_empty_cluster_keeps_centroid(self, spark):
        # k=3 over data with only 2 real groups and a far-away seed id
        rows = [(0, [0.0] * 8), (1, [10.0] * 8), (2, [100.0] * 8)]
        rows += [(i, [0.01] * 8) for i in range(3, 10)]
        rows += [(i, [10.01] * 8) for i in range(10, 17)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        cents = km.kmeans_fit(df, k=3, iterations=2)
        # centroid 2 captured only its own seed at first and may go
        # empty later; it must remain a valid integer vector
        assert len(cents) == 3 and all(len(c) == 8 for c in cents)

    def test_trained_pq_codebooks_beat_sampled_on_clustered_data(self, spark):
        # THE payoff: on clustered vectors, k-means codebooks cut PQ
        # reconstruction error vs sampled ones — a single sampled
        # vector carries its own noise; the trained centroid is the
        # denoised cluster mean. (Recall can tie when sampling happens
        # to pick one seed per cluster; the quantization OBJECTIVE
        # improves regardless.)
        df = _clustered(spark, n_clusters=8, per=25, spread=0.2, seed=11)
        em = df.select("vec_id", "embedding")

        sampled = ss.pq_codebooks(em, m=8, n_codes=8)
        cents = km.kmeans_fit(em, k=8, iterations=3)
        # trained codebooks: per subspace s, the k centroids' slices
        trained = [
            [[v / 1e6 for v in c[s * 8:(s + 1) * 8]] for c in cents]
            for s in range(8)
        ]

        def total_err(cbs):
            return (
                ss.pq_encode(em, cbs)
                .agg(F.sum("err_micro"))
                .collect()[0][0]
            )

        e_sampled, e_trained = total_err(sampled), total_err(trained)
        assert e_trained < 0.7 * e_sampled, (e_trained, e_sampled)

    def test_registry_trained_recall_beats_sampled(self, spark):
        # VERDICT r05 directive #2: the gate query q_pq_recall_trained
        # (per-subspace k-means codebooks) must measurably lift mean
        # recall@5 over the sampled-codebook baseline q_pq_recall on
        # the shared fixture. Measured r6: 0.29 vs 0.17 at sf0.01.
        from huckli_spark.queries import all_queries

        qs = all_queries()
        sf = "/root/testdata/sf0.001"

        def mean_recall(name):
            rows = qs[name].build(spark, sf).collect()
            return sum(r["recall_at_5"] for r in rows) / len(rows)

        sampled = mean_recall("q_pq_recall")
        trained = mean_recall("q_pq_recall_trained")
        assert trained > sampled, (trained, sampled)

    def test_refine_lifts_recall_over_adc(self, spark):
        # Round 7: ADC shortlist + exact refine (q_pq_refine_recall)
        # must decisively beat code-only ADC ranking on the SAME
        # trained index. Measured at sf0.01: 0.76 vs 0.29.
        from huckli_spark.queries import all_queries

        qs = all_queries()
        sf = "/root/testdata/sf0.001"

        def mean_recall(name):
            rows = qs[name].build(spark, sf).collect()
            return sum(r["recall_at_5"] for r in rows) / len(rows)

        adc_only = mean_recall("q_pq_recall_trained")
        refined = mean_recall("q_pq_refine_recall")
        assert refined >= adc_only + 0.2, (refined, adc_only)
        assert refined >= 0.6, refined


class TestKMeansRobustness:
    def test_noncontiguous_ids(self, spark):
        # ids offset by 1e9: init must still find k seeds (the k
        # lowest ids), and the result must match the contiguous run
        # re-labeled — pure id-space invariance
        df = _clustered(spark, seed=21)
        shifted = df.withColumn("vec_id", F.col("vec_id") + F.lit(10**9))
        a = km.kmeans_fit(df, k=4, iterations=3)
        b = km.kmeans_fit(shifted, k=4, iterations=3)
        assert a == b

    def test_short_corpus_raises_loudly(self, spark):
        # Regression (ADVICE r5): empty input used to IndexError and a
        # 3-row corpus silently trained 3 < k clusters.
        import pytest as _pytest

        df = _clustered(spark).limit(3)
        with _pytest.raises(ValueError, match="only 3 row"):
            km.kmeans_fit(df, k=4, iterations=1)
        with _pytest.raises(ValueError, match="only 0 row"):
            km.kmeans_fit(df.limit(0), k=4, iterations=1)


class TestAssignJoinVariant:
    def test_kmeans_join_matches_literal(self, spark):
        # the two forms must agree bit-for-bit (same integer argmin)
        df = _clustered(spark, n_clusters=4, per=30, seed=5)
        cents = km.kmeans_fit(df, k=4, iterations=2)
        a = {(r["vec_id"], r["cid"]) for r in km.kmeans_assign(df, cents).collect()}
        b = {(r["vec_id"], r["cid"])
             for r in km.kmeans_assign_join(df, cents).collect()}
        assert a == b and len(a) == df.count()

    def test_ivf_join_matches_literal(self, spark):
        df = _clustered(spark, n_clusters=4, per=30, seed=9)
        cents = [(i, [v / 1e6 for v in c])
                 for i, c in enumerate(km.kmeans_fit(df, k=4, iterations=2))]
        a = {(r["vec_id"], r["cid"])
             for r in ss.ivf_assign(df, cents, nprobe=2).collect()}
        b = {(r["vec_id"], r["cid"])
             for r in ss.ivf_assign_join(df, cents, nprobe=2).collect()}
        assert a == b

    def test_fit_broadcast_form_bit_identical(self, spark):
        # TRAINING with the codebook-as-data plan form (required at
        # the k~100k regime where a literal assignment expression is
        # millions of plan nodes) must produce the identical centroids
        df = _clustered(spark, n_clusters=4, per=30, seed=11)
        lit = km.kmeans_fit(df, k=4, iterations=3, plan_form="literal")
        bc = km.kmeans_fit(df, k=4, iterations=3, plan_form="broadcast")
        assert lit == bc

    def test_assign_auto_delegates_above_cell_bound(self, spark):
        # a codebook past LITERAL_CELL_BOUND must route to the join
        # variant (no k*dim literal expression in the plan)
        df = _clustered(spark, n_clusters=2, per=5, dim=64, seed=13)
        big_k = km.LITERAL_CELL_BOUND // 64 + 1
        cents = [[i] * 64 for i in range(big_k)]
        plan = (
            km.kmeans_assign(df, cents)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastNestedLoopJoin" in plan

    def test_join_variant_plan_has_no_corpus_shuffle(self, spark):
        # map-only claim: the corpus flows scan -> project -> broadcast
        # nested-loop over ONE centroid row. The only Exchange allowed
        # is the SinglePartition collect_list on the k-row centroid
        # side (bounded by k, never by the corpus).
        df = _clustered(spark, n_clusters=4, per=10, seed=7)
        cents = km.kmeans_fit(df, k=4, iterations=1)
        plan = (
            km.kmeans_assign_join(df, cents)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastNestedLoopJoin" in plan
        assert "hashpartitioning" not in plan, plan


class TestBatchedPQTraining:
    def test_batched_equals_sequential_kmeans_per_subspace(self, spark):
        # pq_codebooks_trained batches all m subspace trainings into
        # shared jobs; the centroids must be BIT-IDENTICAL to running
        # kmeans_fit per subspace slice (the formulation the SQL
        # oracle replays).
        df = _clustered(spark, n_clusters=4, per=20, seed=13)
        em = df.select("vec_id", "embedding")
        m, n_codes, iters = 8, 4, 2
        sub = 64 // m
        seq = []
        for s in range(m):
            sliced = em.select(
                "vec_id",
                F.slice("embedding", s * sub + 1, sub).alias("embedding"),
            )
            cents = km.kmeans_fit(sliced, k=n_codes, iterations=iters)
            seq.append([[v / 1e6 for v in c] for c in cents])
        bat = ss.pq_codebooks_trained(
            em, m=m, n_codes=n_codes, iterations=iters
        )
        assert bat == seq

    def test_short_corpus_raises(self, spark):
        import pytest as _pytest

        df = _clustered(spark, n_clusters=4, per=2, seed=3).limit(5)
        with _pytest.raises(ValueError, match="only 5"):
            ss.pq_codebooks_trained(df, n_codes=16)
