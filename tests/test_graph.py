"""Unit tests for operators/graph.py: edge extraction semantics and
PageRank invariants (mass conservation, dangling handling, known
closed-form cases, partitioning invariance)."""

from __future__ import annotations

from pyspark.sql import functions as F

from huckli_spark.operators.graph import MICRO, pagerank, transition_edges


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, weight long")


class TestTransitionEdges:
    def test_counts_consecutive_pairs(self, spark):
        ev = spark.createDataFrame(
            [
                (1, 100, 10, "a"),
                (2, 100, 20, "b"),
                (3, 100, 30, "a"),
                (4, 200, 10, "a"),
                (5, 200, 20, "b"),
            ],
            "event_id long, user_id long, ts long, event_type string",
        )
        got = {
            (r["src"], r["dst"]): r["weight"]
            for r in transition_edges(ev).collect()
        }
        assert got == {("a", "b"): 2, ("b", "a"): 1}

    def test_no_cross_user_edges(self, spark):
        ev = spark.createDataFrame(
            [(1, 100, 10, "a"), (2, 200, 20, "b")],
            "event_id long, user_id long, ts long, event_type string",
        )
        assert transition_edges(ev).count() == 0


class TestPageRank:
    def test_mass_conserved(self, spark):
        e = _edges(
            spark,
            [("a", "b", 3), ("b", "c", 1), ("c", "a", 2), ("a", "c", 1)],
        )
        total = pagerank(e).agg(F.sum("rank_micro")).collect()[0][0]
        # integer flooring loses < 1 micro per node per term
        assert abs(total - MICRO) < 50

    def test_symmetric_cycle_is_uniform(self, spark):
        # a -> b -> c -> a with equal weights: exact symmetry
        e = _edges(spark, [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)])
        ranks = {r["node"]: r["rank_micro"] for r in pagerank(e).collect()}
        assert len(set(ranks.values())) == 1

    def test_sink_attracts_mass(self, spark):
        # everything points at 'hub'; hub dangles (mass redistributes)
        e = _edges(spark, [("a", "hub", 1), ("b", "hub", 1), ("c", "hub", 1)])
        ranks = {r["node"]: r["rank_micro"] for r in pagerank(e).collect()}
        assert ranks["hub"] > ranks["a"] == ranks["b"] == ranks["c"]

    def test_partitioning_invariance(self, spark):
        rows = [(f"n{i}", f"n{(i * 7) % 23}", (i % 5) + 1) for i in range(200)]
        e1 = _edges(spark, rows).repartition(1)
        e2 = _edges(spark, rows).repartition(64)
        r1 = sorted(map(tuple, pagerank(e1).collect()))
        r2 = sorted(map(tuple, pagerank(e2).collect()))
        assert r1 == r2


class TestTriangleOrientation:
    def test_degree_oriented_equals_id_oriented(self, spark):
        # a skewed graph: one hub connected to everyone + random edges
        import random

        rng = random.Random(5)
        edges = {(0, i) for i in range(1, 40)}  # hub 0
        while len(edges) < 140:
            a, b = rng.randrange(1, 40), rng.randrange(1, 40)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        from huckli_spark.operators.graph import triangles_per_node

        e = spark.createDataFrame(sorted(edges), "s1 long, s2 long")
        plain = {(r["v"], r["n_triangles"])
                 for r in triangles_per_node(e).collect()}
        orient = {(r["v"], r["n_triangles"])
                  for r in triangles_per_node(e, orient_by_degree=True).collect()}
        assert plain == orient and plain  # same counts, non-empty


class TestKCore:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "s1 long, s2 long")

    def test_clique_survives_tail_peeled(self, spark):
        from huckli_spark.operators.graph import kcore

        # 4-clique (1,2,3,4) + a pendant node 5 hanging off node 1
        clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        e = self._edges(spark, clique + [(1, 5)])
        out = {r["v"]: r["core_deg"] for r in kcore(e, k=2, iterations=4).collect()}
        assert out == {1: 3, 2: 3, 3: 3, 4: 3}  # 5 peeled, clique intact

    def test_cascade_peel(self, spark):
        from huckli_spark.operators.graph import kcore

        # chain 1-2-3-4-5: every node peels under k=2, but only via
        # CASCADE (ends first, then the chain unravels inward)
        e = self._edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
        assert kcore(e, k=2, iterations=5).count() == 0

    def test_bounded_iterations_deterministic(self, spark):
        from huckli_spark.operators.graph import kcore

        # triangle + pendant: k=2 converges in one round; extra rounds
        # must be no-ops (monotone peel)
        e = self._edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
        a = sorted(map(tuple, kcore(e, k=2, iterations=2).collect()))
        b = sorted(map(tuple, kcore(e, k=2, iterations=6).collect()))
        assert a == b == [(1, 2), (2, 2), (3, 2)]
