"""fan_out: repartition narrow scans, leave wide plans alone."""

from __future__ import annotations

from huckli_spark.operators.parallel import fan_out


def test_fan_out_widens_narrow_input(spark):
    df = spark.range(1000).coalesce(1)
    out = fan_out(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 1000


def test_fan_out_noop_on_wide_input(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target + 4)
    out = fan_out(df)
    # already wide: returned as-is, no extra shuffle inserted
    assert out is df


def test_fan_out_explicit_minimum(spark):
    df = spark.range(100).coalesce(1)
    assert fan_out(df, min_partitions=7).rdd.getNumPartitions() == 7


def test_connected_components_chain_and_cliques(spark):
    from huckli_spark.operators.dedup import connected_components

    # a 6-node chain (diameter forces several propagation rounds),
    # a 3-clique, and an isolated pair
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),
         (10, 11), (11, 12), (10, 12),
         (20, 21)],
        "d1 long, d2 long",
    )
    want = {(n, 1) for n in range(1, 7)} | {(n, 10) for n in (10, 11, 12)} | {
        (20, 20), (21, 20)
    }
    # union-find fast path and distributed label propagation must agree
    fast = {(r.doc_id, r.cluster_id) for r in connected_components(pairs).collect()}
    dist = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(pairs, small_graph_max=0).collect()
    }
    assert fast == want
    assert dist == want


def test_connected_components_string_ids(spark):
    # the fast path must not assume long ids (VERDICT r02 #7): string
    # doc ids (content digests, uuids) go through both paths identically
    from huckli_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [("docB", "docA"), ("docB", "docC"), ("docX", "docY")],
        "d1 string, d2 string",
    )
    want = {
        ("docA", "docA"), ("docB", "docA"), ("docC", "docA"),
        ("docX", "docX"), ("docY", "docX"),
    }
    fast = {(r.doc_id, r.cluster_id) for r in connected_components(pairs).collect()}
    dist = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(pairs, small_graph_max=0).collect()
    }
    assert fast == want
    assert dist == want
