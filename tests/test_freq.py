"""Unit tests for the count-min sketch (operators/freq.py): the
structural overestimate invariant, the merge-equals-rebuild property
that makes it streaming/rollup-friendly, and size bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from huckli_spark.operators import freq


def _items(spark, spec):
    """spec: dict key -> count; builds one row per occurrence."""
    rows = [(k,) for k, n in spec.items() for _ in range(n)]
    return spark.createDataFrame(rows, "key string")


class TestCountMin:
    def test_estimate_never_underestimates(self, spark):
        spec = {f"k{i}": (i % 7) + 1 for i in range(300)}
        df = _items(spark, spec)
        sketch = freq.cms_build(df, "key")
        est = freq.cms_estimate(
            spark.createDataFrame([(k,) for k in spec], "key string"),
            sketch,
            "key",
        ).collect()
        for r in est:
            assert r["est"] >= spec[r["key"]], r

    def test_uninserted_key_can_be_zero(self, spark):
        df = _items(spark, {"a": 5})
        sketch = freq.cms_build(df, "key")
        est = freq.cms_estimate(
            spark.createDataFrame([("zz",)], "key string"), sketch, "key"
        ).collect()[0]
        assert est["est"] >= 0  # absent cells coalesce to 0, never NULL
        assert est["est"] is not None

    def test_merge_equals_rebuild(self, spark):
        # THE mergeability property: sketch(A) + sketch(B) == sketch(A u B)
        a = _items(spark, {f"a{i}": 3 for i in range(50)})
        b = _items(spark, {f"b{i}": 2 for i in range(80)})
        merged = freq.cms_merge(
            freq.cms_build(a, "key"), freq.cms_build(b, "key")
        )
        rebuilt = freq.cms_build(a.unionByName(b), "key")
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, rebuilt.collect())
        )

    def test_sketch_size_bounded(self, spark):
        df = _items(spark, {f"k{i}": 1 for i in range(5000)})
        assert freq.cms_build(df, "key").count() <= freq.CMS_D * freq.CMS_W

    def test_heavy_hitters_finds_the_heavy_key(self, spark):
        spec = {f"noise{i}": 1 for i in range(200)}
        spec["elephant"] = 500
        hh = freq.cms_heavy_hitters(_items(spark, spec), "key", k=5).collect()
        assert hh[0]["key"] == "elephant"
        assert hh[0]["rnk"] == 1
        assert hh[0]["true_cnt"] == 500
        assert all(r["overestimate"] >= 0 for r in hh)
