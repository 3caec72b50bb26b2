"""Partitioning-invariance of the deterministic sampling/sharding ops.

Their docstrings claim "the same rows survive on any engine or
partitioning" — this pins the partitioning half: rebuilding the same
query over an input repartitioned to pathological layouts (1 partition,
or salted 64-way) must yield identical row sets. Hash-rank selection
with a global row_number would silently break this if it ever picked
up a nondeterministic tiebreak; the portable-hash ordering makes it
exact.
"""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _with_repartitioned_docs(spark, n):
    import os

    df = spark.read.parquet(os.path.join(SF_SMALL, "documents.parquet"))
    return df.repartition(n)


class TestSamplingPartitioningInvariance:
    def _build_on(self, spark, name, docs_df):
        """Rebuild a documents-driven query against a repartitioned
        copy staged as a temp parquet dir (queries read from sf_dir)."""
        import tempfile

        from huckli_spark.queries import all_queries

        d = tempfile.mkdtemp(prefix="sampling_inv_")
        docs_df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        return all_queries()[name].build(spark, d)

    def test_mixture_sample_is_layout_invariant(self, spark):
        from huckli_spark.queries import all_queries

        base = _rows(all_queries()["q_mixture_sample"].build(spark, SF_SMALL))
        assert base  # non-trivial selection
        for n in (1, 64):
            got = _rows(
                self._build_on(spark, "q_mixture_sample", _with_repartitioned_docs(spark, n))
            )
            assert got == base, f"selection changed under {n}-partition layout"

    def test_shard_assign_is_layout_invariant(self, spark):
        from huckli_spark.queries import all_queries

        base = _rows(all_queries()["q_shard_assign"].build(spark, SF_SMALL))
        for n in (1, 64):
            got = _rows(
                self._build_on(spark, "q_shard_assign", _with_repartitioned_docs(spark, n))
            )
            assert got == base

    def test_stratified_sample_is_layout_invariant(self, spark):
        from huckli_spark.queries import all_queries

        base = _rows(all_queries()["q_stratified_sample"].build(spark, SF_SMALL))
        for n in (1, 64):
            got = _rows(
                self._build_on(
                    spark, "q_stratified_sample", _with_repartitioned_docs(spark, n)
                )
            )
            assert got == base
