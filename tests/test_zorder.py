"""Z-order clustering tests: the layout must measurably improve
row-group skipping on BOTH participating columns vs a single-column
sort, and the operator must be a pure reordering (same rows)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from huckli_spark.operators.zorder import morton_key, zorder


def _grid(spark, n=200):
    # n x n grid of (x, y) points — the canonical z-order demo shape
    return (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
    )


def _overlapping_groups(path, col, lo, hi):
    """Row groups whose [min, max] for `col` intersects [lo, hi] —
    what parquet predicate pushdown would have to read."""
    total = hit = 0
    for fn in os.listdir(path):
        if not fn.endswith(".parquet"):
            continue
        pf = pq.ParquetFile(os.path.join(path, fn))
        idx = pf.schema_arrow.get_field_index(col)
        for g in range(pf.num_row_groups):
            st = pf.metadata.row_group(g).column(idx).statistics
            total += 1
            if st.min <= hi and st.max >= lo:
                hit += 1
    return hit, total


class TestZOrder:
    def test_pure_reordering(self, spark):
        df = _grid(spark, 50)
        out = zorder(df, ["x", "y"], partitions=4)
        assert sorted(map(tuple, out.collect())) == sorted(
            map(tuple, df.collect())
        )
        assert out.columns == df.columns  # __z and stat cols dropped

    def test_skipping_improves_on_both_columns(self, spark, tmp_path):
        df = _grid(spark, 200)  # 40k rows
        opts = dict(maxRecordsPerFile=2500)
        linear = str(tmp_path / "linear")
        zpath = str(tmp_path / "zord")
        # baseline: sorted by x only (helps x, useless for y)
        df.repartitionByRange(4, "x").sortWithinPartitions(
            "x"
        ).write.options(**opts).parquet(linear)
        zorder(df, ["x", "y"], partitions=4).write.options(**opts).parquet(
            zpath
        )

        # narrow band on y: the x-sorted layout must scan ~everything,
        # the z-ordered one must skip most groups
        zy_hit, zy_tot = _overlapping_groups(zpath, "y", 10, 20)
        ly_hit, ly_tot = _overlapping_groups(linear, "y", 10, 20)
        assert ly_hit == ly_tot  # x-sort gives y no locality at all
        assert zy_hit <= zy_tot // 2, (zy_hit, zy_tot)
        # and x stays skippable too (z-order trades a little x locality)
        zx_hit, zx_tot = _overlapping_groups(zpath, "x", 10, 20)
        assert zx_hit <= zx_tot // 2, (zx_hit, zx_tot)

    def test_morton_interleave_exact(self, spark):
        row = spark.range(1).select(
            morton_key(
                [F.lit(0b101).cast("long"), F.lit(0b011).cast("long")]
            ).alias("z")
        ).collect()[0]
        # bits: x=101, y=011 -> z = y2 x2 y1 x1 y0 x0 = 0 1 1 0 1 1
        assert row["z"] == 0b011011

    def test_bad_arity_raises(self, spark):
        with pytest.raises(ValueError, match="2-4"):
            zorder(_grid(spark, 5), ["x"])

    def test_four_column_key_stays_nonnegative(self, spark):
        # Regression (ADVICE r6): 4 cols x 16 bits wrote bit 63 (the
        # BIGINT sign bit), so rows with the last column's top scaled
        # bit set got NEGATIVE keys and sorted before everything else.
        # With the cap (63 // 4 = 15 bits) the key must stay >= 0 even
        # when every column sits at its scaled maximum.
        from huckli_spark.operators.zorder import _key_bits

        bits = _key_bits(4)
        assert 4 * bits <= 63
        top = F.lit((1 << bits) - 1).cast("long")
        row = spark.range(1).select(
            morton_key([top, top, top, top], bits).alias("z")
        ).collect()[0]
        assert row["z"] == (1 << (4 * bits)) - 1 > 0

    def test_morton_bits_overflow_raises(self, spark):
        with pytest.raises(ValueError, match="sign bit"):
            morton_key([F.lit(0).cast("long")] * 4, 16)

    def test_four_column_keys_monotone_at_extremes(self, spark):
        # Key-level pin of the fix: over random 4-col scaled points
        # plus the all-max point, every key is non-negative and the
        # all-max point carries the strictly greatest key (before the
        # fix its key was NEGATIVE, sorting it first).
        from huckli_spark.operators.zorder import _key_bits

        bits = _key_bits(4)
        top = (1 << bits) - 1
        df = spark.range(200).select(
            *[
                F.when(F.col("id") == 0, top)
                .otherwise(F.xxhash64(F.col("id"), F.lit(j)) % (top + 1))
                .cast("long")
                .alias(f"s{j}")
                for j in range(4)
            ]
        ).select(
            F.col("s0"),
            morton_key(
                [F.abs(F.col(f"s{j}")).cast("long") for j in range(4)], bits
            ).alias("z"),
        )
        rows = df.collect()
        assert all(r["z"] >= 0 for r in rows)
        maxkey = (1 << (4 * bits)) - 1
        assert rows[0]["z"] == maxkey
        assert all(r["z"] < maxkey for r in rows[1:])


class TestWarehouseZOrderCompact:
    def test_acid_zorder_compact_preserves_rows(self, spark, tmp_path):
        from huckli_spark.ingest.warehouse import Warehouse

        wh = Warehouse(spark, str(tmp_path), acid=True)
        df = _grid(spark, 60)
        wh.append("g", df)
        before = sorted(map(tuple, wh.table("g").collect()))
        wh.compact("g", ["x", "y"], target_partitions=4, zorder=True)
        after = sorted(map(tuple, wh.table("g").collect()))
        assert before == after
        # snapshot-replace: the pre-compaction version stays readable
        assert wh.table("g", as_of=0).count() == len(before)

    def test_date_column_zorder(self, spark):
        # the docstring's date/timestamp claim, exercised
        df = spark.range(100).select(
            F.col("id").alias("x"),
            F.expr("date_add(DATE'2024-01-01', cast(id % 30 AS int))").alias("d"),
            F.col("id").alias("payload"),
        )
        out = zorder(df, ["x", "d"], partitions=2)
        assert out.columns == df.columns
        assert sorted(map(tuple, out.collect())) == sorted(
            map(tuple, df.collect())
        )


class TestZOrderWarehouseAtScale:
    """VERDICT r6 #7: the gate-path pin. A zordered WAREHOUSE table at
    sf0.1 scale must skip row groups on BOTH predicate columns, where
    the single-column compaction (the reference's date-partitioning
    behavior) only ever prunes its one sort column."""

    def _overlap(self, table_path, live, col, lo, hi):
        import os

        import pyarrow.parquet as pq

        total = hit = 0
        for rel in live:
            pf = pq.ParquetFile(os.path.join(table_path, rel))
            idx = pf.schema_arrow.get_field_index(col)
            for g in range(pf.num_row_groups):
                st = pf.metadata.row_group(g).column(idx).statistics
                total += 1
                if st.min <= hi and st.max >= lo:
                    hit += 1
        return hit, total

    def test_sf01_both_columns_prune_vs_single_sort(self, spark, tmp_path):
        from huckli_spark.ingest.txlog import TransactionLog
        from huckli_spark.ingest.warehouse import Warehouse

        li = spark.read.parquet(
            "/root/testdata/sf0.1/lineitem.parquet"
        ).select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")

        wh = Warehouse(spark, str(tmp_path), acid=True)
        for name, cols, z in (
            ("lz", ["l_partkey", "l_suppkey"], True),   # z-ordered
            ("ls", ["l_partkey"], False),               # single-col sort
        ):
            wh.append(name, li)
            wh.compact(name, cols, target_partitions=48, zorder=z)

        bands = {"l_partkey": (1000, 1399), "l_suppkey": (100, 119)}  # ~2%
        stats = {}
        for name in ("lz", "ls"):
            path = wh.table_path(name)
            live = TransactionLog(path).live_files()
            stats[name] = {
                c: self._overlap(path, live, c, lo, hi)
                for c, (lo, hi) in bands.items()
            }

        # enough granularity for skipping to mean anything
        assert stats["lz"]["l_partkey"][1] >= 16

        # single-column sort: perfect on its own column, ZERO pruning
        # on the other (every group overlaps the suppkey band)
        sp_hit, sp_tot = stats["ls"]["l_partkey"]
        ss_hit, ss_tot = stats["ls"]["l_suppkey"]
        assert sp_hit <= sp_tot // 4, stats
        assert ss_hit == ss_tot, stats

        # z-order: BOTH columns prune at least half the groups
        zp_hit, zp_tot = stats["lz"]["l_partkey"]
        zs_hit, zs_tot = stats["lz"]["l_suppkey"]
        assert zp_hit <= zp_tot // 2, stats
        assert zs_hit <= zs_tot // 2, stats
        # and the z layout strictly beats the single-sort layout on
        # the column the latter ignores
        assert zs_hit < ss_hit, stats
