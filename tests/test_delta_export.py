"""Delta-protocol snapshot export tests: action JSON pinned against
the public protocol spec (PROTOCOL.md), live-file equivalence with the
txlog, replaced partitions excluded, re-export rebasing."""

from __future__ import annotations

import json
import os
import urllib.parse

from pyspark.sql import functions as F
from pyspark.sql import types as T

from huckli_spark.ingest.warehouse import Warehouse


def _read_actions(commit_file):
    with open(commit_file) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def _df(spark, n=20, src="pref.1700000000000.gz"):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        F.lit(src).alias("file_source"),
    )


class TestDeltaExport:
    def test_protocol_and_metadata_actions(self, spark, tmp_path):
        wh = Warehouse(spark, str(tmp_path), idempotent=True)
        wh.append("t", _df(spark))
        commit = wh.export_delta("t")
        assert commit.endswith(os.path.join("_delta_log", "0" * 20 + ".json"))
        actions = _read_actions(commit)

        protocol = next(a["protocol"] for a in actions if "protocol" in a)
        assert protocol == {"minReaderVersion": 1, "minWriterVersion": 2}

        meta = next(a["metaData"] for a in actions if "metaData" in a)
        assert meta["format"] == {"provider": "parquet", "options": {}}
        assert meta["partitionColumns"] == ["file_date", "file_source"]
        # schemaString is valid Spark schema JSON incl. partition cols
        schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
        assert {"k", "v", "file_source", "file_date"} <= set(schema.names)

    def test_add_actions_cover_live_files_exactly(self, spark, tmp_path):
        wh = Warehouse(spark, str(tmp_path), idempotent=True, acid=True)
        wh.append("t", _df(spark, src="pref.1700000000000.gz"))
        wh.append("t", _df(spark, src="pref.1700003600000.gz"))
        # re-ingest of the first file: its partition is REPLACED
        wh.append("t", _df(spark, n=5, src="pref.1700000000000.gz"))
        commit = wh.export_delta("t")
        adds = [
            a["add"] for a in _read_actions(commit) if "add" in a
        ]
        paths = sorted(urllib.parse.unquote(a["path"]) for a in adds)
        from huckli_spark.ingest.txlog import TransactionLog

        live = sorted(TransactionLog(wh.table_path("t")).live_files())
        assert paths == live
        for a in adds:
            full = os.path.join(
                wh.table_path("t"), urllib.parse.unquote(a["path"])
            )
            assert a["size"] == os.path.getsize(full)
            assert a["dataChange"] is True
            assert a["partitionValues"]["file_source"] in (
                "pref.1700000000000.gz",
                "pref.1700003600000.gz",
            )
            assert a["partitionValues"]["file_date"]  # derived date value

        # snapshot row count == table row count (5 replaced + 20)
        files = [
            os.path.join(wh.table_path("t"), p) for p in paths
        ]
        assert spark.read.parquet(*files).count() == wh.table("t").count() == 25

    def test_reexport_rebases_snapshot(self, spark, tmp_path):
        wh = Warehouse(spark, str(tmp_path), idempotent=True, acid=True)
        wh.append("t", _df(spark))
        c1 = wh.export_delta("t")
        n1 = len([a for a in _read_actions(c1) if "add" in a])
        wh.append("t", _df(spark, src="pref.1700007200000.gz"))
        c2 = wh.export_delta("t")
        n2 = len([a for a in _read_actions(c2) if "add" in a])
        assert c1 == c2  # same version-0 file, rewritten
        assert n2 > n1

    def test_plain_table_export(self, spark, tmp_path):
        # non-acid, non-partitioned: every parquet file is live
        wh = Warehouse(spark, str(tmp_path))
        wh.append("flat", spark.range(10).select(F.col("id").alias("k")))
        commit = wh.export_delta("flat")
        actions = _read_actions(commit)
        meta = next(a["metaData"] for a in actions if "metaData" in a)
        assert meta["partitionColumns"] == []
        adds = [a["add"] for a in actions if "add" in a]
        assert adds and all(a["partitionValues"] == {} for a in adds)
        files = [
            os.path.join(wh.table_path("flat"), urllib.parse.unquote(a["path"]))
            for a in adds
        ]
        assert spark.read.parquet(*files).count() == 10


class TestSchemaEvolution:
    def test_additive_column_readable_in_place(self, spark, tmp_path):
        from pyspark.sql import functions as F

        wh = Warehouse(spark, str(tmp_path), merge_schema=True)
        v1 = spark.range(5).select(F.col("id").alias("k"))
        v2 = spark.range(5, 10).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("extra")
        )
        wh.append("evo", v1)
        wh.append("evo", v2)
        out = wh.table("evo")
        assert set(out.columns) == {"k", "extra"}
        rows = {r["k"]: r["extra"] for r in out.collect()}
        assert rows[2] is None and rows[7] == 14
        assert len(rows) == 10

    def test_acid_table_evolves_too(self, spark, tmp_path):
        from pyspark.sql import functions as F

        wh = Warehouse(spark, str(tmp_path), acid=True, merge_schema=True)
        wh.append("evo", spark.range(3).select(F.col("id").alias("k")))
        wh.append(
            "evo",
            spark.range(3, 6).select(
                F.col("id").alias("k"), F.lit("v2").alias("tag")
            ),
        )
        out = wh.table("evo")
        assert set(out.columns) == {"k", "tag"}
        assert out.where("tag IS NULL").count() == 3
        # time travel to v0 sees the ORIGINAL schema (old files only)
        v0 = wh.table("evo", as_of=0)
        assert set(v0.columns) == {"k"}
