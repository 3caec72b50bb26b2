#!/usr/bin/env python
"""Source-overlap-matrix scaling probe.

The risk term is the per-shingle pair fan-out (sources-per-shingle
choose 2). Scaling DOCS 10x (salted words -> 10x distinct shingles,
same 20 sources) must scale wall ~linearly with the digest shuffle,
never quadratically: the matrix itself stays 190 rows. Writes
SCALE_PROBE_source_overlap.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from huckli_spark.functions.portable import h60
from huckli_spark.operators.dedup import shingles
from huckli_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated(spark, copies: int):
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    parts = [
        base.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda w: F.concat(w, F.lit(f"x{i}")),
                ),
                " ",
            ).alias("text"),
            "source",
        )
        for i in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def matrix_rows(docs):
    sh = (
        shingles(docs, id_col="source", text_col="text", n=3)
        .select("source", h60(F.col("shingle")).alias("sh"))
        .distinct()
    )
    x = sh.select(F.col("source").alias("src_a"), "sh")
    y = sh.select(F.col("source").alias("src_b"), "sh")
    return (
        x.join(y, "sh")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("shared"))
    )


def main() -> None:
    spark = get_spark(app_name="source_overlap_probe")
    matrix_rows(replicated(spark, 1).limit(500)).count()  # warmup
    results = {}
    for copies in (1, 10):
        docs = replicated(spark, copies).persist()
        n = docs.count()
        t0 = time.perf_counter()
        rows = matrix_rows(docs).count()
        wall = time.perf_counter() - t0
        docs.unpersist()
        results[f"{copies}x"] = {
            "n_docs": n,
            "matrix_rows": rows,
            "wall_s": round(wall, 2),
        }
        print(f"{copies}x: {results[f'{copies}x']}", flush=True)
    results["ratio_10x_over_1x"] = {
        "wall": round(results["10x"]["wall_s"] / results["1x"]["wall_s"], 2)
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROBE_source_overlap.json",
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
