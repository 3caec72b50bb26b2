#!/usr/bin/env python
"""Streaming-ANN-serve scaling probe (VERDICT r08 #1 follow-through).

Measures the SERVE wall of q_stream_ann_serve's fixed plan — frozen
cid-partitioned posting store, NO broadcast hint on the corpus-sized
static side — at 1x / 10x the sf0.1 embeddings corpus with constant
cluster geometry (k scaled 8 -> 80) and a constant 20-query live
feed. Per-query work is nprobe x cluster size, so with geometry held
the serve wall should stay near-flat while the frozen store grows
10x. Index build/freeze is excluded (train-once economics; the
build is the SCALE_PROBE_hybrid_serve story). Writes
SCALE_PROBE_stream_ann.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from huckli_spark.operators import simsearch
from huckli_spark.operators.clustering import kmeans_fit
from huckli_spark.queries.streaming_parity import ann_serve_scored
from huckli_spark.session import get_spark
from huckli_spark.streaming.windows import run_to_memory

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated(spark, copies: int):
    base = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    parts = [
        base.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            F.expr(
                f"transform(embedding, (x, j) -> CASE WHEN j = {i % 64}"
                " THEN cast(x + 0.001 as float) ELSE x END)"
            ).alias("embedding"),
        )
        for i in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def serve_once(spark, emb, k: int) -> tuple[float, float, int]:
    """(freeze_wall, serve_wall, rows): build + freeze the posting
    store, then time ONLY the streaming drain."""
    t0 = time.perf_counter()
    cents_micro = kmeans_fit(emb, k=k, iterations=3)
    cents = [(cid, [x / 1e6 for x in c]) for cid, c in enumerate(cents_micro)]
    idx = os.path.join(tempfile.mkdtemp(prefix="probe_ann_idx_"), "posting")
    simsearch.ivf_assign(emb, cents, nprobe=1).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("__nv"),
        F.col("cid"),
    ).write.partitionBy("cid").parquet(idx)
    posting = spark.read.parquet(idx).select(
        "neighbor_id", "__nv", F.col("cid").cast("int").alias("cid")
    )
    freeze = time.perf_counter() - t0

    qdir = tempfile.mkdtemp(prefix="probe_ann_q_")
    emb.where(F.col("vec_id") < 20).write.parquet(
        os.path.join(qdir, "q.parquet")
    )
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), True),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        ]
    )
    t1 = time.perf_counter()
    stream = spark.readStream.schema(schema).parquet(
        os.path.join(qdir, "q.parquet")
    )
    q = simsearch.ivf_assign(stream, cents, nprobe=2).select(
        F.col("vec_id").alias("query_id"),
        F.col("cid"),
        F.col("embedding").alias("__qv"),
    )
    out = run_to_memory(ann_serve_scored(q, posting), output_mode="append")
    n = out.count()
    serve = time.perf_counter() - t1
    return freeze, serve, n


def main() -> None:
    spark = get_spark(app_name="stream_ann_probe")
    serve_once(spark, replicated(spark, 1).limit(500), k=4)  # warmup
    results = {}
    for copies, k in ((1, 8), (10, 80)):
        emb = replicated(spark, copies).persist()
        n_vec = emb.count()
        freeze, serve, rows = serve_once(spark, emb, k)
        emb.unpersist()
        results[f"{copies}x"] = {
            "n_vectors": n_vec,
            "k": k,
            "freeze_wall_s": round(freeze, 2),
            "serve_wall_s": round(serve, 2),
            "result_rows": rows,
        }
        print(f"{copies}x: {results[f'{copies}x']}", flush=True)
    results["ratio_10x_over_1x"] = {
        "serve_wall": round(
            results["10x"]["serve_wall_s"] / results["1x"]["serve_wall_s"], 2
        ),
        "n_vectors": round(
            results["10x"]["n_vectors"] / results["1x"]["n_vectors"], 2
        ),
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROBE_stream_ann.json",
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
