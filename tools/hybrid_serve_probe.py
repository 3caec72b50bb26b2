#!/usr/bin/env python
"""Frozen-index hybrid serving probe (VERDICT r07 #4).

Train-once-serve-many only pays off if the SERVE wall stays flat as
the indexed corpus grows. This probe builds the persisted ANN index
over 1x and 10x decorrelated embedding corpora (k scales with the
corpus: 8 -> 80 coarse clusters, constant per-cluster membership —
the IVF operating discipline), records the one-time build wall, then
measures serving the hybrid vector arm (probes -> posting join -> ADC
over candidates -> top-50) from the frozen index. With constant
cluster size, nprobe=2 touches a constant candidate count, so serve
wall should hold near-flat at 10x (the incremental-screen probe
pattern). Writes SCALE_PROBE_hybrid_serve.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from huckli_spark.operators import simsearch
from huckli_spark.operators.ann_index import load_ann_index, save_ann_index
from huckli_spark.operators.clustering import kmeans_fit
from huckli_spark.session import get_spark
from tools.scale_probe import WORK, _max_stage_id, _scaled_embeddings, _stage_totals


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="hybrid_serve_probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb0 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    out: dict = {"sf_dir": sf_dir, "scales": {}}
    for scale in (1, 10):
        em = spark.read.parquet(_scaled_embeddings(spark, emb0, scale))
        k = 8 * scale  # constant per-cluster membership
        path = f"{WORK}/serve_idx_x{scale}/index"

        t0 = time.perf_counter()
        cents_micro = kmeans_fit(em, k=k, iterations=3)
        cents = [
            (cid, [x / 1e6 for x in c]) for cid, c in enumerate(cents_micro)
        ]
        # large-k storage assignment: broadcast-row form (plan O(1) in k)
        posting = simsearch.ivf_assign_join(em, cents, nprobe=1).select(
            "vec_id", "cid"
        )
        cbs = simsearch.pq_codebooks_trained(em, iterations=2)
        codes = simsearch.pq_encode(em, cbs).select("vec_id", "code_word")
        save_ann_index(path, cents, cbs, codes=codes, posting=posting)
        build_wall = round(time.perf_counter() - t0, 3)

        # serve: reload quantizers + distributed artifacts, run the
        # vector arm for one query from the frozen index
        def serve() -> int:
            c2, cb2, codes2, post2 = load_ann_index(path, spark)
            q = em.where(F.col("vec_id") == 0)
            probe_cids = simsearch.ivf_assign(q, c2, nprobe=2).select("cid")
            cand = (
                post2.join(F.broadcast(probe_cids), "cid")
                .where(F.col("vec_id") != 0)
                .select("vec_id")
            )
            return (
                simsearch.pq_adc_topk(
                    codes2.join(cand, "vec_id"), q, cb2, k=50
                ).count()
            )

        serve()  # warmup: parquet footers + codegen
        mark = _max_stage_id(spark)
        t0 = time.perf_counter()
        n = serve()
        serve_wall = round(time.perf_counter() - t0, 3)
        out["scales"][str(scale)] = {
            "n_emb": em.count(),
            "k": k,
            "build_wall_s": build_wall,
            "serve_wall_s": serve_wall,
            "served_rows": n,
            **_stage_totals(spark, mark),
        }
        print(scale, out["scales"][str(scale)], flush=True)

    s1, s10 = out["scales"]["1"], out["scales"]["10"]
    out["summary"] = {
        "serve_wall_ratio_10x": round(
            s10["serve_wall_s"] / s1["serve_wall_s"], 2
        ),
        "build_wall_ratio_10x": round(
            s10["build_wall_s"] / s1["build_wall_s"], 2
        ),
    }
    out["loadavg"] = list(os.getloadavg())
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROBE_hybrid_serve.json",
    )
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["summary"]))


if __name__ == "__main__":
    main()
