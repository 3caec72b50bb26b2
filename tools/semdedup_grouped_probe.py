#!/usr/bin/env python
"""Grouped vs sequential two-level SemDeDup training probe
(VERDICT r07 #3 "probe at k=16").

The de-serialized trainer (kmeans_fit_grouped) must (a) produce the
exact rows of the sequential per-cluster loop, and (b) hold one job
wave per iteration regardless of k — the loop pays k training waves
plus a limit(1).count() probe each. This runs both formulations at
k=16 top clusters on the sf0.1 embeddings and records walls + an
output-equality check. Writes SCALE_PROBE_semdedup_grouped.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from huckli_spark.operators.curation import (
    semdedup_two_level,
    semdedup_two_level_loop,
)
from huckli_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="semdedup_grouped_probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    out: dict = {"sf_dir": sf_dir, "n_emb": emb.count(), "runs": {}}
    K, K2, IT, TAU = 16, 4, 2, 0.7

    # warmup both codepaths once at tiny k so JIT doesn't skew run 1
    semdedup_two_level(emb, k=2, k2=2, iterations=1, tau=TAU).count()

    t0 = time.perf_counter()
    grouped_rows = sorted(
        map(tuple, semdedup_two_level(
            emb, k=K, k2=K2, iterations=IT, tau=TAU
        ).collect())
    )
    out["runs"]["grouped_k16"] = {
        "wall_s": round(time.perf_counter() - t0, 3),
        "out_rows": len(grouped_rows),
    }

    t0 = time.perf_counter()
    loop_rows = sorted(
        map(tuple, semdedup_two_level_loop(
            emb, k=K, k2=K2, iterations=IT, tau=TAU
        ).collect())
    )
    out["runs"]["loop_k16"] = {
        "wall_s": round(time.perf_counter() - t0, 3),
        "out_rows": len(loop_rows),
    }

    out["summary"] = {
        "k": K,
        "bit_identical": grouped_rows == loop_rows,
        "speedup": round(
            out["runs"]["loop_k16"]["wall_s"]
            / out["runs"]["grouped_k16"]["wall_s"],
            2,
        ),
    }
    out["loadavg"] = list(os.getloadavg())
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROBE_semdedup_grouped.json",
    )
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["summary"]))
    assert out["summary"]["bit_identical"], "grouped != loop output"


if __name__ == "__main__":
    main()
