#!/usr/bin/env python
"""Media capped-dedup scaling probe (round 10, VERDICT r09 #4).

The r9 media probe showed the PAIR relation's inherent quadratic
growth in duplicate-family size (10x blobs -> 113x pairs). The cap
layer exists to bound exactly that: components + keep-<=K decisions
are O(duplicates) — one row per clustered blob — regardless of how
fat the families get. Probe the image family at 1x / 10x the gate
fixture (same 30-family structure, copies-per-family grows 10x),
recording pair rows vs decision rows and the wall of each stage.
Writes SCALE_PROBE_media_cap.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from huckli_spark.operators.dedup import connected_components
from huckli_spark.operators.multimodal import image_dedup_pairs
from huckli_spark.session import get_spark
from tools.media_dedup_probe import media_df

K = 2


def main() -> None:
    spark = get_spark(app_name="media_cap_probe")
    spark.sparkContext.setLogLevel("ERROR")
    image_dedup_pairs(media_df(spark, 60, 30)).count()  # warmup

    results: dict = {"k": K, "families": 30}
    for copies in (1, 10):
        n = 240 * copies
        media = media_df(spark, n, 30)
        t0 = time.perf_counter()
        pairs = image_dedup_pairs(media, max_hamming=3).select("d1", "d2")
        pairs = pairs.localCheckpoint(eager=True)
        n_pairs = pairs.count()
        t_pairs = time.perf_counter() - t0
        t0 = time.perf_counter()
        comp = connected_components(pairs)
        wr = Window.partitionBy("cluster_id").orderBy(F.asc("doc_id"))
        rk = F.row_number().over(wr).cast("long")
        decisions = comp.select(
            "doc_id", "cluster_id", (rk <= K).alias("kept")
        )
        n_dec = decisions.count()
        n_drop = decisions.where(~F.col("kept")).count()
        t_cap = time.perf_counter() - t0
        results[f"{copies}x"] = {
            "n_images": n,
            "pair_rows": n_pairs,
            "decision_rows": n_dec,
            "dropped": n_drop,
            "wall_s_pairs": round(t_pairs, 3),
            "wall_s_components_cap": round(t_cap, 3),
        }
        print(f"{copies}x: {results[f'{copies}x']}", flush=True)
    r1, r10 = results["1x"], results["10x"]
    results["ratio_10x_over_1x"] = {
        "pair_rows": round(r10["pair_rows"] / r1["pair_rows"], 2),
        "decision_rows": round(
            r10["decision_rows"] / r1["decision_rows"], 2
        ),
        "wall_total": round(
            (r10["wall_s_pairs"] + r10["wall_s_components_cap"])
            / (r1["wall_s_pairs"] + r1["wall_s_components_cap"]), 2),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_PROBE_media_cap.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
