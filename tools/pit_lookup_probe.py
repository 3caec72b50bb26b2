#!/usr/bin/env python
"""Point-in-time lookup scaling probe (round 10 continuation).

q_stream_scd2_lookup / q_pit_backfill join an event relation to an
SCD2 history via ``pit_lookup`` (key equi-join + half-open interval
residual). The scale claim: event volume is the only thing that
grows — the dimension history is fixed — so wall should track the
event side roughly linearly with NO blowup from the residual filter
(a lost equi-key would degrade to a range product and explode). This
probe holds a synthetic 100k-key / 3-version history constant and
feeds 1x / 10x event volumes (BASE_EVENTS per step, as_of spread
over all versions), recording wall and output rows, plus an
exactly-one-version-per-event assertion at both scales (interval
disjointness survives volume). Writes SCALE_PROBE_pit_lookup.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from huckli_spark.queries.warehouse_ops import pit_lookup
from huckli_spark.session import get_spark

N_KEYS = 100_000
BASE_EVENTS = 1_000_000


def main() -> None:
    spark = get_spark()
    # 3-version history over N_KEYS: every key has v0 [0,1); two
    # thirds also have v1 [1,2) or [1,NULL); one third has v2 [2,NULL)
    hist = spark.sql(f"""
        SELECT k, 100 + k %% 7 AS v, 0L AS valid_from,
               CASE WHEN k %% 3 = 0 THEN NULL ELSE 1L END AS valid_to
        FROM (SELECT id AS k FROM range({N_KEYS}))
        UNION ALL
        SELECT k, 200 + k %% 7, 1L,
               CASE WHEN k %% 2 = 0 THEN NULL ELSE 2L END
        FROM (SELECT id AS k FROM range({N_KEYS})) WHERE k %% 3 <> 0
        UNION ALL
        SELECT k, 300 + k %% 7, 2L, CAST(NULL AS LONG)
        FROM (SELECT id AS k FROM range({N_KEYS}))
        WHERE k %% 3 <> 0 AND k %% 2 <> 0
    """.replace("%%", "%")).persist()
    hist.count()

    # untimed warmup: first action pays session/exchange setup that
    # would otherwise make the 1x step look artificially slow
    warm = spark.range(1000).select(
        (F.col("id") % N_KEYS).alias("k"), F.lit(0).cast("long").alias("as_of")
    )
    pit_lookup(warm, hist).agg(F.sum("v")).collect()

    out = {"n_keys": N_KEYS, "steps": []}
    for mult in (1, 10):
        n_ev = BASE_EVENTS * mult
        ev = spark.range(n_ev).select(
            (F.col("id") % N_KEYS).alias("k"),
            # as_of in {0,1,2}, but never probing a version the key
            # lacks: keys with valid_to=1 only have v0 valid at 0
            F.when(F.col("id") % 3 == 0, 0)
            .when((F.col("id") % N_KEYS) % 3 == 0, 0)
            .when(F.col("id") % 3 == 1, 1)
            .when((F.col("id") % N_KEYS) % 2 == 0, 2)
            .otherwise(1)
            .cast("long")
            .alias("as_of"),
        )
        t0 = time.time()
        res = pit_lookup(ev, hist)
        # force the full join output (the r7 attribution-probe lesson:
        # count() lets Catalyst prune; an aggregate over the looked-up
        # value cannot be satisfied without every matched row)
        row = res.agg(
            F.count("*").alias("n"), F.sum("v").alias("sv")
        ).collect()[0]
        n_out = row["n"]
        wall = round(time.time() - t0, 2)
        # exactly-one-version-per-event: output rows == event rows
        assert n_out == n_ev, (n_out, n_ev)
        out["steps"].append(
            {"mult": mult, "events": n_ev, "out_rows": n_out,
             "wall_s": wall}
        )
        print(f"mult={mult}: {n_ev} events -> {n_out} rows in {wall}s")
    w1, w10 = out["steps"][0]["wall_s"], out["steps"][1]["wall_s"]
    out["wall_ratio_10x"] = round(w10 / w1, 2)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROBE_pit_lookup.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, "ratio", out["wall_ratio_10x"])
    spark.stop()


if __name__ == "__main__":
    main()
