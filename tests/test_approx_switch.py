"""The documented 100-TB switch for exact percentiles.

SCALE.md prescribes approx_percentile (t-digest, constant memory) as
the scale path for q_percentile's exact per-group buffering. This pins
that the switch actually yields usable numbers on the fixtures —
within 2% of exact for every group — so the documented escape hatch
is exercised, not just written down.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from huckli_spark.session import load_table
from tests.conftest import SF_MED


def test_approx_percentile_tracks_exact(spark):
    li = load_table(spark, SF_MED, "lineitem")
    both = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("approx"),
    )
    for r in both.collect():
        assert abs(r.approx - r.exact) / r.exact < 0.02, r
