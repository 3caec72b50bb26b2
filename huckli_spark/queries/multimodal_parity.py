"""Multimodal pipeline as a driver-visible query.

Rows-only by design: blob synthesis and the numpy feature math are not
SQL-expressible, so there is no DuckDB oracle — but the pipeline is
fully deterministic (blobs are seeded per media_id inside the
executor), so row count, schema, and values are stable run to run.
The per-stage math is separately unit-tested in
tests/test_multimodal.py; this entry proves the END-TO-END Spark
plumbing: binary columns through mapInPandas decode/feature stages,
JVM-side metadata sniffing, and a relational aggregate on top.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from huckli_spark.functions.portable import fround
from huckli_spark.queries import query

_MEDIA_RAW = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("data", T.BinaryType(), False),
    ]
)


def _media_df(spark: SparkSession, sf_dir: str, limit: int = 300) -> DataFrame:
    """Deterministic media table derived from the documents fixture:
    doc_id % 3 picks the modality, blobs are seeded by doc_id."""
    import pandas as pd  # noqa: F401

    from huckli_spark.runtime import ensure_package_on_executors

    ensure_package_on_executors(spark)
    ids = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id")
        .where(F.col("doc_id") < limit)
    )

    def synth(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from huckli_spark.operators import multimodal as mm

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                rng = np.random.RandomState(did)
                if did % 3 == 0:
                    w, h = 16 + did % 17, 12 + did % 11
                    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
                    rows.append((did, "image", mm.encode_image(img)))
                elif did % 3 == 1:
                    sr = 8000
                    n = 400 + did % 300
                    samples = (rng.randn(n) * 3000).astype(np.int16)
                    rows.append((did, "audio", mm.encode_audio(samples, sr)))
                else:
                    frames = [
                        rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
                        for _ in range(2 + did % 5)
                    ]
                    rows.append((did, "video", mm.encode_video(frames)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "data"])

    return ids.mapInPandas(synth, _MEDIA_RAW)


@query(
    "q_multimodal_pipeline",
    None,
    doc="end-to-end multimodal pipeline (synthesize -> sniff metadata "
    "JVM-side -> decode/feature-extract via mapInPandas -> frame-sample "
    "videos -> aggregate); deterministic, rows-only (numpy feature math "
    "has no SQL twin).",
)
def q_multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators import multimodal as mm
    from huckli_spark.operators.cache import eager_release

    media = mm.sniff_metadata(_media_df(spark, sf_dir)).persist()
    images = media.where(F.col("kind") == "image")
    audio = media.where(F.col("kind") == "audio")
    videos = media.where(F.col("kind") == "video")

    img_stats = (
        mm.image_features(images)
        .where(F.col("features").isNotNull())
        .select(
            F.lit("image").alias("kind"),
            (F.col("width") * F.col("height")).alias("metric"),
        )
    )
    aud_stats = mm.audio_features(audio).select(
        F.lit("audio").alias("kind"), F.col("rms").alias("metric")
    )
    vid_stats = (
        mm.sample_frames(videos, every=2)
        .groupBy("media_id")
        .agg(F.count("*").cast("double").alias("metric"))
        .select(F.lit("video").alias("kind"), "metric")
    )
    out = (
        img_stats.unionByName(aud_stats)
        .unionByName(vid_stats)
        .groupBy("kind")
        .agg(F.count("*").alias("n"), fround(F.avg("metric"), 4).alias("avg_metric"))
    )
    # 3-row aggregate: materialize eagerly and release the media cache
    return eager_release(out, media)
