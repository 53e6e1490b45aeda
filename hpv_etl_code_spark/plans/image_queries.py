"""Image pixel-path entries — the stdlib PNG codec proven end-to-end.

The trick that makes a PIXEL pipeline oracle-checkable without DuckDB
ever decoding an image: the rendered test images DEFINE their pixels
arithmetically — pixel (row k, col j) of a document's 16x16 gray image
is byte j of md5(text + ':' + k) — so the oracle computes expected
statistics straight from md5 hex while the Spark side runs the full
binary path: render → zlib-compressed PNG → decode (unfilter) → stats.
A hash-green entry therefore certifies ``operators/png_codec.py``'s
encoder AND decoder, plus the mapInPandas plumbing, in one check.

All three stages are narrow maps (no shuffle until the final per-image
aggregation happens inside the decode batch), so the scale story is
input-split parallelism — identical to any multimodal featurizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    audio_sample_sums,
    image_ahash,
    image_pixel_sums,
    image_thumbnail_px,
    render_doc_png,
    render_doc_wav,
)
from ..sources.registry import load_table

_PX_SQL = """
  SELECT doc_id, k.k AS y, j.j AS x,
    ('0x' || substr(md5(text || ':' || k.k::VARCHAR), 2*j.j + 1, 2))::BIGINT AS v
  FROM documents, range(16) k(k), range(16) j(j)
"""


def image_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """render → PNG → decode → per-image mean/std from exact integer
    pixel sums (sample std; rounding done as Column expressions so both
    engines round the same doubles)."""
    d = load_table(spark, sf_dir, "documents")
    sums = image_pixel_sums(render_doc_png(d))
    n = F.col("width").cast("long") * F.col("height").cast("long")
    sx = F.col("sum_px")
    var = (n * F.col("sumsq_px") - sx * sx).cast("double") / (
        (n * (n - F.lit(1))).cast("double")
    )
    return sums.select(
        "doc_id",
        "width",
        "height",
        F.round(sx.cast("double") / n.cast("double"), 4).alias("mean_px"),
        F.round(F.sqrt(var), 4).alias("std_px"),
    )


IMAGE_PIXEL_STATS_SQL = f"""
WITH px AS ({_PX_SQL}),
s AS (
  SELECT doc_id, SUM(v) AS sx, SUM(v*v) AS sxx, COUNT(*) AS n
  FROM px GROUP BY doc_id
)
SELECT doc_id, 16::INT AS width, 16::INT AS height,
  ROUND(sx * 1.0 / n, 4) AS mean_px,
  ROUND(sqrt((n * sxx - sx * sx) * 1.0 / (n * (n - 1))), 4) AS std_px
FROM s
"""


def image_ahash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """render → PNG → decode → 64-bit average-hash (2x2 block sums vs
    global sum, integer-exact) as a '0'/'1' string fingerprint."""
    d = load_table(spark, sf_dir, "documents")
    return image_ahash(render_doc_png(d))


IMAGE_AHASH_SQL = f"""
WITH px AS ({_PX_SQL}),
blk AS (
  SELECT doc_id, y // 2 AS by, x // 2 AS bx, SUM(v) AS bs
  FROM px GROUP BY doc_id, y // 2, x // 2
),
tot AS (SELECT doc_id, SUM(v) AS ts FROM px GROUP BY doc_id)
SELECT b.doc_id,
  string_agg(CASE WHEN 64 * bs > ts THEN '1' ELSE '0' END, ''
             ORDER BY by * 8 + bx) AS ahash
FROM blk b JOIN tot t ON b.doc_id = t.doc_id
GROUP BY b.doc_id
"""


def image_thumbnail_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """render → PNG → decode → exact 4x4 box-average thumbnail (floor
    mean of each 4x4 block), long format — the resize stage a
    multimodal featurizer feeds downstream."""
    d = load_table(spark, sf_dir, "documents")
    return image_thumbnail_px(render_doc_png(d), out_side=4)


IMAGE_THUMBNAIL_SQL = f"""
WITH px AS ({_PX_SQL})
SELECT doc_id, (y // 4)::INT AS ty, (x // 4)::INT AS tx,
  (SUM(v) // 16)::INT AS v
FROM px GROUP BY doc_id, y // 4, x // 4
"""


def audio_signal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio twin of the pixel path: render md5-defined int16 PCM →
    REAL RIFF/WAV encode (stdlib ``wave``) → decode → RMS / peak /
    zero-crossing features. Same oracle trick — DuckDB reproduces the
    samples from md5 hex (little-endian int16 reassembly + two's
    complement) and never parses a WAV."""
    d = load_table(spark, sf_dir, "documents")
    sums = audio_sample_sums(render_doc_wav(d))
    return sums.select(
        "doc_id",
        "n_samples",
        F.round(
            F.sqrt(F.col("sumsq").cast("double") / F.col("n_samples").cast("double")),
            4,
        ).alias("rms"),
        "peak",
        "zero_crossings",
    )


AUDIO_SIGNAL_STATS_SQL = """
WITH smp AS (
  SELECT doc_id, 8 * k.k + j.j AS i,
    ('0x' || substr(md5(text || ':a' || k.k::VARCHAR), 4*j.j + 1, 2))::BIGINT
    + 256 * ('0x' || substr(md5(text || ':a' || k.k::VARCHAR), 4*j.j + 3, 2))::BIGINT
      AS u
  FROM documents, range(32) k(k), range(8) j(j)
), v AS (
  SELECT doc_id, i, CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS v
  FROM smp
), lagd AS (
  SELECT doc_id, v,
    LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
  FROM v
)
SELECT doc_id,
  COUNT(*)::BIGINT AS n_samples,
  ROUND(sqrt(SUM(v*v) * 1.0 / COUNT(*)), 4) AS rms,
  MAX(abs(v))::INT AS peak,
  SUM(CASE WHEN pv IS NOT NULL AND ((pv < 0) <> (v < 0)) THEN 1 ELSE 0 END)::BIGINT
    AS zero_crossings
FROM lagd GROUP BY doc_id
"""


def video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling end-to-end: render 8-frame Motion-PNG
    AVIs (frame f's pixels md5-defined from text + '|f' + f) → demux the
    RIFF container and keep every 2nd frame (operators/video.py, stdlib
    only) → decode each sampled PNG frame → per-(doc, frame) mean pixel.
    The oracle reproduces sampled-frame stats arithmetically (frames
    0, 2, 4, 6) without touching AVI or PNG — a hash match certifies the
    container mux/demux AND the codec in one check. Frame sampling for
    compressed codecs (H.264 …) remains behind the PyAV gate."""
    from ..operators.video import frame_pixel_sums, render_doc_avi, sample_frames_avi

    d = load_table(spark, sf_dir, "documents")
    sampled = sample_frames_avi(render_doc_avi(d, n_frames=8), every_n=2)
    sums = frame_pixel_sums(sampled)
    return sums.select(
        "doc_id",
        "frame_idx",
        F.round(F.col("sum_px").cast("double") / F.lit(256.0), 4).alias("mean_px"),
    )


VIDEO_FRAME_STATS_SQL = """
WITH px AS (
  SELECT doc_id, f.f AS frame_idx,
    ('0x' || substr(md5(text || '|f' || f.f::VARCHAR || ':' || k.k::VARCHAR),
                    2*j.j + 1, 2))::BIGINT AS v
  FROM documents, range(0, 8, 2) f(f), range(16) k(k), range(16) j(j)
)
SELECT doc_id, frame_idx::INT AS frame_idx,
  ROUND(SUM(v) * 1.0 / 256.0, 4) AS mean_px
FROM px GROUP BY doc_id, frame_idx
"""


def image_dedup_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image dedup by perceptual fingerprint: group images on their
    64-bit average-hash, keep the min doc_id — the multimodal twin of
    exact text dedup (and the front gate of a vision-corpus pipeline;
    near-dup banding over the same fingerprint is
    ``simhash_near_pairs``'s machinery). On this corpus aHash collides
    exactly for identical texts (md5 avalanche), so the duplicate
    structure mirrors the text fingerprint — which the oracle checks."""
    d = load_table(spark, sf_dir, "documents")
    hashes = image_ahash(render_doc_png(d))
    return hashes.groupBy("ahash").agg(
        F.min("doc_id").alias("keeper_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )


IMAGE_DEDUP_AHASH_SQL = f"""
WITH px AS ({_PX_SQL}),
blk AS (
  SELECT doc_id, y // 2 AS by, x // 2 AS bx, SUM(v) AS bs
  FROM px GROUP BY doc_id, y // 2, x // 2
),
tot AS (SELECT doc_id, SUM(v) AS ts FROM px GROUP BY doc_id),
h AS (
  SELECT b.doc_id,
    string_agg(CASE WHEN 64 * bs > ts THEN '1' ELSE '0' END, ''
               ORDER BY by * 8 + bx) AS ahash
  FROM blk b JOIN tot t ON b.doc_id = t.doc_id
  GROUP BY b.doc_id
)
SELECT ahash, MIN(doc_id) AS keeper_id, COUNT(*)::BIGINT AS n_dups
FROM h GROUP BY ahash
"""


def register_entries(register) -> None:  # noqa: ANN001
    register("image_pixel_stats", image_pixel_stats, IMAGE_PIXEL_STATS_SQL)
    register("image_dedup_ahash", image_dedup_ahash, IMAGE_DEDUP_AHASH_SQL)
    register("image_ahash_fingerprint", image_ahash_fingerprint, IMAGE_AHASH_SQL)
    register("image_thumbnail_resize", image_thumbnail_resize, IMAGE_THUMBNAIL_SQL)
    register("audio_signal_stats", audio_signal_stats, AUDIO_SIGNAL_STATS_SQL)
    register("video_frame_stats", video_frame_stats, VIDEO_FRAME_STATS_SQL)
