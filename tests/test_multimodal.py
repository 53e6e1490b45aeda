"""Multimodal plumbing tests: binary payloads, mapInPandas decode (real
PNG header parse + stub fallback), pandas_udf feature extraction."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from hpv_etl_code_spark.operators.multimodal import (
    attach_binary_payload,
    byte_histogram,
    decode_image_meta,
    sample_frames,
)


def _png_bytes(w: int, h: int) -> bytes:
    return b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(">II", w, h) + b"\x00" * 8


def test_decode_parses_real_png_header(spark):
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    df = spark.createDataFrame(
        [(1, _png_bytes(640, 480)), (2, b"not an image payload")], schema
    )
    out = {r.doc_id: r for r in decode_image_meta(df).collect()}
    assert (out[1].format, out[1].width, out[1].height) == ("png", 640, 480)
    assert out[2].format == "stub"  # deterministic fake dims
    assert out[2].n_bytes == len(b"not an image payload")


def _jpeg_bytes(w: int, h: int) -> bytes:
    """Minimal JPEG: SOI, an APP0 segment to skip, then SOF0 with dims."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0


def test_decode_parses_real_jpeg_and_gif_headers(spark):
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4
    df = spark.createDataFrame(
        [(1, _jpeg_bytes(1024, 768)), (2, gif)], schema
    )
    out = {r.doc_id: r for r in decode_image_meta(df).collect()}
    assert (out[1].format, out[1].width, out[1].height) == ("jpeg", 1024, 768)
    assert (out[2].format, out[2].width, out[2].height) == ("gif", 320, 200)


def test_byte_histogram_is_normalized_16d(spark, sf_dir):
    from hpv_etl_code_spark.sources.registry import load_table

    d = attach_binary_payload(load_table(spark, sf_dir, "documents")).limit(20)
    rows = d.select("doc_id", byte_histogram("payload").alias("f")).collect()
    for r in rows:
        assert len(r.f) == 16
        assert abs(sum(r.f) - 1.0) < 1e-3


def test_sample_frames_routes_per_payload(spark):
    """VERDICT r5 #6: the former unconditional NotImplementedError is
    retired into the permissive seam — unsupported codecs DROP under
    the default strict=False (no caller can hit an unhandled raise),
    raise per payload only under strict=True, and JPEG/PNG stills come
    through as frame 0."""
    from hpv_etl_code_spark.operators.jpeg_codec import encode_jpeg_gray_coeffs
    from hpv_etl_code_spark.operators.png_codec import encode_png

    import numpy as np

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    from hpv_etl_code_spark.operators.video import mux_avi_mpng

    jpg = encode_jpeg_gray_coeffs(np.zeros((1, 1, 8, 8), dtype=np.int64))
    png = encode_png(np.zeros((8, 8), dtype=np.uint8))
    avi = mux_avi_mpng([png, png, png], 8, 8)
    df = spark.createDataFrame(
        [(1, b"fake h264 bytes"), (2, jpg), (3, png), (4, avi)], schema
    )
    got = {
        (r.doc_id, r.frame_idx)
        for r in sample_frames(df, every_n=2).collect()
    }
    # AVI: frames 0 and 2 survive every_n=2; stills are frame 0;
    # the unsupported payload is dropped without raising
    assert got == {(2, 0), (3, 0), (4, 0), (4, 1)}

    from py4j.protocol import Py4JJavaError  # noqa: F401

    import pytest as _pytest

    with _pytest.raises(Exception, match="frame sampling"):
        sample_frames(df, strict=True).collect()


def test_decode_parses_real_wav_header(spark):
    """A genuine 44-byte-header WAV payload (2ch, 44.1kHz, 16-bit, 1s)
    must decode through the RIFF chunk walk, not the stub."""
    import struct as _struct

    from hpv_etl_code_spark.operators.multimodal import decode_audio_meta

    rate, channels, bits = 44100, 2, 16
    block = channels * bits // 8
    data = b"\x00" * (rate * block)  # exactly 1 second of silence
    fmt = _struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    wav = (
        b"RIFF"
        + _struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + _struct.pack("<I", 16)
        + fmt
        + b"data"
        + _struct.pack("<I", len(data))
        + data
    )
    df = spark.createDataFrame([(1, bytearray(wav)), (2, bytearray(b"not-audio"))],
                               "doc_id LONG, payload BINARY")
    rows = {r.doc_id: r for r in decode_audio_meta(df).collect()}
    wav_row = rows[1]
    assert (wav_row.format, wav_row.channels, wav_row.sample_rate,
            wav_row.bits_per_sample, wav_row.duration_ms) == ("wav", 2, 44100, 16, 1000)
    assert rows[2].format == "stub"


def _mp4_bytes(brand: bytes, timescale: int, duration: int, version: int = 0) -> bytes:
    """Hand-built minimal ISO-BMFF: ftyp + moov(mvhd)."""
    ftyp = b"ftyp" + brand + (0).to_bytes(4, "big")
    ftyp = (4 + len(ftyp)).to_bytes(4, "big") + ftyp
    if version == 0:
        mvhd_body = bytes([0, 0, 0, 0]) + (0).to_bytes(4, "big") * 2 + timescale.to_bytes(4, "big") + duration.to_bytes(4, "big") + b"\x00" * 4
    else:
        mvhd_body = bytes([1, 0, 0, 0]) + (0).to_bytes(8, "big") * 2 + timescale.to_bytes(4, "big") + duration.to_bytes(8, "big") + b"\x00" * 4
    mvhd = (8 + len(mvhd_body)).to_bytes(4, "big") + b"mvhd" + mvhd_body
    moov = (8 + len(mvhd)).to_bytes(4, "big") + b"moov" + mvhd
    return ftyp + moov


def test_video_meta_decodes_real_mp4_boxes(spark):
    from hpv_etl_code_spark.operators.multimodal import decode_video_meta

    rows = [
        (1, _mp4_bytes(b"isom", 1000, 5500)),          # 5.5 s, v0 mvhd
        (2, _mp4_bytes(b"mp42", 90000, 90000 * 3, 1)),  # 3 s, v1 mvhd
        (3, b"not a video payload at all............"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, payload BINARY")
    got = {r["doc_id"]: r for r in decode_video_meta(df).collect()}
    assert (got[1]["format"], got[1]["brand"], got[1]["duration_ms"]) == ("mp4", "isom", 5500)
    assert (got[2]["format"], got[2]["brand"], got[2]["duration_ms"]) == ("mp4", "mp42", 3000)
    assert got[3]["format"] == "unknown" and got[3]["duration_ms"] == len(rows[2][1]) % 9000


def test_wav_render_decode_roundtrip(spark, sf_dir):
    """The stdlib wave encode→decode round-trip preserves the md5-defined
    samples exactly (the audio twin of the PNG codec guarantee)."""
    import io
    import wave

    import numpy as np

    from hpv_etl_code_spark.operators.multimodal import (
        _doc_samples,
        render_doc_wav,
    )
    from hpv_etl_code_spark.sources.registry import load_table

    d = load_table(spark, sf_dir, "documents").limit(5)
    rows = render_doc_wav(d).collect()
    texts = {r.doc_id: r.text for r in d.select("doc_id", "text").collect()}
    assert rows
    for r in rows:
        with wave.open(io.BytesIO(bytes(r.payload)), "rb") as w:
            assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (1, 2, 8000)
            got = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
        assert np.array_equal(got, _doc_samples(texts[r.doc_id]))


def test_png_render_decode_roundtrip(spark, sf_dir):
    """render_doc_png payloads are REAL PNGs that decode back to the
    md5-defined pixel matrix bit-for-bit."""
    import numpy as np

    from hpv_etl_code_spark.operators.multimodal import (
        _doc_pixels,
        render_doc_png,
    )
    from hpv_etl_code_spark.operators.png_codec import decode_png
    from hpv_etl_code_spark.sources.registry import load_table

    d = load_table(spark, sf_dir, "documents").limit(5)
    texts = {r.doc_id: r.text for r in d.select("doc_id", "text").collect()}
    for r in render_doc_png(d).collect():
        arr = decode_png(bytes(r.payload))[:, :, 0]
        assert np.array_equal(arr, _doc_pixels(texts[r.doc_id]))


def test_avi_mux_demux_and_frame_sampling(spark, sf_dir):
    """AVI container round-trip: mux arbitrary frame payloads, demux
    back in order; sampled frames decode to the md5-defined pixels of
    their frame index (container + codec both real, stdlib-only)."""
    import numpy as np

    from hpv_etl_code_spark.operators.multimodal import _doc_pixels
    from hpv_etl_code_spark.operators.png_codec import decode_png
    from hpv_etl_code_spark.operators.video import (
        demux_avi_frames,
        mux_avi_mpng,
        render_doc_avi,
        sample_frames_avi,
    )
    from hpv_etl_code_spark.sources.registry import load_table

    frames = [b"x" * n for n in (3, 8, 1)]
    assert demux_avi_frames(mux_avi_mpng(frames, 4, 4)) == frames

    d = load_table(spark, sf_dir, "documents").limit(3)
    texts = {r.doc_id: r.text for r in d.select("doc_id", "text").collect()}
    rows = sample_frames_avi(render_doc_avi(d, n_frames=8), every_n=2).collect()
    assert len(rows) == 3 * 4  # frames 0,2,4,6 per doc
    assert sorted({r.frame_idx for r in rows}) == [0, 2, 4, 6]
    for r in rows:
        arr = decode_png(bytes(r.frame))[:, :, 0]
        want = _doc_pixels(f"{texts[r.doc_id]}|f{r.frame_idx}")
        assert np.array_equal(arr, want)


def test_image_pixel_sums_permissive_drops_corrupt(spark, sf_dir):
    """strict=False (the 100 TB posture): corrupt payloads drop their
    row instead of failing the task; strict mode raises."""
    import pytest as _pytest

    from hpv_etl_code_spark.operators.multimodal import (
        image_pixel_sums,
        render_doc_png,
    )
    from hpv_etl_code_spark.sources.registry import load_table

    d = load_table(spark, sf_dir, "documents").limit(4)
    good = render_doc_png(d)
    from pyspark.sql import functions as F

    # corrupt one payload (doc with min id): truncate to 10 bytes
    min_id = good.agg(F.min("doc_id")).first()[0]
    mixed = good.withColumn(
        "payload",
        F.when(
            F.col("doc_id") == min_id, F.substring(F.col("payload"), 1, 10)
        ).otherwise(F.col("payload")),
    )
    out = image_pixel_sums(mixed, strict=False)
    assert out.count() == 3
    assert min_id not in {r.doc_id for r in out.collect()}
    with _pytest.raises(Exception):  # noqa: B017 — strict surfaces the task error
        image_pixel_sums(mixed, strict=True).count()


def test_permissive_decode_uniform_across_operators(spark, sf_dir):
    """The per_payload_decoder seam covers EVERY payload-decoding
    operator: aHash, thumbnail, AVI demux and per-frame decode all drop
    corrupt payloads under strict=False and raise under strict=True."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from hpv_etl_code_spark.operators.multimodal import (
        image_ahash,
        image_thumbnail_px,
        render_doc_png,
    )
    from hpv_etl_code_spark.operators.video import (
        frame_pixel_sums,
        render_doc_avi,
        sample_frames_avi,
    )
    from hpv_etl_code_spark.sources.registry import load_table

    d = load_table(spark, sf_dir, "documents").limit(4)

    def corrupt_min(df, col="payload"):
        min_id = df.agg(F.min("doc_id")).first()[0]
        return min_id, df.withColumn(
            col,
            F.when(
                F.col("doc_id") == min_id, F.substring(F.col(col), 1, 10)
            ).otherwise(F.col(col)),
        )

    bad_id, pngs = corrupt_min(render_doc_png(d))
    got = image_ahash(pngs, strict=False)
    assert got.count() == 3 and bad_id not in {r.doc_id for r in got.collect()}
    with _pytest.raises(Exception):  # noqa: B017
        image_ahash(pngs, strict=True).count()

    thumbs = image_thumbnail_px(pngs, strict=False)
    assert {r.doc_id for r in thumbs.collect()} == {
        r.doc_id for r in got.collect()
    }
    with _pytest.raises(Exception):  # noqa: B017
        image_thumbnail_px(pngs, strict=True).count()

    bad_vid, avis = corrupt_min(render_doc_avi(d, n_frames=4))
    frames = sample_frames_avi(avis, every_n=2, strict=False)
    assert bad_vid not in {r.doc_id for r in frames.collect()}
    with _pytest.raises(Exception):  # noqa: B017
        sample_frames_avi(avis, every_n=2, strict=True).count()

    good_frames = sample_frames_avi(render_doc_avi(d, n_frames=4), every_n=2)
    bad_frame_id, mixed = corrupt_min(good_frames, col="frame")
    fsums = frame_pixel_sums(mixed, strict=False)
    # both of the bad doc's sampled frames were corrupted and drop;
    # every other doc's frames survive
    assert fsums.count() == good_frames.count() - 2
    assert bad_frame_id not in {r.doc_id for r in fsums.collect()}
    with _pytest.raises(Exception):  # noqa: B017
        frame_pixel_sums(mixed, strict=True).count()


def test_shared_cache_prunes_dead_session_entries(spark, sf_dir):
    """Entries whose session has been stopped are evicted on the next
    cache miss — a driver cycling get_spark()/stop() must not leak
    persisted-DataFrame handles (review finding, round 3)."""
    from hpv_etl_code_spark.plans import shared_cache

    class _DeadDF:  # stands in for a DataFrame of a stopped session
        @property
        def sparkSession(self):
            raise RuntimeError("SparkContext was shut down")

        def unpersist(self):
            pass

    shared_cache._CACHE[("dead-app", "sf")] = _DeadDF()
    # force the miss path (prune runs on misses only): evict any live
    # entry a previous test may have built for this (session, sf)
    live_key = (spark.sparkContext.applicationId, sf_dir, "enriched")
    evicted = shared_cache._CACHE.pop(live_key, None)
    if evicted is not None:
        evicted.unpersist()
    try:
        live = shared_cache.enriched_documents(spark, sf_dir)
        assert ("dead-app", "sf") not in shared_cache._CACHE
        assert live.count() > 0
        # live entry survives a subsequent prune
        shared_cache._prune_dead_entries()
        key = (spark.sparkContext.applicationId, sf_dir, "enriched")
        assert key in shared_cache._CACHE
    finally:
        shared_cache.clear_cache()
