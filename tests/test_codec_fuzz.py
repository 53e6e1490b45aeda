"""Hypothesis fuzz for the stdlib codecs behind the multimodal path.

The permissive-decode posture (`per_payload_decoder`) catches
``Exception`` — so the guarantee these tests pin is that malformed
input ALWAYS surfaces as an ordinary exception (never a hang, segfault
or silent wrong answer), and that well-formed input round-trips
bit-exactly for every shape the encoders accept.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hpv_etl_code_spark.operators.png_codec import decode_png, encode_png
from hpv_etl_code_spark.operators.video import demux_avi_frames, mux_avi_mpng


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    c=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_any_shape(h, w, c, seed):
    arr = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, c), dtype=np.uint8
    )
    got = decode_png(encode_png(arr))
    assert np.array_equal(got, arr)


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_png_decoder_never_hangs_on_mutation(data):
    """Any single-region byte mutation of a valid PNG either decodes
    (mutation hit a pixel that still CRC-matches — impossible for our
    CRC-checked reader, but stated for completeness) or raises an
    ordinary exception the permissive path can catch."""
    arr = np.random.default_rng(7).integers(0, 256, size=(8, 8), dtype=np.uint8)
    b = bytearray(encode_png(arr))
    pos = data.draw(st.integers(0, len(b) - 1))
    val = data.draw(st.integers(0, 255))
    b[pos] = val
    try:
        out = decode_png(bytes(b))
        assert out.shape == (8, 8, 1)  # mutation was a no-op byte
    except Exception:  # noqa: BLE001 — exactly what permissive mode catches
        pass


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_png_decoder_truncation_is_exact_or_raises(data):
    """Truncation must never yield WRONG pixels: either the cut lands
    past the complete IDAT (losing only IEND — decodes to the exact
    image) or the decoder raises a permissive-catchable exception."""
    arr = np.random.default_rng(11).integers(0, 256, size=(8, 8), dtype=np.uint8)
    b = encode_png(arr)
    cut = data.draw(st.integers(0, len(b) - 1))
    try:
        out = decode_png(b[:cut])
    except Exception:  # noqa: BLE001 — permissive-catchable
        return
    assert np.array_equal(out, arr[:, :, None])


@settings(max_examples=40, deadline=None)
@given(
    frames=st.lists(st.binary(min_size=0, max_size=64), min_size=0, max_size=6)
)
def test_avi_mux_demux_roundtrip_arbitrary_payloads(frames):
    """The RIFF walk must return exactly the muxed frame payloads, in
    order — including odd-length frames (word-aligned padding) and
    empty payloads."""
    avi = mux_avi_mpng(frames, width=16, height=16)
    assert demux_avi_frames(avi) == frames


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_avi_demux_never_hangs_on_mutation(data):
    avi = bytearray(mux_avi_mpng([b"x" * 21, b"y" * 8], 16, 16))
    pos = data.draw(st.integers(0, len(avi) - 1))
    avi[pos] = data.draw(st.integers(0, 255))
    try:
        out = demux_avi_frames(bytes(avi))
        assert isinstance(out, list)
    except Exception:  # noqa: BLE001 — permissive-catchable
        pass


def test_mjpeg_avi_pipeline_drops_corrupt_payloads(spark):
    """VERDICT r6 #2 done-criterion: corrupt rows flow through the
    permissive seam — a garbage payload, a truncated AVI, and an AVI
    holding a corrupt JPEG frame are DROPPED (strict=False) while the
    well-formed sibling rows still decode; strict=True raises."""
    import hashlib

    from pyspark.sql import Row
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    from hpv_etl_code_spark.operators.jpeg_codec import (
        encode_jpeg_gray_coeffs,
    )
    from hpv_etl_code_spark.operators.video import (
        frame_pixel_sums,
        sample_frames_avi,
    )

    def dc_jpeg(seed: str) -> bytes:
        dc = hashlib.md5(seed.encode()).digest()[0] - 128
        c = np.zeros((1, 1, 8, 8), dtype=np.int64)
        c[0, 0, 0, 0] = dc
        return encode_jpeg_gray_coeffs(c)

    good = mux_avi_mpng([dc_jpeg(f"g{f}") for f in range(4)], 8, 8,
                        fourcc=b"MJPG")
    corrupt_frame = mux_avi_mpng(
        [dc_jpeg("x"), b"\xff\xd8 not a real jpeg"], 8, 8, fourcc=b"MJPG"
    )
    rows = [
        Row(doc_id=1, payload=good),
        Row(doc_id=2, payload=b"garbage, not RIFF at all"),
        Row(doc_id=3, payload=good[:20]),          # truncated container
        Row(doc_id=4, payload=corrupt_frame),      # demuxes, frame 1 bad
    ]
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ])
    df = spark.createDataFrame(rows, schema)

    sampled = sample_frames_avi(df, every_n=1, strict=False)
    out = frame_pixel_sums(sampled, codec="jpeg", strict=False)
    got = {(r.doc_id, r.frame_idx) for r in out.collect()}
    # doc 1: all 4 frames; doc 2/3 dropped at demux; doc 4: frame 0
    # survives, frame 1 dropped at decode
    assert got == {(1, 0), (1, 1), (1, 2), (1, 3), (4, 0)}

    with pytest.raises(Exception):
        frame_pixel_sums(
            sample_frames_avi(df, every_n=1, strict=True), codec="jpeg"
        ).collect()
