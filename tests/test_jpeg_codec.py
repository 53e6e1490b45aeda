"""Stdlib baseline-JPEG codec (operators/jpeg_codec.py): exact entropy
round-trip (incl. ZRL/EOB/byte-stuffing/DC-prediction edge cases),
golden IDCT values against an independent reference, structural spec
checks, and error behavior on malformed streams."""

from __future__ import annotations

import math

import numpy as np
import pytest

from hpv_etl_code_spark.operators.jpeg_codec import (
    QUANT_LUMA,
    ZIGZAG,
    decode_jpeg_coefficients,
    decode_jpeg_gray,
    encode_jpeg_gray,
    encode_jpeg_gray_coeffs,
)


def _blocks(arr_2d):
    out = np.zeros((1, 1, 8, 8), dtype=np.int64)
    out[0, 0] = arr_2d
    return out


def test_zigzag_is_the_standard_sequence():
    assert ZIGZAG[:16] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert sorted(ZIGZAG) == list(range(64))
    assert ZIGZAG[-1] == 63


def test_coeff_roundtrip_exact_random():
    rng = np.random.RandomState(42)
    c = rng.randint(-200, 200, size=(4, 3, 8, 8)).astype(np.int64)
    blocks, h, w = decode_jpeg_coefficients(encode_jpeg_gray_coeffs(c))
    assert (h, w) == (32, 24)
    assert np.array_equal(blocks, c * QUANT_LUMA.reshape(8, 8))


def test_zrl_long_zero_runs():
    """>15 consecutive zero ACs force ZRL symbols."""
    z = np.zeros((8, 8), dtype=np.int64)
    flat = np.zeros(64, dtype=np.int64)
    flat[ZIGZAG[0]] = 5      # DC
    flat[ZIGZAG[40]] = -3    # one AC after a 39-zero run (2×ZRL + run 7)
    flat[ZIGZAG[63]] = 7     # last slot: another long run, no EOB after
    z[:, :] = flat.reshape(8, 8)
    blocks, _, _ = decode_jpeg_coefficients(encode_jpeg_gray_coeffs(_blocks(z)))
    assert np.array_equal(blocks[0, 0], z * QUANT_LUMA.reshape(8, 8))


def test_dc_prediction_across_blocks():
    """DC is differentially coded block to block — a multi-block image
    with swinging DCs round-trips exactly."""
    c = np.zeros((1, 4, 8, 8), dtype=np.int64)
    for i, dc in enumerate((-900, 1000, -1000, 0)):
        c[0, i, 0, 0] = dc
    blocks, _, _ = decode_jpeg_coefficients(encode_jpeg_gray_coeffs(c))
    assert np.array_equal(blocks, c * QUANT_LUMA.reshape(8, 8))


def test_byte_stuffing_roundtrip():
    """Coefficient patterns whose entropy bits hit 0xFF bytes must
    round-trip through the FF00 stuffing. Brute-force a spread of
    blocks; at least one stuffed byte must occur across them."""
    rng = np.random.RandomState(7)
    stuffed_seen = False
    for _ in range(50):
        c = rng.randint(-1000, 1000, size=(1, 1, 8, 8)).astype(np.int64)
        b = encode_jpeg_gray_coeffs(c)
        scan = b[b.rindex(b"\x00\x3f\x00") + 3 : -2]
        stuffed_seen = stuffed_seen or (b"\xff\x00" in scan)
        blocks, _, _ = decode_jpeg_coefficients(b)
        assert np.array_equal(blocks, c * QUANT_LUMA.reshape(8, 8))
    assert stuffed_seen, "test corpus never exercised byte stuffing"


def test_stream_structure_is_baseline_jfif():
    b = encode_jpeg_gray_coeffs(_blocks(np.zeros((8, 8), dtype=np.int64)))
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    for marker in (b"\xff\xe0", b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in b, f"missing segment {marker.hex()}"
    assert b[b.index(b"\xff\xe0") + 4 : b.index(b"\xff\xe0") + 9] == b"JFIF\x00"


def test_idct_dc_only_is_flat():
    for dc in (-128, -1, 0, 1, 127):
        c = np.zeros((8, 8), dtype=np.int64)
        c[0, 0] = dc
        px = decode_jpeg_gray(encode_jpeg_gray_coeffs(_blocks(c)))
        want = min(255, max(0, 2 * dc + 128))  # DC·Q00/8 + 128, Q00=16
        assert px.shape == (8, 8)
        assert (px == want).all(), (dc, px[0, 0], want)


def test_idct_golden_against_independent_reference():
    """Full-AC IDCT: compare the decoder's pixels to an independently
    written double-sum reference (textbook T.81 formula, not the
    codec's matrix form)."""
    rng = np.random.RandomState(3)
    c = rng.randint(-50, 50, size=(8, 8)).astype(np.int64)
    px = decode_jpeg_gray(encode_jpeg_gray_coeffs(_blocks(c)))
    deq = (c * QUANT_LUMA.reshape(8, 8)).astype(float)
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = math.sqrt(0.5) if u == 0 else 1.0
                    cv = math.sqrt(0.5) if v == 0 else 1.0
                    s += (
                        0.25 * cu * cv * deq[u, v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            want = min(255, max(0, int(math.floor(s + 0.5)) + 128))
            assert abs(int(px[x, y]) - want) <= 1, (x, y, px[x, y], want)


def test_pixel_encoder_roundtrip_quality():
    """Smooth content survives the lossy quantize/IDCT loop closely;
    exact equality is NOT expected (JPEG is lossy by design)."""
    xs, ys = np.meshgrid(np.arange(32), np.arange(16))
    img = ((xs * 3 + ys * 5) % 200 // 2 + 20).astype(np.uint8)
    out = decode_jpeg_gray(encode_jpeg_gray(img))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 2.0 and err.max() <= 8


def test_malformed_streams_raise():
    good = encode_jpeg_gray_coeffs(_blocks(np.zeros((8, 8), dtype=np.int64)))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_coefficients(b"not a jpeg")
    with pytest.raises(ValueError, match="truncated|marker|Huffman|data"):
        decode_jpeg_coefficients(good[:40])
    # progressive SOF2 is out of scope and must say so
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg_coefficients(prog)


def test_out_of_range_coefficients_rejected():
    c = np.zeros((1, 1, 8, 8), dtype=np.int64)
    c[0, 0, 0, 1] = 2048  # AC category 12 > baseline 10
    with pytest.raises(ValueError, match="baseline range"):
        encode_jpeg_gray_coeffs(c)


def test_permissive_seam_drops_corrupt_payload(spark):
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    from hpv_etl_code_spark.operators.multimodal import jpeg_coeff_sums

    good = encode_jpeg_gray_coeffs(
        _blocks(np.eye(8, dtype=np.int64) * 3)
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    df = spark.createDataFrame([(1, good), (2, b"corrupt")], schema)
    got = jpeg_coeff_sums(df, strict=False).collect()
    assert [r.doc_id for r in got] == [1]
    with pytest.raises(Exception):
        jpeg_coeff_sums(df, strict=True).collect()
