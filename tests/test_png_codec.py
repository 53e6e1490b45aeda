"""Pure-stdlib PNG codec: round-trip, all five scanline filters, and
the exact box resize — the pixel-level guarantees behind the
oracle-checked image entries (plans/image_queries.py)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from hpv_etl_code_spark.operators.png_codec import (
    box_downsample,
    decode_png,
    encode_png,
)


def _rng(seed=7):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("shape", [(16, 16), (5, 9), (16, 16, 3), (4, 6, 4)])
def test_roundtrip(shape):
    arr = _rng().integers(0, 256, size=shape, dtype=np.uint8)
    got = decode_png(encode_png(arr))
    want = arr[:, :, None] if arr.ndim == 2 else arr
    assert got.shape == want.shape
    assert np.array_equal(got, want)


def _encode_with_filter(arr: np.ndarray, f: int) -> bytes:
    """Hand-build a PNG whose every scanline uses filter ``f`` — the
    encoder only emits filter 0, so this exercises the decoder's
    Sub/Up/Average/Paeth reconstruction against a numpy reference."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    bpp = c

    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else cc

    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int32)
    for y in range(h):
        line = arr[y].reshape(-1).astype(np.int32)
        filt = np.empty_like(line)
        for i in range(len(line)):
            a = int(line[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            cc = int(prev[i - bpp]) if i >= bpp else 0
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                pred = paeth(a, b, cc)
            filt[i] = (int(line[i]) - pred) % 256
        raw += bytes([f]) + bytes(filt.astype(np.uint8))
        prev = line
    ctype = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("f", [1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3])
def test_decoder_reconstructs_every_filter(f, channels):
    shape = (7, 11) if channels == 1 else (7, 11, 3)
    arr = _rng(f * 10 + channels).integers(0, 256, size=shape, dtype=np.uint8)
    got = decode_png(_encode_with_filter(arr, f))
    want = arr[:, :, None] if arr.ndim == 2 else arr
    assert np.array_equal(got, want), f"filter {f}"


def test_crc_corruption_detected():
    arr = _rng().integers(0, 256, size=(4, 4), dtype=np.uint8)
    b = bytearray(encode_png(arr))
    b[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(b))


def test_multi_idat_concatenated():
    arr = _rng().integers(0, 256, size=(6, 6), dtype=np.uint8)
    full = encode_png(arr)
    # split the single IDAT into two chunks
    sig, rest = full[:8], full[8:]
    (ln,) = struct.unpack(">I", rest[:4])
    ihdr = rest[: 12 + ln]
    rest2 = rest[12 + ln :]
    (ln2,) = struct.unpack(">I", rest2[:4])
    idat_body = rest2[8 : 8 + ln2]
    iend = rest2[12 + ln2 :]

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    half = len(idat_body) // 2
    rebuilt = (
        sig
        + ihdr
        + chunk(b"IDAT", idat_body[:half])
        + chunk(b"IDAT", idat_body[half:])
        + iend
    )
    assert np.array_equal(decode_png(rebuilt), arr[:, :, None])


def test_box_downsample_exact_floor_mean():
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    t = box_downsample(arr, 4, 4)[:, :, 0]
    for y in range(4):
        for x in range(4):
            block = arr[2 * y : 2 * y + 2, 2 * x : 2 * x + 2]
            assert t[y, x] == int(block.sum()) // 4
    with pytest.raises(ValueError, match="not divisible"):
        box_downsample(arr, 3, 3)


def test_unsupported_shapes_raise():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"nope")
    with pytest.raises(ValueError, match="uint8"):
        encode_png(np.zeros((2, 2), dtype=np.float32))
    with pytest.raises(ValueError, match="channel"):
        encode_png(np.zeros((2, 2, 2), dtype=np.uint8))
