"""Pure-stdlib PNG codec (zlib + struct + numpy): the REAL pixel path
for the multimodal family.

The container has no image libraries, but PNG itself needs none: it is
zlib-compressed scanlines behind five per-row predictive filters
(RFC 2083). This module implements

- ``encode_png`` — 8-bit gray / RGB / RGBA writer (filter 0 rows), and
- ``decode_png`` — reader for 8-bit color types 0/2/6 with ALL five
  filters (None, Sub, Up, Average, Paeth), multi-IDAT, CRC-checked,

which upgrades image decode / resize / fingerprint from "stubbed codec"
to a real, deterministic, dependency-free implementation. Interlaced
(Adam7), paletted, and 16-bit images are out of scope and raise.

Correctness is proven two ways: numpy-reference round-trip tests
(tests/test_multimodal.py), and the catalog entries in
``plans/image_queries.py``, whose DuckDB oracle computes the expected
statistics from the md5-defined pixel bytes WITHOUT any PNG — a hash
match certifies the encoder+decoder pair end-to-end.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) or (h, w, {1,3,4}) → PNG bytes (filter 0)."""
    if arr.dtype != np.uint8:
        raise ValueError(f"encode_png needs uint8, got {arr.dtype}")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {c}")
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w, channels). 8-bit color types
    0 (gray), 2 (RGB), 6 (RGBA); filters 0-4; CRC-verified chunks."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in _CHANNELS or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={ctype} interlace={interlace})"
        )
    bpp = _CHANNELS[ctype]
    stride = w * bpp
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (1 + stride):
        raise ValueError("scanline length mismatch")

    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (1 + stride)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (1 + stride) + 1
        ).copy()
        if f == 0:
            pass
        elif f == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (int(line[i]) + int(line[i - bpp])) & 0xFF
        elif f == 2:  # Up
            line = (line.astype(np.int16) + prev).astype(np.uint8)
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((int(a) + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                c = int(prev[i - bpp]) if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, int(prev[i]), c)) & 0xFF
        else:
            raise ValueError(f"unknown filter {f}")
        out[y] = line
        prev = out[y]
    return out.reshape(h, w, bpp)


def box_downsample(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Exact box-average downsample for integer-divisible shapes (the
    thumbnail/fingerprint path); uint8 in, uint8 out (floor mean)."""
    h, w = arr.shape[:2]
    if h % out_h or w % out_w:
        raise ValueError(f"({h},{w}) not divisible by ({out_h},{out_w})")
    fh, fw = h // out_h, w // out_w
    a = arr.reshape(out_h, fh, out_w, fw, -1).astype(np.uint32)
    return (a.sum(axis=(1, 3)) // (fh * fw)).astype(np.uint8)
