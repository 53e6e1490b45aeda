"""Pure-stdlib baseline JPEG codec (grayscale): the last decode gate
(VERDICT r5 #6) closed with public knowledge only — ITU-T T.81 baseline
sequential DCT, 8-bit, single component.

The container has no image libraries, but baseline JPEG needs none:

- ``encode_jpeg_gray_coeffs`` — writes a valid JFIF stream from
  QUANTIZED coefficient blocks (the entropy layer is LOSSLESS over
  quantized coefficients, which is what makes the codec exactly
  oracle-certifiable);
- ``encode_jpeg_gray`` — pixel encoder (level shift → float DCT →
  quantize) on top of it;
- ``decode_jpeg_coefficients`` — marker walk (SOI/APP/DQT/SOF0/DHT/
  SOS/EOI), Huffman tables rebuilt FROM THE FILE's DHT segments
  (canonical code assignment, spec C.2), entropy decode with 0xFF00
  byte-unstuffing, de-zigzag, dequantize → exact integer coefficient
  blocks;
- ``decode_jpeg_gray`` — adds the IDCT + level shift + clamp for the
  pixel path.

Arithmetic contract (documented because T.81 leaves IDCT precision
implementation-defined): the IDCT is the separable float64 cosine
transform, rounded HALF-UP (floor(s + 0.5)), then +128 level shift and
[0, 255] clamp. On the DC-only subspace this collapses to
``clamp(floor(DC·Q00/8 + 0.5) + 128)`` — pure integer arithmetic a SQL
oracle reproduces, which certifies the full pixel path end-to-end
(plans/image_queries.py::jpeg_dc_pixel_stats). The entropy layer is
certified EXACTLY on arbitrary coefficients (jpeg_coeff_roundtrip).

Out of scope (raise): progressive/arithmetic/12-bit modes, multi-
component color, restart intervals. Callers that must never raise wrap
with ``multimodal.per_payload_decoder(strict=False)``.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# --------------------------------------------------------------- tables


def _zigzag_order() -> list[int]:
    """The T.81 zigzag scan as natural-order indices, generated (not
    transcribed): even diagonals run bottom-left→top-right, odd ones
    top-right→bottom-left."""
    out = []
    for s in range(15):
        idx = (
            [(s - j, j) for j in range(s + 1)]
            if s % 2 == 0
            else [(j, s - j) for j in range(s + 1)]
        )
        out.extend(r * 8 + c for r, c in idx if r < 8 and c < 8)
    return out


ZIGZAG = _zigzag_order()  # zigzag position k -> natural index

# Annex K.1 luminance quantization table (natural order, row-major)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

# Annex-K-style Huffman specs: (bits per code length 1..16, values).
# Any valid table is legal in DHT — the DECODER rebuilds from the file,
# so the pair is self-consistent by construction; these are the
# standard luminance tables so external decoders agree too.
_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_DC_VALS = tuple(range(12))
_AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)


def _canonical_codes(bits, vals) -> dict[int, tuple[int, int]]:
    """value -> (code, length) via the spec's canonical assignment
    (T.81 C.2): codes increase within a length, shift left across."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, vals) -> dict[tuple[int, int], int]:
    """(length, code) -> value, for the reader."""
    return {
        (length, code): v for v, (code, length) in _canonical_codes(bits, vals).items()
    }


# ----------------------------------------------------------- bit stream


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self._d = data
        self._pos = 0
        self._acc = 0
        self._n = 0

    def read(self, length: int) -> int:
        while self._n < length:
            if self._pos >= len(self._d):
                raise ValueError("jpeg: truncated entropy-coded segment")
            byte = self._d[self._pos]
            self._pos += 1
            if byte == 0xFF:
                if self._pos >= len(self._d) or self._d[self._pos] != 0x00:
                    raise ValueError("jpeg: unexpected marker in scan")
                self._pos += 1  # skip the stuffed 0x00
            self._acc = (self._acc << 8) | byte
            self._n += 8
        self._n -= length
        v = (self._acc >> self._n) & ((1 << length) - 1)
        self._acc &= (1 << self._n) - 1
        return v

    def read_code(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("jpeg: invalid Huffman code")


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _mag_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --------------------------------------------------------------- encode


def encode_jpeg_gray_coeffs(
    coeffs: np.ndarray, quant: np.ndarray | None = None
) -> bytes:
    """QUANTIZED coefficient blocks → baseline JFIF grayscale bytes.

    ``coeffs``: int array (by, bx, 8, 8) in NATURAL order — the image is
    (8·by) × (8·bx). The entropy layer is lossless, so
    ``decode_jpeg_coefficients(encode_jpeg_gray_coeffs(c))`` returns
    ``c * quant`` exactly — the certifiable core."""
    coeffs = np.asarray(coeffs, dtype=np.int64)
    if coeffs.ndim != 4 or coeffs.shape[2:] != (8, 8):
        raise ValueError(f"expected (by, bx, 8, 8) blocks, got {coeffs.shape}")
    q = QUANT_LUMA if quant is None else np.asarray(quant, dtype=np.int64).reshape(64)
    by, bx = coeffs.shape[:2]
    h, w = 8 * by, 8 * bx

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for y in range(by):
        for x in range(bx):
            zz = coeffs[y, x].reshape(64)[ZIGZAG]
            dc = int(zz[0])
            diff = dc - prev_dc
            prev_dc = dc
            t = _category(diff)
            if t > 11:
                raise ValueError(f"jpeg: DC diff {diff} out of baseline range")
            code, length = dc_codes[t]
            bw.write(code, length)
            if t:
                bw.write(_mag_bits(diff, t), t)
            run = 0
            last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
            for k in range(1, last_nz + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                s = _category(v)
                if s > 10:
                    raise ValueError(f"jpeg: AC coeff {v} out of baseline range")
                code, length = ac_codes[(run << 4) | s]
                bw.write(code, length)
                bw.write(_mag_bits(v, s), s)
                run = 0
            if last_nz < 63:
                code, length = ac_codes[0x00]  # EOB
                bw.write(code, length)
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    zz_q = bytes(int(q[ZIGZAG[k]]) for k in range(64))
    dht = seg(
        0xFFC4,
        b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS),
    ) + seg(
        0xFFC4,
        b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS),
    )
    return (
        b"\xff\xd8"  # SOI
        + seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xFFDB, b"\x00" + zz_q)  # DQT, 8-bit, table 0
        + seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
        + dht
        + seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
        + scan
        + b"\xff\xd9"  # EOI
    )


def _dct_matrix() -> np.ndarray:
    a = np.zeros((8, 8))
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return a


_A = _dct_matrix()


def encode_jpeg_gray(pixels: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    """uint8 (h, w) pixels (multiples of 8) → baseline JPEG: level
    shift, float64 forward DCT, quantize HALF-UP — then the lossless
    coefficient encoder."""
    px = np.asarray(pixels)
    if px.dtype != np.uint8 or px.ndim != 2:
        raise ValueError("encode_jpeg_gray needs a uint8 (h, w) array")
    h, w = px.shape
    if h % 8 or w % 8:
        raise ValueError("dimensions must be multiples of 8 (no padding here)")
    q = (QUANT_LUMA if quant is None else np.asarray(quant, dtype=np.int64)).reshape(8, 8)
    by, bx = h // 8, w // 8
    shifted = px.astype(np.float64) - 128.0
    out = np.zeros((by, bx, 8, 8), dtype=np.int64)
    for y in range(by):
        for x in range(bx):
            f = _A @ shifted[8 * y : 8 * y + 8, 8 * x : 8 * x + 8] @ _A.T
            out[y, x] = np.floor(f / q + 0.5).astype(np.int64)
    return encode_jpeg_gray_coeffs(out, quant=q)


# --------------------------------------------------------------- decode


def _walk_segments(b: bytes):
    if b[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"jpeg: bad marker alignment at {pos}")
        marker = (b[pos] << 8) | b[pos + 1]
        if marker == 0xFFD9:  # EOI
            return
        (length,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        body = b[pos + 4 : pos + 2 + length]
        if marker == 0xFFDA:
            yield marker, body, b[pos + 2 + length :]
            return
        yield marker, body, b""
        pos += 2 + length
    raise ValueError("jpeg: ran out of data before SOS/EOI")


def decode_jpeg_coefficients(b: bytes):
    """bytes → (blocks, h, w): DEQUANTIZED int64 coefficient blocks
    (by, bx, 8, 8) in natural order, plus image dims. Exact — the
    inverse of the entropy layer."""
    b = bytes(b)
    try:
        return _decode_coefficients_inner(b)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"jpeg: truncated or malformed stream ({exc})") from exc


def _decode_coefficients_inner(b: bytes):
    quant = None
    huff: dict[tuple[int, int], dict] = {}
    h = w = None
    scan = None
    for marker, body, tail in _walk_segments(b):
        if marker == 0xFFDB:
            pos = 0
            while pos < len(body):
                pq_tq = body[pos]
                if pq_tq >> 4:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                for k in range(64):
                    tbl[ZIGZAG[k]] = body[pos + 1 + k]
                if pq_tq & 0x0F == 0:
                    quant = tbl
                pos += 65
        elif marker == 0xFFC0:
            _, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if ncomp != 1:
                raise ValueError("jpeg: only single-component (gray) supported")
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC9, 0xFFCA, 0xFFCB):
            raise ValueError("jpeg: only baseline sequential (SOF0) supported")
        elif marker == 0xFFC4:
            pos = 0
            while pos < len(body):
                tc_th = body[pos]
                bits = tuple(body[pos + 1 : pos + 17])
                nvals = sum(bits)
                vals = tuple(body[pos + 17 : pos + 17 + nvals])
                huff[(tc_th >> 4, tc_th & 0x0F)] = _decode_table(bits, vals)
                pos += 17 + nvals
        elif marker == 0xFFDD:
            raise ValueError("jpeg: restart intervals unsupported")
        elif marker == 0xFFDA:
            scan = tail
    if quant is None or h is None or scan is None:
        raise ValueError("jpeg: missing DQT/SOF0/SOS")
    if (0, 0) not in huff or (1, 0) not in huff:
        raise ValueError("jpeg: missing Huffman tables")
    by, bx = (h + 7) // 8, (w + 7) // 8
    dc_tbl, ac_tbl = huff[(0, 0)], huff[(1, 0)]
    br = _BitReader(scan)
    blocks = np.zeros((by, bx, 8, 8), dtype=np.int64)
    prev_dc = 0
    for y in range(by):
        for x in range(bx):
            zz = np.zeros(64, dtype=np.int64)
            t = br.read_code(dc_tbl)
            diff = _extend(br.read(t), t) if t else 0
            prev_dc += diff
            zz[0] = prev_dc
            k = 1
            while k < 64:
                rs = br.read_code(ac_tbl)
                if rs == 0x00:  # EOB
                    break
                run, size = rs >> 4, rs & 0x0F
                if size == 0:
                    if run != 15:
                        raise ValueError("jpeg: invalid zero-size AC symbol")
                    k += 16  # ZRL
                    continue
                k += run
                if k > 63:
                    raise ValueError("jpeg: AC run overflows block")
                zz[k] = _extend(br.read(size), size)
                k += 1
            nat = np.zeros(64, dtype=np.int64)
            nat[ZIGZAG] = zz
            blocks[y, x] = (nat * quant).reshape(8, 8)
    return blocks, h, w


def decode_jpeg_gray(b: bytes) -> np.ndarray:
    """bytes → uint8 (h, w) pixels: coefficients → float64 IDCT →
    floor(s + 0.5) (HALF-UP) → +128 → clamp [0, 255]."""
    blocks, h, w = decode_jpeg_coefficients(b)
    by, bx = blocks.shape[:2]
    out = np.zeros((8 * by, 8 * bx), dtype=np.uint8)
    for y in range(by):
        for x in range(bx):
            s = _A.T @ blocks[y, x].astype(np.float64) @ _A
            px = np.floor(s + 0.5) + 128.0
            out[8 * y : 8 * y + 8, 8 * x : 8 * x + 8] = np.clip(
                px, 0, 255
            ).astype(np.uint8)
    return out[:h, :w]
