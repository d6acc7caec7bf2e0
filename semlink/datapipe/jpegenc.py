"""Fixture-side baseline JPEG encoder (test/generator use only).

A minimal but VALID baseline-sequential JFIF writer (ITU-T T.81):
8-bit samples, 4:4:4 (no subsampling), one scan, optional restart
markers. It exists so the REAL decoder (`multimodal.decode_jpeg_pixels`)
can be pinned against deterministic, library-free fixtures — the same
role the PNG/WAV SQL generators and the test-only GIF LZW encoder play
for those formats (VERDICT r04 next #3).

Tables: quantization uses the standard example tables of T.81 Annex K
(public knowledge); Huffman tables are SELF-DEFINED flat canonical
codes (12×4-bit DC categories, 162×8-bit AC run/size symbols) written
into DHT — legal per the spec (any complete prefix code is allowed,
and these never produce an all-ones code), and deliberately simple so
nothing depends on transcribing Annex K's 162-entry code lists. The
decoder reads whatever DQT/DHT the file carries, so it decodes both
these fixtures and standard-table files.
"""
from __future__ import annotations

import struct

import numpy as np

# raster index of each zigzag position (T.81 Figure A.6)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# T.81 Annex K.1 / K.2 example quantization tables (raster order)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# Self-defined canonical Huffman tables: BITS[i] = #codes of length i+1.
# DC: the 12 magnitude categories, all 4-bit codes (12/16 Kraft-ok,
# max code 1011 — never all-ones). AC: EOB + ZRL + 160 run/size
# symbols, all 8-bit codes (162/256, max code 10100001).
DC_BITS = [0, 0, 0, 12] + [0] * 12
DC_VALS = list(range(12))
AC_BITS = [0] * 7 + [162] + [0] * 8
AC_VALS = sorted([0x00, 0xF0] + [(r << 4) | s
                                 for r in range(16) for s in range(1, 11)])


def _canonical_codes(bits, vals):
    """symbol → (code, length) per T.81 Annex C."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return out


_DC_CODE = _canonical_codes(DC_BITS, DC_VALS)
_AC_CODE = _canonical_codes(AC_BITS, AC_VALS)

_M = np.array([[np.cos((2 * x + 1) * u * np.pi / 16)
                * (np.sqrt(0.5) if u == 0 else 1.0) / 2.0
                for x in range(8)] for u in range(8)])


def fdct2d(block: np.ndarray) -> np.ndarray:
    """Forward 8×8 DCT-II of a level-shifted float block."""
    return _M @ block @ _M.T


def idct2d(coef: np.ndarray) -> np.ndarray:
    """Inverse 8×8 DCT of dequantized coefficients."""
    return _M.T @ coef @ _M


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:          # byte stuffing
                    self.out.append(0x00)
                self.acc, self.n = 0, 0

    def pad_to_byte(self):
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int) -> int:
    """Entropy-code one block of zigzag-ordered quantized coefs."""
    diff = int(zz[0]) - pred
    s = _category(diff)
    bw.write(*_DC_CODE[s])
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    k = 1
    while k < 64:
        run = 0
        while k < 64 and zz[k] == 0:
            run += 1
            k += 1
        if k == 64:
            bw.write(*_AC_CODE[0x00])         # EOB
            break
        while run > 15:
            bw.write(*_AC_CODE[0xF0])         # ZRL
            run -= 16
        v = int(zz[k])
        s = _category(v)
        bw.write(*_AC_CODE[(run << 4) | s])
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        k += 1
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _quantize_channel(ch: np.ndarray, qt: np.ndarray) -> list:
    """8×8-tile a channel (edge-replicated), FDCT + quantize; returns
    zigzag-ordered int blocks in MCU raster order."""
    h, w = ch.shape
    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(ch.astype(np.float64) - 128.0,
                    ((0, bh * 8 - h), (0, bw_ * 8 - w)), mode="edge")
    qt2 = qt.reshape(8, 8)
    blocks = []
    for by in range(bh):
        for bx in range(bw_):
            tile = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
            coef = fdct2d(tile) / qt2
            q = np.floor(np.abs(coef) + 0.5) * np.sign(coef)
            blocks.append(q.astype(np.int32).ravel()[ZIGZAG])
    return blocks


def encode_baseline_jpeg(img: np.ndarray, restart_interval: int = 0) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 to baseline JFIF.

    4:4:4 sampling, Annex K quant tables, flat self-defined Huffman
    tables; ``restart_interval`` > 0 emits DRI + RSTn markers every
    that many MCUs (DC predictors reset, writer byte-aligned)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [(img.astype(np.float64), QT_LUMA, 0)]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        clip = lambda x: np.clip(np.floor(x + 0.5), 0, 255)
        planes = [(clip(y), QT_LUMA, 0), (clip(cb), QT_CHROMA, 1),
                  (clip(cr), QT_CHROMA, 1)]

    out = bytearray(b"\xff\xd8")                       # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0x00]) + bytes(QT_LUMA[ZIGZAG].tolist()))
    if not gray:
        out += _seg(0xFFDB, bytes([0x01]) + bytes(QT_CHROMA[ZIGZAG].tolist()))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += _seg(0xFFC0, sof)
    for cls, tid, bits, vals in ((0, 0, DC_BITS, DC_VALS),
                                 (1, 0, AC_BITS, AC_VALS)):
        out += _seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits)
                    + bytes(vals))
    if not gray:   # chroma reuses the same table layout under id 1
        for cls, bits, vals in ((0, DC_BITS, DC_VALS), (1, AC_BITS, AC_VALS)):
            out += _seg(0xFFC4, bytes([(cls << 4) | 1]) + bytes(bits)
                        + bytes(vals))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)

    per_comp = [_quantize_channel(p, qt) for p, qt, _ in planes]
    n_mcu = len(per_comp[0])
    bw = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            bw.pad_to_byte()
            bw.out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            preds = [0] * ncomp
        for ci in range(ncomp):
            preds[ci] = _encode_block(bw, per_comp[ci][m], preds[ci])
    bw.pad_to_byte()
    out += bw.out
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)
