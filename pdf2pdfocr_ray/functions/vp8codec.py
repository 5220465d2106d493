"""Pure-numpy VP8 (lossy WebP) intra-frame codec.

Lossy VP8 is the dominant WebP flavor in real crawls; the reference
accepts it through ImageMagick (/root/reference/pdf2pdfocr.py:1133-1141).
This module implements the VP8 KEYFRAME bitstream from RFC 6386 ("VP8
Data Format and Decoding Guide") — WebP stills are always keyframes:

* ``decode_vp8``: boolean arithmetic decoder (RFC SS7), keyframe header
  (SS9), segment/filter/quantizer state, coefficient-probability
  updates, per-macroblock intra modes (16x16 DC/V/H/TM and 4x4 B_PRED
  with the full [above][left] context model, SS11), DCT token decoding
  with band/context tracking (SS13), dequantization (SS14), the exact
  integer inverse DCT/WHT (SS14.3-14.4), all intra predictors incl. the
  above-right rules (SS12), the normal AND simple in-loop deblocking
  filters (SS15), and studio-swing YUV420 -> RGB.
* ``encode_vp8``: a minimal conforming keyframe encoder (16x16 DC_PRED
  everywhere, single token partition, default probabilities, loop
  filter level 0) that reconstructs its own prediction chain exactly
  like the decoder — used for roundtrip tests and lossy re-encode.

The static probability/quantizer tables normative to the format live in
``vp8_tables.py``.  Entropy decode is bit-serial Python (page-scale
images inside actor pools); pixel reconstruction and color conversion
are vectorized numpy.
"""

from __future__ import annotations

import struct

import numpy as np

from .vp8_tables import (
    AC_QLOOKUP,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    DEFAULT_COEFF_PROBS,
    KF_BMODE_PROBS,
)

# ---------------------------------------------------------------- constants
# Intra 16x16 / chroma modes (RFC 6386 SS11.2)
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
# 4x4 modes (SS11.5)
(B_DC_PRED, B_TM_PRED, B_VE_PRED, B_HE_PRED, B_LD_PRED,
 B_RD_PRED, B_VR_PRED, B_VL_PRED, B_HD_PRED, B_HU_PRED) = range(10)

# keyframe mode trees + probs (RFC 6386 SS11.3, SS11.5, SS11.6)
KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROB = (145, 156, 163, 128)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROB = (142, 114, 183, 44)
BMODE_TREE = (
    -B_DC_PRED, 2,
    -B_TM_PRED, 4,
    -B_VE_PRED, 6,
    8, 12,
    -B_HE_PRED, 10,
    -B_RD_PRED, -B_VR_PRED,
    -B_LD_PRED, 14,
    -B_VL_PRED, 16,
    -B_HD_PRED, -B_HU_PRED,
)

# token tree (RFC 6386 SS13.2); tokens 0..10, 11 = EOB
(ZERO_TOK, ONE_TOK, TWO_TOK, THREE_TOK, FOUR_TOK, CAT1, CAT2, CAT3,
 CAT4, CAT5, CAT6, EOB_TOK) = range(12)
COEFF_TREE = (
    -EOB_TOK, 2,
    -ZERO_TOK, 4,
    -ONE_TOK, 6,
    8, 12,
    -TWO_TOK, 10,
    -THREE_TOK, -FOUR_TOK,
    14, 16,
    -CAT1, -CAT2,
    18, 20,
    -CAT3, -CAT4,
    -CAT5, -CAT6,
)
# extra-bit probabilities per category (RFC 6386 SS13.2)
CAT_PROBS = {
    CAT1: (159,),
    CAT2: (165, 145),
    CAT3: (173, 148, 140),
    CAT4: (176, 155, 140, 135),
    CAT5: (180, 157, 141, 134, 130),
    CAT6: (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
}
CAT_BASE = {CAT1: 5, CAT2: 7, CAT3: 11, CAT4: 19, CAT5: 35, CAT6: 67}

COEFF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# block types for the coefficient probability table (RFC 6386 SS13.3):
# 0 = Y after Y2, 1 = Y2, 2 = chroma, 3 = Y without Y2 (B_PRED)
PLANE_Y_AFTER_Y2, PLANE_Y2, PLANE_UV, PLANE_Y_NO_Y2 = 0, 1, 2, 3


# ---------------------------------------------------------------- bool coder
class BoolDecoder:
    """RFC 6386 SS7.3 boolean arithmetic decoder.  Tolerates the spec's
    implicit zero padding a few bytes past the partition end; further
    reads raise (a desynced stream overruns almost surely)."""

    __slots__ = ("buf", "pos", "end", "value", "range", "bit_count", "over")

    def __init__(self, buf: bytes, start: int = 0, end: int | None = None):
        self.buf = buf
        self.end = len(buf) if end is None else end
        self.pos = start
        self.value = 0
        for _ in range(2):
            self.value = (self.value << 8) | self._next_byte()
        self.range = 255
        self.bit_count = 0
        self.over = 0

    def _next_byte(self) -> int:
        if self.pos < self.end:
            b = self.buf[self.pos]
            self.pos += 1
            return b
        self.over += 1
        if self.over > 4:
            raise ValueError("VP8 bool decoder overran its partition")
        return 0

    def get_bool(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big_split = split << 8
        if self.value >= big_split:
            ret = 1
            self.range -= split
            self.value -= big_split
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value = (self.value << 1) & 0xFFFF
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                self.value |= self._next_byte()
        return ret

    def get_literal(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            v = (v << 1) | self.get_bool(128)
        return v

    def get_signed(self, bits: int) -> int:
        v = self.get_literal(bits)
        return -v if self.get_bool(128) else v

    def read_tree(self, tree: tuple, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.get_bool(probs[i >> 1])]
            if i <= 0:
                return -i


class BoolEncoder:
    """RFC 6386 SS7.2 boolean arithmetic encoder."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self) -> None:
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 0xFF:
            self.out[i] = 0
            i -= 1
        if i < 0:  # pragma: no cover - cannot carry before any output
            raise AssertionError("bool encoder carry underflow")
        self.out[i] += 1

    def put_bool(self, prob: int, value: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if value:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= 0xFFFFFF
                self.bit_count = 8

    def put_literal(self, value: int, bits: int) -> None:
        for b in range(bits - 1, -1, -1):
            self.put_bool(128, (value >> b) & 1)

    def put_signed(self, value: int, bits: int) -> None:
        self.put_literal(abs(value), bits)
        self.put_bool(128, 1 if value < 0 else 0)

    def write_tree(self, tree: tuple, probs, symbol: int,
                   start: int = 0) -> None:
        path: list[tuple[int, int]] = []

        def walk(i: int) -> bool:
            for bit in (0, 1):
                j = tree[i + bit]
                if j <= 0:
                    if -j == symbol:
                        path.append((probs[i >> 1], bit))
                        return True
                else:
                    path.append((probs[i >> 1], bit))
                    if walk(j):
                        return True
                    path.pop()
            return False

        if not walk(start):  # pragma: no cover - malformed use
            raise ValueError(f"symbol {symbol} not reachable in tree")
        for prob, bit in path:
            self.put_bool(prob, bit)

    def finish(self) -> bytes:
        for _ in range(32):
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= 0xFFFFFF
                self.bit_count = 8
        return bytes(self.out)


# ---------------------------------------------------------------- transforms
def idct4x4_batch(coeffs: np.ndarray) -> np.ndarray:
    """RFC 6386 SS14.3 exact integer inverse DCT, batched: coeffs
    (n, 16) int raster order -> (n, 4, 4) int32 residuals.  One numpy
    pass for a whole macroblock's 24 blocks instead of 24 tiny calls."""
    c1, c2 = 20091, 35468  # cos(pi/8)*sqrt(2)-1, sin(pi/8)*sqrt(2) in Q16
    ip = coeffs.reshape(-1, 4, 4).astype(np.int64)
    a1 = ip[:, 0] + ip[:, 2]
    b1 = ip[:, 0] - ip[:, 2]
    cc = ((ip[:, 1] * c2) >> 16) - (ip[:, 3] + ((ip[:, 3] * c1) >> 16))
    dd = (ip[:, 1] + ((ip[:, 1] * c1) >> 16)) + ((ip[:, 3] * c2) >> 16)
    col = np.empty_like(ip)
    col[:, 0] = a1 + dd
    col[:, 3] = a1 - dd
    col[:, 1] = b1 + cc
    col[:, 2] = b1 - cc
    ip = col.transpose(0, 2, 1)
    a1 = ip[:, 0] + ip[:, 2]
    b1 = ip[:, 0] - ip[:, 2]
    cc = ((ip[:, 1] * c2) >> 16) - (ip[:, 3] + ((ip[:, 3] * c1) >> 16))
    dd = (ip[:, 1] + ((ip[:, 1] * c1) >> 16)) + ((ip[:, 3] * c2) >> 16)
    out = np.empty_like(ip)
    out[:, 0] = (a1 + dd + 4) >> 3
    out[:, 3] = (a1 - dd + 4) >> 3
    out[:, 1] = (b1 + cc + 4) >> 3
    out[:, 2] = (b1 - cc + 4) >> 3
    return out.transpose(0, 2, 1).astype(np.int32)


def idct4x4(coeffs: np.ndarray) -> np.ndarray:
    """Single-block wrapper over :func:`idct4x4_batch`."""
    return idct4x4_batch(np.asarray(coeffs).reshape(1, 16))[0]


def iwht4x4(coeffs: np.ndarray) -> np.ndarray:
    """RFC 6386 SS14.3 inverse Walsh-Hadamard for the Y2 block; returns
    the 16 Y-block DC values in raster order."""
    ip = coeffs.reshape(4, 4).astype(np.int64)
    a1 = ip[0] + ip[3]
    b1 = ip[1] + ip[2]
    c1 = ip[1] - ip[2]
    d1 = ip[0] - ip[3]
    col = np.empty((4, 4), np.int64)
    col[0] = a1 + b1
    col[1] = c1 + d1
    col[2] = a1 - b1
    col[3] = d1 - c1
    ip = col.T
    a1 = ip[0] + ip[3]
    b1 = ip[1] + ip[2]
    c1 = ip[1] - ip[2]
    d1 = ip[0] - ip[3]
    out = np.empty((4, 4), np.int64)
    out[0] = (a1 + b1 + 3) >> 3
    out[1] = (c1 + d1 + 3) >> 3
    out[2] = (a1 - b1 + 3) >> 3
    out[3] = (d1 - c1 + 3) >> 3
    return out.T.reshape(16).astype(np.int32)


def fdct4x4(block: np.ndarray) -> np.ndarray:
    """Forward 4x4 transform (libvpx short_fdct4x4 constants) for the
    encoder; any conforming forward works — reconstruction always goes
    through the normative inverse."""
    ip = block.astype(np.int64)
    tmp = np.empty((4, 4), np.int64)
    for r in range(4):
        a1 = (ip[r, 0] + ip[r, 3]) * 8
        b1 = (ip[r, 1] + ip[r, 2]) * 8
        c1 = (ip[r, 1] - ip[r, 2]) * 8
        d1 = (ip[r, 0] - ip[r, 3]) * 8
        tmp[r, 0] = a1 + b1
        tmp[r, 2] = a1 - b1
        tmp[r, 1] = (c1 * 2217 + d1 * 5352 + 14500) >> 12
        tmp[r, 3] = (d1 * 2217 - c1 * 5352 + 7500) >> 12
    out = np.empty((4, 4), np.int64)
    for c in range(4):
        a1 = tmp[0, c] + tmp[3, c]
        b1 = tmp[1, c] + tmp[2, c]
        c1 = tmp[1, c] - tmp[2, c]
        d1 = tmp[0, c] - tmp[3, c]
        out[0, c] = (a1 + b1 + 7) >> 4
        out[2, c] = (a1 - b1 + 7) >> 4
        out[1, c] = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (d1 != 0)
        out[3, c] = (d1 * 2217 - c1 * 5352 + 51000) >> 16
    return out.reshape(16).astype(np.int32)


def fwht4x4(dcs: np.ndarray) -> np.ndarray:
    """Forward WHT over the 16 Y DC values (libvpx short_walsh4x4)."""
    ip = dcs.reshape(4, 4).astype(np.int64)
    tmp = np.empty((4, 4), np.int64)
    for r in range(4):
        a1 = (ip[r, 0] + ip[r, 2]) * 4
        d1 = (ip[r, 1] + ip[r, 3]) * 4
        c1 = (ip[r, 1] - ip[r, 3]) * 4
        b1 = (ip[r, 0] - ip[r, 2]) * 4
        tmp[r, 0] = a1 + d1 + (a1 != 0)
        tmp[r, 1] = b1 + c1
        tmp[r, 2] = b1 - c1
        tmp[r, 3] = a1 - d1
    out = np.empty((4, 4), np.int64)
    for c in range(4):
        a1 = tmp[0, c] + tmp[2, c]
        d1 = tmp[1, c] + tmp[3, c]
        c1 = tmp[1, c] - tmp[3, c]
        b1 = tmp[0, c] - tmp[2, c]
        a2 = a1 + d1
        b2 = b1 + c1
        c2 = b1 - c1
        d2 = a1 - d1
        out[0, c] = (a2 + (1 if a2 < 0 else 0) + 3) >> 3
        out[1, c] = (b2 + (1 if b2 < 0 else 0) + 3) >> 3
        out[2, c] = (c2 + (1 if c2 < 0 else 0) + 3) >> 3
        out[3, c] = (d2 + (1 if d2 < 0 else 0) + 3) >> 3
    return out.reshape(16).astype(np.int32)


# ---------------------------------------------------------------- dequant
def _clamp_q(q: int) -> int:
    return 0 if q < 0 else 127 if q > 127 else q


def dequant_factors(q_index: int, deltas: dict) -> dict:
    """RFC 6386 SS14.1 dequantization factors per plane."""
    y1dc = DC_QLOOKUP[_clamp_q(q_index + deltas["y1dc"])]
    y1ac = AC_QLOOKUP[_clamp_q(q_index)]
    y2dc = DC_QLOOKUP[_clamp_q(q_index + deltas["y2dc"])] * 2
    y2ac = AC_QLOOKUP[_clamp_q(q_index + deltas["y2ac"])] * 155 // 100
    if y2ac < 8:
        y2ac = 8
    uvdc = DC_QLOOKUP[_clamp_q(q_index + deltas["uvdc"])]
    if uvdc > 132:
        uvdc = 132
    uvac = AC_QLOOKUP[_clamp_q(q_index + deltas["uvac"])]
    return {"y1": (y1dc, y1ac), "y2": (y2dc, y2ac), "uv": (uvdc, uvac)}


# ---------------------------------------------------------------- predictors
def _pred_block(mode: int, above: np.ndarray | None,
                left: np.ndarray | None, top_left: int,
                size: int) -> np.ndarray:
    """Whole-block (16x16 luma / 8x8 chroma) intra prediction (SS12.2)."""
    shift = 4 if size == 16 else 3
    if mode == DC_PRED:
        if above is None and left is None:
            val = 128
        elif above is None:
            val = (int(left.sum()) + (size >> 1)) >> shift
        elif left is None:
            val = (int(above.sum()) + (size >> 1)) >> shift
        else:
            val = (int(above.sum()) + int(left.sum()) + size) >> (shift + 1)
        return np.full((size, size), val, np.int32)
    if mode == V_PRED:
        a = above if above is not None else np.full(size, 127, np.int32)
        return np.tile(a.astype(np.int32), (size, 1))
    if mode == H_PRED:
        lf = left if left is not None else np.full(size, 129, np.int32)
        return np.tile(lf.astype(np.int32).reshape(-1, 1), (1, size))
    # TM_PRED
    a = (above if above is not None
         else np.full(size, 127, np.int32)).astype(np.int32)
    lf = (left if left is not None
          else np.full(size, 129, np.int32)).astype(np.int32)
    p = lf.reshape(-1, 1) + a.reshape(1, -1) - int(top_left)
    return np.clip(p, 0, 255)


def _avg2(x, y):
    return (x + y + 1) >> 1


def _avg3(x, y, z):
    return (x + 2 * y + z + 2) >> 2


def _pred4(mode: int, a: np.ndarray, al: int, lf: np.ndarray,
           ar: np.ndarray) -> np.ndarray:
    """4x4 subblock intra prediction (RFC 6386 SS12.3) — explicit RFC
    pixel tables.  ``a``: 4 above pixels, ``al``: above-left, ``lf``: 4
    left pixels, ``ar``: 4 above-right."""
    out = np.empty((4, 4), np.int64)
    A = [int(x) for x in a] + [int(x) for x in ar]  # A[0..7]
    L = [int(x) for x in lf]
    AL = int(al)
    if mode == B_DC_PRED:
        out[:] = (sum(A[:4]) + sum(L) + 4) >> 3
    elif mode == B_TM_PRED:
        p = (np.asarray(L, np.int64).reshape(-1, 1)
             + np.asarray(A[:4], np.int64).reshape(1, -1) - AL)
        out[:] = np.clip(p, 0, 255)
    elif mode == B_VE_PRED:
        row = [_avg3(AL, A[0], A[1]), _avg3(A[0], A[1], A[2]),
               _avg3(A[1], A[2], A[3]), _avg3(A[2], A[3], A[4])]
        out[:] = np.asarray(row, np.int64).reshape(1, 4)
    elif mode == B_HE_PRED:
        col = [_avg3(AL, L[0], L[1]), _avg3(L[0], L[1], L[2]),
               _avg3(L[1], L[2], L[3]), _avg3(L[2], L[3], L[3])]
        out[:] = np.asarray(col, np.int64).reshape(4, 1)
    elif mode == B_LD_PRED:
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    out[r, c] = _avg3(A[i], A[i + 1], A[i + 2])
                else:
                    out[r, c] = _avg3(A[6], A[7], A[7])
    elif mode == B_RD_PRED:
        e = [L[3], L[2], L[1], L[0], AL, A[0], A[1], A[2], A[3]]
        for r in range(4):
            for c in range(4):
                i = c - r + 3
                out[r, c] = _avg3(e[i], e[i + 1], e[i + 2])
    elif mode == B_VR_PRED:
        out[0, 0] = out[2, 1] = _avg2(AL, A[0])
        out[0, 1] = out[2, 2] = _avg2(A[0], A[1])
        out[0, 2] = out[2, 3] = _avg2(A[1], A[2])
        out[0, 3] = _avg2(A[2], A[3])
        out[1, 0] = out[3, 1] = _avg3(L[0], AL, A[0])
        out[1, 1] = out[3, 2] = _avg3(AL, A[0], A[1])
        out[1, 2] = out[3, 3] = _avg3(A[0], A[1], A[2])
        out[1, 3] = _avg3(A[1], A[2], A[3])
        out[2, 0] = _avg3(L[1], L[0], AL)
        out[3, 0] = _avg3(L[2], L[1], L[0])
    elif mode == B_VL_PRED:
        out[0, 0] = _avg2(A[0], A[1])
        out[1, 0] = _avg3(A[0], A[1], A[2])
        out[2, 0] = out[0, 1] = _avg2(A[1], A[2])
        out[3, 0] = out[1, 1] = _avg3(A[1], A[2], A[3])
        out[2, 1] = out[0, 2] = _avg2(A[2], A[3])
        out[3, 1] = out[1, 2] = _avg3(A[2], A[3], A[4])
        out[2, 2] = out[0, 3] = _avg2(A[3], A[4])
        out[3, 2] = out[1, 3] = _avg3(A[3], A[4], A[5])
        # last two do not strictly follow the pattern (RFC SS12.3)
        out[2, 3] = _avg3(A[4], A[5], A[6])
        out[3, 3] = _avg3(A[5], A[6], A[7])
    elif mode == B_HD_PRED:
        out[3, 0] = _avg2(L[3], L[2])
        out[3, 1] = _avg3(L[3], L[2], L[1])
        out[2, 0] = out[3, 2] = _avg2(L[2], L[1])
        out[2, 1] = out[3, 3] = _avg3(L[2], L[1], L[0])
        out[1, 0] = out[2, 2] = _avg2(L[1], L[0])
        out[1, 1] = out[2, 3] = _avg3(L[1], L[0], AL)
        out[0, 0] = out[1, 2] = _avg2(L[0], AL)
        out[0, 1] = out[1, 3] = _avg3(L[0], AL, A[0])
        out[0, 2] = _avg3(AL, A[0], A[1])
        out[0, 3] = _avg3(A[0], A[1], A[2])
    elif mode == B_HU_PRED:
        out[0, 0] = _avg2(L[0], L[1])
        out[0, 1] = _avg3(L[0], L[1], L[2])
        out[0, 2] = out[1, 0] = _avg2(L[1], L[2])
        out[0, 3] = out[1, 1] = _avg3(L[1], L[2], L[3])
        out[1, 2] = out[2, 0] = _avg2(L[2], L[3])
        out[1, 3] = out[2, 1] = _avg3(L[2], L[3], L[3])
        out[2, 2] = out[2, 3] = L[3]
        out[3, :] = L[3]
    else:  # pragma: no cover
        raise ValueError(f"bad bmode {mode}")
    return out.astype(np.int32)


# ---------------------------------------------------------------- loop filter
def _common_adjust(use_outer: np.ndarray | bool, p1, p0, q0, q1):
    """RFC 6386 SS15.2 common_adjust on signed int32 arrays; returns the
    new (p0, q0) plus the F value."""
    a = np.clip(p1 - q1, -128, 127)
    a = np.where(use_outer, a, 0)
    a = np.clip(a + 3 * (q0 - p0), -128, 127)
    f = np.clip(a + 4, -128, 127) >> 3
    e = np.clip(a + 3, -128, 127) >> 3
    return np.clip(p0 + e, -128, 127), np.clip(q0 - f, -128, 127), f


def _normal_mask(limit, interior, p3, p2, p1, p0, q0, q1, q2, q3):
    m = (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= limit
    for x, y in ((p3, p2), (p2, p1), (p1, p0), (q1, q0), (q2, q1), (q3, q2)):
        m &= np.abs(x - y) <= interior
    return m


def _hev(thresh, p1, p0, q0, q1):
    return (np.abs(p1 - p0) > thresh) | (np.abs(q1 - q0) > thresh)


def _filter_segment(rows: list[np.ndarray], kind: str, limit: int,
                    interior: int, hev_t: int) -> None:
    """Filter one edge.  ``rows`` = 8 int32 arrays [p3..q3] (modified in
    place).  kind: 'simple' | 'sub' | 'mb'."""
    p3, p2, p1, p0, q0, q1, q2, q3 = rows
    if kind == "simple":
        mask = (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= limit
        s = [x - 128 for x in (p1, p0, q0, q1)]
        p0n, q0n, _ = _common_adjust(True, *s)
        rows[3][:] = np.where(mask, p0n, s[1]) + 128
        rows[4][:] = np.where(mask, q0n, s[2]) + 128
        return
    mask = _normal_mask(limit, interior, p3, p2, p1, p0, q0, q1, q2, q3)
    hev = _hev(hev_t, p1, p0, q0, q1)
    if kind == "sub":
        s1, s0, t0, t1 = (p1 - 128, p0 - 128, q0 - 128, q1 - 128)
        p0n, q0n, f = _common_adjust(hev, s1, s0, t0, t1)
        a = (f + 1) >> 1
        p1n = np.clip(s1 + np.where(hev, 0, a), -128, 127)
        q1n = np.clip(t1 - np.where(hev, 0, a), -128, 127)
        rows[2][:] = np.where(mask, p1n, s1) + 128
        rows[3][:] = np.where(mask, p0n, s0) + 128
        rows[4][:] = np.where(mask, q0n, t0) + 128
        rows[5][:] = np.where(mask, q1n, t1) + 128
        return
    # mb edge
    s = [x - 128 for x in (p2, p1, p0, q0, q1, q2)]
    p2s, p1s, p0s, q0s, q1s, q2s = s
    p0h, q0h, _ = _common_adjust(True, p1s, p0s, q0s, q1s)
    w = np.clip(np.clip(p1s - q1s, -128, 127) + 3 * (q0s - p0s), -128, 127)
    a = np.clip((27 * w + 63) >> 7, -128, 127)
    q0w = np.clip(q0s - a, -128, 127)
    p0w = np.clip(p0s + a, -128, 127)
    a = np.clip((18 * w + 63) >> 7, -128, 127)
    q1w = np.clip(q1s - a, -128, 127)
    p1w = np.clip(p1s + a, -128, 127)
    a = np.clip((9 * w + 63) >> 7, -128, 127)
    q2w = np.clip(q2s - a, -128, 127)
    p2w = np.clip(p2s + a, -128, 127)
    useh = mask & hev
    usew = mask & ~hev
    rows[1][:] = np.where(usew, p2w, p2s) + 128
    rows[2][:] = np.where(usew, p1w, p1s) + 128
    rows[3][:] = np.where(usew, p0w, np.where(useh, p0h, p0s)) + 128
    rows[4][:] = np.where(usew, q0w, np.where(useh, q0h, q0s)) + 128
    rows[5][:] = np.where(usew, q1w, q1s) + 128
    rows[6][:] = np.where(usew, q2w, q2s) + 128


def _filter_edge(plane: np.ndarray, y0: int, x0: int, n: int, pos: int,
                 vertical: bool, kind: str, limit: int, interior: int,
                 hev_t: int) -> None:
    """Filter one n-pixel edge of an MB in `plane`; `pos` = q0 coordinate
    (absolute).  vertical=True filters a vertical edge (columns)."""
    if vertical:
        seg = plane[y0: y0 + n, pos - 4: pos + 4].astype(np.int32)
        rows = [seg[:, i].copy() for i in range(8)]
    else:
        seg = plane[pos - 4: pos + 4, x0: x0 + n].astype(np.int32)
        rows = [seg[i, :].copy() for i in range(8)]
    _filter_segment(rows, kind, limit, interior, hev_t)
    stacked = np.stack(rows, axis=1 if vertical else 0).astype(np.uint8)
    if vertical:
        plane[y0: y0 + n, pos - 4: pos + 4] = stacked
    else:
        plane[pos - 4: pos + 4, x0: x0 + n] = stacked


def _loop_filter(ypl, upl, vpl, mb_w, mb_h, hdr, mb_info) -> None:
    """RFC 6386 SS15 in-loop deblocking, normal or simple profile."""
    simple = bool(hdr.filter_type)
    for my in range(mb_h):
        for mx in range(mb_w):
            seg, ymode, has_coeffs = mb_info[my * mb_w + mx]
            lvl = hdr.filter_level
            if hdr.seg_enabled:
                lvl = hdr.seg_lf[seg] if hdr.seg_abs else lvl + hdr.seg_lf[seg]
            if hdr.lf_delta_enabled:
                lvl += hdr.ref_lf_deltas[0]  # intra/golden index 0
                if ymode == B_PRED:
                    lvl += hdr.mode_lf_deltas[0]
            lvl = max(0, min(63, lvl))
            if lvl == 0:
                continue
            interior = lvl
            if hdr.sharpness:
                interior >>= 2 if hdr.sharpness > 4 else 1
                interior = min(interior, 9 - hdr.sharpness)
            interior = max(1, interior)
            mb_lim = (lvl + 2) * 2 + interior
            sb_lim = lvl * 2 + interior
            hev_t = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)
            inner = has_coeffs or ymode == B_PRED
            y0, x0 = my * 16, mx * 16
            cy0, cx0 = my * 8, mx * 8
            if simple:
                if mx > 0:
                    _filter_edge(ypl, y0, x0, 16, x0, True, "simple",
                                 mb_lim, interior, hev_t)
                if inner:
                    for dx in (4, 8, 12):
                        _filter_edge(ypl, y0, x0, 16, x0 + dx, True,
                                     "simple", sb_lim, interior, hev_t)
                if my > 0:
                    _filter_edge(ypl, y0, x0, 16, y0, False, "simple",
                                 mb_lim, interior, hev_t)
                if inner:
                    for dy in (4, 8, 12):
                        _filter_edge(ypl, y0, x0, 16, y0 + dy, False,
                                     "simple", sb_lim, interior, hev_t)
                continue
            if mx > 0:
                _filter_edge(ypl, y0, x0, 16, x0, True, "mb",
                             mb_lim, interior, hev_t)
                for pl in (upl, vpl):
                    _filter_edge(pl, cy0, cx0, 8, cx0, True, "mb",
                                 mb_lim, interior, hev_t)
            if inner:
                for dx in (4, 8, 12):
                    _filter_edge(ypl, y0, x0, 16, x0 + dx, True, "sub",
                                 sb_lim, interior, hev_t)
                for pl in (upl, vpl):
                    _filter_edge(pl, cy0, cx0, 8, cx0 + 4, True, "sub",
                                 sb_lim, interior, hev_t)
            if my > 0:
                _filter_edge(ypl, y0, x0, 16, y0, False, "mb",
                             mb_lim, interior, hev_t)
                for pl in (upl, vpl):
                    _filter_edge(pl, cy0, cx0, 8, cy0, False, "mb",
                                 mb_lim, interior, hev_t)
            if inner:
                for dy in (4, 8, 12):
                    _filter_edge(ypl, y0, x0, 16, y0 + dy, False, "sub",
                                 sb_lim, interior, hev_t)
                for pl in (upl, vpl):
                    _filter_edge(pl, cy0, cx0, 8, cy0 + 4, False, "sub",
                                 sb_lim, interior, hev_t)


# ---------------------------------------------------------------- header
class _FrameHeader:
    pass


def _parse_header(bd: BoolDecoder) -> _FrameHeader:
    h = _FrameHeader()
    h.color_space = bd.get_bool(128)
    h.clamping = bd.get_bool(128)
    h.seg_enabled = bd.get_bool(128)
    h.seg_update_map = 0
    h.seg_abs = 0
    h.seg_q = [0, 0, 0, 0]
    h.seg_lf = [0, 0, 0, 0]
    h.seg_tree_probs = [255, 255, 255]
    if h.seg_enabled:
        h.seg_update_map = bd.get_bool(128)
        update_data = bd.get_bool(128)
        if update_data:
            h.seg_abs = bd.get_bool(128)
            for i in range(4):
                if bd.get_bool(128):
                    h.seg_q[i] = bd.get_signed(7)
            for i in range(4):
                if bd.get_bool(128):
                    h.seg_lf[i] = bd.get_signed(6)
        if h.seg_update_map:
            for i in range(3):
                if bd.get_bool(128):
                    h.seg_tree_probs[i] = bd.get_literal(8)
    h.filter_type = bd.get_bool(128)  # 1 = simple profile
    h.filter_level = bd.get_literal(6)
    h.sharpness = bd.get_literal(3)
    h.lf_delta_enabled = bd.get_bool(128)
    h.ref_lf_deltas = [0, 0, 0, 0]
    h.mode_lf_deltas = [0, 0, 0, 0]
    if h.lf_delta_enabled:
        if bd.get_bool(128):
            for i in range(4):
                if bd.get_bool(128):
                    h.ref_lf_deltas[i] = bd.get_signed(6)
            for i in range(4):
                if bd.get_bool(128):
                    h.mode_lf_deltas[i] = bd.get_signed(6)
    h.num_parts = 1 << bd.get_literal(2)
    h.q_index = bd.get_literal(7)
    h.q_deltas = {}
    for key in ("y1dc", "y2dc", "y2ac", "uvdc", "uvac"):
        h.q_deltas[key] = bd.get_signed(4) if bd.get_bool(128) else 0
    h.refresh_entropy = bd.get_bool(128)
    probs = [[[list(DEFAULT_COEFF_PROBS[t][b][c]) for c in range(3)]
              for b in range(8)] for t in range(4)]
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for p in range(11):
                    if bd.get_bool(COEFF_UPDATE_PROBS[t][b][c][p]):
                        probs[t][b][c][p] = bd.get_literal(8)
    h.coeff_probs = probs
    h.mb_no_skip = bd.get_bool(128)
    h.prob_skip_false = bd.get_literal(8) if h.mb_no_skip else 0
    return h


# ---------------------------------------------------------------- residuals
def _decode_block_coeffs(bd: BoolDecoder, probs, plane: int, ctx: int,
                         first: int, dqf: tuple[int, int]):
    """Token-decode one 4x4 block (RFC 6386 SS13.3).  Returns
    (dequantized (16,) int32 raster coefficients, eob position).

    The bool decoder is inlined with local-variable state (this loop is
    the lossy-WebP hot path: ~10^5 arithmetic decisions per page)."""
    buf = bd.buf
    end = bd.end
    pos = bd.pos
    value = bd.value
    rng = bd.range
    bitc = bd.bit_count
    over = bd.over
    out = np.zeros(16, np.int32)
    i = first
    start = 0  # tree entry: 0 checks EOB; 2 skips it (after a zero)
    nz = ctx
    tree = COEFF_TREE
    bands = COEFF_BANDS
    zz = ZIGZAG
    pplane = probs[plane]
    try:
        while i < 16:
            p = pplane[bands[i]][nz]
            node = start
            while True:
                prob = p[node >> 1]
                split = 1 + (((rng - 1) * prob) >> 8)
                big = split << 8
                if value >= big:
                    b = 1
                    rng -= split
                    value -= big
                else:
                    b = 0
                    rng = split
                while rng < 128:
                    value = (value << 1) & 0xFFFF
                    rng <<= 1
                    bitc += 1
                    if bitc == 8:
                        bitc = 0
                        if pos < end:
                            value |= buf[pos]
                            pos += 1
                        else:
                            over += 1
                            if over > 4:
                                raise ValueError(
                                    "VP8 bool decoder overran its partition"
                                )
                node = tree[node + b]
                if node <= 0:
                    tok = -node
                    break
            if tok == EOB_TOK:
                break
            if tok == ZERO_TOK:
                nz = 0
                start = 2
                i += 1
                continue
            start = 0
            if tok <= FOUR_TOK:
                val = tok
            else:
                extra = 0
                for prob in CAT_PROBS[tok]:
                    split = 1 + (((rng - 1) * prob) >> 8)
                    big = split << 8
                    if value >= big:
                        b = 1
                        rng -= split
                        value -= big
                    else:
                        b = 0
                        rng = split
                    while rng < 128:
                        value = (value << 1) & 0xFFFF
                        rng <<= 1
                        bitc += 1
                        if bitc == 8:
                            bitc = 0
                            if pos < end:
                                value |= buf[pos]
                                pos += 1
                            else:
                                over += 1
                                if over > 4:
                                    raise ValueError(
                                        "VP8 bool decoder overran its "
                                        "partition"
                                    )
                    extra = (extra << 1) | b
                val = CAT_BASE[tok] + extra
            # sign bit (prob 128)
            split = 1 + (((rng - 1) * 128) >> 8)
            big = split << 8
            if value >= big:
                rng -= split
                value -= big
                val = -val
            else:
                rng = split
            while rng < 128:
                value = (value << 1) & 0xFFFF
                rng <<= 1
                bitc += 1
                if bitc == 8:
                    bitc = 0
                    if pos < end:
                        value |= buf[pos]
                        pos += 1
                    else:
                        over += 1
                        if over > 4:
                            raise ValueError(
                                "VP8 bool decoder overran its partition"
                            )
            nz = 1 if val in (1, -1) else 2
            out[zz[i]] = val * (dqf[0] if i == 0 else dqf[1])
            i += 1
    finally:
        bd.pos = pos
        bd.value = value
        bd.range = rng
        bd.bit_count = bitc
        bd.over = over
    return out, i - first


# ---------------------------------------------------------------- decoder
def decode_vp8(payload: bytes) -> np.ndarray:
    """VP8 keyframe bytes (the 'VP8 ' chunk body) -> (h, w, 3) uint8 RGB."""
    if len(payload) < 10:
        raise ValueError("truncated VP8 payload")
    tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
    if tag & 1:
        raise ValueError("VP8 interframe in a still image")
    part1_size = tag >> 5
    if payload[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    w = struct.unpack("<H", payload[6:8])[0] & 0x3FFF
    h = struct.unpack("<H", payload[8:10])[0] & 0x3FFF
    if w == 0 or h == 0:
        raise ValueError("zero VP8 dimensions")
    from .limits import guard_dims

    guard_dims(w + 16, h + 16, "VP8")  # planes pad to MB multiples
    part1_end = 10 + part1_size
    if part1_end > len(payload):
        raise ValueError("VP8 partition 1 overruns payload")
    bd = BoolDecoder(payload, 10, part1_end)
    hdr = _parse_header(bd)

    mb_w, mb_h = (w + 15) >> 4, (h + 15) >> 4
    nparts = hdr.num_parts
    sizes_at = part1_end
    data_at = sizes_at + 3 * (nparts - 1)
    part_bounds = []
    pos = data_at
    for i in range(nparts):
        if i < nparts - 1:
            psz = (payload[sizes_at + 3 * i]
                   | (payload[sizes_at + 3 * i + 1] << 8)
                   | (payload[sizes_at + 3 * i + 2] << 16))
        else:
            psz = len(payload) - pos
        if psz < 0 or pos + psz > len(payload):
            raise ValueError("VP8 token partition overruns payload")
        part_bounds.append((pos, pos + psz))
        pos += psz
    parts = [BoolDecoder(payload, s, e) for s, e in part_bounds]

    # ---- pass 1: per-MB prediction records (partition 1, SS11)
    mbs = []
    above_bmodes = [[B_DC_PRED] * 4 for _ in range(mb_w)]
    for my in range(mb_h):
        left_bmodes = [B_DC_PRED] * 4
        for mx in range(mb_w):
            seg = 0
            if hdr.seg_enabled and hdr.seg_update_map:
                if not bd.get_bool(hdr.seg_tree_probs[0]):
                    seg = bd.get_bool(hdr.seg_tree_probs[1])
                else:
                    seg = 2 + bd.get_bool(hdr.seg_tree_probs[2])
            skip = bd.get_bool(hdr.prob_skip_false) if hdr.mb_no_skip else 0
            ymode = bd.read_tree(KF_YMODE_TREE, KF_YMODE_PROB)
            if ymode == B_PRED:
                bmodes = []
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    above = bmodes[sb - 4] if r > 0 else above_bmodes[mx][c]
                    left = bmodes[sb - 1] if c > 0 else left_bmodes[r]
                    bmodes.append(bd.read_tree(
                        BMODE_TREE, KF_BMODE_PROBS[above][left]))
            else:
                implied = {DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
                           H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED}[ymode]
                bmodes = [implied] * 16
            above_bmodes[mx] = bmodes[12:16]
            left_bmodes = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]
            uvmode = bd.read_tree(UV_MODE_TREE, KF_UV_MODE_PROB)
            mbs.append((seg, skip, ymode, bmodes, uvmode))

    seg_dq = []
    for s in range(4):
        if hdr.seg_enabled:
            qi = hdr.seg_q[s] if hdr.seg_abs else hdr.q_index + hdr.seg_q[s]
        else:
            qi = hdr.q_index
        seg_dq.append(dequant_factors(_clamp_q(qi), hdr.q_deltas))

    # ---- pass 2: residual decode + reconstruction
    ypl = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
    upl = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
    vpl = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
    above_nz = [np.zeros(9, np.int32) for _ in range(mb_w)]  # 4Y 2U 2V Y2
    mb_filter_info = []
    probs = hdr.coeff_probs
    for my in range(mb_h):
        left_nz = np.zeros(9, np.int32)
        tb = parts[my % nparts]
        for mx in range(mb_w):
            seg, skip, ymode, bmodes, uvmode = mbs[my * mb_w + mx]
            dq = seg_dq[seg]
            has_y2 = ymode != B_PRED
            blocks = np.zeros((25, 16), np.int32)  # 16 Y, 4 U, 4 V, Y2
            eobtotal = 0
            if not skip:
                if has_y2:
                    ctx = int(left_nz[8] + above_nz[mx][8])
                    c, eob = _decode_block_coeffs(
                        tb, probs, PLANE_Y2, ctx, 0, dq["y2"])
                    nz = int(c.any())
                    left_nz[8] = above_nz[mx][8] = nz
                    blocks[24] = c
                    eobtotal += eob
                    ytype, first = PLANE_Y_AFTER_Y2, 1
                else:
                    ytype, first = PLANE_Y_NO_Y2, 0
                for sb in range(16):
                    r, c4 = sb >> 2, sb & 3
                    ctx = int(left_nz[r] + above_nz[mx][c4])
                    c, eob = _decode_block_coeffs(
                        tb, probs, ytype, ctx, first, dq["y1"])
                    nz = int(c.any())
                    left_nz[r] = above_nz[mx][c4] = nz
                    blocks[sb] = c
                    eobtotal += eob
                for base, off in ((16, 4), (20, 6)):
                    for sb in range(4):
                        r, c4 = sb >> 1, sb & 1
                        ctx = int(left_nz[off + r] + above_nz[mx][off + c4])
                        c, eob = _decode_block_coeffs(
                            tb, probs, PLANE_UV, ctx, 0, dq["uv"])
                        nz = int(c.any())
                        left_nz[off + r] = above_nz[mx][off + c4] = nz
                        blocks[base + sb] = c
                        eobtotal += eob
            else:
                # skipped MB: clear subblock contexts; the Y2 context is
                # cleared only when this MB carries a Y2 block (SS13.1)
                left_nz[:8] = 0
                above_nz[mx][:8] = 0
                if has_y2:
                    left_nz[8] = above_nz[mx][8] = 0
            if has_y2 and not skip:
                dcs = iwht4x4(blocks[24])
                for sb in range(16):
                    blocks[sb][0] = dcs[sb]
            res = None if skip else idct4x4_batch(blocks[:24])
            _reconstruct_mb(ypl, upl, vpl, mx, my, mb_w,
                            ymode, bmodes, uvmode, res)
            mb_filter_info.append((seg, ymode, eobtotal > 0))

    if hdr.filter_level:
        _loop_filter(ypl, upl, vpl, mb_w, mb_h, hdr, mb_filter_info)

    return _yuv420_to_rgb(
        ypl[:h, :w],
        upl[: (h + 1) // 2, : (w + 1) // 2],
        vpl[: (h + 1) // 2, : (w + 1) // 2],
    )


def _mb_edges(plane, y0, x0, size, mx, my):
    """(above, left, top_left) for a whole-block prediction, with the
    RFC border conventions (top row 127, left col 129)."""
    above = plane[y0 - 1, x0: x0 + size].astype(np.int32) if my > 0 else None
    left = plane[y0: y0 + size, x0 - 1].astype(np.int32) if mx > 0 else None
    if my > 0 and mx > 0:
        tl = int(plane[y0 - 1, x0 - 1])
    elif my > 0:
        tl = 129
    else:
        tl = 127
    return above, left, tl


def _reconstruct_mb(ypl, upl, vpl, mx, my, mb_w,
                    ymode, bmodes, uvmode, res) -> None:
    """``res``: (24, 4, 4) int32 batched IDCT residuals (16 Y, 4 U,
    4 V), or None for a skipped macroblock."""
    y0, x0 = my * 16, mx * 16
    skip = res is None
    if ymode != B_PRED:
        above, left, tl = _mb_edges(ypl, y0, x0, 16, mx, my)
        out = _pred_block(ymode, above, left, tl, 16).copy()
        if not skip:
            # (4,4,4,4) residual grid -> one 16x16 add
            out += res[:16].reshape(4, 4, 4, 4).transpose(
                0, 2, 1, 3).reshape(16, 16)
        ypl[y0: y0 + 16, x0: x0 + 16] = np.clip(out, 0, 255).astype(np.uint8)
    else:
        # subblock reconstruction with the spec's above-right rules:
        # buf[0] holds the above row + 4 above-right pixels; rightmost
        # subblocks always take above-right from the row ABOVE the MB
        buf = np.empty((17, 21), np.int32)
        if my > 0:
            buf[0, 0] = ypl[y0 - 1, x0 - 1] if mx > 0 else 129
            buf[0, 1:17] = ypl[y0 - 1, x0: x0 + 16]
            if mx < mb_w - 1:
                buf[0, 17:21] = ypl[y0 - 1, x0 + 16: x0 + 20]
            else:
                buf[0, 17:21] = ypl[y0 - 1, x0 + 15]
        else:
            buf[0, :] = 127
        buf[1:, 0] = (ypl[y0: y0 + 16, x0 - 1].astype(np.int32)
                      if mx > 0 else 129)
        for sb in range(16):
            r, c = sb >> 2, sb & 3
            a = buf[r * 4, c * 4 + 1: c * 4 + 5]
            al = int(buf[r * 4, c * 4])
            lf = buf[r * 4 + 1: r * 4 + 5, c * 4]
            ar = buf[0, 17:21] if c == 3 else buf[r * 4, c * 4 + 5: c * 4 + 9]
            p = _pred4(bmodes[sb], a, al, lf, ar)
            if not skip:
                p = p + res[sb]
            buf[r * 4 + 1: r * 4 + 5, c * 4 + 1: c * 4 + 5] = np.clip(
                p, 0, 255)
        ypl[y0: y0 + 16, x0: x0 + 16] = buf[1:, 1:17].astype(np.uint8)
    cy0, cx0 = my * 8, mx * 8
    for plane, base in ((upl, 16), (vpl, 20)):
        above, left, tl = _mb_edges(plane, cy0, cx0, 8, mx, my)
        out = _pred_block(uvmode, above, left, tl, 8).copy()
        if not skip:
            out += res[base: base + 4].reshape(2, 2, 4, 4).transpose(
                0, 2, 1, 3).reshape(8, 8)
        plane[cy0: cy0 + 8, cx0: cx0 + 8] = np.clip(out, 0, 255).astype(
            np.uint8)


# ---------------------------------------------------------------- colorspace
def _yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Studio-swing BT.601 YUV420 -> RGB888 (integer Q14)."""
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, 0), 2, 1)[:h, :w].astype(np.int32) - 128
    vv = np.repeat(np.repeat(v, 2, 0), 2, 1)[:h, :w].astype(np.int32) - 128
    yy = (y.astype(np.int32) - 16) * 19077  # 1.164 in Q14
    r = (yy + 26149 * vv + 8192) >> 14  # + 1.596 V
    g = (yy - 6419 * uu - 13320 * vv + 8192) >> 14  # - .391 U - .813 V
    b = (yy + 33050 * uu + 8192) >> 14  # + 2.018 U
    return np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)


def _rgb_to_yuv420(img: np.ndarray):
    """RGB888 -> studio-swing BT.601 YUV420 (encoder side)."""
    r = img[:, :, 0].astype(np.int64)
    g = img[:, :, 1].astype(np.int64)
    b = img[:, :, 2].astype(np.int64)
    y = (16384 * 16 + 4211 * r + 8258 * g + 1606 * b + 8192) >> 14
    u = (16384 * 128 - 2425 * r - 4768 * g + 7193 * b + 8192) >> 14
    v = (16384 * 128 + 7193 * r - 6029 * g - 1163 * b + 8192) >> 14
    y = np.clip(y, 0, 255).astype(np.uint8)
    h, w = y.shape
    ch, cw = (h + 1) // 2, (w + 1) // 2
    up = np.pad(np.clip(u, 0, 255).astype(np.float64),
                ((0, h % 2), (0, w % 2)), mode="edge")
    vp = np.pad(np.clip(v, 0, 255).astype(np.float64),
                ((0, h % 2), (0, w % 2)), mode="edge")
    u2 = ((up[0::2, 0::2] + up[0::2, 1::2] + up[1::2, 0::2]
           + up[1::2, 1::2]) / 4.0).round().astype(np.uint8)
    v2 = ((vp[0::2, 0::2] + vp[0::2, 1::2] + vp[1::2, 0::2]
           + vp[1::2, 1::2]) / 4.0).round().astype(np.uint8)
    return y, u2[:ch, :cw], v2[:ch, :cw]


# ---------------------------------------------------------------- encoder
def _quantize(coeffs: np.ndarray, dqf: tuple[int, int],
              first: int) -> np.ndarray:
    """Truncate-toward-zero quantization -> (16,) int32 quantized levels
    in ZIGZAG scan order starting at `first` (earlier positions 0)."""
    q = np.empty(16, np.int64)
    for i in range(first, 16):
        c = int(coeffs[ZIGZAG[i]])
        fac = dqf[0] if i == 0 else dqf[1]
        lvl = int(c / fac)  # trunc toward zero
        q[i] = max(-2047 - 67, min(2047 + 67, lvl))
    q[:first] = 0
    return q.astype(np.int32)


def _encode_block_tokens(be: BoolEncoder, probs, plane: int, ctx: int,
                         first: int, qlevels: np.ndarray) -> int:
    """Token-encode one block's zigzag levels; mirrors the decoder's
    tree-entry/context tracking exactly.  Returns block nz flag."""
    last = -1
    for i in range(15, first - 1, -1):
        if qlevels[i]:
            last = i
            break
    i = first
    start = 0
    nz = ctx
    while i <= last:
        v = int(qlevels[i])
        band = COEFF_BANDS[i]
        p = probs[plane][band][nz]
        av = abs(v)
        if av == 0:
            be.write_tree(COEFF_TREE, p, ZERO_TOK, start)
            nz = 0
            start = 2
            i += 1
            continue
        if av <= 4:
            tok = av  # ONE..FOUR
        elif av <= 6:
            tok = CAT1
        elif av <= 10:
            tok = CAT2
        elif av <= 18:
            tok = CAT3
        elif av <= 34:
            tok = CAT4
        elif av <= 66:
            tok = CAT5
        else:
            tok = CAT6
        be.write_tree(COEFF_TREE, p, tok, start)
        if tok >= CAT1:
            extra = av - CAT_BASE[tok]
            cps = CAT_PROBS[tok]
            for bidx, pb in enumerate(cps):
                be.put_bool(pb, (extra >> (len(cps) - 1 - bidx)) & 1)
        be.put_bool(128, 1 if v < 0 else 0)
        nz = 1 if av == 1 else 2
        start = 0
        i += 1
    if last < 15:
        band = COEFF_BANDS[i]
        p = probs[plane][band][nz]
        be.write_tree(COEFF_TREE, p, EOB_TOK, start)
    return int(last >= first)


def encode_vp8(img: np.ndarray, q_index: int = 40,
               n_token_parts: int = 1, filter_level: int = 0,
               filter_simple: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB -> VP8 keyframe bytes ('VP8 ' chunk body).
    Minimal conforming encoder: DC_PRED 16x16 everywhere, default
    probabilities.  ``n_token_parts`` (1/2/4/8) splits coefficient rows
    across token partitions (row i -> partition i mod n) the way real
    encoders do for parallel decode.  ``filter_level``/``filter_simple``
    signal in-loop deblocking: for a still image the filter only smooths
    the decoder's OUTPUT (intra prediction uses unfiltered pixels), so
    any level stays conforming."""
    if n_token_parts not in (1, 2, 4, 8):
        raise ValueError("n_token_parts must be 1, 2, 4 or 8")
    img = np.ascontiguousarray(img)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    h, w = img.shape[:2]
    if not (0 < w <= 0x3FFF and 0 < h <= 0x3FFF):
        raise ValueError("image exceeds VP8 14-bit dimensions")
    y, u, v = _rgb_to_yuv420(img)
    mb_w, mb_h = (w + 15) >> 4, (h + 15) >> 4
    ypad = np.pad(y, ((0, mb_h * 16 - h), (0, mb_w * 16 - w)), mode="edge")
    upad = np.pad(u, ((0, mb_h * 8 - u.shape[0]),
                      (0, mb_w * 8 - u.shape[1])), mode="edge")
    vpad = np.pad(v, ((0, mb_h * 8 - v.shape[0]),
                      (0, mb_w * 8 - v.shape[1])), mode="edge")
    dq = dequant_factors(q_index, dict.fromkeys(
        ("y1dc", "y2dc", "y2ac", "uvdc", "uvac"), 0))

    # ---- partition 1: header + per-MB modes
    be = BoolEncoder()
    be.put_bool(128, 0)  # color space
    be.put_bool(128, 0)  # clamping
    be.put_bool(128, 0)  # segmentation off
    be.put_bool(128, 1 if filter_simple else 0)  # filter profile
    be.put_literal(filter_level & 63, 6)
    be.put_literal(0, 3)  # sharpness
    be.put_bool(128, 0)  # lf deltas off
    be.put_literal({1: 0, 2: 1, 4: 2, 8: 3}[n_token_parts], 2)
    be.put_literal(q_index, 7)
    for _ in range(5):
        be.put_bool(128, 0)  # no quantizer deltas
    be.put_bool(128, 1)  # refresh entropy (stills: ignored)
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for p in range(11):
                    be.put_bool(COEFF_UPDATE_PROBS[t][b][c][p], 0)
    be.put_bool(128, 0)  # mb_no_coeff_skip off (every MB carries tokens)
    for _ in range(mb_w * mb_h):
        be.write_tree(KF_YMODE_TREE, KF_YMODE_PROB, DC_PRED)
        be.write_tree(UV_MODE_TREE, KF_UV_MODE_PROB, DC_PRED)

    # ---- token partitions + reconstruction-in-lockstep
    tps = [BoolEncoder() for _ in range(n_token_parts)]
    probs = DEFAULT_COEFF_PROBS
    recon_y = np.zeros_like(ypad)
    recon_u = np.zeros_like(upad)
    recon_v = np.zeros_like(vpad)
    above_nz = [np.zeros(9, np.int32) for _ in range(mb_w)]
    for my in range(mb_h):
        left_nz = np.zeros(9, np.int32)
        tp = tps[my % n_token_parts]
        for mx in range(mb_w):
            y0, x0 = my * 16, mx * 16
            cy0, cx0 = my * 8, mx * 8
            above, left, tl = _mb_edges(recon_y, y0, x0, 16, mx, my)
            pred_y = _pred_block(DC_PRED, above, left, tl, 16)
            res = ypad[y0: y0 + 16, x0: x0 + 16].astype(np.int32) - pred_y
            ycoefs = []
            dcs = np.empty(16, np.int32)
            for sb in range(16):
                r, c = sb >> 2, sb & 3
                co = fdct4x4(res[r * 4: r * 4 + 4, c * 4: c * 4 + 4])
                dcs[sb] = co[0]
                ycoefs.append(co)
            y2_raster = fwht4x4(dcs)
            y2q = np.zeros(16, np.int32)
            for i in range(16):
                c = int(y2_raster[ZIGZAG[i]])
                fac = dq["y2"][0] if i == 0 else dq["y2"][1]
                y2q[i] = max(-2114, min(2114, int(c / fac)))
            ctx = int(left_nz[8] + above_nz[mx][8])
            nzf = _encode_block_tokens(tp, probs, PLANE_Y2, ctx, 0, y2q)
            left_nz[8] = above_nz[mx][8] = nzf
            # dequantized y2 -> reconstructed DC per Y block
            y2d = np.zeros(16, np.int32)
            for i in range(16):
                fac = dq["y2"][0] if i == 0 else dq["y2"][1]
                y2d[ZIGZAG[i]] = y2q[i] * fac
            rec_dcs = iwht4x4(y2d)
            out = pred_y.copy()
            yq_list = []
            for sb in range(16):
                qb = _quantize(ycoefs[sb], dq["y1"], 1)
                yq_list.append(qb)
                deq = np.zeros(16, np.int32)
                for i in range(1, 16):
                    deq[ZIGZAG[i]] = qb[i] * dq["y1"][1]
                deq[0] = rec_dcs[sb]
                r, c = sb >> 2, sb & 3
                out[r * 4: r * 4 + 4, c * 4: c * 4 + 4] += idct4x4(deq)
            for sb in range(16):
                r, c4 = sb >> 2, sb & 3
                ctx = int(left_nz[r] + above_nz[mx][c4])
                nzf = _encode_block_tokens(
                    tp, probs, PLANE_Y_AFTER_Y2, ctx, 1, yq_list[sb])
                left_nz[r] = above_nz[mx][c4] = nzf
            recon_y[y0: y0 + 16, x0: x0 + 16] = np.clip(out, 0, 255).astype(
                np.uint8)
            for plane, recon, off in ((upad, recon_u, 4), (vpad, recon_v, 6)):
                above, left, tl = _mb_edges(recon, cy0, cx0, 8, mx, my)
                pred = _pred_block(DC_PRED, above, left, tl, 8)
                resc = plane[cy0: cy0 + 8, cx0: cx0 + 8].astype(
                    np.int32) - pred
                outc = pred.copy()
                for sb in range(4):
                    r, c = sb >> 1, sb & 1
                    co = fdct4x4(resc[r * 4: r * 4 + 4, c * 4: c * 4 + 4])
                    qb = _quantize(co, dq["uv"], 0)
                    ctx = int(left_nz[off + r] + above_nz[mx][off + c])
                    nzf = _encode_block_tokens(
                        tp, probs, PLANE_UV, ctx, 0, qb)
                    left_nz[off + r] = above_nz[mx][off + c] = nzf
                    deq = np.zeros(16, np.int32)
                    for i in range(16):
                        fac = dq["uv"][0] if i == 0 else dq["uv"][1]
                        deq[ZIGZAG[i]] = qb[i] * fac
                    outc[r * 4: r * 4 + 4, c * 4: c * 4 + 4] += idct4x4(deq)
                recon[cy0: cy0 + 8, cx0: cx0 + 8] = np.clip(
                    outc, 0, 255).astype(np.uint8)

    part1 = be.finish()
    parts = [t.finish() for t in tps]
    sizes = b"".join(
        bytes([len(p) & 0xFF, (len(p) >> 8) & 0xFF, (len(p) >> 16) & 0xFF])
        for p in parts[:-1]
    )
    tag = (len(part1) << 5) | (1 << 4) | 0  # show_frame, version 0, keyframe
    head = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    head += b"\x9d\x01\x2a"
    head += struct.pack("<HH", w, h)
    return head + part1 + sizes + b"".join(parts)
