"""Netpbm (PNM) codec — pure numpy/stdlib.

PPM is exactly what the reference's rasterizer emits: ``pdftoppm`` writes
P6 portable pixmaps that ImageMagick then consumes
(/root/reference/pdf2pdfocr.py:56-75, 1133-1141).  The engine reads the
whole family in-process: binary P4 (packed bitmap), P5 (greymap), P6
(pixmap) and the ASCII variants P1/P2/P3, maxval <= 65535 (16-bit
big-endian samples are scaled to 8).  Encode: P6 binary (the pdftoppm
interchange format).
"""

from __future__ import annotations

import re

import numpy as np

PNM_MAGIC_RE = re.compile(rb"^P[1-6][\s#]")


def _tokens(payload: bytes, start: int, count: int):
    """Yield `count` whitespace-separated tokens after `start`, skipping
    '#' comments; returns (values, next_pos)."""
    vals = []
    pos = start
    n = len(payload)
    while len(vals) < count:
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < n and payload[pos] == 0x23:  # '#'
            while pos < n and payload[pos] != 0x0A:
                pos += 1
            continue
        tok_start = pos
        while pos < n and not payload[pos : pos + 1].isspace():
            pos += 1
        if pos == tok_start:
            raise ValueError("PNM: truncated header")
        vals.append(int(payload[tok_start:pos]))
    return vals, pos


def decode_pnm(payload: bytes) -> np.ndarray:
    """PNM bytes -> (H, W, 3) uint8 RGB."""
    if len(payload) < 2 or payload[0] != 0x50:  # 'P'
        raise ValueError("not a PNM")
    kind = payload[1] - 0x30
    if kind not in (1, 2, 3, 4, 5, 6):
        raise ValueError(f"PNM: unknown magic P{kind}")
    (w, h), pos = _tokens(payload, 2, 2)
    if w <= 0 or h <= 0:
        raise ValueError("PNM: bad dimensions")
    from .limits import guard_dims

    guard_dims(w, h, "PNM")
    maxval = 1
    if kind not in (1, 4):
        (maxval,), pos = _tokens(payload, pos, 1)
        if not 1 <= maxval <= 65535:
            raise ValueError(f"PNM: bad maxval {maxval}")

    if kind in (1, 2, 3):  # ASCII
        per_px = 3 if kind == 3 else 1
        vals, _ = _tokens(payload, pos, w * h * per_px)
        arr = np.asarray(vals, np.int64)
    else:  # binary: exactly ONE whitespace byte after the header
        pos += 1
        if kind == 4:
            row_bytes = (w + 7) // 8
            raw = np.frombuffer(payload, np.uint8, row_bytes * h, offset=pos)
            bits = np.unpackbits(raw.reshape(h, row_bytes), axis=1)[:, :w]
            arr = bits.astype(np.int64).reshape(-1)
        else:
            per_px = 3 if kind == 6 else 1
            count = w * h * per_px
            if maxval > 255:  # 16-bit big-endian samples
                raw = np.frombuffer(payload, ">u2", count, offset=pos)
            else:
                raw = np.frombuffer(payload, np.uint8, count, offset=pos)
            arr = raw.astype(np.int64)

    if kind in (1, 4):  # bitmap: 1 = black per spec
        grey = np.where(arr == 1, 0, 255).astype(np.uint8)
        img = grey.reshape(h, w)
        return np.ascontiguousarray(np.repeat(img[:, :, None], 3, axis=2))
    scaled = (arr * 255 // maxval).astype(np.uint8) if maxval != 255 else arr.astype(np.uint8)
    if kind in (3, 6):
        return np.ascontiguousarray(scaled.reshape(h, w, 3))
    img = scaled.reshape(h, w)
    return np.ascontiguousarray(np.repeat(img[:, :, None], 3, axis=2))


def encode_pnm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> binary P6 PPM bytes (pdftoppm's format)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_pnm: need (H, W, 3) uint8")
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()
