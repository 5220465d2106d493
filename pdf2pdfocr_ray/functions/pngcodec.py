"""Minimal pure-python PNG codec (RGB8, filter 0) over numpy + zlib.

The container has no image libraries (no PIL), so page images travel through
the pipeline as real PNG bytes produced/consumed here.  Encoder always writes
8-bit RGB with scanline filter 0; the decoder accepts filters 0-2 (None, Sub,
Up), which covers everything this engine emits.

This replaces the reference's on-disk JPEG page files
(/root/reference/pdf2pdfocr.py:70, 477-478 — jpg chosen there to bound temp
disk; here compressed bytes bound Arrow block size in the object store).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png(img: np.ndarray, compress_level: int = 6) -> bytes:
    """RGB uint8 (h, w, 3) array -> PNG bytes (filter 0 scanlines)."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected uint8 (h,w,3) array, got {img.dtype} {img.shape}")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, colortype 2 (RGB)
    # prepend filter byte 0 to every scanline, vectorized
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return _MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> RGB uint8 (h, w, 3). Supports 8-bit RGB, filters 0/1/2."""
    if not data.startswith(_MAGIC):
        raise ValueError("not a PNG (bad magic)")
    pos = len(_MAGIC)
    width = height = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bitdepth, colortype, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if bitdepth != 8 or colortype != 2 or interlace != 0:
                raise ValueError(
                    f"unsupported PNG: bitdepth={bitdepth} colortype={colortype} "
                    f"interlace={interlace} (codec handles 8-bit RGB only)"
                )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = 1 + width * 3
    if len(raw) != height * stride:
        raise ValueError("PNG IDAT length mismatch")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride)
    filters = lines[:, 0]
    out = np.empty((height, width * 3), dtype=np.uint8)
    if not filters.any():  # fast path: all filter 0 (what encode_png writes)
        out[:] = lines[:, 1:]
    else:
        prev = np.zeros(width * 3, dtype=np.uint8)
        for y in range(height):
            cur = lines[y, 1:].copy()
            f = filters[y]
            if f == 0:
                pass
            elif f == 1:  # Sub
                cur = cur.astype(np.int64)
                for x in range(3, width * 3):
                    cur[x] = (cur[x] + cur[x - 3]) & 0xFF
                cur = cur.astype(np.uint8)
            elif f == 2:  # Up
                cur = (cur.astype(np.int64) + prev) & 0xFF
                cur = cur.astype(np.uint8)
            else:
                raise ValueError(f"unsupported PNG filter {f}")
            out[y] = cur
            prev = out[y]
    return out.reshape(height, width, 3)
