"""ICO (favicon) codec — pure numpy/stdlib.

Web crawls fetch favicons constantly; ICO files carry one or more
directory entries whose payloads are either embedded PNG streams or
BMP DIBs (a BITMAPINFOHEADER with DOUBLED height covering the XOR color
plane plus a 1-bit AND transparency mask, and no BITMAPFILEHEADER).

``decode_ico`` returns the LARGEST image (the usual consumer choice),
decoded to (H, W, 3) uint8 RGB with the AND mask composited over white.
``encode_ico`` writes PNG-payload entries (the modern favicon layout).
"""

from __future__ import annotations

import struct

import numpy as np

from .pngcodec import _MAGIC as _PNG_MAGIC
from .pngcodec import decode_png, encode_png


def sniff_ico(payload: bytes) -> bool:
    """ICO magic: reserved 0, type 1, count >= 1 — plus a sane first
    directory entry (the 6-byte prefix alone is too weak for crawls)."""
    if len(payload) < 22 or payload[:4] != b"\x00\x00\x01\x00":
        return False
    (count,) = struct.unpack_from("<H", payload, 4)
    if not 1 <= count <= 64:
        return False
    size, off = struct.unpack_from("<II", payload, 6 + 8)
    return 0 < size <= len(payload) and 6 + 16 * count <= off <= len(payload)


def decode_ico(payload: bytes) -> np.ndarray:
    """ICO bytes -> (H, W, 3) uint8 RGB of the largest entry."""
    if not sniff_ico(payload):
        raise ValueError("not an ICO file")
    (count,) = struct.unpack_from("<H", payload, 4)
    best = None
    best_px = -1
    for i in range(count):
        w, h, _ncol, _rsv, _planes, _bpp, size, off = struct.unpack_from(
            "<BBBBHHII", payload, 6 + 16 * i)
        w = w or 256
        h = h or 256
        if w * h > best_px:
            best_px = w * h
            best = (w, h, payload[off : off + size])
    if best is None:
        raise ValueError("ICO: no entries")
    w, h, blob = best
    if blob.startswith(_PNG_MAGIC):
        return decode_png(blob)
    return _decode_ico_dib(blob, w, h)


def _decode_ico_dib(blob: bytes, w: int, h: int) -> np.ndarray:
    """BMP DIB entry: BITMAPINFOHEADER with biHeight = 2*h (XOR plane +
    AND mask), bottom-up, palette for <= 8 bpp; AND-mask bits composite
    the pixel to white (the browser-over-page convention)."""
    if len(blob) < 40:
        raise ValueError("ICO: truncated DIB")
    hdr_size, biw, bih2 = struct.unpack_from("<Iii", blob, 0)
    planes, bpp = struct.unpack_from("<HH", blob, 12)
    comp = struct.unpack_from("<I", blob, 16)[0]
    if hdr_size < 40 or comp != 0:
        raise ValueError(f"ICO: unsupported DIB (hdr={hdr_size}, comp={comp})")
    # trust the DIB, not the byte-sized directory fields: biHeight spans
    # the XOR plane plus the AND mask, so the true height is half of it
    w = biw
    h = abs(bih2) // 2
    pos = hdr_size
    palette = None
    if bpp <= 8:
        n = struct.unpack_from("<I", blob, 32)[0] or (1 << bpp)
        raw = np.frombuffer(blob, np.uint8, n * 4, offset=pos)
        palette = raw.reshape(n, 4)[:, [2, 1, 0]].copy()
        pos += n * 4

    def rows(bits_per_px: int, height: int) -> np.ndarray:
        nonlocal pos
        row_bytes = (w * bits_per_px + 7) // 8
        stride = (row_bytes + 3) & ~3
        need = stride * height
        raw = np.frombuffer(blob, np.uint8, need, offset=pos)
        pos += need
        return raw.reshape(height, stride)[:, :row_bytes]

    xor = rows(bpp, h)
    if bpp == 32:
        img = xor.reshape(h, w, 4)[:, :, [2, 1, 0]]
        alpha = xor.reshape(h, w, 4)[:, :, 3].astype(np.uint16)
        img = ((img.astype(np.uint16) * alpha[..., None]
                + 255 * (255 - alpha[..., None])) // 255).astype(np.uint8)
    elif bpp == 24:
        img = xor.reshape(h, w, 3)[:, :, ::-1]
    elif bpp == 8:
        img = palette[np.minimum(xor[:, :w], len(palette) - 1)]
    elif bpp == 4:
        hi, lo = xor >> 4, xor & 0x0F
        idx = np.empty((h, xor.shape[1] * 2), np.uint8)
        idx[:, 0::2] = hi
        idx[:, 1::2] = lo
        img = palette[np.minimum(idx[:, :w], len(palette) - 1)]
    elif bpp == 1:
        bits = np.unpackbits(xor, axis=1)[:, :w]
        img = palette[np.minimum(bits, len(palette) - 1)]
    else:
        raise ValueError(f"ICO: unsupported bit depth {bpp}")
    # AND mask (1 bpp): set pixels -> transparent -> white
    if pos < len(blob) and bpp != 32:
        mask = np.unpackbits(rows(1, h), axis=1)[:, :w]
        img = img.copy()
        img[mask.astype(bool)] = 255
    return np.ascontiguousarray(img[::-1])  # bottom-up


def encode_ico(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB (<= 256 on each side) -> single-entry
    PNG-payload ICO bytes."""
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    if h > 256 or w > 256:
        raise ValueError("encode_ico: max 256x256")
    png = encode_png(img)
    hdr = b"\x00\x00\x01\x00\x01\x00"
    entry = struct.pack("<BBBBHHII", w % 256, h % 256, 0, 0, 1, 32,
                        len(png), 6 + 16)
    return hdr + entry + png
