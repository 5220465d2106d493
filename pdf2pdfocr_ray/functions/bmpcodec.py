"""Windows BMP codec — pure numpy/stdlib.

The reference reads BMP for free via ImageMagick's dispatch
(/root/reference/pdf2pdfocr.py:1133-1141); here the engine decodes it
in-process.  Decode: BITMAPINFOHEADER (and the V4/V5 supersets), bit
depths 1/4/8 (palettized), 24 and 32 (BGR(A)), BI_RGB and BI_RLE8,
bottom-up and top-down row order, 4-byte row padding.  Encode: 24-bit
BI_RGB (the interchange baseline).  Everything except RLE8 run
expansion is vectorized numpy.
"""

from __future__ import annotations

import struct

import numpy as np

BMP_MAGIC = b"BM"

BI_RGB = 0
BI_RLE8 = 1


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes -> (H, W, 3) uint8 RGB."""
    if payload[:2] != BMP_MAGIC or len(payload) < 54:
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"BMP: unsupported header size {hdr_size} (OS/2?)")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    comp = struct.unpack_from("<I", payload, 30)[0]
    n_colors = struct.unpack_from("<I", payload, 46)[0]
    if w <= 0 or h_raw == 0:
        raise ValueError("BMP: bad dimensions")
    top_down = h_raw < 0
    h = abs(h_raw)
    from .limits import guard_dims

    guard_dims(w, h, "BMP")
    if planes != 1:
        raise ValueError("BMP: planes != 1")
    if comp not in (BI_RGB, BI_RLE8):
        raise ValueError(f"BMP: unsupported compression {comp}")
    if comp == BI_RLE8 and bpp != 8:
        raise ValueError("BMP: RLE8 requires 8 bpp")

    palette = None
    if bpp <= 8:
        n = n_colors or (1 << bpp)
        pal_off = 14 + hdr_size
        raw = np.frombuffer(payload, np.uint8, n * 4, offset=pal_off)
        palette = raw.reshape(n, 4)[:, [2, 1, 0]].copy()  # BGRX -> RGB

    if comp == BI_RLE8:
        idx = _decode_rle8(payload[data_off:], w, h)
    else:
        row_bytes = (w * bpp + 7) // 8
        stride = (row_bytes + 3) & ~3
        need = stride * h
        raw = np.frombuffer(payload, np.uint8, need, offset=data_off)
        rows = raw.reshape(h, stride)[:, :row_bytes]
        if bpp == 24:
            img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
        elif bpp == 32:
            img = rows.reshape(h, w, 4)[:, :, [2, 1, 0]]
        elif bpp == 8:
            idx = rows[:, :w]
            img = None
        elif bpp == 4:
            hi = rows >> 4
            lo = rows & 0x0F
            idx = np.empty((h, row_bytes * 2), np.uint8)
            idx[:, 0::2] = hi
            idx[:, 1::2] = lo
            idx = idx[:, :w]
            img = None
        elif bpp == 1:
            bits = np.unpackbits(rows, axis=1)
            idx = bits[:, :w]
            img = None
        else:
            raise ValueError(f"BMP: unsupported bit depth {bpp}")
        if img is None:
            img = palette[np.minimum(idx, len(palette) - 1)]
        if not top_down:
            img = img[::-1]
        return np.ascontiguousarray(img, dtype=np.uint8)

    img = palette[np.minimum(idx, len(palette) - 1)]
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img, dtype=np.uint8)


def _decode_rle8(data: bytes, w: int, h: int) -> np.ndarray:
    """BI_RLE8 -> (h, w) uint8 index raster (bottom-up order as stored)."""
    out = np.zeros((h, w), np.uint8)
    x = y = 0
    pos = 0
    n = len(data)
    while pos + 1 < n:
        count = data[pos]
        val = data[pos + 1]
        pos += 2
        if count > 0:  # run
            end = min(x + count, w)
            if y < h:
                out[y, x:end] = val
            x = end
            continue
        if val == 0:  # end of line
            x = 0
            y += 1
            if y >= h:
                break
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if pos + 1 >= n:
                break
            x = min(x + data[pos], w)
            y = min(y + data[pos + 1], h - 1)
            pos += 2
        else:  # absolute mode: val literal pixels, padded to word
            take = min(val, n - pos)
            lit = np.frombuffer(data, np.uint8, take, offset=pos)
            end = min(x + take, w)
            if y < h:
                out[y, x:end] = lit[: end - x]
            x = end
            pos += (val + 1) & ~1
    return out


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit BI_RGB BMP bytes (bottom-up)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_bmp: need (H, W, 3) uint8")
    h, w = img.shape[:2]
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :row_bytes] = img[::-1, :, ::-1].reshape(h, row_bytes)  # RGB->BGR
    pix = rows.tobytes()
    off = 14 + 40
    hdr = BMP_MAGIC + struct.pack("<IHHI", off + len(pix), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, BI_RGB,
                       len(pix), 2835, 2835, 0, 0)
    return hdr + info + pix
