"""Pure-python PNG codec over numpy + zlib — full decode coverage.

The container has no image libraries (no PIL), so page images travel through
the pipeline as real PNG bytes produced/consumed here, and external crawl
PNGs decode in-process.

Decode accepts the whole PNG spec surface a web crawl produces: color
types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA); bit
depths 1/2/4/8/16; scanline filters 0-4 (None/Sub/Up/Average/Paeth);
Adam7 interlacing; tRNS transparency (palette and color-key).  Alpha is
composited over white — the scan/web convention, matching the GIF
decoder's background handling.  Output is always (H, W, 3) uint8 RGB.

Encode writes 8-bit RGB, gray or palette, fixed or adaptive per-row
filters (0-4), optional Adam7 — enough to exercise every decode path
from the synthetic corpus.  The engine's own hot path stays the filter-0
RGB fast lane.

Defilter note: Sub is a strided prefix-sum (vectorized via cumsum);
Up is whole-row vectorized; Average and Paeth are sequential BY SPEC
along x (each pixel needs the already-reconstructed left neighbor), so
those rows run a per-byte loop — same as any scalar implementation.

This replaces the reference's on-disk JPEG page files
(/root/reference/pdf2pdfocr.py:70, 477-478 — jpg chosen there to bound temp
disk; here compressed bytes bound Arrow block size in the object store).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"

# Adam7: (x_start, x_step, y_start, y_step) per pass
_ADAM7 = (
    (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
    (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2),
)

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _filter_rows(raw: np.ndarray, bpp: int, filter_type) -> np.ndarray:
    """(h, w*ch) uint8 raster -> (h, 1 + w*ch) filtered scanlines.

    ``filter_type``: 0-4 fixed, or "adaptive" (minimum-sum-of-absolutes
    heuristic per row, what libpng does)."""
    h, rb = raw.shape
    a = np.zeros_like(raw)  # left neighbor
    a[:, bpp:] = raw[:, :-bpp]
    b = np.zeros_like(raw)  # up neighbor
    b[1:] = raw[:-1]
    c = np.zeros_like(raw)  # up-left
    c[1:, bpp:] = raw[:-1, :-bpp]
    ai = a.astype(np.int32)
    bi = b.astype(np.int32)
    ci = c.astype(np.int32)
    cand = np.empty((5, h, rb), np.uint8)
    cand[0] = raw
    cand[1] = raw - a
    cand[2] = raw - b
    cand[3] = raw - ((ai + bi) >> 1).astype(np.uint8)
    p = ai + bi - ci
    pa, pb, pc = np.abs(p - ai), np.abs(p - bi), np.abs(p - ci)
    pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    cand[4] = raw - pred
    if filter_type == "adaptive":
        # per-row: minimize sum of |signed byte| (the libpng heuristic)
        costs = np.abs(cand.astype(np.int8).astype(np.int32)).sum(axis=2)
        pick = costs.argmin(axis=0)
    else:
        pick = np.full(h, int(filter_type), np.int64)
    out = np.empty((h, 1 + rb), np.uint8)
    out[:, 0] = pick
    out[:, 1:] = cand[pick, np.arange(h)]
    return out


def encode_png(
    img: np.ndarray,
    compress_level: int = 6,
    *,
    colortype: str = "rgb",
    filter_type=0,
    interlace: bool = False,
) -> bytes:
    """RGB uint8 (h, w, 3) array -> PNG bytes.

    ``colortype``: "rgb" (type 2), "gray" (type 0; requires r==g==b),
    "palette" (type 3; requires <= 256 distinct colors).
    ``filter_type``: 0-4 fixed per-row filter or "adaptive".
    ``interlace``: Adam7.
    """
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected uint8 (h,w,3) array, got {img.dtype} {img.shape}")
    h, w = img.shape[:2]
    extra = b""
    if colortype == "rgb":
        ct, raster = 2, img  # (h, w, 3) pixel grid
    elif colortype == "gray":
        if not (img[..., 0] == img[..., 1]).all() or not (
            img[..., 1] == img[..., 2]
        ).all():
            raise ValueError("encode_png gray: image is not grayscale")
        ct, raster = 0, img[..., :1]
    elif colortype == "palette":
        colors, inv = np.unique(img.reshape(-1, 3), axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError(f"encode_png palette: {len(colors)} colors > 256")
        ct, raster = 3, inv.astype(np.uint8).reshape(h, w, 1)
        extra = _chunk(b"PLTE", colors.astype(np.uint8).tobytes())
    else:
        raise ValueError(f"encode_png: unknown colortype {colortype!r}")
    bpp = _CHANNELS[ct]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 1 if interlace else 0)
    if interlace:
        parts = []
        for x0, dx, y0, dy in _ADAM7:
            sub = raster[y0::dy, x0::dx]  # pixel-grid slice, THEN bytes
            if sub.size == 0:
                continue
            parts.append(_filter_rows(
                np.ascontiguousarray(sub.reshape(sub.shape[0], -1)),
                bpp, filter_type).tobytes())
        body = b"".join(parts)
    else:
        body = _filter_rows(
            np.ascontiguousarray(raster.reshape(h, -1)), bpp, filter_type
        ).tobytes()
    idat = zlib.compress(body, compress_level)
    return (_MAGIC + _chunk(b"IHDR", ihdr) + extra + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _defilter(lines: np.ndarray, bpp: int) -> np.ndarray:
    """(h, 1 + rb) filtered scanlines -> (h, rb) reconstructed bytes."""
    h = lines.shape[0]
    rb = lines.shape[1] - 1
    filters = lines[:, 0]
    out = np.empty((h, rb), dtype=np.uint8)
    if not filters.any():  # fast path: all filter 0 (what the engine emits)
        out[:] = lines[:, 1:]
        return out
    prev = np.zeros(rb, dtype=np.int32)
    for y in range(h):
        f = filters[y]
        cur = lines[y, 1:]
        if f == 0:
            row = cur.astype(np.int32)
        elif f == 1:  # Sub: strided prefix sum, vectorized
            row = cur.reshape(-1, bpp).astype(np.int64).cumsum(axis=0)
            row = (row & 0xFF).astype(np.int32).reshape(rb)
        elif f == 2:  # Up: whole-row vectorized
            row = (cur.astype(np.int32) + prev) & 0xFF
        elif f == 3:  # Average: sequential by spec (needs decoded left)
            c_ = cur.tolist()
            p_ = prev.tolist()
            o = [0] * rb
            for x in range(rb):
                left = o[x - bpp] if x >= bpp else 0
                o[x] = (c_[x] + ((left + p_[x]) >> 1)) & 0xFF
            row = np.asarray(o, np.int32)
        elif f == 4:  # Paeth: sequential by spec
            c_ = cur.tolist()
            p_ = prev.tolist()
            o = [0] * rb
            for x in range(rb):
                a = o[x - bpp] if x >= bpp else 0
                b = p_[x]
                c = p_[x - bpp] if x >= bpp else 0
                pp = a + b - c
                pa = pp - a if pp >= a else a - pp
                pb = pp - b if pp >= b else b - pp
                pc = pp - c if pp >= c else c - pp
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                o[x] = (c_[x] + pr) & 0xFF
            row = np.asarray(o, np.int32)
        else:
            raise ValueError(f"unsupported PNG filter {f}")
        out[y] = row.astype(np.uint8)
        prev = row
    return out


def _unpack_bits(rows: np.ndarray, w: int, depth: int) -> np.ndarray:
    """(h, rowbytes) packed sub-byte samples -> (h, w) uint8 sample values
    (NOT scaled)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, :w]
    bits = np.unpackbits(rows, axis=1)
    per = 8 // depth
    vals = bits.reshape(h, -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    samples = (vals * weights).sum(axis=2).astype(np.uint8)
    return samples[:, :w] if per else samples


def _pass_to_rgb(
    recon: np.ndarray, w: int, ct: int, depth: int,
    palette: np.ndarray | None, trns: bytes | None,
) -> np.ndarray:
    """Reconstructed bytes of one (sub)image -> (h, w, 3) uint8 RGB,
    alpha composited over white."""
    h = recon.shape[0]
    ch = _CHANNELS[ct]
    if depth == 16:
        samples = recon.reshape(h, -1, 2)[:, :, 0]  # MSB ~ value >> 8
        samples = samples.reshape(h, w, ch)
    elif depth == 8:
        samples = recon.reshape(h, w, ch)
    else:  # 1/2/4 — only color types 0 and 3 allow sub-byte depths
        samples = _unpack_bits(recon, w, depth)[:, :, None]

    if ct == 3:
        if palette is None:
            raise ValueError("PNG: palette image without PLTE")
        idx = samples[:, :, 0]
        rgb = palette[np.minimum(idx, len(palette) - 1)]
        if trns:
            alpha = np.frombuffer(trns, np.uint8)
            av = np.ones(len(palette), np.uint16) * 255
            av[: len(alpha)] = alpha
            a = av[np.minimum(idx, len(palette) - 1)][:, :, None]
            rgb = ((rgb.astype(np.uint16) * a + 255 * (255 - a)) // 255).astype(np.uint8)
        return np.ascontiguousarray(rgb)
    if ct == 0:
        g = samples[:, :, 0]
        if depth in (1, 2, 4):  # scale to full range
            g = (g.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if ct == 2:
        return np.ascontiguousarray(samples)
    if ct == 4:
        g = samples[:, :, 0].astype(np.uint16)
        a = samples[:, :, 1].astype(np.uint16)
        g = ((g * a + 255 * (255 - a)) // 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if ct == 6:
        rgb = samples[:, :, :3].astype(np.uint16)
        a = samples[:, :, 3:4].astype(np.uint16)
        return ((rgb * a + 255 * (255 - a)) // 255).astype(np.uint8)
    raise ValueError(f"PNG: unsupported color type {ct}")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB.  Full spec surface: color types
    0/2/3/4/6, depths 1-16, filters 0-4, Adam7, tRNS (over white)."""
    if not data.startswith(_MAGIC):
        raise ValueError("not a PNG (bad magic)")
    pos = len(_MAGIC)
    width = height = None
    depth = ct = interlace = 0
    palette = None
    trns = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ct, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            from .limits import guard_dims

            guard_dims(width, height, "PNG")
            if ct not in _CHANNELS:
                raise ValueError(f"PNG: bad color type {ct}")
            if depth not in (1, 2, 4, 8, 16):
                raise ValueError(f"PNG: bad bit depth {depth}")
            if depth < 8 and ct not in (0, 3):
                raise ValueError(f"PNG: depth {depth} invalid for type {ct}")
            if depth == 16 and ct == 3:
                raise ValueError("PNG: 16-bit palette is invalid")
        elif tag == b"PLTE":
            palette = np.frombuffer(payload, np.uint8).reshape(-1, 3).copy()
        elif tag == b"tRNS":
            trns = payload
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    from .limits import capped_inflate

    raw = capped_inflate(bytes(idat), "PNG IDAT")
    ch = _CHANNELS[ct]
    bits_pp = ch * depth
    bpp = max(1, bits_pp // 8)

    def rowbytes(w: int) -> int:
        return (w * bits_pp + 7) // 8

    if trns is not None and ct in (0, 2):
        # color-key transparency on gray/RGB: composite keyed pixels white
        key = np.frombuffer(trns, ">u2").astype(np.uint16)
        if ct == 0:
            key = np.repeat(key[:1], 3)
    else:
        key = None

    if not interlace:
        rb = rowbytes(width)
        expect = height * (1 + rb)
        if len(raw) < expect:
            raise ValueError("PNG IDAT too short")
        lines = np.frombuffer(raw, np.uint8, expect).reshape(height, 1 + rb)
        recon = _defilter(lines, bpp)
        img = _pass_to_rgb(recon, width, ct, depth, palette, trns)
        if key is not None and depth == 8:
            keyed = np.all(
                img == key.astype(np.uint8)[None, None, :3], axis=2)
            img = img.copy()
            img[keyed] = 255
        return img
    if interlace != 1:
        raise ValueError(f"PNG: bad interlace method {interlace}")
    out = np.zeros((height, width, 3), np.uint8)
    off = 0
    for x0, dx, y0, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        rb = rowbytes(pw)
        need = ph * (1 + rb)
        if off + need > len(raw):
            raise ValueError("PNG IDAT too short (interlaced)")
        lines = np.frombuffer(raw, np.uint8, need, offset=off).reshape(
            ph, 1 + rb)
        off += need
        recon = _defilter(lines, bpp)
        sub = _pass_to_rgb(recon, pw, ct, depth, palette, trns)
        out[y0::dy, x0::dx] = sub
    if key is not None and depth == 8:
        keyed = np.all(out == key.astype(np.uint8)[None, None, :3], axis=2)
        out[keyed] = 255
    return out


# ---------------------------------------------------------------------------
# APNG (acTL/fcTL/fdAT) — animated PNG, composed like GIF disposal
# ---------------------------------------------------------------------------

def decode_png_frames(data: bytes) -> list[np.ndarray]:
    """PNG bytes -> list of composed (h, w, 3) uint8 RGB frames.

    APNG animation: fcTL control chunks carry the frame rectangle,
    dispose_op (0 none / 1 background / 2 previous) and blend_op; frame
    pixels arrive in IDAT (first frame, when its fcTL precedes IDAT) or
    fdAT chunks (sequence number + IDAT-format data).  Each frame
    decodes as a standalone PNG against the shared IHDR parameters.
    blend_op=1 (over) is honest only without an alpha channel (decode
    composites alpha over white), so alpha+over raises.  Non-animated
    input returns a single frame."""
    if not data.startswith(_MAGIC):
        raise ValueError("not a PNG (bad magic)")
    pos = len(_MAGIC)
    ihdr_payload = None
    plte = trns = None
    actl = False
    fctls: list[dict] = []  # in stream order; each with "data" list
    idat_parts: list[bytes] = []
    idat_is_frame = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr_payload = payload
        elif tag == b"acTL":
            actl = True
        elif tag == b"PLTE":
            plte = payload
        elif tag == b"tRNS":
            trns = payload
        elif tag == b"fcTL":
            (seq, fw, fh, fx, fy, dn, dd, dispose, blend) = struct.unpack(
                ">IIIIIHHBB", payload)
            fctls.append({"w": fw, "h": fh, "x": fx, "y": fy,
                          "dispose": dispose, "blend": blend, "data": []})
            if not idat_parts:
                idat_is_frame = True  # first fcTL precedes IDAT
        elif tag == b"IDAT":
            if fctls and idat_is_frame:
                fctls[0]["data"].append(payload)
            idat_parts.append(payload)
        elif tag == b"fdAT":
            if not fctls:
                raise ValueError("APNG: fdAT before any fcTL")
            fctls[-1]["data"].append(payload[4:])  # strip sequence number
        elif tag == b"IEND":
            break
    if not actl or not fctls:
        return [decode_png(data)]
    if ihdr_payload is None:
        raise ValueError("PNG missing IHDR")
    cw, ch, depth, ct = struct.unpack(">IIBBxxx", ihdr_payload[:13])
    from .limits import guard_dims

    guard_dims(cw, ch, "APNG canvas")
    interlace = ihdr_payload[12]  # frames inherit the base interlace method
    if ct in (4, 6):
        for f in fctls:
            if f["blend"] == 1:
                raise ValueError(
                    "APNG: blend_op=over with an alpha channel is not "
                    "representable after alpha-over-white composition")

    def mini_png(fw: int, fh: int, parts: list[bytes]) -> bytes:
        ihdr = struct.pack(">IIBBBBB", fw, fh, depth, ct, 0, 0, interlace)
        out = _MAGIC + _chunk(b"IHDR", ihdr)
        if plte is not None:
            out += _chunk(b"PLTE", plte)
        if trns is not None:
            out += _chunk(b"tRNS", trns)
        return out + _chunk(b"IDAT", b"".join(parts)) + _chunk(b"IEND", b"")

    canvas = np.full((ch, cw, 3), 255, np.uint8)
    frames: list[np.ndarray] = []
    for f in fctls:
        if not f["data"]:
            raise ValueError("APNG: fcTL without frame data")
        img = decode_png(mini_png(f["w"], f["h"], f["data"]))
        x, y, fw, fh = f["x"], f["y"], f["w"], f["h"]
        if y + fh > ch or x + fw > cw:
            raise ValueError("APNG: frame outside canvas")
        saved = canvas[y : y + fh, x : x + fw].copy() if f["dispose"] == 2 else None
        canvas[y : y + fh, x : x + fw] = img
        frames.append(canvas.copy())
        if f["dispose"] == 1:
            canvas[y : y + fh, x : x + fw] = 255
        elif f["dispose"] == 2 and saved is not None:
            canvas[y : y + fh, x : x + fw] = saved
    return frames


def encode_png_anim(frames: list[np.ndarray], loop: int = 0) -> bytes:
    """Same-size (h, w, 3) uint8 frames -> APNG bytes (full-canvas
    frames, blend source, no dispose).  Lossless round-trip through
    :func:`decode_png_frames`."""
    if not frames:
        raise ValueError("encode_png_anim: no frames")
    frames = [np.ascontiguousarray(f, np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w) or f.ndim != 3 or f.shape[2] != 3:
            raise ValueError("encode_png_anim: (h, w, 3) frames of one size")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    out = bytearray(_MAGIC + _chunk(b"IHDR", ihdr))
    out += _chunk(b"acTL", struct.pack(">II", len(frames), loop))
    seq = 0

    def raw_idat(img: np.ndarray) -> bytes:
        body = _filter_rows(
            np.ascontiguousarray(img.reshape(h, -1)), 3, 0).tobytes()
        return zlib.compress(body, 6)

    for i, f in enumerate(frames):
        fctl = struct.pack(">IIIIIHHBB", seq, w, h, 0, 0, 1, 10, 0, 0)
        out += _chunk(b"fcTL", fctl)
        seq += 1
        payload = raw_idat(f)
        if i == 0:
            out += _chunk(b"IDAT", payload)
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + payload)
            seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)
