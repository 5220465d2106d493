"""GIF87a/89a codec — pure numpy/stdlib, no external binaries.

The reference accepts GIF inputs for free through ImageMagick's own
dispatch (`convert` reads anything, /root/reference/pdf2pdfocr.py:1133-1141)
and sniffs them via ``file -b --mime-type``
(/root/reference/pdf2pdfocr.py:1229-1236).  GIF is one of the most common
image formats in real web crawls, so the engine decodes it in-process:

* ``decode_gif``: the full decode path — logical screen descriptor,
  global/local color tables, variable-width LSB-first LZW (including the
  KwKwK case, per-image minimum code size, deferred-clear streams),
  four-pass interlace reorder, GIF89a graphic-control extensions
  (transparency index, disposal methods 0-3 incl. restore-to-background
  and restore-to-previous), and frame composition onto the logical
  screen.  Returns ONE composed (H, W, 3) uint8 RGB frame per image
  descriptor — an animated GIF is a multi-frame document and fans out
  through the same S5 path as multi-frame TIFF.
* ``encode_gif``: an exact-palette encoder for few-color images (scan
  pages, line art): builds a shared global color table (<= 256 colors
  across all frames, else ``ValueError``), LZW-compresses each frame
  (dictionary keyed by (prefix_code, byte), clear-and-reset at 4096),
  optional interlacing, optional per-frame local color tables, and a
  Netscape loop block for multi-frame output.  Round-trips losslessly
  through ``decode_gif``.

Sequential-by-spec LZW is the only non-vectorized loop: each output code
expands a run, so the Python loop runs per CODE, not per pixel (mostly-
white scan pages average long runs per code).  Palette application,
interlace reorder and frame composition are numpy.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")

_MAX_CODE = 4096  # 12-bit LZW ceiling (GIF89a spec appendix F)


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Variable-width LSB-first GIF-LZW -> uint8 index array of n_pixels.

    Tolerates deferred-clear streams (table full at 4096, no clear code)
    and streams that end without an explicit EOI.
    """
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]

    table = list(base)
    width = min_code_size + 1
    next_code = eoi + 1

    out = bytearray()
    bitbuf = 0
    nbits = 0
    pos = 0
    prev = -1
    data_len = len(data)
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= data_len:
                # truncated stream: return what we have, zero-fill the rest
                arr = np.zeros(n_pixels, np.uint8)
                got = np.frombuffer(bytes(out[:n_pixels]), np.uint8)
                arr[: len(got)] = got
                return arr
            bitbuf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width

        if code == clear:
            table = list(base)
            width = min_code_size + 1
            next_code = eoi + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= len(table):
                raise ValueError("GIF LZW: first code out of range")
            entry = table[code]
            out += entry
            prev = code
            continue
        if code < next_code:
            entry = table[code]
        elif code == next_code:
            entry = table[prev] + table[prev][:1]  # KwKwK
        else:
            raise ValueError("GIF LZW: code out of range")
        out += entry
        if next_code < _MAX_CODE:
            table.append(table[prev] + entry[:1])
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8).copy()


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """uint8 index array -> GIF-LZW bytes (no sub-block framing)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table: dict = {}
    width = min_code_size + 1
    next_code = eoi + 1
    emit(clear, width)
    px = indices.tolist()
    if not px:
        emit(eoi, width)
    else:
        prefix = px[0]
        for k in px[1:]:
            key = (prefix, k)
            got = table.get(key)
            if got is not None:
                prefix = got
                continue
            emit(prefix, width)
            table[key] = next_code
            next_code += 1
            # mirror of the decoder's width bump: the decoder's table runs
            # one entry behind, so the encoder switches at (1<<width)+1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
            prefix = k
            if next_code > _MAX_CODE:
                emit(clear, width)
                table = {}
                width = min_code_size + 1
                next_code = eoi + 1
        emit(prefix, width)
        emit(eoi, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _subblocks(data: bytes) -> bytes:
    """Frame raw bytes into <=255-byte GIF sub-blocks + terminator."""
    chunks = [
        bytes([min(255, len(data) - i)]) + data[i: i + 255]
        for i in range(0, len(data), 255)
    ]
    return b"".join(chunks) + b"\x00"


# ---------------------------------------------------------------------------
# interlace
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_row_order(h: int) -> np.ndarray:
    """Row indices in on-wire order for a GIF interlaced image."""
    rows = [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    return np.concatenate(rows) if rows else np.arange(0)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def decode_gif(payload: bytes) -> list[np.ndarray]:
    """GIF bytes -> list of composed (H, W, 3) uint8 RGB frames, one per
    image descriptor (animated GIF -> one entry per animation frame)."""
    if payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF (bad signature)")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, flags, bg_index, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    from .limits import guard_dims

    guard_dims(sw, sh, "GIF screen")
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, offset=pos).reshape(n, 3)
        pos += n * 3

    # logical screen canvas; GIF "background" outside any palette renders
    # white (browsers composite transparent-to-page; scans are white)
    if gct is not None and bg_index < len(gct):
        bg_rgb = gct[bg_index]
    else:
        bg_rgb = np.array([255, 255, 255], np.uint8)
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()

    frames: list[np.ndarray] = []
    transparent = -1
    disposal = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = payload[pos]
                gflags = payload[pos + 1]
                disposal = (gflags >> 2) & 0x07
                transparent = payload[pos + 4] if (gflags & 0x01) else -1
                pos += 1 + size
                if payload[pos] != 0:
                    raise ValueError("GIF: unterminated graphic control")
                pos += 1
            else:  # comment / plain text / application: skip sub-blocks
                while True:
                    size = payload[pos]
                    pos += 1 + size
                    if size == 0:
                        break
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if w == 0 or h == 0 or left + w > sw or top + h > sh:
            raise ValueError("GIF: image descriptor outside logical screen")
        palette = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            palette = np.frombuffer(
                payload, np.uint8, n * 3, offset=pos).reshape(n, 3)
            pos += n * 3
        if palette is None:
            raise ValueError("GIF: image with neither local nor global palette")
        if pos >= len(payload):
            raise ValueError("GIF: truncated before image data")
        min_code_size = payload[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"GIF: bad LZW min code size {min_code_size}")
        parts = []
        while pos < len(payload):
            size = payload[pos]
            pos += 1
            if size == 0:
                break
            parts.append(payload[pos: pos + size])
            pos += size
        idx = _lzw_decode(b"".join(parts), min_code_size, w * h).reshape(h, w)
        if iflags & 0x40:  # interlaced: reorder wire rows to raster rows
            raster = np.empty_like(idx)
            raster[_interlace_row_order(h)] = idx
            idx = raster

        region = canvas[top: top + h, left: left + w]
        saved = region.copy() if disposal == 3 else None
        rgb = palette[np.minimum(idx, len(palette) - 1)]
        if transparent >= 0:
            opaque = idx != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:  # restore to background
            canvas[top: top + h, left: left + w] = bg_rgb
        elif disposal == 3 and saved is not None:  # restore to previous
            canvas[top: top + h, left: left + w] = saved
        transparent = -1
        disposal = 0
    if not frames:
        raise ValueError("GIF: no image data")
    return frames


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def encode_gif(
    frames: np.ndarray | list[np.ndarray],
    *,
    interlace: bool = False,
    local_palettes: bool = False,
    loop: int = 0,
) -> bytes:
    """(H, W, 3) uint8 frame(s) -> GIF89a bytes, exact palette (lossless).

    All frames share one palette built from their union of colors; more
    than 256 distinct colors raises ``ValueError`` (this encoder exists
    for few-color scan/line-art fixtures, mirroring how the corpus uses
    the other in-repo encoders — it is not a quantizing photo encoder).
    ``local_palettes`` additionally emits the table per-frame (exercises
    the local-color-table decode path); multi-frame output gets a
    Netscape loop block.
    """
    if isinstance(frames, np.ndarray) and frames.ndim == 3:
        frames = [frames]
    frames = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("encode_gif: no frames")
    h0, w0 = frames[0].shape[:2]
    for f in frames:
        if f.ndim != 3 or f.shape[2] != 3:
            raise ValueError("encode_gif: frames must be (H, W, 3) uint8")
        if f.shape[:2] != (h0, w0):
            raise ValueError("encode_gif: frames must share one size")

    # shared exact palette over the union of colors
    stacked = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors = np.unique(stacked, axis=0)
    if len(colors) > 256:
        raise ValueError(
            f"encode_gif: {len(colors)} distinct colors (exact-palette "
            "encoder caps at 256)")
    # palette size must be a power of two >= 2; LZW min code size >= 2
    pbits = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    psize = 1 << pbits
    palette = np.zeros((psize, 3), np.uint8)
    palette[: len(colors)] = colors
    min_code_size = max(2, pbits)

    # color -> index via packed-uint32 searchsorted (vectorized)
    packed_pal = (
        colors[:, 0].astype(np.uint32) << 16
    ) | (colors[:, 1].astype(np.uint32) << 8) | colors[:, 2].astype(np.uint32)
    order = np.argsort(packed_pal)
    sorted_pal = packed_pal[order]

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w0, h0,
                       (0x80 | ((pbits - 1) & 0x07)) if not local_palettes
                       else 0x00,
                       0, 0)
    if not local_palettes:
        out += palette.tobytes()
    if len(frames) > 1:
        # Netscape 2.0 application extension: animation loop count
        out += b"\x21\xff\x0bNETSCAPE2.0"
        out += bytes([3, 1]) + struct.pack("<H", loop) + b"\x00"
    for f in frames:
        packed = (
            f[:, :, 0].astype(np.uint32) << 16
        ) | (f[:, :, 1].astype(np.uint32) << 8) | f[:, :, 2].astype(np.uint32)
        loc = np.searchsorted(sorted_pal, packed.reshape(-1))
        idx = order[loc].astype(np.uint8).reshape(h0, w0)
        if len(frames) > 1:
            # graphic control: disposal=1 (keep), no transparency
            out += b"\x21\xf9" + bytes([4, 0x04]) + struct.pack("<H", 2)
            out += bytes([0, 0])
        iflags = 0
        if interlace:
            iflags |= 0x40
            idx = idx[_interlace_row_order(h0)]
        if local_palettes:
            iflags |= 0x80 | ((pbits - 1) & 0x07)
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w0, h0, iflags)
        if local_palettes:
            out += palette.tobytes()
        out += bytes([min_code_size])
        out += _subblocks(_lzw_encode(idx.reshape(-1), min_code_size))
    out += b"\x3b"
    return bytes(out)
