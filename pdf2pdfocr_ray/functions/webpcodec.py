"""Pure-numpy WebP lossless (VP8L) codec.

The reference accepts any image ImageMagick reads (`convert` path,
/root/reference/pdf2pdfocr.py:1133-1141), which includes WebP — the
dominant non-JPEG format on the modern web, so a Common-Crawl-scale
pipeline must at least read it.  This module implements the VP8L
lossless bitstream from the public container/bitstream specification
(RFC 9649, "WebP Image Format"):

* ``decode_webp``: the FULL lossless decode path — RIFF/VP8X container
  walk, LSB-first bitreader, canonical prefix codes (simple and
  code-length-coded, incl. repeat codes 16/17/18 and the max-symbol
  shortcut), optional color cache, LZ77 backward references with the
  120-entry 2D distance neighborhood, meta-prefix (entropy image)
  group selection, and the four inverse transforms (predictor with all
  14 modes, cross-color, subtract-green, color-indexing incl. sub-byte
  pixel bundling).
* ``encode_webp``: a valid literal-only VP8L encoder (every channel an
  8-bit flat prefix code; optional subtract-green transform; optional
  color-indexing/palette path exercising bundled widths) — byte streams
  any spec-conforming decoder accepts; used for roundtrip coverage and
  for emitting webp from the re-encode stages.

Lossy "VP8 " chunks (the DCT/bool-coder codec, RFC 6386) decode through
``vp8codec.decode_vp8``; ``encode_webp_lossy`` wraps its encoder in the
RIFF container.

Decode is bit-serial Python in the entropy loop (fine for page-scale
images in the actor pools; a block carries few images), while the
transforms and the encoder hot path are vectorized numpy.
"""

from __future__ import annotations

import struct

import numpy as np

# Code-length code symbol order (RFC 9649 §5.2.2).
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

# 2D distance neighborhood for LZ77 distance codes 1..120 (RFC 9649
# §4.2.2): (xoffset, yoffset) pairs, dist = xoffset + yoffset * xsize.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)

_PRED_TF, _COLOR_TF, _SUBGREEN_TF, _INDEX_TF = 0, 1, 2, 3


class _BitReader:
    """LSB-first bitreader over the VP8L payload."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        p, out = self.pos, 0
        data = self.data
        for i in range(n):
            byte = p >> 3
            if byte >= len(data):
                raise ValueError("truncated VP8L bitstream")
            out |= ((data[byte] >> (p & 7)) & 1) << i
            p += 1
        self.pos = p
        return out

    def read_bit(self) -> int:
        p = self.pos
        byte = p >> 3
        if byte >= len(self.data):
            raise ValueError("truncated VP8L bitstream")
        self.pos = p + 1
        return (self.data[byte] >> (p & 7)) & 1


class _PrefixCode:
    """Canonical prefix code: maps (bit-walk) -> symbol.  ``single`` is
    the zero-bit special case (simple code with one symbol, or a lengths
    array with exactly one used symbol)."""

    __slots__ = ("table", "single", "max_len")

    def __init__(self, lengths):
        used = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not used:
            raise ValueError("empty prefix code")
        if len(used) == 1:
            self.single = used[0][1]
            self.table = None
            self.max_len = 0
            return
        self.single = None
        # canonical assignment: sort by (length, symbol)
        used.sort()
        kraft = sum(2.0 ** -l for l, _ in used)
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError(f"invalid prefix code (kraft sum {kraft})")
        table: dict[tuple[int, int], int] = {}
        code, prev_len = 0, used[0][0]
        for l, s in used:
            code <<= l - prev_len
            prev_len = l
            table[(l, code)] = s
            code += 1
        self.table = table
        self.max_len = used[-1][0]

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        acc, ln = 0, 0
        table, max_len = self.table, self.max_len
        while ln <= max_len:
            acc = (acc << 1) | br.read_bit()
            ln += 1
            sym = table.get((ln, acc))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix-coded symbol")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        if br.read_bit():  # first symbol in 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read_bit()
        lengths = [0] * alphabet_size
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym0 >= alphabet_size or sym1 >= alphabet_size:
                raise ValueError("simple-code symbol out of range")
            lengths[sym0] = lengths[sym1] = 1
        else:
            if sym0 >= alphabet_size:
                raise ValueError("simple-code symbol out of range")
            lengths[sym0] = 1
        return _PrefixCode(lengths)
    # code-length-coded
    num_codes = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_codes):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixCode(clc_lengths)
    if br.read_bit():  # max-symbol shortcut
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    i = 0
    while i < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        sym = clc.read(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym != 0:
                prev_len = sym
        elif sym == 16:
            for _ in range(3 + br.read(2)):
                if i < alphabet_size:
                    lengths[i] = prev_len
                    i += 1
        elif sym == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    if i > alphabet_size:
        raise ValueError("prefix code lengths overflow alphabet")
    return _PrefixCode(lengths)


def _is_flat8(code: _PrefixCode) -> bool:
    """True iff the code is the identity flat 8-bit code over 0..255."""
    t = code.table
    if t is None or len(t) != 256 or code.max_len != 8:
        return False
    return all(t.get((8, s)) == s for s in range(256))


def _prefix_value(code: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix decode (RFC 9649 §4.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _cache_key(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


def _decode_entropy_image(
    br: _BitReader, w: int, h: int, allow_meta: bool
) -> np.ndarray:
    """Decode one spatially/entropy-coded VP8L image -> (h, w) uint32 ARGB.

    ``allow_meta``: True only for the main ARGB image (auxiliary images —
    entropy image, predictor/color tiles, palette — have no meta codes)."""
    # color-cache-info comes first (RFC 9649 §5.2: spatially-coded-image
    # ::= color-cache-info meta-prefix data)
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError(f"invalid color-cache bits {cache_bits}")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    # meta prefix codes (entropy image) — main ARGB image only
    meta = None
    meta_bits = 0
    num_groups = 1
    if allow_meta and br.read_bit():
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_entropy_image(br, mw, mh, False)
        meta = (((meta_img >> 8) & 0xFFFF)).astype(np.int64)  # (r<<8)|g
        num_groups = int(meta.max()) + 1
    # prefix code groups: 5 codes per group
    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    groups = []
    for _ in range(num_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),  # red
                _read_prefix_code(br, 256),  # blue
                _read_prefix_code(br, 256),  # alpha
                _read_prefix_code(br, 40),  # distance
            )
        )
    total = w * h
    # Vectorized fast path for flat 8-bit literal streams (what
    # encode_webp emits): every channel code is the identity 8-bit
    # canonical code and LZ77/cache symbols are absent, so the payload
    # is exactly 32 bits per pixel — decode with unpackbits + a dot
    # product instead of the bit-serial walk (page-scale images in the
    # OCR corpus hit this path; ~1000x faster than the generic loop).
    if num_groups == 1 and cache is None and all(
        _is_flat8(c) for c in groups[0][:4]
    ):
        start = br.pos
        nbits = total * 32
        allbits = np.unpackbits(
            np.frombuffer(br.data, np.uint8), bitorder="little"
        )
        if start + nbits > len(allbits):
            raise ValueError("truncated VP8L literal stream")
        chunk = allbits[start : start + nbits].reshape(total, 4, 8)
        weights = (1 << np.arange(7, -1, -1)).astype(np.uint32)  # MSB-first
        vals = (chunk.astype(np.uint32) * weights).sum(axis=2)  # (n, GRBA)
        br.pos = start + nbits
        argb = (
            (vals[:, 3] << 24) | (vals[:, 1] << 16)
            | (vals[:, 0] << 8) | vals[:, 2]
        )
        return argb.astype(np.uint32).reshape(h, w)
    out = np.zeros(w * h, dtype=np.uint32)
    pos = 0
    g_code, r_code, b_code, a_code, d_code = groups[0]
    while pos < total:
        if meta is not None:
            x, y = pos % w, pos // w
            gi = int(meta[y >> meta_bits, (x >> meta_bits)])
            g_code, r_code, b_code, a_code, d_code = groups[gi]
        sym = g_code.read(br)
        if sym < 256:  # literal: G R B A
            green = sym
            red = r_code.read(br)
            blue = b_code.read(br)
            alpha = a_code.read(br)
            px = (alpha << 24) | (red << 16) | (green << 8) | blue
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[_cache_key(px, cache_bits)] = px
        elif sym < 280:  # LZ77 backward reference
            length = _prefix_value(sym - 256, br)
            dist_code = _prefix_value(d_code.read(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > total:
                raise ValueError("LZ77 reference out of bounds")
            if cache is None and dist >= length:
                out[pos : pos + length] = out[pos - dist : pos - dist + length]
                pos += length
            else:
                for _ in range(length):
                    px = int(out[pos - dist])
                    out[pos] = px
                    pos += 1
                    if cache is not None:
                        cache[_cache_key(px, cache_bits)] = px
        else:  # color cache hit
            if cache is None:
                raise ValueError("color-cache symbol without a cache")
            out[pos] = cache[sym - 280]
            pos += 1
    return out.reshape(h, w)


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return ((a.astype(np.uint16) + b.astype(np.uint16)) // 2).astype(np.uint8)


def _pred_one(mode: int, L, T, TL, TR) -> np.ndarray:
    """Predictor for one pixel: L/T/TL/TR are (4,) uint8 channel vectors
    in ARGB order.  Modes per RFC 9649 §4.2.1.1."""
    if mode == 0:
        return np.array([0xFF, 0, 0, 0], np.uint8)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:  # Select
        p = L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32)
        pl = int(np.abs(p - L.astype(np.int32)).sum())
        pt = int(np.abs(p - T.astype(np.int32)).sum())
        return L if pl < pt else T
    if mode == 12:  # ClampAddSubtractFull
        v = L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32)
        return np.clip(v, 0, 255).astype(np.uint8)
    if mode == 13:  # ClampAddSubtractHalf
        a = _avg2(L, T).astype(np.int32)
        d = a - TL.astype(np.int32)
        # C-style truncation toward zero for (a - b) / 2
        half = np.where(d >= 0, d // 2, -((-d) // 2))
        return np.clip(a + half, 0, 255).astype(np.uint8)
    raise ValueError(f"invalid predictor mode {mode}")


def _inv_predictor(img: np.ndarray, tiles: np.ndarray, bits: int) -> np.ndarray:
    """Inverse predictor transform.  ``img`` (h, w, 4) uint8 ARGB residuals
    -> reconstructed.  Sequential by spec (left/top neighbors are decoded
    pixels)."""
    h, w = img.shape[:2]
    modes = ((tiles >> 8) & 0xFF).astype(np.int32)  # green channel
    out = img.copy()
    for y in range(h):
        trow = modes[y >> bits]
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([0xFF, 0, 0, 0], np.uint8)
            elif y == 0:
                pred = out[0, x - 1]
            elif x == 0:
                pred = out[y - 1, 0]
            else:
                mode = int(trow[x >> bits])
                L = out[y, x - 1]
                T = out[y - 1, x]
                TL = out[y - 1, x - 1]
                # RFC 9649 §4.2.1: the rightmost column's top-right pixel
                # wraps (linear index p - w + 1) to the leftmost pixel of
                # the CURRENT row, already decoded.
                TR = out[y, 0] if x + 1 >= w else out[y - 1, x + 1]
                pred = _pred_one(mode, L, T, TL, TR)
            out[y, x] = out[y, x] + pred  # uint8 wraps mod 256
    return out


def _inv_color_transform(img: np.ndarray, tiles: np.ndarray, bits: int) -> np.ndarray:
    """Inverse cross-color transform (vectorized per pixel row blocks)."""
    h, w = img.shape[:2]
    ty = np.arange(h) >> bits
    tx = np.arange(w) >> bits
    t = tiles[np.ix_(ty, tx)]  # (h, w) uint32
    g2r = ((t & 0xFF).astype(np.int32) ^ 0x80) - 0x80  # int8 of blue channel
    g2b = (((t >> 8) & 0xFF).astype(np.int32) ^ 0x80) - 0x80
    r2b = (((t >> 16) & 0xFF).astype(np.int32) ^ 0x80) - 0x80
    a = img[:, :, 0].astype(np.int32)
    r = img[:, :, 1].astype(np.int32)
    g = img[:, :, 2].astype(np.int32)
    b = img[:, :, 3].astype(np.int32)
    g8 = (g ^ 0x80) - 0x80  # green as int8
    r_new = (r + ((g2r * g8) >> 5)) & 0xFF
    r8 = (r_new ^ 0x80) - 0x80
    b_new = (b + ((g2b * g8) >> 5) + ((r2b * r8) >> 5)) & 0xFF
    out = np.empty_like(img)
    out[:, :, 0] = a
    out[:, :, 1] = r_new
    out[:, :, 2] = g
    out[:, :, 3] = b_new
    return out


def _inv_subtract_green(img: np.ndarray) -> np.ndarray:
    out = img.copy()
    out[:, :, 1] += out[:, :, 2]  # red += green (mod 256)
    out[:, :, 3] += out[:, :, 2]  # blue += green
    return out


def _inv_color_index(
    img: np.ndarray, palette: np.ndarray, orig_w: int
) -> np.ndarray:
    """Inverse color-indexing: unpack bundled indices and look up the
    palette.  ``img`` (h, packed_w, 4); palette (n, 4) uint8 ARGB."""
    n = len(palette)
    if n <= 2:
        ibits = 1
    elif n <= 4:
        ibits = 2
    elif n <= 16:
        ibits = 4
    else:
        ibits = 8
    idx = img[:, :, 2]  # green channel carries indices
    if ibits < 8:
        per = 8 // ibits
        mask = (1 << ibits) - 1
        shifts = (np.arange(per) * ibits).astype(np.uint8)
        # (h, packed_w, per) -> (h, packed_w*per), LSB-first sub-pixels
        unpacked = (idx[:, :, None] >> shifts[None, None, :]) & mask
        idx = unpacked.reshape(idx.shape[0], -1)[:, :orig_w]
    idx = idx.astype(np.int64)
    safe = np.where(idx < n, idx, 0)
    out = palette[safe]
    out[idx >= n] = 0  # out-of-range index -> transparent black
    return out


def _argb_to_planes(argb: np.ndarray) -> np.ndarray:
    """(h, w) uint32 -> (h, w, 4) uint8 [A, R, G, B]."""
    return np.stack(
        [
            (argb >> 24).astype(np.uint8),
            ((argb >> 16) & 0xFF).astype(np.uint8),
            ((argb >> 8) & 0xFF).astype(np.uint8),
            (argb & 0xFF).astype(np.uint8),
        ],
        axis=-1,
    )


def _find_vp8l_payload(payload: bytes) -> bytes:
    """RIFF walk: return the VP8L or VP8 chunk body (handles VP8X
    containers).  Lossy VP8 bodies are returned TAGGED so decode_webp can
    route them to the vp8codec decoder."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP file (missing RIFF/WEBP header)")
    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            return body
        if fourcc == b"VP8 ":
            return b"\x00LOSSY\x00" + body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    raise ValueError("no VP8L/VP8 chunk in WebP container")


def decode_webp_frames(payload: bytes) -> list["np.ndarray"]:
    """WebP bytes -> list of composed (h, w, 3) uint8 frames.

    Animated WebP (VP8X + ANIM/ANMF): each ANMF carries a frame
    rectangle (x/2, y/2 in u24 pairs, w-1/h-1 u24), a duration and a
    flags byte (bit0 = dispose-to-background after display), wrapping a
    VP8/VP8L subchunk; frames compose onto the canvas like GIF
    disposal.  Detection is by ANMF chunk PRESENCE (not the VP8X flag
    bit), so a mis-set flag can't misroute.  Non-animated input returns
    a single frame."""
    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP file (missing RIFF/WEBP header)")
    pos = 12
    canvas_w = canvas_h = 0
    anmf: list[bytes] = []
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8X" and len(body) >= 10:
            canvas_w = 1 + int.from_bytes(body[4:7], "little")
            canvas_h = 1 + int.from_bytes(body[7:10], "little")
        elif fourcc == b"ANMF":
            anmf.append(body)
        pos += 8 + size + (size & 1)
    if not anmf:
        return [decode_webp(payload)]
    if not canvas_w or not canvas_h:
        raise ValueError("animated WebP without a VP8X canvas size")
    from .limits import guard_dims

    guard_dims(canvas_w, canvas_h, "WebP canvas")
    canvas = np.full((canvas_h, canvas_w, 3), 255, np.uint8)
    frames: list[np.ndarray] = []
    for body in anmf:
        if len(body) < 16:
            raise ValueError("truncated ANMF chunk")
        fx = 2 * int.from_bytes(body[0:3], "little")
        fy = 2 * int.from_bytes(body[3:6], "little")
        fw = 1 + int.from_bytes(body[6:9], "little")
        fh = 1 + int.from_bytes(body[9:12], "little")
        flags = body[15]
        dispose_bg = bool(flags & 0x01)
        # frame data: sub-chunks (ALPH? then VP8/VP8L) — reuse the RIFF
        # walk by wrapping the sub-chunk stream in a synthetic container
        sub = body[16:]
        wrapped = (b"RIFF" + struct.pack("<I", 4 + len(sub)) + b"WEBP" + sub)
        img = decode_webp(wrapped)
        if img.shape[:2] != (fh, fw):
            raise ValueError("ANMF frame dims disagree with its payload")
        if fy + fh > canvas_h or fx + fw > canvas_w:
            raise ValueError("ANMF frame outside the canvas")
        canvas[fy : fy + fh, fx : fx + fw] = img
        frames.append(canvas.copy())
        if dispose_bg:
            canvas[fy : fy + fh, fx : fx + fw] = 255
    return frames


def encode_webp_anim(frames: list["np.ndarray"], loop: int = 0) -> bytes:
    """Same-size (h, w, 3) uint8 frames -> animated WebP (VP8X + ANIM +
    one full-canvas lossless VP8L ANMF per frame).  Lossless, so it
    round-trips exactly through decode_webp_frames."""
    import numpy as np

    if not frames:
        raise ValueError("encode_webp_anim: no frames")
    frames = [np.ascontiguousarray(f, np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("encode_webp_anim: frames must share one size")

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    vp8x = (bytes([0x02]) + b"\x00\x00\x00"
            + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little"))
    anim = struct.pack("<IH", 0xFFFFFFFF, loop)  # white bg, loop count
    out = bytearray(chunk(b"VP8X", vp8x) + chunk(b"ANIM", anim))
    for f in frames:
        sub = _vp8l_chunk_of(encode_webp(f))
        body = (b"\x00\x00\x00" * 2  # frame at (0, 0)
                + (w - 1).to_bytes(3, "little")
                + (h - 1).to_bytes(3, "little")
                + (100).to_bytes(3, "little")  # duration ms
                + bytes([0x00])  # no dispose, no blend
                + sub)
        out += chunk(b"ANMF", body)
    riff = b"WEBP" + bytes(out)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _vp8l_chunk_of(webp: bytes) -> bytes:
    """Extract the raw VP8L chunk (header + body + pad) from a simple
    lossless WebP container."""
    pos = 12
    while pos + 8 <= len(webp):
        fourcc = webp[pos : pos + 4]
        (size,) = struct.unpack("<I", webp[pos + 4 : pos + 8])
        if fourcc == b"VP8L":
            end = pos + 8 + size + (size & 1)
            return webp[pos:end]
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8L chunk")


def encode_webp_lossy(img: np.ndarray, q_index: int = 40) -> bytes:
    """(h, w, 3) uint8 RGB -> lossy WebP bytes (RIFF-wrapped VP8
    keyframe from vp8codec.encode_vp8)."""
    from .vp8codec import encode_vp8

    body = encode_vp8(img, q_index=q_index)
    if len(body) & 1:
        body += b"\x00"
    riff = b"WEBP" + b"VP8 " + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_webp(payload: bytes) -> np.ndarray:
    """WebP bytes -> (h, w, 3) uint8 RGB (alpha dropped, matching the
    decode_image contract).  Lossless (VP8L) decodes here; lossy (VP8)
    routes to the vp8codec keyframe decoder."""
    data = _find_vp8l_payload(payload)
    if data[:7] == b"\x00LOSSY\x00":
        from .vp8codec import decode_vp8

        return decode_vp8(data[7:])
    if not data or data[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(data[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    from .limits import guard_dims

    guard_dims(w, h, "VP8L")
    br.read_bit()  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    # transforms, in reading order; inverses applied in reverse order
    transforms: list[tuple] = []
    seen = set()
    cur_w = w
    while br.read_bit():
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError(f"duplicate transform {ttype}")
        seen.add(ttype)
        if ttype == _PRED_TF or ttype == _COLOR_TF:
            bits = br.read(3) + 2
            tw = (cur_w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            tiles = _decode_entropy_image(br, tw, th, False)
            transforms.append((ttype, bits, tiles))
        elif ttype == _SUBGREEN_TF:
            transforms.append((ttype,))
        else:  # color indexing
            n_colors = br.read(8) + 1
            pal_argb = _decode_entropy_image(br, n_colors, 1, False)[0]
            palette = _argb_to_planes(pal_argb)
            # palette entries are delta-coded (per channel, mod 256)
            palette = np.cumsum(palette.astype(np.int64), axis=0).astype(np.uint8)
            if n_colors <= 2:
                per = 8
            elif n_colors <= 4:
                per = 4
            elif n_colors <= 16:
                per = 2
            else:
                per = 1
            transforms.append((ttype, palette, cur_w))
            cur_w = (cur_w + per - 1) // per
    argb = _decode_entropy_image(br, cur_w, h, True)
    img = _argb_to_planes(argb)
    for tf in reversed(transforms):
        if tf[0] == _INDEX_TF:
            img = _inv_color_index(img, tf[1], tf[2])
        elif tf[0] == _SUBGREEN_TF:
            img = _inv_subtract_green(img)
        elif tf[0] == _COLOR_TF:
            img = _inv_color_transform(img, tf[2], tf[1])
        else:
            img = _inv_predictor(img, tf[2], tf[1])
    return np.ascontiguousarray(img[:, :, 1:4])  # ARGB -> RGB


# ---------------------------------------------------------------- encoder


class _BitWriter:
    """Bit accumulator: small header writes go to a Python list, bulk
    pixel payloads ride as numpy chunks — packing a page-sized literal
    stream never materializes a multi-million-entry Python list."""

    __slots__ = ("buf", "parts")

    def __init__(self) -> None:
        self.buf: list[int] = []
        self.parts: list[np.ndarray] = []

    def write(self, value: int, n: int) -> None:  # LSB-first
        for i in range(n):
            self.buf.append((value >> i) & 1)

    def write_code(self, code: int, length: int) -> None:  # MSB-first
        for i in range(length - 1, -1, -1):
            self.buf.append((code >> i) & 1)

    def extend_bits(self, arr: np.ndarray) -> None:
        if self.buf:
            self.parts.append(np.asarray(self.buf, np.uint8))
            self.buf = []
        self.parts.append(arr.astype(np.uint8, copy=False))

    def to_bytes(self) -> bytes:
        if self.buf:
            self.parts.append(np.asarray(self.buf, np.uint8))
            self.buf = []
        allbits = (
            np.concatenate(self.parts) if self.parts else np.zeros(0, np.uint8)
        )
        self.parts = [allbits]
        return np.packbits(allbits, bitorder="little").tobytes()

    @property
    def bits(self) -> list[int]:  # test hook: full bit list
        out: list[int] = []
        for p in self.parts:
            out.extend(int(b) for b in p)
        out.extend(self.buf)
        return out


def _write_flat_code(bw: _BitWriter, alphabet_size: int, used: int) -> None:
    """Write a prefix code where symbols 0..used-1 all have length 8 (a
    complete code iff used == 256) and the rest length 0, via the
    code-length code {0: len 1, 8: len 1}."""
    assert used == 256
    bw.write(0, 1)  # not simple
    bw.write(11 - 4, 4)  # num_code_lengths = 11 (through symbol 8 in order)
    for i in range(11):
        sym = _CLC_ORDER[i]
        bw.write(1 if sym in (0, 8) else 0, 3)
    bw.write(0, 1)  # no max-symbol shortcut
    # canonical over {0, 8} both len 1: symbol 0 -> '0', symbol 8 -> '1'
    for _ in range(used):
        bw.write_code(1, 1)  # length 8
    for _ in range(alphabet_size - used):
        bw.write_code(0, 1)  # length 0


def _write_single_symbol_code(bw: _BitWriter, symbol: int) -> None:
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # one symbol
    if symbol < 2:
        bw.write(0, 1)  # 1-bit symbol
        bw.write(symbol, 1)
    else:
        bw.write(1, 1)  # 8-bit symbol
        bw.write(symbol, 8)


def encode_webp(img: np.ndarray, subtract_green: bool = False,
                palette: bool = False) -> bytes:
    """RGB uint8 (h, w, 3) -> lossless WebP bytes.

    Literal-only VP8L: each channel under a flat 8-bit prefix code (a
    valid, complete canonical code any conforming decoder accepts).
    ``subtract_green`` adds that transform; ``palette=True`` uses the
    color-indexing transform when the image has <= 256 distinct colors
    (with sub-byte pixel bundling below 17 colors)."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected uint8 (h,w,3) array, got {img.dtype} {img.shape}")
    h, w = img.shape[:2]
    if h > 1 << 14 or w > 1 << 14:
        raise ValueError("image exceeds VP8L 16383x16383 limit")
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    plane = None  # (h', w', 4) uint8 GRBA literal stream source
    if palette:
        flat = img.reshape(-1, 3)
        colors, inv = np.unique(flat, axis=0, return_inverse=True)
        if len(colors) <= 256:
            bw.write(1, 1)  # transform present
            bw.write(_INDEX_TF, 2)
            bw.write(len(colors) - 1, 8)
            # palette as a 1 x n literal image, delta-coded per channel
            pal = np.concatenate(
                [np.full((len(colors), 1), 255, np.uint8), colors], axis=1
            )  # ARGB
            deltas = np.diff(
                np.concatenate([np.zeros((1, 4), np.uint8), pal]).astype(np.int16),
                axis=0,
            ).astype(np.uint8)
            _encode_literal_image(bw, deltas[None, :, :])
            n = len(colors)
            ibits = 1 if n <= 2 else 2 if n <= 4 else 4 if n <= 16 else 8
            idx = inv.reshape(h, w).astype(np.uint8)
            if ibits < 8:
                per = 8 // ibits
                pw = (w + per - 1) // per
                padded = np.zeros((h, pw * per), np.uint8)
                padded[:, :w] = idx
                shifts = (np.arange(per) * ibits).astype(np.uint8)
                packed = (
                    (padded.reshape(h, pw, per) << shifts[None, None, :])
                    .sum(axis=2)
                    .astype(np.uint8)
                )
                idx = packed
                w = pw
            # literal order G,R,B,A: indices ride the green channel
            plane = np.zeros((h, w, 4), np.uint8)
            plane[:, :, 0] = idx
            plane[:, :, 3] = 255
        # else: fall through to plain literal encode
    if plane is None:
        src = img
        if subtract_green:
            bw.write(1, 1)
            bw.write(_SUBGREEN_TF, 2)
            src = img.copy()
            src[:, :, 0] -= src[:, :, 1]  # r -= g (mod 256)
            src[:, :, 2] -= src[:, :, 1]  # b -= g
        plane = np.zeros((h, w, 4), np.uint8)
        plane[:, :, 0] = src[:, :, 1]  # green first in literal order
        plane[:, :, 1] = src[:, :, 0]  # red
        plane[:, :, 2] = src[:, :, 2]  # blue
        plane[:, :, 3] = 255  # alpha
    bw.write(0, 1)  # end of transforms
    _encode_literal_image(bw, None, plane=plane, main=True)
    vp8l = b"\x2f" + bw.to_bytes()
    riff_size = 4 + 8 + len(vp8l) + (len(vp8l) & 1)
    out = (
        b"RIFF"
        + struct.pack("<I", riff_size)
        + b"WEBP"
        + b"VP8L"
        + struct.pack("<I", len(vp8l))
        + vp8l
    )
    if len(vp8l) & 1:
        out += b"\x00"
    return out


def _encode_literal_image(
    bw: _BitWriter,
    argb_planes: np.ndarray | None,
    plane: np.ndarray | None = None,
    main: bool = False,
) -> None:
    """Write one entropy-coded image body: no cache, flat 8-bit codes,
    literal pixels.  ``argb_planes`` is (h, w, 4) ARGB uint8 (auxiliary
    images, e.g. the palette); ``plane`` is already in literal order
    G,R,B,A.  Only the MAIN ARGB image carries the meta-prefix bit —
    auxiliary images must not write it (the decoder never reads it
    there)."""
    if plane is None:
        a = argb_planes
        plane = np.stack(
            [a[:, :, 2], a[:, :, 1], a[:, :, 3], a[:, :, 0]], axis=-1
        )  # G, R, B, A
    bw.write(0, 1)  # no color cache
    if main:
        bw.write(0, 1)  # no meta prefix codes
    _write_flat_code(bw, 256 + 24, 256)  # green
    _write_flat_code(bw, 256, 256)  # red
    _write_flat_code(bw, 256, 256)  # blue
    _write_flat_code(bw, 256, 256)  # alpha
    _write_single_symbol_code(bw, 0)  # distance (unused)
    bw.extend_bits(np.unpackbits(plane.reshape(-1)))  # MSB-first codes
