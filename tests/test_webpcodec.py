"""WebP lossless (VP8L) codec: encoder/decoder roundtrips plus
handcrafted bitstreams for the decoder paths the in-repo encoder never
emits (LZ77 backward refs, color cache, predictor / cross-color
transforms, meta-prefix groups)."""

import struct

import numpy as np
import pytest

from pdf2pdfocr_ray.functions.webpcodec import (
    _BitWriter,
    _cache_key,
    decode_webp,
    encode_webp,
)


def _rng():
    return np.random.default_rng(1234)


# ------------------------------------------------------------- roundtrips


def test_roundtrip_plain_and_subtract_green():
    img = _rng().integers(0, 256, (19, 31, 3)).astype(np.uint8)
    assert (decode_webp(encode_webp(img)) == img).all()
    assert (decode_webp(encode_webp(img, subtract_green=True)) == img).all()


@pytest.mark.parametrize("n_colors", [2, 3, 4, 9, 16, 17, 256])
def test_roundtrip_palette_all_bundle_widths(n_colors):
    rng = _rng()
    pal = rng.integers(0, 256, (n_colors, 3)).astype(np.uint8)
    # width NOT a multiple of the bundle factor: exercises edge unpacking
    img = pal[rng.integers(0, n_colors, (7, 13))]
    out = decode_webp(encode_webp(img, palette=True))
    assert (out == img).all()


def test_roundtrip_single_pixel_and_single_row():
    img1 = np.array([[[200, 100, 50]]], np.uint8)
    assert (decode_webp(encode_webp(img1)) == img1).all()
    row = _rng().integers(0, 256, (1, 64, 3)).astype(np.uint8)
    assert (decode_webp(encode_webp(row)) == row).all()


def test_container_errors():
    with pytest.raises(ValueError, match="RIFF"):
        decode_webp(b"NOPE" * 8)
    # lossy VP8 now decodes for real; a truncated body is a decode error
    lossy = (
        b"RIFF" + struct.pack("<I", 16) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(ValueError, match="truncated VP8"):
        decode_webp(lossy)
    with pytest.raises(ValueError, match="truncated|signature|VP8L"):
        decode_webp(encode_webp(np.zeros((4, 4, 3), np.uint8))[:20])


def test_dispatcher_integration():
    from pdf2pdfocr_ray.functions.imagecodec import decode_image, sniff_image_format

    img = _rng().integers(0, 256, (8, 8, 3)).astype(np.uint8)
    payload = encode_webp(img)
    assert sniff_image_format(payload) == "webp"
    assert (decode_image(payload) == img).all()


# ---------------------------------------------------- handcrafted streams
#
# The encoder is literal-only, so LZ77 / color-cache / predictor /
# cross-color decode paths are driven by bitstreams assembled here with
# the module's own bit-writer (same LSB-first packing the spec uses).


def _wrap(bw: _BitWriter) -> bytes:
    payload = np.packbits(np.asarray(bw.bits, np.uint8), bitorder="little").tobytes()
    vp8l = b"\x2f" + payload
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(vp8l)) + b"WEBP"
        + b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    )


def _header(bw: _BitWriter, w: int, h: int) -> None:
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def _single(bw: _BitWriter, symbol: int) -> None:
    """Simple prefix code, one symbol (zero-bit reads)."""
    bw.write(1, 1)
    bw.write(0, 1)
    if symbol < 2:
        bw.write(0, 1)
        bw.write(symbol, 1)
    else:
        bw.write(1, 1)
        bw.write(symbol, 8)


def _pair(bw: _BitWriter, s0: int, s1: int) -> None:
    """Simple prefix code, two symbols (1 bit each): s0 -> '0', s1 -> '1'
    after canonical ordering (writer must pass s0 < s1)."""
    assert s0 < s1 <= 255
    bw.write(1, 1)
    bw.write(1, 1)  # two symbols
    if s0 < 2:
        bw.write(0, 1)
        bw.write(s0, 1)
    else:
        bw.write(1, 1)
        bw.write(s0, 8)
    bw.write(s1, 8)


def _green_pair_tree(bw: _BitWriter, other_symbol: int, alphabet: int) -> None:
    """Code-length-coded green tree: symbols {0, other_symbol} length 1
    each (other_symbol > 255, out of simple-code range)."""
    bw.write(0, 1)  # not simple
    # code-length code over symbols {0: len 2, 1: len 2, 18: len 1}
    bw.write(0, 4)  # num_code_lengths = 4 -> order 17,18,0,1
    bw.write(0, 3)  # 17 -> 0
    bw.write(1, 3)  # 18 -> 1
    bw.write(2, 3)  # 0  -> 2
    bw.write(2, 3)  # 1  -> 2
    bw.write(0, 1)  # no max-symbol shortcut
    # canonical: 18 -> '0'; 0 -> '10'; 1 -> '11'
    def sym1():
        bw.write_code(0b11, 2)

    def zeros(n):
        while n:
            take = min(n, 138)
            if take < 11:  # use literal-zero code repeatedly
                for _ in range(take):
                    bw.write_code(0b10, 2)
            else:
                bw.write_code(0b0, 1)
                bw.write(take - 11, 7)
            n -= take

    sym1()  # symbol 0: length 1
    zeros(other_symbol - 1)
    sym1()  # other_symbol: length 1
    zeros(alphabet - other_symbol - 1)


def test_handcrafted_lz77_row_copy():
    """4x2: top row literals, bottom row one LZ77 ref (length 4, distance
    code 1 -> (0,1) neighborhood -> exactly one row up)."""
    w, h = 4, 2
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta
    # green: {0, 256+3} — literal green 0 / length-prefix 3 (=> length 4)
    _green_pair_tree(bw, 256 + 3, 256 + 24)
    _pair(bw, 5, 9)  # red: two symbols to vary per pixel
    _single(bw, 6)  # blue
    _single(bw, 255)  # alpha
    _single(bw, 0)  # distance: prefix 0 -> dist_code 1 -> (0, 1)
    for i in range(4):  # literals: green '0' + red choice + 0-bit b/a
        bw.write_code(0, 1)
        bw.write_code(i & 1, 1)  # alternate red 5 / 9
    bw.write_code(1, 1)  # green symbol 256+3: length 4, no extra bits
    # distance symbol: 0 bits; prefix 0 -> no extra bits
    img = decode_webp(_wrap(bw))
    exp_row = np.array(
        [[5, 0, 6], [9, 0, 6], [5, 0, 6], [9, 0, 6]], np.uint8
    )
    assert (img[0] == exp_row).all()
    assert (img[1] == exp_row).all()  # copied row


def test_handcrafted_color_cache_hit():
    """2x1: literal pixel then a cache-hit symbol -> identical pixels."""
    w, h = 2, 1
    argb = (255 << 24) | (5 << 16) | (0 << 8) | 6  # the literal below
    cache_bits = 1
    key = _cache_key(argb, cache_bits)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta
    _green_pair_tree(bw, 280 + key, 256 + 24 + 2)
    _single(bw, 5)  # red
    _single(bw, 6)  # blue
    _single(bw, 255)  # alpha
    _single(bw, 0)  # distance
    bw.write_code(0, 1)  # literal green 0 (r/b/a cost 0 bits)
    bw.write_code(1, 1)  # cache hit
    img = decode_webp(_wrap(bw))
    assert (img == np.array([[[5, 0, 6], [5, 0, 6]]], np.uint8)).all()


def _aux_1x1(bw: _BitWriter, green: int, red: int, blue: int) -> None:
    """1x1 auxiliary (tile) image: all channels via 0-bit simple codes."""
    bw.write(0, 1)  # no color cache
    _single(bw, green)
    _single(bw, red)
    _single(bw, blue)
    _single(bw, 255)  # alpha
    _single(bw, 0)  # distance


def _pred_ref(mode, L, T, TL, TR):
    """Independent predictor reimplementation (spec pseudo-code) used to
    cross-check the decoder's version."""
    L, T, TL, TR = (x.astype(np.int32) for x in (L, T, TL, TR))
    avg = lambda a, b: (a + b) // 2
    if mode == 0:
        return np.array([255, 0, 0, 0], np.int32)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return avg(avg(L, TR), T)
    if mode == 6:
        return avg(L, TL)
    if mode == 7:
        return avg(L, T)
    if mode == 8:
        return avg(TL, T)
    if mode == 9:
        return avg(T, TR)
    if mode == 10:
        return avg(avg(L, TL), avg(T, TR))
    if mode == 11:
        p = L + T - TL
        return L if np.abs(p - L).sum() < np.abs(p - T).sum() else T
    if mode == 12:
        return np.clip(L + T - TL, 0, 255)
    if mode == 13:
        a = avg(L, T)
        d = a - TL
        half = np.where(d >= 0, d // 2, -((-d) // 2))
        return np.clip(a + half, 0, 255)


@pytest.mark.parametrize("mode", list(range(14)))
def test_handcrafted_predictor_modes(mode):
    """4x4 with one predictor tile of the given mode; residuals decoded
    against an independent reimplementation of the spec pseudo-code."""
    w = h = 4
    rng = np.random.default_rng(mode)
    res = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)  # ARGB residuals
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)  # transform present
    bw.write(0, 2)  # predictor
    bw.write(0, 3)  # size_bits = 2 -> one 4x4 tile
    _aux_1x1(bw, green=mode, red=0, blue=0)
    bw.write(0, 1)  # end transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # full 8-bit flat trees via the encoder's writer
    from pdf2pdfocr_ray.functions.webpcodec import (
        _write_flat_code,
        _write_single_symbol_code,
    )

    _write_flat_code(bw, 256 + 24, 256)
    _write_flat_code(bw, 256, 256)
    _write_flat_code(bw, 256, 256)
    _write_flat_code(bw, 256, 256)
    _write_single_symbol_code(bw, 0)
    for y in range(h):
        for x in range(w):
            a, r, g, b = res[y, x]
            for v in (g, r, b, a):
                bw.write_code(int(v), 8)
    img = decode_webp(_wrap(bw))
    # reference reconstruction
    out = np.zeros((h, w, 4), np.int32)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], np.int32)
            elif y == 0:
                pred = out[0, x - 1]
            elif x == 0:
                pred = out[y - 1, 0]
            else:
                # RFC 9649 §4.2.1 wraparound: rightmost-column TR is the
                # leftmost pixel of the CURRENT row.
                TR = out[y, 0] if x + 1 >= w else out[y - 1, x + 1]
                pred = _pred_ref(
                    mode, out[y, x - 1], out[y - 1, x], out[y - 1, x - 1], TR
                )
            out[y, x] = (res[y, x].astype(np.int32) + pred) % 256
    assert (img == out[:, :, 1:4].astype(np.uint8)).all(), f"mode {mode}"


def test_handcrafted_cross_color_transform():
    """2x2 with one cross-color tile; checked against the spec's delta
    formula computed independently."""
    w = h = 2
    g2r, g2b, r2b = 17, -20 & 0xFF, 5  # stored as uint8, read as int8
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)  # ARGB pre-inverse
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(1, 2)  # color transform
    bw.write(0, 3)  # size_bits = 2
    _aux_1x1(bw, green=g2b, red=r2b, blue=g2r)
    bw.write(0, 1)  # end transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    from pdf2pdfocr_ray.functions.webpcodec import (
        _write_flat_code,
        _write_single_symbol_code,
    )

    _write_flat_code(bw, 256 + 24, 256)
    _write_flat_code(bw, 256, 256)
    _write_flat_code(bw, 256, 256)
    _write_flat_code(bw, 256, 256)
    _write_single_symbol_code(bw, 0)
    for y in range(h):
        for x in range(w):
            a, r, g, b = px[y, x]
            for v in (g, r, b, a):
                bw.write_code(int(v), 8)
    img = decode_webp(_wrap(bw))

    def to_i8(v):
        return (int(v) ^ 0x80) - 0x80

    for y in range(h):
        for x in range(w):
            a, r, g, b = (int(v) for v in px[y, x])
            delta_r = (to_i8(g2r) * to_i8(g)) >> 5
            new_r = (r + delta_r) & 0xFF
            delta_b = ((to_i8(g2b) * to_i8(g)) >> 5) + (
                (to_i8(r2b) * to_i8(new_r)) >> 5
            )
            new_b = (b + delta_b) & 0xFF
            assert tuple(img[y, x]) == (new_r, g, new_b), (y, x)


def test_decode_stage_accepts_webp():
    """The multimodal decode stage treats webp as a real format now."""
    import pyarrow as pa

    from pdf2pdfocr_ray.ops.multimodal import ImageDecodeStage

    img = _rng().integers(0, 256, (12, 9, 3)).astype(np.uint8)
    batch = pa.table({"image": pa.array([encode_webp(img)], pa.binary())})
    out = ImageDecodeStage(strict=True)(batch)
    assert out.column("width").to_pylist() == [9]
    assert out.column("height").to_pylist() == [12]
    assert out.column("decode_error").to_pylist() == [None]


# ------------------------------------------------------- property-based
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(st.data())
    def test_vp8l_roundtrip_property(data):
        h = data.draw(st.integers(1, 16))
        w = data.draw(st.integers(1, 16))
        seed = data.draw(st.integers(0, 2**31))
        n_colors = data.draw(st.integers(1, 300))
        palette = data.draw(st.booleans())
        sub_green = data.draw(st.booleans())
        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, (n_colors, 3)).astype(np.uint8)
        img = pal[rng.integers(0, n_colors, (h, w))]
        out = decode_webp(encode_webp(img, palette=palette,
                                      subtract_green=sub_green and not palette))
        assert (out == img).all()

except ImportError:  # pragma: no cover
    pass


def test_animated_webp_roundtrip_and_composition():
    """VP8X/ANIM/ANMF: lossless frame roundtrip, sub-rect placement
    (x/2,y/2 units) and dispose-to-background composition; single-image
    input returns one frame."""
    import struct

    from pdf2pdfocr_ray.functions.webpcodec import (
        _vp8l_chunk_of,
        decode_webp_frames,
        encode_webp,
        encode_webp_anim,
    )

    rng = np.random.default_rng(0)
    pal = rng.integers(0, 256, (6, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, 6, (37, 53))] for _ in range(3)]
    dec = decode_webp_frames(encode_webp_anim(frames))
    assert len(dec) == 3
    assert all(np.array_equal(a, b) for a, b in zip(dec, frames))
    single = encode_webp(frames[0])
    assert len(decode_webp_frames(single)) == 1

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    w, h = 8, 6
    base = np.zeros((h, w, 3), np.uint8)
    sub = np.full((2, 4, 3), 200, np.uint8)
    vp8x = (bytes([0x02]) + b"\x00" * 3
            + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little"))
    anim = struct.pack("<IH", 0xFFFFFFFF, 0)
    f1 = (b"\x00\x00\x00" * 2 + (w - 1).to_bytes(3, "little")
          + (h - 1).to_bytes(3, "little") + (100).to_bytes(3, "little")
          + bytes([0x01]) + _vp8l_chunk_of(encode_webp(base)))
    f2 = ((1).to_bytes(3, "little") + (1).to_bytes(3, "little")
          + (3).to_bytes(3, "little") + (1).to_bytes(3, "little")
          + (100).to_bytes(3, "little") + bytes([0x00])
          + _vp8l_chunk_of(encode_webp(sub)))
    body = (chunk(b"VP8X", vp8x) + chunk(b"ANIM", anim)
            + chunk(b"ANMF", f1) + chunk(b"ANMF", f2))
    riff = b"WEBP" + body
    d = decode_webp_frames(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    assert len(d) == 2
    assert tuple(d[0][0, 0]) == (0, 0, 0)
    assert tuple(d[1][0, 0]) == (255, 255, 255)  # disposed to background
    assert tuple(d[1][2, 2]) == (200, 200, 200)  # sub-rect at (2, 2)
