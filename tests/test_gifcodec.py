"""GIF / BMP / PNM codec unit tests (pure-numpy web-crawl image formats).

The GIF decode path is validated against a REAL external byte stream (the
canonical 43-byte 1x1 transparent GIF, produced by standard tooling and
published verbatim for decades) in addition to encoder round-trips, so the
decoder is not merely self-consistent with the in-repo encoder.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pdf2pdfocr_ray.functions.bmpcodec import decode_bmp, encode_bmp
from pdf2pdfocr_ray.functions.gifcodec import (
    _lzw_decode,
    _lzw_encode,
    _subblocks,
    decode_gif,
    encode_gif,
)
from pdf2pdfocr_ray.functions.imagecodec import (
    decode_image,
    decode_image_frames,
    sniff_image_format,
)
from pdf2pdfocr_ray.functions.pnmcodec import decode_pnm, encode_pnm


def _few_color(h, w, ncol, seed=0):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    return pal[rng.integers(0, ncol, (h, w))], pal


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape,ncol", [((7, 5), 2), ((64, 48), 5),
                                        ((100, 130), 256), ((1, 1), 1),
                                        ((33, 77), 17)])
@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("local_palettes", [False, True])
def test_gif_roundtrip(shape, ncol, interlace, local_palettes):
    img, _ = _few_color(*shape, ncol)
    enc = encode_gif(img, interlace=interlace, local_palettes=local_palettes)
    frames = decode_gif(enc)
    assert len(frames) == 1
    assert np.array_equal(frames[0], img)


def test_gif_animated_roundtrip_and_fanout_dispatch():
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (9, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, 9, (33, 77))] for _ in range(4)]
    enc = encode_gif(frames, interlace=True)
    dec = decode_gif(enc)
    assert len(dec) == 4
    assert all(np.array_equal(a, b) for a, b in zip(dec, frames))
    # imagecodec dispatch: frames via decode_image_frames, first via decode_image
    assert sniff_image_format(enc) == "gif"
    assert len(decode_image_frames(enc)) == 4
    assert np.array_equal(decode_image(enc), frames[0])


def test_gif_lzw_table_overflow_clear_reset():
    # enough high-entropy pixels to exceed 4096 LZW codes -> clear/reset path
    img, _ = _few_color(400, 600, 256, seed=1)
    assert np.array_equal(decode_gif(encode_gif(img))[0], img)


def test_gif_decodes_canonical_external_stream():
    """The classic 1x1 transparent tracking pixel — an externally-produced
    GIF89a stream (GCE with transparency over background index 0)."""
    px = bytes.fromhex(
        "47494638396101000100800000000000ffffff21f904010000"
        "00002c00000000010001000002024401003b")
    assert len(px) == 43
    frames = decode_gif(px)
    assert len(frames) == 1
    assert frames[0].shape == (1, 1, 3)
    # transparent pixel never overwrites the background canvas (palette[0])
    assert tuple(frames[0][0, 0]) == (0, 0, 0)


def test_gif_disposal_and_transparency_composition():
    """Hand-built 3-frame stream: full frame, then a transparent sub-rect
    with disposal=3 (restore previous), then a 1x1 overwrite."""
    pal3 = np.array([[255, 255, 255], [255, 0, 0], [0, 0, 255]], np.uint8)
    palette = np.zeros((4, 3), np.uint8)
    palette[:3] = pal3
    out = bytearray(
        b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x80 | 1, 0, 0)
        + palette.tobytes())
    full = np.full((4, 4), 1, np.uint8)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0) + bytes([2])
    out += _subblocks(_lzw_encode(full.reshape(-1), 2))
    # GCE: disposal=3, transparent index 3
    out += b"\x21\xf9" + bytes([4, (3 << 2) | 1]) + struct.pack("<H", 0)
    out += bytes([3, 0])
    sub = np.array([[2, 3], [3, 2]], np.uint8)
    out += b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0) + bytes([2])
    out += _subblocks(_lzw_encode(sub.reshape(-1), 2))
    one = np.array([[0]], np.uint8)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0) + bytes([2])
    out += _subblocks(_lzw_encode(one.reshape(-1), 2))
    out += b"\x3b"
    d = decode_gif(bytes(out))
    assert len(d) == 3
    assert np.array_equal(d[0], pal3[full])
    # frame 2: blue where opaque, red preserved where transparent
    assert tuple(d[1][1, 1]) == (0, 0, 255)
    assert tuple(d[1][1, 2]) == (255, 0, 0)
    assert tuple(d[1][2, 2]) == (0, 0, 255)
    # frame 3: disposal=3 restored the all-red canvas; only (0,0) is white
    assert tuple(d[2][1, 1]) == (255, 0, 0)
    assert tuple(d[2][0, 0]) == (255, 255, 255)


def test_gif_lzw_kwkwk_case():
    """aaa...: the second code the encoder emits references the entry the
    decoder has not built yet (code == next_code)."""
    idx = np.zeros(50, np.uint8)
    enc = _lzw_encode(idx, 2)
    dec = _lzw_decode(enc, 2, 50)
    assert np.array_equal(dec, idx)


def test_gif_truncated_lzw_zero_fills():
    """A bitstream that ends mid-LZW (well-formed sub-blocks, no EOI)
    decodes to what it carries plus zero-fill — row-level isolation takes
    care of the rest; garbage CODES (misframed blocks) still raise."""
    idx = np.arange(400, dtype=np.uint8) % 4
    lzw = _lzw_encode(idx, 2)
    full = _lzw_decode(lzw, 2, 400)
    assert np.array_equal(full, idx)
    short = _lzw_decode(lzw[: len(lzw) // 2], 2, 400)
    assert short.shape == (400,)
    # some decoded prefix survives; the tail is zero-filled, never a crash
    n_match = int(np.argmin(short == idx)) or 400
    assert n_match > 0 and np.all(short[n_match:] * 0 == 0)


def test_gif_too_many_colors_rejected():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="distinct colors"):
        encode_gif(img)


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

def _bmp_raw(w, h, bpp, pixdata, palette=b"", comp=0, topdown=False):
    off = 14 + 40 + len(palette)
    hdr = b"BM" + struct.pack("<IHHI", off + len(pixdata), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, (-h if topdown else h), 1, bpp,
                       comp, len(pixdata), 0, 0, len(palette) // 4, 0)
    return hdr + info + palette + pixdata


_PAL4 = b"".join(bytes([b, g, r, 0]) for r, g, b in
                 [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)])


@pytest.mark.parametrize("shape", [(1, 1), (7, 3), (33, 31), (5, 2)])
def test_bmp_rgb24_roundtrip(shape):
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    payload = encode_bmp(img)
    assert sniff_image_format(payload) == "bmp"
    assert np.array_equal(decode_image(payload), img)


def test_bmp_palettized_depths_and_roworder():
    # 8bpp bottom-up: stored row 0 is the bottom raster row
    rows8 = bytes([0, 1, 2, 0]) + bytes([3, 0, 1, 0])
    img = decode_bmp(_bmp_raw(3, 2, 8, rows8, _PAL4))
    assert tuple(img[1, 0]) == (255, 0, 0) and tuple(img[0, 0]) == (9, 9, 9)
    img_td = decode_bmp(_bmp_raw(3, 2, 8, rows8, _PAL4, topdown=True))
    assert tuple(img_td[0, 0]) == (255, 0, 0)
    # 1bpp with 4-byte row padding
    bits = bytes([0b11000000, 0b01000000, 0, 0])
    pal2 = b"\x00\x00\x00\x00\xff\xff\xff\x00"
    img = decode_bmp(_bmp_raw(10, 1, 1, bits, pal2))
    assert tuple(img[0, 0]) == (255, 255, 255)
    assert tuple(img[0, 2]) == (0, 0, 0)
    assert tuple(img[0, 9]) == (255, 255, 255)
    # 4bpp nibble unpack
    img = decode_bmp(_bmp_raw(3, 1, 4, bytes([0x01, 0x20, 0, 0]), _PAL4))
    assert [tuple(p) for p in img[0]] == [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    # 32bpp BGRX
    img = decode_bmp(_bmp_raw(2, 1, 32, bytes([10, 20, 30, 0, 40, 50, 60, 0])))
    assert tuple(img[0, 0]) == (30, 20, 10)


def test_bmp_rle8():
    # run of 3x idx1 | EOL | absolute 3 literals (word-padded) | EOB
    rle = bytes([3, 1, 0, 0, 0, 3, 0, 1, 2, 0, 0, 1])
    img = decode_bmp(_bmp_raw(3, 2, 8, rle, _PAL4, comp=1))
    assert tuple(img[1, 0]) == (0, 255, 0)  # bottom-up: rle row 0 at bottom
    assert [tuple(p) for p in img[0]] == [(255, 0, 0), (0, 255, 0), (0, 0, 255)]


def test_bmp_rejects_unknown_compression():
    with pytest.raises(ValueError, match="compression"):
        decode_bmp(_bmp_raw(2, 1, 24, b"\x00" * 8, comp=4))


# ---------------------------------------------------------------------------
# PNM
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [(1, 1), (5, 7), (32, 33)])
def test_pnm_p6_roundtrip(shape):
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    payload = encode_pnm(img)
    assert sniff_image_format(payload) == "pnm"
    assert np.array_equal(decode_image(payload), img)


def test_pnm_variants():
    # ASCII P3 with a header comment
    img = decode_pnm(b"P3 # comment\n2 1\n255\n255 0 0  0 0 255\n")
    assert tuple(img[0, 0]) == (255, 0, 0) and tuple(img[0, 1]) == (0, 0, 255)
    # P5 16-bit big-endian scaled to 8
    raw = np.array([0, 32768, 65535], ">u2").tobytes()
    img = decode_pnm(b"P5\n3 1\n65535\n" + raw)
    assert tuple(img[0, 0]) == (0, 0, 0)
    assert img[0, 1, 0] == 127
    assert tuple(img[0, 2]) == (255, 255, 255)
    # P4 packed bitmap: 1 = black
    raw = bytes([0b10100000, 0b01000000]) + bytes([0b00000000, 0b11000000])
    img = decode_pnm(b"P4\n10 2\n" + raw)
    assert tuple(img[0, 0]) == (0, 0, 0)
    assert tuple(img[0, 1]) == (255, 255, 255)
    assert tuple(img[1, 8]) == (0, 0, 0)
    # ASCII P1 / P2
    img = decode_pnm(b"P1\n3 1\n1 0 1\n")
    assert tuple(img[0, 0]) == (0, 0, 0) and tuple(img[0, 1]) == (255, 255, 255)
    img = decode_pnm(b"P2\n2 1\n15\n0 15\n")
    assert tuple(img[0, 0]) == (0, 0, 0) and tuple(img[0, 1]) == (255, 255, 255)


def test_pnm_rejects_garbage():
    with pytest.raises(ValueError):
        decode_pnm(b"P7\n1 1\n255\n\x00")
    with pytest.raises(ValueError):
        decode_pnm(b"Q6\n1 1\n255\n\x00")


# ---------------------------------------------------------------------------
# ICO (favicons)
# ---------------------------------------------------------------------------

def test_ico_png_entry_roundtrip_and_dispatch():
    import struct

    from pdf2pdfocr_ray.functions.icocodec import decode_ico, encode_ico

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    ico = encode_ico(img)
    assert sniff_image_format(ico) == "ico"
    assert np.array_equal(decode_image(ico), img)
    # largest-entry selection: two entries, second larger
    img2 = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    from pdf2pdfocr_ray.functions.pngcodec import encode_png

    p1, p2 = encode_png(img), encode_png(img2)
    hdr = b"\x00\x00\x01\x00\x02\x00"
    e1 = struct.pack("<BBBBHHII", 32, 32, 0, 0, 1, 32, len(p1), 6 + 32)
    e2 = struct.pack("<BBBBHHII", 48, 48, 0, 0, 1, 32, len(p2),
                     6 + 32 + len(p1))
    assert np.array_equal(decode_ico(hdr + e1 + e2 + p1 + p2), img2)


def test_ico_dib_entry_with_and_mask():
    import struct

    from pdf2pdfocr_ray.functions.icocodec import decode_ico

    w, h = 4, 2
    xor32 = np.zeros((h, w * 4), np.uint8)
    xor32[:, 0::4] = 10
    xor32[:, 1::4] = 20
    xor32[:, 2::4] = 30
    xor32[:, 3::4] = 255
    dib = (struct.pack("<IiiHHIIiiII", 40, w, 2 * h, 1, 32, 0, 0, 0, 0, 0, 0)
           + xor32.tobytes() + np.zeros((h, 4), np.uint8).tobytes())
    hdr = (b"\x00\x00\x01\x00\x01\x00"
           + struct.pack("<BBBBHHII", w, h, 0, 0, 1, 32, len(dib), 22))
    out = decode_ico(hdr + dib)
    assert out.shape == (h, w, 3)
    assert tuple(out[0, 0]) == (30, 20, 10)  # BGRA -> RGB
