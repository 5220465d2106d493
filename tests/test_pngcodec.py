"""PNG codec round-trip tests (the engine's in-object-store page-image format,
replacing the reference's temp-dir JPEGs at /root/reference/pdf2pdfocr.py:70)."""

from __future__ import annotations

import numpy as np
import pytest

from pdf2pdfocr_ray.functions.pngcodec import decode_png, encode_png


@pytest.mark.parametrize("shape", [(1, 1), (7, 5), (64, 48), (480, 640)])
def test_roundtrip(shape):
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()


def test_white_page_compresses():
    img = np.full((700, 500, 3), 255, dtype=np.uint8)
    data = encode_png(img)
    assert len(data) < 5000
    assert (decode_png(data) == img).all()


def test_bad_magic_rejected():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_magic_prefix():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    assert encode_png(img).startswith(b"\x89PNG\r\n\x1a\n")


# ---------------------------------------------------------------------------
# full-spec decode surface (color types, depths, filters, Adam7, tRNS)
# ---------------------------------------------------------------------------

import struct
import zlib

import pytest

from pdf2pdfocr_ray.functions.pngcodec import _MAGIC, _chunk


def _few_color_img(h=37, w=53, ncol=7, seed=0):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    return pal[rng.integers(0, ncol, (h, w))]


@pytest.mark.parametrize("colortype", ["rgb", "gray", "palette"])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4, "adaptive"])
@pytest.mark.parametrize("interlace", [False, True])
def test_png_full_matrix_roundtrip(colortype, filter_type, interlace):
    rng = np.random.default_rng(1)
    if colortype == "gray":
        img = np.repeat(rng.integers(0, 256, (37, 53, 1), np.uint8), 3, axis=2)
    elif colortype == "palette":
        img = _few_color_img()
    else:
        img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    enc = encode_png(img, colortype=colortype, filter_type=filter_type,
                     interlace=interlace)
    assert np.array_equal(decode_png(enc), img)


def _build_png(w, h, depth, ct, row_bytes_list, extra=b""):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ct, 0, 0, 0)
    rows = b"".join(b"\x00" + r for r in row_bytes_list)
    return (_MAGIC + _chunk(b"IHDR", ihdr) + extra
            + _chunk(b"IDAT", zlib.compress(rows)) + _chunk(b"IEND", b""))


def test_png_rgba_composites_over_white():
    px = np.array([[[255, 0, 0, 255], [0, 255, 0, 0], [10, 20, 30, 128]]],
                  np.uint8)
    d = decode_png(_build_png(3, 1, 8, 6, [px[0].tobytes()]))
    assert tuple(d[0, 0]) == (255, 0, 0)
    assert tuple(d[0, 1]) == (255, 255, 255)
    assert d[0, 2, 0] == (10 * 128 + 255 * 127) // 255


def test_png_gray_alpha_and_16bit():
    ga = np.array([[[0, 255], [128, 0]]], np.uint8)
    d = decode_png(_build_png(2, 1, 8, 4, [ga[0].tobytes()]))
    assert tuple(d[0, 0]) == (0, 0, 0) and tuple(d[0, 1]) == (255, 255, 255)
    r16 = np.array([[[65535, 0, 32768]]], ">u2")
    d = decode_png(_build_png(1, 1, 16, 2, [r16.tobytes()]))
    assert tuple(d[0, 0]) == (255, 0, 128)


def test_png_subbyte_gray_depths():
    bits = np.packbits(np.array([[1, 0, 1, 1, 0, 1, 0, 0, 1, 1]], np.uint8),
                       axis=1)
    d = decode_png(_build_png(10, 1, 1, 0, [bits[0].tobytes()]))
    assert tuple(d[0, 0]) == (255, 255, 255) and tuple(d[0, 1]) == (0, 0, 0)
    d = decode_png(_build_png(2, 1, 4, 0, [bytes([0xF8])]))
    assert tuple(d[0, 0]) == (255, 255, 255)
    assert d[0, 1, 0] == 8 * 255 // 15


def test_png_trns_palette_and_colorkey():
    pal = np.array([[10, 20, 30], [200, 100, 50]], np.uint8)
    d = decode_png(_build_png(
        2, 1, 8, 3, [bytes([0, 1])],
        extra=_chunk(b"PLTE", pal.tobytes()) + _chunk(b"tRNS", bytes([0]))))
    assert tuple(d[0, 0]) == (255, 255, 255)
    assert tuple(d[0, 1]) == (200, 100, 50)
    d = decode_png(_build_png(
        2, 1, 8, 2, [bytes([1, 2, 3, 7, 8, 9])],
        extra=_chunk(b"tRNS", struct.pack(">HHH", 1, 2, 3))))
    assert tuple(d[0, 0]) == (255, 255, 255) and tuple(d[0, 1]) == (7, 8, 9)


def test_png_invalid_headers_rejected():
    with pytest.raises(ValueError, match="bad color type"):
        decode_png(_build_png(1, 1, 8, 5, [b"\x00"]))
    with pytest.raises(ValueError, match="bad bit depth"):
        decode_png(_build_png(1, 1, 3, 0, [b"\x00"]))
    with pytest.raises(ValueError, match="invalid for type"):
        decode_png(_build_png(1, 1, 4, 2, [b"\x00"]))


def test_apng_roundtrip_and_composition():
    """acTL/fcTL/fdAT: lossless frame roundtrip; hand-built sub-rect
    frame with dispose-to-background; non-animated passthrough."""
    from pdf2pdfocr_ray.functions.pngcodec import (
        decode_png_frames,
        encode_png_anim,
    )

    rng = np.random.default_rng(0)
    pal = rng.integers(0, 256, (5, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, 5, (29, 41))] for _ in range(3)]
    dec = decode_png_frames(encode_png_anim(frames))
    assert len(dec) == 3
    assert all(np.array_equal(a, b) for a, b in zip(dec, frames))
    assert len(decode_png_frames(encode_png(frames[0]))) == 1

    # hand-built: full frame then 2x4 sub-rect at (2,1) with dispose=1
    base = np.zeros((6, 8, 3), np.uint8)
    sub = np.full((2, 4, 3), 200, np.uint8)
    ihdr = struct.pack(">IIBBBBB", 8, 6, 8, 2, 0, 0, 0)
    out = bytearray(_MAGIC + _chunk(b"IHDR", ihdr))
    out += _chunk(b"acTL", struct.pack(">II", 2, 0))
    out += _chunk(b"fcTL", struct.pack(">IIIIIHHBB", 0, 8, 6, 0, 0, 1, 10, 0, 0))
    raw = np.zeros((6, 1 + 24), np.uint8)
    raw[:, 1:] = base.reshape(6, 24)
    out += _chunk(b"IDAT", zlib.compress(raw.tobytes()))
    out += _chunk(b"fcTL", struct.pack(">IIIIIHHBB", 1, 4, 2, 2, 1, 1, 10, 1, 0))
    raw2 = np.zeros((2, 1 + 12), np.uint8)
    raw2[:, 1:] = sub.reshape(2, 12)
    out += _chunk(b"fdAT", struct.pack(">I", 2) + zlib.compress(raw2.tobytes()))
    out += _chunk(b"IEND", b"")
    d = decode_png_frames(bytes(out))
    assert len(d) == 2
    assert tuple(d[0][0, 0]) == (0, 0, 0)
    assert tuple(d[1][1, 2]) == (200, 200, 200)  # sub at (x=2, y=1)
    assert tuple(d[1][0, 0]) == (0, 0, 0)  # untouched canvas kept


def test_apng_interlaced_frames_roundtrip():
    """APNG frame data inherits the base IHDR's interlace method (ADVICE
    r4 #4): an Adam7-interlaced APNG must decode to the true pixels, not
    scrambled ones from a hardcoded interlace=0 reconstruction."""
    from pdf2pdfocr_ray.functions.pngcodec import decode_png_frames

    def idat_of(png: bytes) -> bytes:
        pos, parts = 8, []
        while pos + 8 <= len(png):
            (length,) = struct.unpack(">I", png[pos : pos + 4])
            tag = png[pos + 4 : pos + 8]
            if tag == b"IDAT":
                parts.append(png[pos + 8 : pos + 8 + length])
            pos += 12 + length
        return b"".join(parts)

    rng = np.random.default_rng(7)
    frames = [
        rng.integers(0, 256, (13, 17, 3), dtype=np.uint8) for _ in range(2)
    ]
    ihdr = struct.pack(">IIBBBBB", 17, 13, 8, 2, 0, 0, 1)  # interlace=1
    out = bytearray(_MAGIC + _chunk(b"IHDR", ihdr))
    out += _chunk(b"acTL", struct.pack(">II", 2, 0))
    out += _chunk(
        b"fcTL", struct.pack(">IIIIIHHBB", 0, 17, 13, 0, 0, 1, 10, 0, 0))
    out += _chunk(b"IDAT", idat_of(encode_png(frames[0], interlace=True)))
    out += _chunk(
        b"fcTL", struct.pack(">IIIIIHHBB", 1, 17, 13, 0, 0, 1, 10, 0, 0))
    out += _chunk(
        b"fdAT",
        struct.pack(">I", 2) + idat_of(encode_png(frames[1], interlace=True)),
    )
    out += _chunk(b"IEND", b"")
    dec = decode_png_frames(bytes(out))
    assert len(dec) == 2
    assert np.array_equal(dec[0], frames[0])
    assert np.array_equal(dec[1], frames[1])
