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
