"""VP8 (lossy WebP) codec tests.

The external vector `PYTHON_WEBP` is CPython's own test asset
Lib/test/test_email/data/python.webp (PSF license; a 16x16 lossy-WebP
encode of the Python logo produced by libwebp).  It is a REAL
libwebp-encoded VP8 keyframe, so a correct decode validates the RFC
6386 default probability tables, the bool decoder, the keyframe header
(incl. quantizer deltas and coefficient-probability updates), B_PRED
4x4 intra modes with the [above][left] context model, token decoding,
dequantization, the inverse transforms, and the normal loop filter
(the file carries filter_level=12) against an independent encoder —
none of which our own encoder could self-validate.
"""

from __future__ import annotations

import base64
import struct

import numpy as np
import pytest

from pdf2pdfocr_ray.functions.vp8codec import (
    BoolDecoder,
    BoolEncoder,
    decode_vp8,
    encode_vp8,
    fdct4x4,
    idct4x4,
    fwht4x4,
    iwht4x4,
)
from pdf2pdfocr_ray.functions.webpcodec import decode_webp, encode_webp_lossy

PYTHON_WEBP = base64.b64decode(
    "UklGRqgBAABXRUJQVlA4WAoAAAAQAAAADwAADwAAQUxQSMMAAAABJ6KokSTleucYX+ff"
    "KpmImP90cY3gJjDi4Yt3MsjBEVyDKzDosHgVjnhRNcEIDAJPkqBqsFUZHNa2bUYvTsZ2"
    "PLbtd/uvKa4hov9J0f2PkPe6REkkGzolkTTzFG0Ox9PlFiD0CxS+kOGDtxoynjaCfx0p"
    "fk52CPuInrOR75lzRugygtv4zEiy90UwfSD9NheMITJWLaXWayO8XeOlWRXVnIGk2W6W"
    "dYoYMQ+KqixQNPowgt+6a1BSKbUtz+lUFAoBAAAAVlA4IL4AAACQAgCdASoQABAAAwA0"
    "JbACdDBPCIUMfAMdCCz96AD+/XSg/QKbH4r3Q3ycN/bSDK/T/zVo4u6nvclvG/SqxWOu"
    "up+XhN9BojvaW+Tv+MvxvX/hr/o/5Qns9LtmX/+qKdl/yWznhuasl7nkxvSTI4xf3Y85"
    "VSB/lU/8Ofj/b9JrA+ifvIOYZm2x1RP/dhfmsf5diuSfR7+z+r/+HR3zEo/+XM/B+vkY"
    "w73Pzx+ROaAB/ZoBSzEs3rzZe6qsAAAA"
)


def _vp8_chunk(webp: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(webp):
        four = webp[pos: pos + 4]
        (size,) = struct.unpack("<I", webp[pos + 4: pos + 8])
        if four == b"VP8 ":
            return webp[pos + 8: pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def test_real_libwebp_keyframe_decodes():
    """A genuine libwebp encode must decode to the Python-logo palette.
    A desynced bool decoder / wrong probability table produces noise,
    which hits neither color cluster."""
    rgb = decode_vp8(_vp8_chunk(PYTHON_WEBP))
    assert rgb.shape == (16, 16, 3)
    px = rgb.reshape(-1, 3).astype(int)
    blue = (np.abs(px - [60, 110, 150]).sum(1) < 120).sum()
    yellow = (np.abs(px - [255, 212, 80]).sum(1) < 150).sum()
    assert blue > 60, blue       # python blue #4B8BBE region
    assert yellow > 40, yellow   # python yellow #FFD43B region


def test_real_file_header_fields():
    """Pin the known header of the external vector: exercises quantizer
    deltas, coefficient-probability updates, and the B_PRED mode path."""
    import pdf2pdfocr_ray.functions.vp8codec as V

    vp8 = _vp8_chunk(PYTHON_WEBP)
    tag = vp8[0] | (vp8[1] << 8) | (vp8[2] << 16)
    bd = V.BoolDecoder(vp8, 10, 10 + (tag >> 5))
    h = V._parse_header(bd)
    assert (h.filter_type, h.filter_level, h.sharpness) == (0, 12, 0)
    assert h.q_index == 26
    assert h.q_deltas["uvdc"] == -2 and h.q_deltas["uvac"] == 6
    n_upd = sum(
        1 for t in range(4) for b in range(8) for c in range(3)
        for p in range(11)
        if h.coeff_probs[t][b][c][p]
        != V.DEFAULT_COEFF_PROBS[t][b][c][p]
    )
    assert n_upd == 3  # libwebp updated exactly three probabilities
    ymode = bd.read_tree(V.KF_YMODE_TREE, V.KF_YMODE_PROB)
    assert ymode == V.B_PRED


def test_roundtrip_flat_is_exact():
    img = np.full((24, 40, 3), 180, np.uint8)
    out = decode_vp8(encode_vp8(img, q_index=20))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - 180).max()) == 0


def test_roundtrip_gradient_psnr():
    r = np.linspace(0, 255, 48).astype(np.uint8)
    gy, gx = np.meshgrid(r, r, indexing="ij")
    img = np.stack([gy, gx, np.full_like(gy, 100)], -1)
    out = decode_vp8(encode_vp8(img, q_index=12))
    err = out.astype(float) - img.astype(float)
    psnr = 10 * np.log10(255.0**2 / max((err**2).mean(), 1e-9))
    assert psnr > 30.0, psnr


def test_roundtrip_odd_dims_and_noise():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (33, 49, 3)).astype(np.uint8)
    out = decode_vp8(encode_vp8(img, q_index=60))
    assert out.shape == (33, 49, 3)  # non-MB-aligned dims crop correctly


def test_webp_container_lossy_roundtrip():
    img = np.zeros((32, 32, 3), np.uint8)
    img[:16] = (40, 90, 160)
    img[16:] = (250, 210, 60)
    blob = encode_webp_lossy(img, q_index=8)
    out = decode_webp(blob)
    assert out.shape == (32, 32, 3)
    assert np.abs(out[:14].astype(int) - [40, 90, 160]).mean() < 12
    assert np.abs(out[18:].astype(int) - [250, 210, 60]).mean() < 12


def test_bool_coder_roundtrip():
    rng = np.random.default_rng(11)
    probs = rng.integers(1, 255, 500).tolist()
    bits = rng.integers(0, 2, 500).tolist()
    be = BoolEncoder()
    for p, b in zip(probs, bits):
        be.put_bool(p, b)
    be.put_literal(0xA5, 8)
    buf = be.finish()
    bd = BoolDecoder(buf)
    got = [bd.get_bool(p) for p in probs]
    assert got == bits
    assert bd.get_literal(8) == 0xA5


def test_transforms_invert_small_residuals():
    """fdct -> idct round-trips small residuals to within +-1 (the
    normative inverse is exact; the pair is near-lossless unquantized)."""
    rng = np.random.default_rng(3)
    for _ in range(20):
        blk = rng.integers(-40, 41, (4, 4)).astype(np.int32)
        back = idct4x4(fdct4x4(blk))
        assert np.abs(back - blk).max() <= 1, (blk, back)
    dcs = rng.integers(-500, 501, 16).astype(np.int32)
    back = iwht4x4(fwht4x4(dcs))
    assert np.abs(back - dcs).max() <= 2


def test_truncated_vp8_raises():
    with pytest.raises(ValueError, match="truncated VP8"):
        decode_vp8(b"\x00\x00")
    good = encode_vp8(np.full((16, 16, 3), 99, np.uint8))
    with pytest.raises(ValueError):
        decode_vp8(good[:8])


def test_multi_token_partitions():
    """Rows split across 2/4/8 token partitions (real encoders' parallel
    layout) decode identically to the single-partition stream."""
    r = np.linspace(0, 255, 80).astype(np.uint8)
    gy, gx = np.meshgrid(r, r, indexing="ij")
    img = np.stack([gy, gx, np.full_like(gy, 90)], -1)
    ref = decode_vp8(encode_vp8(img, q_index=12, n_token_parts=1))
    for n in (2, 4, 8):
        out = decode_vp8(encode_vp8(img, q_index=12, n_token_parts=n))
        assert (out == ref).all(), n
    with pytest.raises(ValueError, match="n_token_parts"):
        encode_vp8(img, n_token_parts=3)


def test_loop_filter_paths_run_deterministically():
    """Signal loop filtering from our own encoder: both the normal and
    simple profiles must run, be deterministic, smooth block edges
    without wrecking the image, and leave a level-0 decode unchanged."""
    r = np.linspace(0, 255, 64).astype(np.uint8)
    gy, gx = np.meshgrid(r, r, indexing="ij")
    img = np.stack([gy, gx, np.full_like(gy, 120)], -1)
    base = decode_vp8(encode_vp8(img, q_index=40, filter_level=0))
    for simple in (False, True):
        blob = encode_vp8(img, q_index=40, filter_level=20,
                          filter_simple=simple)
        out1 = decode_vp8(blob)
        out2 = decode_vp8(blob)
        assert (out1 == out2).all()  # deterministic
        diff = np.abs(out1.astype(int) - base.astype(int))
        assert diff.max() > 0       # the filter actually ran
        assert diff.mean() < 8.0    # ...and only smoothed, not corrupted


def test_vp8_truncation_fuzz_never_crashes():
    """Truncating or corrupting a valid stream must yield a ValueError
    or a successful (possibly different) decode — never a crash — so
    the decode actor stages' row-level fault isolation holds."""
    img = np.full((32, 48, 3), 77, np.uint8)
    img[8:24, 10:30] = (200, 40, 90)
    good = encode_vp8(img, q_index=20)
    for cut in (9, 10, 12, len(good) // 3, len(good) // 2, len(good) - 2):
        try:
            out = decode_vp8(good[:cut])
            assert out.shape == (32, 48, 3)
        except ValueError:
            pass
    rng = np.random.default_rng(2)
    for _ in range(20):
        blob = bytearray(good)
        for pos in rng.integers(3, len(blob), 3):
            blob[pos] ^= int(rng.integers(1, 256))
        try:
            out = decode_vp8(bytes(blob))
            assert out.shape == (32, 48, 3)
        except ValueError:
            pass


def test_image_stage_isolates_corrupt_vp8():
    """A corrupt lossy-webp row becomes a row-level decode_error, not a
    stage failure."""
    import pyarrow as pa

    from pdf2pdfocr_ray.functions.webpcodec import encode_webp_lossy
    from pdf2pdfocr_ray.ops.multimodal import ImageDecodeStage

    good = encode_webp_lossy(np.full((20, 20, 3), 130, np.uint8))
    bad = good[:40]  # truncated mid-stream
    t = pa.table({"image": pa.array([good, bad], pa.binary())})
    out = ImageDecodeStage()(t)
    errs = out.column("decode_error").to_pylist()
    assert errs[0] is None
    assert errs[1] is not None and errs[1].startswith("webp:")
