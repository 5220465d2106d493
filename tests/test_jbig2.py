"""JBIG2 generic regions + MQ coder: roundtrips, TPGDON decode,
segment-layer behavior, and the scanned-PDF extraction path."""

import struct

import numpy as np
import pytest

from pdf2pdfocr_ray.functions.jbig2 import (
    decode_generic_arith,
    decode_jbig2_embedded,
    encode_generic_arith,
    encode_jbig2_embedded,
)
from pdf2pdfocr_ray.functions.mq import MQDecoder, MQEncoder


def test_mq_roundtrip_mixed_contexts():
    rng = np.random.default_rng(11)
    for p in (0.02, 0.3, 0.5, 0.97):
        bits = (rng.random(4000) < p).astype(int)
        cxs = rng.integers(0, 9, 4000).astype(int)
        enc = MQEncoder(9)
        for c, b in zip(cxs, bits):
            enc.encode(int(c), int(b))
        dec = MQDecoder(enc.flush(), 9)
        assert [dec.decode(int(c)) for c in cxs] == bits.tolist()


def test_generic_region_roundtrip_shapes():
    rng = np.random.default_rng(2)
    for h, w, p in [(1, 1, 0.5), (3, 40, 0.2), (25, 25, 0.5), (12, 7, 0.9)]:
        bits = (rng.random((h, w)) < p).astype(np.uint8)
        assert (
            decode_generic_arith(encode_generic_arith(bits), w, h) == bits
        ).all()


def test_tpgdon_typical_rows():
    """Hand-encode a TPGDON stream: LTP toggles decoded from context
    0x9B25, a typical row copies the row above."""
    from pdf2pdfocr_ray.functions.jbig2 import _TPGDON_CTX, _context0

    bits = np.array([[1, 0, 1, 0], [1, 0, 1, 0], [0, 1, 1, 0]], np.uint8)
    enc = MQEncoder(1 << 16)
    ltp = 0
    for y in range(3):
        typical = y == 1  # row 1 == row 0
        if typical != ltp:
            enc.encode(_TPGDON_CTX, 1)
            ltp = typical
        else:
            enc.encode(_TPGDON_CTX, 0)
        if not typical:
            for x in range(4):
                enc.encode(_context0(bits, x, y, ((3,-1),(-3,-1),(2,-2),(-2,-2))), int(bits[y, x]))
    out = decode_generic_arith(enc.flush(), 4, 3, tpgdon=True)
    assert (out == bits).all()


@pytest.mark.parametrize("mmr", [False, True])
def test_embedded_roundtrip(mmr):
    rng = np.random.default_rng(4)
    img = np.where(rng.random((21, 33)) < 0.3, 0, 255).astype(np.uint8)
    out = decode_jbig2_embedded(encode_jbig2_embedded(img, mmr=mmr))
    assert (out == img).all()


def test_unsupported_segment_types_raise():
    # a symbol dict whose flags request Huffman coding must raise
    seg = (struct.pack(">IB", 0, 0) + b"\x00\x01" + struct.pack(">I", 2)
           + struct.pack(">H", 1))
    with pytest.raises(ValueError, match="Huffman"):
        decode_jbig2_embedded(seg)
    with pytest.raises(ValueError):
        decode_jbig2_embedded(b"\x00\x01")  # truncated header


def test_int_arith_roundtrip():
    """T.88 Annex A integer coder: every bucket boundary + OOB."""
    from pdf2pdfocr_ray.functions.jbig2 import (
        _IADH, _IADS, _int_decode, _int_encode, _n_contexts,
    )

    vals = [0, 1, -1, 3, 4, -4, 19, 20, -83, 84, 339, 340, -4435, 4436,
            70000, -70000, None, 2, None, -340]
    enc = MQEncoder(_n_contexts(1))
    for v in vals:
        _int_encode(enc, _IADH, v)
        _int_encode(enc, _IADS, v if v is None or v >= 0 else -v)
    buf = enc.flush()
    dec = MQDecoder(buf, _n_contexts(1))
    for v in vals:
        assert _int_decode(dec, _IADH) == v
        assert _int_decode(dec, _IADS) == (
            v if v is None or v >= 0 else -v)


def test_symbolic_roundtrip_text_page():
    """Symbol-coded organization: a rendered text page roundtrips
    byte-identically and compresses via glyph dedup."""
    from pdf2pdfocr_ray.functions.jbig2 import (
        encode_jbig2_embedded as enc_gen,
        encode_jbig2_symbolic,
    )
    from pdf2pdfocr_ray.functions.pagerender import render_page

    page = render_page(
        ["the quick brown fox", "the lazy dog dog dog", "totals 410 77"],
        dpi=72,
    )
    bil = np.where(page.mean(axis=2) < 128, 0, 255).astype(np.uint8)
    blob = encode_jbig2_symbolic(bil)
    out = decode_jbig2_embedded(blob)
    assert (out == bil).all()
    # repeated glyphs share dictionary entries -> much smaller than the
    # generic-region encode of the same page
    assert len(blob) < len(enc_gen(bil))


def test_symbolic_blank_and_single_pixel():
    from pdf2pdfocr_ray.functions.jbig2 import encode_jbig2_symbolic

    blank = np.full((12, 18), 255, np.uint8)
    assert (decode_jbig2_embedded(encode_jbig2_symbolic(blank))
            == blank).all()
    one = blank.copy()
    one[5, 7] = 0
    assert (decode_jbig2_embedded(encode_jbig2_symbolic(one)) == one).all()


def test_text_region_reference_corners():
    """Decode the same symbol placed via each REFCORNER: the instance
    lands so the named corner sits at (S, T)."""
    from pdf2pdfocr_ray.functions.jbig2 import (
        _IADS, _IADT, _IAFS, _iaid_encode, _int_encode, _n_contexts,
        _symcodelen, decode_text_region,
    )

    sym = np.array([[1, 1, 1], [1, 0, 1]], np.uint8)  # 2x3 glyph
    for corner in range(4):
        scl = _symcodelen(1)
        enc = MQEncoder(_n_contexts(scl))
        _int_encode(enc, _IADT, 0)   # initial STRIPT
        _int_encode(enc, _IADT, 5)   # strip at T=5
        _int_encode(enc, _IAFS, 4)   # first S = 4
        _iaid_encode(enc, scl, 0)
        _int_encode(enc, _IADS, None)
        body = (
            struct.pack(">IIII", 12, 10, 0, 0) + b"\x00"
            + struct.pack(">H", corner << 4)
            + struct.pack(">I", 1)
            + enc.flush()
        )
        bits, rx, ry = decode_text_region(body, [sym])
        ys, xs = np.nonzero(bits)
        # RIGHT corners advance CURS by WI-1 BEFORE drawing (T.88
        # 6.4.5(vi)), so the first instance's left edge is FIRSTS for
        # all four corners; the corner choice shows up in T:
        assert (xs.min(), xs.max()) == (4, 6), corner
        # T=5 is the top row for TOP corners, bottom row for BOTTOM
        assert ys.min() == (5 if corner in (1, 3) else 4), corner


def test_scanned_pdf_jbig2_symbolic_extracted():
    from pdf2pdfocr_ray.functions.imagecodec import decode_image
    from pdf2pdfocr_ray.functions.minipdf import build_scanned_pdf, parse_pdf
    from pdf2pdfocr_ray.functions.ocr_core import recognize_page
    from pdf2pdfocr_ray.functions.pagerender import render_page

    page = render_page(["Symbol Coded Scan 9"], dpi=72)
    bil = np.where(page.mean(axis=2) < 128, 0, 255).astype(np.uint8)
    pdf = build_scanned_pdf([("jbig2sym", bil)])
    doc = parse_pdf(pdf)
    payload = doc.pages[0].image_bytes
    assert payload is not None
    img = decode_image(payload)
    assert (img == np.repeat(bil[:, :, None], 3, axis=2)).all()
    assert [l.text for l in recognize_page(img, 2)] == [
        "Symbol Coded Scan 9"]


def test_region_offset_compositions():
    """Region placed at (x, y) inside a larger page ORs onto the page."""
    inner = np.zeros((2, 3), np.uint8)
    inner[0, 0] = inner[1, 2] = 1

    def segment(num, stype, body):
        return (
            struct.pack(">IB", num, stype) + b"\x00\x01"
            + struct.pack(">I", len(body)) + body
        )

    page_body = struct.pack(">IIII", 8, 6, 0, 0) + struct.pack(">BH", 0, 0)
    at = b"".join(bytes([a & 0xFF, b & 0xFF]) for a, b in
                  ((3, -1), (-3, -1), (2, -2), (-2, -2)))
    region_body = (
        struct.pack(">IIII", 3, 2, 4, 3) + b"\x00" + b"\x00" + at
        + encode_generic_arith(inner)
    )
    data = segment(0, 48, page_body) + segment(1, 39, region_body)
    out = decode_jbig2_embedded(data)
    assert out.shape == (6, 8)
    exp = np.full((6, 8), 255, np.uint8)
    exp[3, 4] = 0
    exp[4, 6] = 0
    assert (out == exp).all()


def test_scanned_pdf_jbig2_extracted():
    from pdf2pdfocr_ray.functions.imagecodec import decode_image
    from pdf2pdfocr_ray.functions.minipdf import build_scanned_pdf, parse_pdf
    from pdf2pdfocr_ray.functions.ocr_core import recognize_page
    from pdf2pdfocr_ray.functions.pagerender import render_page

    page = render_page(["Jbig Two Page 7"], dpi=72)
    bil = np.where(page.mean(axis=2) < 128, 0, 255).astype(np.uint8)
    pdf = build_scanned_pdf([("jbig2", bil)])
    doc = parse_pdf(pdf)
    payload = doc.pages[0].image_bytes
    assert payload is not None
    img = decode_image(payload)
    assert (img == np.repeat(bil[:, :, None], 3, axis=2)).all()
    assert [l.text for l in recognize_page(img, 2)] == ["Jbig Two Page 7"]


def test_text_region_dsoffset_combop_defpixel():
    """Hand-built text regions exercising fields our encoder never
    writes: a nonzero signed SBDSOFFSET widens inter-symbol gaps, XOR
    composition onto an all-black (SBDEFPIXEL=1) region carves the
    symbol out of the background."""
    from pdf2pdfocr_ray.functions.jbig2 import (
        _IADS, _IADT, _IAFS, _iaid_encode, _int_encode, _n_contexts,
        _symcodelen, decode_text_region,
    )

    sym = np.ones((2, 2), np.uint8)
    scl = _symcodelen(1)

    # --- SBDSOFFSET = 3: second instance lands 3 columns later than the
    # IDS delta alone would place it
    enc = MQEncoder(_n_contexts(scl))
    _int_encode(enc, _IADT, 0)
    _int_encode(enc, _IADT, 0)   # strip at T=0
    _int_encode(enc, _IAFS, 0)   # first S = 0
    _iaid_encode(enc, scl, 0)
    _int_encode(enc, _IADS, 1)   # CURS += 1 + dsoffset(3)
    _iaid_encode(enc, scl, 0)
    _int_encode(enc, _IADS, None)
    flags = (1 << 4) | (3 << 10)  # TOPLEFT, SBDSOFFSET=+3
    body = (
        struct.pack(">IIII", 12, 4, 0, 0) + b"\x00"
        + struct.pack(">H", flags) + struct.pack(">I", 2) + enc.flush()
    )
    bits, _, _ = decode_text_region(body, [sym])
    xs = sorted(set(np.nonzero(bits)[1].tolist()))
    # first instance at x 0-1 (CURS advances to 1), second: 1+1+3=5 -> 5-6
    assert xs == [0, 1, 5, 6], xs

    # --- SBDEFPIXEL=1 + XOR: symbol pixels flip the black background
    enc = MQEncoder(_n_contexts(scl))
    _int_encode(enc, _IADT, 0)
    _int_encode(enc, _IADT, 1)
    _int_encode(enc, _IAFS, 1)
    _iaid_encode(enc, scl, 0)
    _int_encode(enc, _IADS, None)
    flags = (1 << 4) | (1 << 9) | (2 << 7)  # TOPLEFT, defpixel 1, XOR
    body = (
        struct.pack(">IIII", 5, 4, 0, 0) + b"\x00"
        + struct.pack(">H", flags) + struct.pack(">I", 1) + enc.flush()
    )
    bits, _, _ = decode_text_region(body, [sym])
    exp = np.ones((4, 5), np.uint8)
    exp[1:3, 1:3] = 0  # XOR carved the 2x2 symbol out
    assert (bits == exp).all()
