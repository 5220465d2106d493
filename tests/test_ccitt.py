"""CCITT Group 4 (T.6) codec: roundtrips, hand-assembled vectors against
the public T.4 code tables, and the scanned-PDF extraction path."""

import numpy as np
import pytest

from pdf2pdfocr_ray.functions.ccitt import decode_g4, encode_g4


def _bits(data: bytes) -> str:
    return "".join(f"{b:08b}" for b in data)


def test_roundtrip_random_bilevel():
    rng = np.random.default_rng(7)
    for _ in range(15):
        h, w = int(rng.integers(1, 50)), int(rng.integers(1, 90))
        img = np.where(rng.random((h, w)) < 0.35, 0, 255).astype(np.uint8)
        assert (decode_g4(encode_g4(img), w, h) == img).all()


def test_roundtrip_text_page_and_compression():
    from pdf2pdfocr_ray.functions.pagerender import render_page

    page = render_page(["CCITT Group Four Test", "Second Line"], dpi=72)
    bil = np.where(page.mean(axis=2) < 128, 0, 255).astype(np.uint8)
    enc = encode_g4(bil)
    assert (decode_g4(enc, bil.shape[1], bil.shape[0]) == bil).all()
    assert len(enc) < bil.size // 20  # real 2D compression, not a passthrough


def test_black_is_1_and_byte_align():
    img = np.where(np.eye(9, 13) > 0, 0, 255).astype(np.uint8)
    enc = encode_g4(img)
    assert (decode_g4(enc, 13, 9, black_is_1=True) == 255 - img).all()


def test_hand_vector_horizontal_mode():
    """Row [w2 b3 w3]: first change pair is coded in horizontal mode with
    the published MH codes white-2 = 0111, black-3 = 10; the trailing
    white run reaches the row end exactly where b1 does -> V0 = 1."""
    img = np.array([[255, 255, 0, 0, 0, 255, 255, 255]], np.uint8)
    enc = encode_g4(img, eofb=False)
    assert _bits(enc).startswith("001" + "0111" + "10" + "1")
    assert (decode_g4(enc, 8, 1) == img).all()


def test_hand_vector_vertical_and_pass():
    """Second row shifted by one -> pure vertical codes; a run that ends
    before the new one starts -> pass mode (0001) appears."""
    img = np.array(
        [[255, 0, 0, 255, 255, 255, 255, 255],
         [255, 255, 0, 0, 255, 255, 255, 255]],  # VR1 on both edges
        np.uint8,
    )
    enc = encode_g4(img, eofb=False)
    s = _bits(enc)
    # row 1: H + white1(000111) + black2(11), then V0 at row end
    # row 2: VR1 (011) twice, then V0
    assert "011" in s
    assert (decode_g4(enc, 8, 2) == img).all()
    # pass mode: black run on ref line ends left of the cur-line run
    img2 = np.array(
        [[255, 0, 255, 255, 255, 255, 0, 255],
         [255, 255, 255, 255, 255, 255, 0, 255]],
        np.uint8,
    )
    enc2 = encode_g4(img2, eofb=False)
    assert "0001" in _bits(enc2)
    assert (decode_g4(enc2, 8, 2) == img2).all()


def test_makeup_codes_long_runs():
    # runs > 64 and > 1728 exercise per-color make-up + extended codes
    img = np.full((2, 2600), 255, np.uint8)
    img[0, 100:2500] = 0
    img[1, :2000] = 0
    assert (decode_g4(encode_g4(img), 2600, 2) == img).all()


def test_truncated_stream_raises():
    img = np.where(np.eye(20, 20) > 0, 0, 255).astype(np.uint8)
    enc = encode_g4(img, eofb=False)
    with pytest.raises(ValueError):
        decode_g4(enc[: len(enc) // 3], 20, 20)


def test_scanned_pdf_ccitt_image_extracted():
    """A PDF whose page image is /CCITTFaxDecode K=-1 extracts through
    pdfparse -> ccitt -> RAWB and OCRs byte-identically."""
    from pdf2pdfocr_ray.functions.imagecodec import decode_image
    from pdf2pdfocr_ray.functions.minipdf import build_scanned_pdf, parse_pdf
    from pdf2pdfocr_ray.functions.pagerender import render_page

    page = render_page(["Fax Encoded Page 42"], dpi=72)
    bil = np.where(page.mean(axis=2) < 128, 0, 255).astype(np.uint8)
    pdf = build_scanned_pdf([("g4", bil)])
    doc = parse_pdf(pdf)
    assert doc.n_pages == 1
    payload = doc.pages[0].image_bytes
    assert payload is not None
    img = decode_image(payload)
    assert (img == np.repeat(bil[:, :, None], 3, axis=2)).all()
    from pdf2pdfocr_ray.functions.ocr_core import recognize_page

    assert [l.text for l in recognize_page(img, 2)] == ["Fax Encoded Page 42"]


# ------------------------------------------------------- property-based
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.data())
    def test_g4_roundtrip_property(data):
        h = data.draw(st.integers(1, 24))
        w = data.draw(st.integers(1, 48))
        rows = data.draw(
            st.lists(
                st.lists(st.booleans(), min_size=w, max_size=w),
                min_size=h, max_size=h,
            )
        )
        img = np.where(np.array(rows, bool), 0, 255).astype(np.uint8)
        assert (decode_g4(encode_g4(img), w, h) == img).all()

except ImportError:  # pragma: no cover
    pass


def test_g3_roundtrips_all_modes():
    """T.4 Group 3: K=0 (pure MH, with and without EOL framing) and
    K>0 (mixed 1D/2D) roundtrip a rendered page byte-identically."""
    from pdf2pdfocr_ray.functions.ccitt import decode_g3, encode_g3
    from pdf2pdfocr_ray.functions.pagerender import render_page

    page = render_page(["fax era scan 77", "group three test"], dpi=72)
    bil = np.where(page.mean(axis=2) < 128, 0, 255).astype(np.uint8)
    h, w = bil.shape
    for k, eol in [(0, False), (0, True), (2, None), (4, None)]:
        blob = encode_g3(bil, k=k, end_of_line=eol)
        out = decode_g3(blob, w, h, k=k, end_of_line=bool(eol))
        assert (out == bil).all(), (k, eol)
    # 2D coding against the previous row must beat pure 1D on text
    assert len(encode_g3(bil, k=4)) < len(encode_g3(bil, k=0))


def test_g3_edge_cases():
    from pdf2pdfocr_ray.functions.ccitt import decode_g3, encode_g3

    img = np.zeros((5, 16), np.uint8)  # all black (zero-len white run)
    blob = encode_g3(img)
    assert (decode_g3(blob, 16, 5) == img).all()
    assert (decode_g3(blob, 16, 5, black_is_1=True) == 255 - img).all()
    # short stream: remaining rows stay white (fax RTC behavior)
    page = np.full((8, 16), 255, np.uint8)
    page[:3, 2:9] = 0
    out = decode_g3(encode_g3(page[:3]), 16, 8)
    assert (out[:3] == page[:3]).all() and (out[3:] == 255).all()


def test_scanned_pdf_g3_extracted():
    from pdf2pdfocr_ray.functions.imagecodec import decode_image
    from pdf2pdfocr_ray.functions.minipdf import build_scanned_pdf, parse_pdf
    from pdf2pdfocr_ray.functions.ocr_core import recognize_page
    from pdf2pdfocr_ray.functions.pagerender import render_page

    for kind in ("g3", "g3_2d"):
        page = render_page(["Group Three Fax 3"], dpi=72)
        bil = np.where(page.mean(axis=2) < 128, 0, 255).astype(np.uint8)
        pdf = build_scanned_pdf([(kind, bil)])
        doc = parse_pdf(pdf)
        payload = doc.pages[0].image_bytes
        assert payload is not None, kind
        img = decode_image(payload)
        assert (img == np.repeat(bil[:, :, None], 3, axis=2)).all(), kind
        assert [l.text for l in recognize_page(img, 2)] == [
            "Group Three Fax 3"], kind


def test_g3_property_roundtrip():
    """Property: any bilevel image roundtrips through every G3 mode."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdf2pdfocr_ray.functions.ccitt import decode_g3, encode_g3

    @settings(max_examples=20, deadline=None)
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 40),
        p=st.floats(0.0, 1.0),
        k=st.sampled_from([0, 2, 4]),
        seed=st.integers(0, 2**31),
    )
    def check(h, w, p, k, seed):
        rng = np.random.default_rng(seed)
        img = np.where(rng.random((h, w)) < p, 0, 255).astype(np.uint8)
        out = decode_g3(encode_g3(img, k=k), w, h, k=k)
        assert (out == img).all()

    check()
