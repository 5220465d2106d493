"""Unit tests for the font invariants and the render->OCR round trip.

Pins the deterministic OCR engine that replaces the reference's external
Tesseract (/root/reference/pdf2pdfocr.py:104-160): byte-exact recognition of
rendered pages at every supported DPI, under 90-degree rotation (OSD analog,
pdf2pdfocr.py:78-91) and integer shear (deskew analog, pdf2pdfocr.py:94-101).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf2pdfocr_ray.functions.font5x7 import (
    GLYPHS,
    LINE_SPLIT_UNITS,
    SUPPORTED_CHARS,
    _tight,
)
from pdf2pdfocr_ray.functions.image_ops import deskew, estimate_skew
from pdf2pdfocr_ray.functions.ocr_core import (
    detect_orientation,
    recognize_page,
)
from pdf2pdfocr_ray.functions.pagerender import (
    apply_rot90,
    apply_shear,
    render_page,
)

LINES = ["Hello World 123", "the quick brown fox", "Ligatures: ﬂow ﬁsh."]


def test_glyphs_have_no_internal_blank_columns():
    for ch, g in GLYPHS.items():
        assert g.any(axis=0).all(), f"glyph {ch!r} has an internal blank column"


def test_glyphs_internal_blank_row_runs_bounded():
    for ch, g in GLYPHS.items():
        t = _tight(g)
        blank = ~t.any(axis=1)
        run = best = 0
        for b in blank:
            run = run + 1 if b else 0
            best = max(best, run)
        assert best < LINE_SPLIT_UNITS, f"glyph {ch!r} blank-row run {best}"


def test_templates_unambiguous():
    # every glyph classifies back to itself (tight-template keys collide never)
    from pdf2pdfocr_ray.functions.font5x7 import classify_tight

    for ch, g in GLYPHS.items():
        assert classify_tight(_tight(g)) == ch


@pytest.mark.parametrize("dpi", [36, 72, 108, 144, 216, 288])
def test_roundtrip_multi_dpi(dpi):
    img = render_page(LINES, dpi=dpi)
    rec = [ln.text for ln in recognize_page(img, dpi // 36)]
    assert rec == LINES


@pytest.mark.parametrize("k", [0, 1, 2, 3])
def test_orientation_detect(k):
    img = render_page(LINES, dpi=72)
    rot = apply_rot90(img, k)
    assert detect_orientation(rot, 2) == k
    fixed = np.ascontiguousarray(np.rot90(rot, -k))
    assert [ln.text for ln in recognize_page(fixed, 2)] == LINES


@pytest.mark.parametrize("slope", [-0.2, -0.08, 0.0, 0.04, 0.12, 0.2])
def test_deskew_roundtrip(slope):
    img = render_page(LINES, dpi=72)
    sheared = apply_shear(img, slope)
    est = estimate_skew(sheared, scale=2)
    fixed = deskew(sheared, est)
    assert [ln.text for ln in recognize_page(fixed, 2)] == LINES


def test_word_bboxes_sane():
    img = render_page(["ab cd"], dpi=72)
    (line,) = recognize_page(img, 2)
    assert [w.text for w in line.words] == ["ab", "cd"]
    w0, w1 = line.words
    assert w0.x2 < w1.x1  # disjoint, ordered
    assert w0.y2 > w0.y1 and w0.x2 > w0.x1


def test_unsupported_char_renders_as_question():
    img = render_page(["aΩb"], dpi=72)  # Ω not in font
    (line,) = recognize_page(img, 2)
    assert line.text == "a?b"


def test_foreign_vocab_roundtrips():
    """Every FOREIGN_VOCAB token (currency signs, fractions, guillemets,
    cp1252-region letters — the widened-AGL corpus vocabulary) must
    render->recognize byte-identically: the corpus byte-identity gate
    rests on this invariant."""
    from pdf2pdfocr_ray.sources.corpus import FOREIGN_VOCAB

    lines = [" ".join(FOREIGN_VOCAB[i : i + 5])
             for i in range(0, len(FOREIGN_VOCAB), 5)]
    for dpi in (36, 72, 144):
        img = render_page(lines, dpi=dpi)
        rec = [ln.text for ln in recognize_page(img, dpi // 36)]
        assert rec == lines, f"dpi {dpi}"


def test_symbol_glyphs_survive_distortion():
    """The new symbol glyphs through the M3-M5 normalize path: shear +
    90-degree rotation must still recognize byte-identically (their
    narrow/low shapes — „ … · — are the segmentation-hostile cases)."""
    from pdf2pdfocr_ray.functions.ocr_core import normalize_page

    lines = ["€249,90 «citação» ½ Škoda œuvre", "„Zitat‚ etc… nº·1ª ±0,5%"]
    img = render_page(lines, dpi=72)
    for k in (0, 1, 3):
        for slope in (0.0, 0.08, -0.12):
            scan = apply_rot90(apply_shear(img, slope), k)
            fixed, got_k, got_slope = normalize_page(scan, 2)
            assert [l.text for l in recognize_page(fixed, 2)] == lines, (
                k, slope)


def test_symmetric_symbol_page_recovers_via_joint_normalize():
    """A page made ONLY of rotation-symmetric symbols (x-cross, divide,
    dots, ring glyphs) is the OSD-adversarial case: the cheap standalone
    detect_orientation can misread k=3 as 0 here, but the pipeline's
    joint rot90+deskew normalize_page scores full recognition and must
    still recover the text at every rotation."""
    from pdf2pdfocr_ray.functions.ocr_core import normalize_page

    lines = ["× ÷ ± − … · °º¹²³"]
    img = render_page(lines, dpi=72)
    for k in range(4):
        fixed, _, _ = normalize_page(apply_rot90(img, k), 2)
        assert [l.text for l in recognize_page(fixed, 2)] == lines, k


def test_low_glyph_only_lines_segment():
    """Lines whose every glyph is 1-2 ink rows tall (… „ ‚ ·) are the
    band-detection edge: the line band is far shorter than LINE_HEIGHT
    and must neither merge into a neighbor nor split."""
    for lines in (["… „ ‚ ·"], ["‚‚‚"], ["a", "…", "b"],
                  ["… normal text after"]):
        for dpi in (36, 72):
            img = render_page(lines, dpi=dpi)
            rec = [l.text for l in recognize_page(img, dpi // 36)]
            assert rec == lines, (lines, dpi, rec)


def test_supported_chars_cover_ascii_alnum():
    import string

    for ch in string.ascii_letters + string.digits:
        assert ch in SUPPORTED_CHARS


_GLYPH_ALPHABET = sorted(SUPPORTED_CHARS - {" "})


@settings(max_examples=60, deadline=None)
@given(
    lines=st.lists(
        st.text(alphabet=_GLYPH_ALPHABET, min_size=1, max_size=12).map(
            lambda s: " ".join(s[i : i + 4] for i in range(0, len(s), 4))
        ),
        min_size=1,
        max_size=4,
    )
)
def test_any_supported_text_roundtrips(lines):
    """Property: ANY text over the supported alphabet (all 137 glyphs,
    arbitrary adjacency — including glyph pairs no vocabulary exercises)
    renders and recognizes byte-identically at scale 1 and 2."""
    for dpi in (36, 72):
        img = render_page(lines, dpi=dpi)
        rec = [ln.text for ln in recognize_page(img, dpi // 36)]
        assert rec == lines
