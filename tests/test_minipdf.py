"""Mini-PDF builder/parser property tests (hypothesis): build->parse
roundtrip fidelity, corruption detection, native-text extraction."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf2pdfocr_ray.functions.minipdf import PageSpec, build_pdf, parse_pdf

# Printable-latin line content the PDF string escaper must round-trip,
# including the escape-sensitive chars ( ) \ and ligatures.
line_st = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ 0123()\\ﬁﬂéã.")
    ),
    min_size=0,
    max_size=40,
)
page_st = st.one_of(
    st.builds(
        PageSpec,
        lines=st.lists(line_st, min_size=1, max_size=4),
        dpi=st.sampled_from([36, 72, 144]),
        rot_k=st.integers(0, 3),
        shear=st.sampled_from([0.0, 0.04, -0.1]),
        color=st.booleans(),
    ),
    st.builds(
        PageSpec,
        blank=st.just(True),
        blank_w_u=st.integers(40, 200),
        blank_h_u=st.integers(40, 200),
    ),
)


@settings(max_examples=40, deadline=None)
@given(pages=st.lists(page_st, min_size=1, max_size=6), native=st.booleans())
def test_build_parse_roundtrip(pages, native):
    data = build_pdf(pages, native_text=native)
    doc = parse_pdf(data)
    assert doc.n_pages == len(pages)
    assert doc.is_encrypted is False
    assert doc.has_native_text is native
    for spec, parsed in zip(pages, doc.pages):
        assert parsed.blank == spec.blank
        if spec.blank:
            assert (parsed.blank_w_u, parsed.blank_h_u) == (
                spec.blank_w_u,
                spec.blank_h_u,
            )
        else:
            assert parsed.lines == spec.lines
            assert parsed.dpi == spec.dpi
            assert parsed.rot_k == spec.rot_k
            assert abs(parsed.shear - round(spec.shear, 4)) < 1e-9
            assert parsed.color == spec.color


def test_encrypted_detected_without_page_parse():
    data = build_pdf([PageSpec(lines=["secret"])], encrypted=True)
    doc = parse_pdf(data)
    assert doc.is_encrypted and doc.pages is None


@settings(max_examples=30, deadline=None)
@given(cut=st.floats(0.05, 0.95))
def test_truncation_always_detected(cut):
    data = build_pdf([PageSpec(lines=["hello world"]), PageSpec(blank=True)])
    trunc = data[: int(len(data) * cut)]
    with pytest.raises(ValueError):
        parse_pdf(trunc)


def test_non_pdf_rejected():
    with pytest.raises(ValueError):
        parse_pdf(b"\x00garbage")
    with pytest.raises(ValueError):
        parse_pdf(b"%PDF-1.4\nnot really")
