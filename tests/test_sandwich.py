"""Searchable-PDF sandwich tests (S7 parity: reference pdf2pdfocr.py
942-956 text-layer merge, 1333-1374 producer metadata, multibackground
34-95 page zip; HocrTransform render-mode-3 layout 278-437)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pdf2pdfocr_ray.functions.minipdf import parse_pdf
from pdf2pdfocr_ray.functions.pdfparse import PdfDocument, extract_text_lines
from pdf2pdfocr_ray.functions.sandwich import (
    PRODUCER,
    assemble_pdf,
    build_page_fragment,
    invisible_text_ops,
    parse_fragment,
)


def _spans_for(words, y1=10, y2=24, x0=30, step=60):
    return [
        {"text": w, "x1": x0 + i * step, "y1": y1, "x2": x0 + i * step + 50,
         "y2": y2, "kind": "ocrx_word"}
        for i, w in enumerate(words)
    ]


def test_fragment_roundtrip_geometry():
    img = np.full((140, 100), 200, np.uint8)
    frag = build_page_fragment(img, 72, _spans_for(["Hi"]), 100, 140)
    f = parse_fragment(frag)
    assert (f["img_w"], f["img_h"], f["channels"]) == (100, 140, 1)
    assert abs(f["w_pt"] - 100.0) < 1e-9 and abs(f["h_pt"] - 140.0) < 1e-9
    import zlib

    assert zlib.decompress(f["img_flate"]) == img.tobytes()


def test_invisible_ops_render_mode_and_text():
    ops = invisible_text_ops(_spans_for(["Hello", "World"]), 72, 140.0)
    assert b"3 Tr" in ops  # invisible render mode (reference 420-424)
    assert extract_text_lines(ops) == ["Hello World"]


def test_multi_line_grouping():
    spans = _spans_for(["One", "Two"]) + _spans_for(["Next", "Line"], y1=30, y2=44)
    ops = invisible_text_ops(spans, 72, 140.0)
    assert extract_text_lines(ops) == ["One Two", "Next Line"]


def test_assemble_pdf_parses_and_preserves_metadata():
    img = np.full((70, 50, 3), 128, np.uint8)
    frags = [
        build_page_fragment(img, 72, _spans_for(["Page", "one"]), 50, 70),
        build_page_fragment(img[:, :, 0], 72, _spans_for(["Page", "two"]), 50, 70),
    ]
    pdf = assemble_pdf(frags, title="My Scan")
    doc = PdfDocument(pdf)
    assert len(doc.pages()) == 2
    info = doc.info()
    assert info["Producer"] == PRODUCER
    assert info["Title"] == "My Scan"
    assert doc.has_fonts()  # the text layer declares its font
    # both colorspaces emitted
    assert b"/DeviceRGB" in pdf and b"/DeviceGray" in pdf
    # per-page text extraction through the generic parser
    m = parse_pdf(pdf)
    assert [s.lines for s in m.pages] == [["Page one"], ["Page two"]]


def test_kerning_places_words_at_bbox():
    """TJ kerning must land each word's pen position at its bbox x: the
    second word's kern number encodes (natural_end - desired_x)."""
    ops = invisible_text_ops(_spans_for(["ab", "cd"], step=60), 72, 140.0)
    # font size = 14pt, pieces "ab " (3 chars): natural advance =
    # 3 * (6/7) * 14 = 36pt from x=30 -> pen 66; desired x = 90;
    # kern = -(90-66)/14*1000 = -1714
    assert b"-1714" in ops


@pytest.mark.usefixtures("ray_session")
def test_sandwich_pipeline_end_to_end():
    import ray.data

    from pdf2pdfocr_ray.pipelines.sandwich import extract_sandwich
    from pdf2pdfocr_ray.sources.corpus import generate_corpus

    pages, golden = generate_corpus(40, seed=7)
    ds = ray.data.from_arrow(pages).repartition(4)
    res = extract_sandwich(ds).to_pandas().sort_values("url").reset_index(drop=True)
    g = golden.to_pandas().sort_values("url").reset_index(drop=True)
    assert len(res) == len(g)
    n_pdf = 0
    for i in range(len(g)):
        a, b = res["extracted_text"][i], g["extracted_text"][i]
        assert (a == b) or (pd.isna(a) and pd.isna(b))
        blob = res["pdf_bytes"][i]
        if res["route"][i] in ("pdf", "image") and res["error"][i] is None:
            assert blob is not None
            n_pdf += 1
            doc = parse_pdf(bytes(blob))
            txt = "".join(
                "\n".join(s.lines) + "\n"
                for s in doc.pages
                if not s.blank and s.lines
            )
            assert txt == (b or "")  # golden byte-identity via the sandwich
        else:
            assert blob is None
    assert n_pdf > 0
