"""hOCR generation and parsing + the text-layer invariant functions.

Mirrors the reference's hOCR handling faithfully, re-expressed columnar:

* emit: the OCR stage writes real hOCR XML per page (the reference gets this
  from ``tesseract ... hocr``, /root/reference/pdf2pdfocr.py:116-126);
* parse: bbox regex ``bbox((\\s+\\d+){4})`` on the ``title`` attribute
  (reference pdf2pdfocr.py:288-290, 336-347) and recursive text+tail walk
  (reference 311-334);
* element-class fallback: use ``ocrx_word`` spans when present, else
  ``ocr_line`` (reference HocrTransform 398-402);
* ligature normalization ﬂ→fl / ﬁ→fi (reference 356-366 — part of the
  byte-identical text invariant);
* px→pt: ``px / dpi * 72`` (reference 349-354, 257-260);
* malformed hOCR → hardcoded A4 ``ocr_page`` stub, bbox 0 0 1700 2400
  (reference cuneiform repair path 192-205).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass

from .ocr_core import LineBox

BBOX_RE = re.compile(r"bbox((\s+\d+){4})")
POINTS_PER_INCH = 72
A4_STUB_BBOX = (0, 0, 1700, 2400)  # reference pdf2pdfocr.py:199-200

_LIGATURES = (("ﬂ", "fl"), ("ﬁ", "fi"))  # ﬂ, ﬁ


def normalize_ligatures(text: str) -> str:
    """Reference pdf2pdfocr.py:356-366 (replace_unsupported_chars)."""
    for src, dst in _LIGATURES:
        text = text.replace(src, dst)
    return text


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace('"', "&quot;")
    )


def emit_hocr(lines: list[LineBox], width_px: int, height_px: int, dpi: int) -> bytes:
    """Recognized lines -> hOCR XML bytes (ocr_page > ocr_line > ocrx_word)."""
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<html xmlns="http://www.w3.org/1999/xhtml">\n<body>\n'
        f'<div class="ocr_page" title="bbox 0 0 {width_px} {height_px}; scan_res {dpi} {dpi}">\n'
    ]
    for li, line in enumerate(lines, start=1):
        x1, y1, x2, y2 = line.bbox
        parts.append(f'<span class="ocr_line" id="line_{li}" title="bbox {x1} {y1} {x2} {y2}">')
        for wi, w in enumerate(line.words, start=1):
            parts.append(
                f'<span class="ocrx_word" id="word_{li}_{wi}" '
                f'title="bbox {w.x1} {w.y1} {w.x2} {w.y2}">{_esc(w.text)}</span> '
            )
        parts.append("</span>\n")
    parts.append("</div>\n</body>\n</html>\n")
    return "".join(parts).encode("utf-8")


A4_STUB_HOCR = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<html xmlns="http://www.w3.org/1999/xhtml">\n<body>\n'
    '<div class="ocr_page" title="bbox 0 0 1700 2400">\n'
    "</div>\n</body>\n</html>\n"
).encode("utf-8")


@dataclass
class Span:
    text: str
    x1: int
    y1: int
    x2: int
    y2: int
    kind: str  # ocrx_word | ocr_line | ocr_par | ocr_page


@dataclass
class HocrPage:
    width_px: int
    height_px: int
    spans: list[Span]
    text: str  # normalized page text: lines joined by \n, trailing \n


def _elem_class(el: ET.Element) -> str | None:
    return el.get("class")


def _bbox_of(el: ET.Element) -> tuple[int, int, int, int] | None:
    title = el.get("title") or ""
    m = BBOX_RE.search(title)
    if m is None:
        return None
    a = m.group(1).split()
    return int(a[0]), int(a[1]), int(a[2]), int(a[3])


def _text_of(el: ET.Element) -> str:
    """Recursive text+tail concat (reference __str__ walk at 311-334)."""
    parts = [el.text or ""]
    for child in el:
        parts.append(_text_of(child))
        parts.append(child.tail or "")
    return "".join(parts)


def parse_hocr(data: bytes) -> HocrPage:
    """hOCR bytes -> page dims + spans + normalized text.

    Word-level spans are used when any ``ocrx_word`` exists in a line, else
    the line itself becomes one span (reference elemclass fallback, 398-402).
    Malformed XML raises ValueError (callers substitute the A4 stub page —
    reference repair path 192-205).
    """
    try:
        root = ET.fromstring(data.decode("utf-8"))
    except (ET.ParseError, UnicodeDecodeError) as e:
        raise ValueError(f"malformed hOCR: {e}") from e

    # strip namespaces for class-based walking (reference tolerates the
    # namespace-prefixed html tag, pdf2pdfocr.py:294-297)
    def walk(el: ET.Element, cls: str):
        tag_cls = _elem_class(el)
        if tag_cls == cls:
            yield el
        for ch in el:
            yield from walk(ch, cls)

    pages = list(walk(root, "ocr_page"))
    if not pages:
        raise ValueError("malformed hOCR: no ocr_page element")
    page = pages[0]
    pb = _bbox_of(page)
    if pb is None:
        raise ValueError("malformed hOCR: ocr_page missing bbox")
    _, _, width_px, height_px = pb

    spans: list[Span] = []
    line_texts: list[str] = []
    for line in walk(page, "ocr_line"):
        lb = _bbox_of(line)
        words = [
            (w, _bbox_of(w))
            for w in walk(line, "ocrx_word")
            if _bbox_of(w) is not None
        ]
        wtexts = []
        if words:
            for w, (x1, y1, x2, y2) in words:
                t = normalize_ligatures(_text_of(w).strip())
                if not t:
                    continue  # empty-text elements skipped (reference 391-392)
                spans.append(Span(t, x1, y1, x2, y2, "ocrx_word"))
                wtexts.append(t)
        elif lb is not None:
            t = normalize_ligatures(_text_of(line).strip())
            if t:
                spans.append(Span(t, *lb, "ocr_line"))
                wtexts.append(t)
        if wtexts:
            line_texts.append(" ".join(wtexts))
    text = "\n".join(line_texts) + "\n" if line_texts else ""
    return HocrPage(width_px, height_px, spans, text)


def px_to_pt(v: int | float, dpi: int) -> float:
    """Reference pdf2pdfocr.py:349-354: px / dpi * 72."""
    return v / dpi * POINTS_PER_INCH
