"""Searchable-PDF ("PDF sandwich") writer — the reference's actual output
artifact: each page's raster image with an INVISIBLE text layer (PDF text
render mode 3) positioned from the OCR spans, assembled in page order with
producer metadata.

Reference parity:
* per-page text-layer PDFs merged in page order — pdf2pdfocr.py:942-956;
* under/overlay zip of text layer and original pages —
  pdf2pdfocr_multibackground.py:34-95 (here fused: image + text in one
  content stream per page, text drawn over the image, invisible);
* producer metadata edit — pdf2pdfocr.py:1333-1374 (Producer set to the
  engine string, original /Title preserved);
* HocrTransform span layout semantics — pdf2pdfocr.py:278-437: px→pt via
  ``px / dpi * 72`` (349-354), per-word placement with horizontal scaling
  to the detected bbox, invisible render mode (the ``text_render_mode=3``
  of 420-424).

Layout model: one TJ array per text LINE whose string pieces are the
line's words (inter-word spaces embedded in the pieces) and whose kerning
numbers place each word's start at its detected bbox x — so a PDF viewer
sees words at their scanned positions, while text extraction concatenates
the pieces back to the exact OCR line (the byte-identity invariant this
repo's ``pdfparse.extract_text_lines`` checks).

The per-page output is a self-contained FRAGMENT blob (image payload +
content ops + geometry) designed to ride an Arrow binary column through
the assembly shuffle; ``assemble_pdf`` concatenates fragments into one
real PDF (classic xref, FlateDecode streams).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .hocr import px_to_pt

PRODUCER = "pdf2pdfocr_ray (Ray Data searchable-PDF sink)"
_MAGIC = b"PFRG1"
# Fixed-pitch advance fraction of the font size used for the invisible
# layer (the engine's 5x7 glyph grid: 6 advance units on a 7-unit em).
CHAR_W_FRAC = 6.0 / 7.0


def _group_lines(spans: list[dict]) -> list[list[dict]]:
    """Spans (reading order) -> lines.  New line when the next span starts
    at or left of the previous span's start, or strictly below its box."""
    lines: list[list[dict]] = []
    for s in spans:
        if not s.get("text"):
            continue
        if lines:
            prev = lines[-1][-1]
            same_row = s["y1"] < prev["y2"] and s["x1"] > prev["x1"]
            if not same_row:
                lines.append([s])
                continue
            lines[-1].append(s)
        else:
            lines.append([s])
    return lines


def _fmt(v: float) -> bytes:
    return (b"%.2f" % v).rstrip(b"0").rstrip(b".")


def _esc_pdf(s: str) -> bytes:
    out = bytearray()
    for b in s.encode("utf-8"):
        if b in (0x5C, 0x28, 0x29):
            out += b"\\" + bytes([b])
        elif 32 <= b < 127:
            out.append(b)
        else:
            out += b"\\%03o" % b
    return bytes(out)


def invisible_text_ops(
    spans: list[dict], dpi: int, page_h_pt: float
) -> bytes:
    """OCR spans -> content-stream ops for the invisible text layer.

    One BT..ET per line: ``3 Tr`` (invisible), font size = line height in
    points, ``Td`` to the first word's baseline, then a TJ array placing
    each subsequent word at its bbox x via a kerning number (PDF kerning
    is in thousandths of the font size, subtracted from the advance)."""
    ops: list[bytes] = []
    for line in _group_lines(spans):
        x1 = px_to_pt(line[0]["x1"], dpi)
        y2 = max(px_to_pt(w["y2"], dpi) for w in line)
        y1 = min(px_to_pt(w["y1"], dpi) for w in line)
        size = max(y2 - y1, 1.0)
        baseline = page_h_pt - y2
        pieces: list[bytes] = []
        cursor = x1  # natural pen x after pieces emitted so far
        for i, w in enumerate(line):
            wx = px_to_pt(w["x1"], dpi)
            if i:
                gap_pt = wx - cursor
                kern = -gap_pt / size * 1000.0
                pieces.append(b"%d" % round(kern))
                cursor = wx
            text = w["text"] + (" " if i + 1 < len(line) else "")
            pieces.append(b"(" + _esc_pdf(text) + b")")
            cursor += len(text) * CHAR_W_FRAC * size
        ops.append(
            b"BT 3 Tr /F1 "
            + _fmt(size)
            + b" Tf "
            + _fmt(x1)
            + b" "
            + _fmt(baseline)
            + b" Td ["
            + b" ".join(pieces)
            + b"] TJ ET"
        )
    return b"\n".join(ops)


def build_page_fragment(
    img: "np.ndarray | None",
    dpi: int,
    spans: list[dict],
    width_px: int,
    height_px: int,
) -> bytes:
    """One OCR'd page -> self-contained sandwich fragment bytes.

    ``img`` is the page raster (H,W) grey or (H,W,3) RGB uint8, or None
    (no raster — text-only page).  Geometry: page box = raster size at
    ``dpi`` converted to points (reference px→pt rule)."""
    w_px = img.shape[1] if img is not None else width_px
    h_px = img.shape[0] if img is not None else height_px
    dpi = dpi or 72
    w_pt = px_to_pt(w_px, dpi)
    h_pt = px_to_pt(h_px, dpi)

    content = bytearray()
    img_flate = b""
    img_w = img_h = channels = 0
    if img is not None:
        arr = np.ascontiguousarray(img, dtype=np.uint8)
        if arr.ndim == 2:
            channels = 1
        else:
            channels = arr.shape[2]
            if channels == 1:
                arr = arr[:, :, 0]
        img_h, img_w = arr.shape[0], arr.shape[1]
        img_flate = zlib.compress(arr.tobytes(), 6)
        content += (
            b"q "
            + _fmt(w_pt)
            + b" 0 0 "
            + _fmt(h_pt)
            + b" 0 0 cm /Im0 Do Q\n"
        )
    content += invisible_text_ops(spans or [], dpi, h_pt)

    head = struct.pack(
        "<ddiiii", w_pt, h_pt, img_w, img_h, channels, len(img_flate)
    )
    return _MAGIC + head + img_flate + bytes(content)


def parse_fragment(blob: bytes) -> dict:
    if not blob.startswith(_MAGIC):
        raise ValueError("not a sandwich fragment")
    off = len(_MAGIC)
    w_pt, h_pt, img_w, img_h, channels, n_img = struct.unpack_from(
        "<ddiiii", blob, off
    )
    off += struct.calcsize("<ddiiii")
    return {
        "w_pt": w_pt,
        "h_pt": h_pt,
        "img_w": img_w,
        "img_h": img_h,
        "channels": channels,
        "img_flate": blob[off : off + n_img],
        "content": blob[off + n_img :],
    }


def assemble_pdf(
    fragments: list[bytes],
    *,
    title: str | None = None,
    producer: str = PRODUCER,
) -> bytes:
    """Page fragments (page order) -> one searchable PDF.

    Classic layout: catalog, page tree, shared Type1 font, then per page
    an image XObject (FlateDecode raw samples, DeviceGray/DeviceRGB) and
    a FlateDecode content stream.  /Info carries the engine Producer and
    the preserved source /Title (reference metadata edit semantics,
    pdf2pdfocr.py:1333-1374)."""
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    catalog_no = add(b"")  # patched
    pages_no = add(b"")  # patched
    font_no = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>")

    kid_nos: list[int] = []
    for blob in fragments:
        f = parse_fragment(blob)
        res_parts = [b"/Font << /F1 %d 0 R >>" % font_no]
        if f["img_w"]:
            cs = b"/DeviceGray" if f["channels"] == 1 else b"/DeviceRGB"
            img_no = add(
                b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
                b"/ColorSpace %s /BitsPerComponent 8 /Filter /FlateDecode "
                b"/Length %d >>\nstream\n"
                % (f["img_w"], f["img_h"], cs, len(f["img_flate"]))
                + f["img_flate"]
                + b"\nendstream"
            )
            res_parts.append(b"/XObject << /Im0 %d 0 R >>" % img_no)
        comp = zlib.compress(f["content"], 6)
        cont_no = add(
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
            + comp
            + b"\nendstream"
        )
        kid_nos.append(
            add(
                b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 %s %s] "
                b"/Resources << %s >> /Contents %d 0 R >>"
                % (
                    pages_no,
                    _fmt(f["w_pt"]),
                    _fmt(f["h_pt"]),
                    b" ".join(res_parts),
                    cont_no,
                )
            )
        )

    kids = b" ".join(b"%d 0 R" % n for n in kid_nos)
    objs[pages_no - 1] = b"<< /Type /Pages /Kids [%s] /Count %d >>" % (
        kids,
        len(kid_nos),
    )
    objs[catalog_no - 1] = b"<< /Type /Catalog /Pages %d 0 R >>" % pages_no
    info = b"<< /Producer (" + _esc_pdf(producer) + b")"
    if title:
        info += b" /Title (" + _esc_pdf(title) + b")"
    info += b" >>"
    info_no = add(info)

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0] * (len(objs) + 1)
    for i, body in enumerate(objs, start=1):
        offsets[i] = len(buf)
        buf += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += b"xref\n0 %d\n" % (len(objs) + 1)
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size %d /Root %d 0 R /Info %d 0 R >>\n"
        b"startxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, catalog_no, info_no, xref_at)
    )
    return bytes(buf)
