"""Minimal real-syntax PDF writer/parser for the synthetic corpus.

The corpus's PDF payloads are genuine minimal PDFs (``%PDF-1.4`` header,
numbered objects, page tree, literal-string content streams, trailer) whose
page content streams carry the text lines that the deterministic rasterizer
renders into "scanned" page images.  Scan-distortion parameters (dpi,
rotation, shear, ink color) ride in each page's ``/PieceInfo`` dict — the
PDF-spec-sanctioned slot for private page data.

Engine-side this module is the replacement for the reference's PyPDF2
open/validate/metadata read (/root/reference/pdf2pdfocr.py:1169-1198):
``parse_pdf`` yields page count, encryption flag (``/Encrypt`` in trailer,
reference 1196-1198), the has-fonts check standing in for ``pdffonts``
(reference 1215-1227: a PDF with font resources already has a text layer),
and per-page content for rasterization.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

PDF_HEADER = b"%PDF-1.4"
PRODUCER = "pdf2pdfocr_ray"


@dataclass
class PageSpec:
    """One synthetic page: text lines + scan-distortion profile."""

    lines: list[str] = field(default_factory=list)
    dpi: int = 72
    rot_k: int = 0  # page was rotated rot_k*90 deg CCW when "scanned"
    shear: float = 0.0  # integer-shear slope (on DESKEW_SLOPES grid)
    color: bool = False  # True -> non-greyscale ink
    blank: bool = False  # True -> solid-white page, lines ignored
    blank_w_u: int = 100  # blank page width in layout units
    blank_h_u: int = 140  # blank page height in layout units


@dataclass
class MiniPdfDoc:
    n_pages: int
    is_encrypted: bool
    has_native_text: bool
    metadata: dict[str, str]
    pages: list[PageSpec] | None  # None when encrypted (content inaccessible)


def _esc(s: str) -> bytes:
    """Encode a python string as a PDF literal string body (UTF-8 + escapes)."""
    out = bytearray()
    for b in s.encode("utf-8"):
        if b in (0x5C, 0x28, 0x29):  # \ ( )
            out += b"\\" + bytes([b])
        elif 32 <= b < 127:
            out.append(b)
        else:
            out += b"\\%03o" % b
    return bytes(out)


def _unesc(body: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(body):
        b = body[i]
        if b == 0x5C:  # backslash
            nxt = body[i + 1 : i + 2]
            if nxt.isdigit():
                j = i + 1
                while j < len(body) and j < i + 4 and chr(body[j]).isdigit():
                    j += 1
                out.append(int(body[i + 1 : j], 8))
                i = j
                continue
            out.append(body[i + 1])
            i += 2
            continue
        out.append(b)
        i += 1
    return out.decode("utf-8")


def build_pdf(
    pages: list[PageSpec],
    *,
    encrypted: bool = False,
    native_text: bool = False,
    title: str = "",
) -> bytes:
    """Assemble a minimal PDF.  Objects: 1=Catalog, 2=Pages, then per page a
    Page object + Contents stream; optional Font object (native-text marker)
    and Info dict; trailer carries /Encrypt when ``encrypted``."""
    objs: list[bytes] = []  # objs[i] is object number i+1

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    catalog_no = add(b"")  # placeholder, patched below
    pages_no = add(b"")
    font_no = 0
    if native_text:
        font_no = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    kid_nos: list[int] = []
    for p in pages:
        if p.blank:
            content = b""
            w_pt = p.blank_w_u * 72 // 36
            h_pt = p.blank_h_u * 72 // 36
        else:
            parts = [b"BT /F1 12 Tf 36 720 Td"]
            for i, line in enumerate(p.lines):
                if i:
                    parts.append(b"0 -14 Td")
                parts.append(b"(" + _esc(line) + b") Tj")
            parts.append(b"ET")
            content = b" ".join(parts)
            w_pt, h_pt = 612, 792
        cont_no = add(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)
        )
        piece = (
            b"<< /Dpi %d /Rot %d /Shear %s /Color %s /Blank %s /BlankW %d /BlankH %d >>"
            % (
                p.dpi,
                p.rot_k,
                repr(round(p.shear, 4)).encode(),
                b"true" if p.color else b"false",
                b"true" if p.blank else b"false",
                p.blank_w_u,
                p.blank_h_u,
            )
        )
        res = b" /Resources << /Font << /F1 %d 0 R >> >>" % font_no if native_text else b""
        kid_nos.append(
            add(
                b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 %d %d] "
                b"/Contents %d 0 R /PieceInfo %s%s >>"
                % (pages_no, w_pt, h_pt, cont_no, piece, res)
            )
        )

    kids = b" ".join(b"%d 0 R" % n for n in kid_nos)
    objs[pages_no - 1] = b"<< /Type /Pages /Kids [%s] /Count %d >>" % (
        kids,
        len(pages),
    )
    objs[catalog_no - 1] = b"<< /Type /Catalog /Pages %d 0 R >>" % pages_no

    info_no = add(
        b"<< /Producer (" + _esc(PRODUCER) + b") /Title (" + _esc(title) + b") >>"
    )
    encrypt_no = add(b"<< /Filter /Standard /V 1 /R 2 >>") if encrypted else 0

    buf = bytearray(PDF_HEADER + b"\n")
    offsets = [0] * (len(objs) + 1)
    for i, body in enumerate(objs, start=1):
        offsets[i] = len(buf)
        buf += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += b"xref\n0 %d\n" % (len(objs) + 1)
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += b"%010d 00000 n \n" % off
    trailer = b"<< /Size %d /Root %d 0 R /Info %d 0 R" % (
        len(objs) + 1,
        catalog_no,
        info_no,
    )
    if encrypted:
        trailer += b" /Encrypt %d 0 R" % encrypt_no
    trailer += b" >>"
    buf += b"trailer\n" + trailer + b"\nstartxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(buf)


_OBJ_RE = re.compile(rb"(\d+) 0 obj\n(.*?)\nendobj\n", re.S)
_TJ_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\) Tj")
_PIECE_RE = re.compile(
    rb"/PieceInfo << /Dpi (\d+) /Rot (\d+) /Shear (-?[\d.]+) /Color (true|false) "
    rb"/Blank (true|false) /BlankW (\d+) /BlankH (\d+) >>"
)
_META_RE = re.compile(rb"/(Producer|Title) \(((?:[^()\\]|\\.)*)\)")


def parse_pdf(data: bytes) -> MiniPdfDoc:
    """Parse a corpus mini-PDF.  Raises ValueError on corrupt input (the
    engine's stages catch this into the ``error`` column — row-level fault
    isolation replacing the reference's per-file abort at pdf2pdfocr.py:1169-1175)."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    if b"%%EOF" not in data[-64:]:
        raise ValueError("truncated PDF (missing %%EOF)")
    tail = data[data.rfind(b"trailer") :]
    if b"trailer" not in tail:
        raise ValueError("corrupt PDF (missing trailer)")
    is_encrypted = b"/Encrypt" in tail

    objects: dict[int, bytes] = {
        int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)
    }
    if not objects:
        raise ValueError("corrupt PDF (no objects)")

    count_m = re.search(rb"/Type /Pages /Kids \[([^\]]*)\] /Count (\d+)", data)
    if count_m is None:
        raise ValueError("corrupt PDF (no page tree)")
    kid_nos = [int(t.split()[0]) for t in re.findall(rb"\d+ 0 R", count_m.group(1))]
    n_pages = int(count_m.group(2))
    if n_pages != len(kid_nos):
        raise ValueError("corrupt PDF (page count mismatch)")

    metadata: dict[str, str] = {}
    info_m = re.search(rb"/Info (\d+) 0 R", tail)
    if info_m and int(info_m.group(1)) in objects:
        for key, val in _META_RE.findall(objects[int(info_m.group(1))]):
            metadata[key.decode()] = _unesc(val)

    has_native_text = any(
        b"/Type /Font" in body for body in objects.values()
    )

    if is_encrypted:
        return MiniPdfDoc(n_pages, True, has_native_text, metadata, None)

    pages: list[PageSpec] = []
    for no in kid_nos:
        body = objects.get(no)
        if body is None or b"/Type /Page" not in body:
            raise ValueError(f"corrupt PDF (missing page object {no})")
        pm = _PIECE_RE.search(body)
        if pm is None:
            raise ValueError(f"corrupt PDF (page {no} missing PieceInfo)")
        dpi, rot_k = int(pm.group(1)), int(pm.group(2))
        shear = float(pm.group(3))
        color = pm.group(4) == b"true"
        blank = pm.group(5) == b"true"
        bw, bh = int(pm.group(6)), int(pm.group(7))
        cm = re.search(rb"/Contents (\d+) 0 R", body)
        if cm is None:
            raise ValueError(f"corrupt PDF (page {no} missing contents)")
        cont = objects.get(int(cm.group(1)), b"")
        sm = re.search(rb"stream\n(.*?)\nendstream", cont, re.S)
        stream = sm.group(1) if sm else b""
        lines = [_unesc(m) for m in _TJ_RE.findall(stream)]
        pages.append(
            PageSpec(
                lines=lines,
                dpi=dpi,
                rot_k=rot_k,
                shear=shear,
                color=color,
                blank=blank,
                blank_w_u=bw,
                blank_h_u=bh,
            )
        )
    return MiniPdfDoc(n_pages, False, has_native_text, metadata, pages)
