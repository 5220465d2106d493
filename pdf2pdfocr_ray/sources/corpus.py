"""Deterministic synthetic Common-Crawl-style corpus generator + golden oracle.

Produces the ``pages`` input table mandated by BASELINE.json's input_hint —
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``
— with the FIXTURES.md row mix: ~70% HTML, ~20% PDF (page counts 1-5 plus
deliberately skewed giant docs for the repartition/skew path), ~5% image,
~5% corrupt/edge rows (encrypted PDFs, zero-byte, native-text PDFs, junk).

The golden ``extracted`` table is computed here by an independent oracle
path — the *specification* of each route's output, not the engine code:

* html  → blocks passing the content rule (>=30 chars, link density < 0.3,
  not inside a boilerplate container) joined by "\\n\\n";
* pdf   → per page "\\n".join(lines) + "\\n" with ligatures normalized
  (reference pdf2pdfocr.py:356-366), blank pages contribute "", pages
  concatenated in page order with no separator bytes (reference 928-940);
* image → per-frame pdf formula (PNG/JPEG: one page; multi-frame TIFF:
  frames concatenated in frame order — the S5 fan-out path);
* error rows → null text + error code.

Everything is seeded; no wall clock, no external data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hocr import normalize_ligatures
from ..functions.image_ops import DESKEW_SLOPES
from ..functions.minipdf import PageSpec, build_pdf
from ..functions.pagerender import (
    COLOR_INK,
    apply_rot90,
    apply_shear,
    render_page,
)
from ..functions.pngcodec import encode_png

# Font-supported vocabulary (OCR branch); includes ligature words to pin M6.
PDF_VOCAB = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "invoice",
    "total", "page", "report", "summary", "data", "table", "value", "amount",
    "ﬂow", "ﬂuid", "ﬁne", "ﬁrst", "ﬁsh", "final", "draft", "review", "signed",
    "Lorem", "ipsum", "dolor", "sit", "amet", "scan", "copy", "original",
    "2026", "410", "77", "1024", "A4", "Ref", "No.", "Q3",
]
# Foreign-PDF vocabulary: PDF_VOCAB plus symbol-bearing tokens covering the
# widened AGL glyph-name table (pdftext._AGL_BASE).  Foreign PDFs are
# rasterized + OCR'd in the flagship, so every char here must also be in the
# 5x7 render/OCR font; in /Differences mode these store as NAMED glyphs
# (/Euro, /onehalf, /Scaron...), certifying the name table end-to-end
# through the byte-identity gate.
FOREIGN_VOCAB = PDF_VOCAB + [
    "€249,90", "£17", "¥3000", "¢99", "¤", "ƒ(x)",
    "½", "¾", "¼", "×4", "8÷2", "25°C", "±0,5%", "¹²³",
    "§7", "¶2", "«citação»", "‹nota›", "„Zitat‚",
    "©2026", "®", "™", "45‰", "†nota‡", "etc…",
    "Škoda", "žurnál", "œuvre", "Œ", "Łukasz", "Þórður", "Ærø",
    "¿qué?", "¡Hola!", "µg", "¬p", "nº·1ª", "ÿŸ", "Ðe−ð",
]
# HTML vocabulary (no font constraint).
HTML_VOCAB = [
    "research", "article", "content", "analysis", "methods", "results",
    "discussion", "São", "Paulo", "naïve", "crédito", "R&D", "ação",
    "window", "stream", "shuffle", "partition", "actor", "arrow", "batch",
    "cluster", "byte", "golden", "extracted", "pipeline", "engine", "web",
    "crawl", "corpus", "document", "heuristics", "density", "boilerplate",
]
LANGS = ["por", "eng", "por+eng"]
EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)
GOLDEN_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("route", pa.string()),
        ("extracted_text", pa.string()),
        ("n_pages", pa.int32()),
        ("error", pa.string()),
    ]
)


def _words(rng: np.random.Generator, vocab: list[str], n: int) -> str:
    return " ".join(vocab[i] for i in rng.integers(0, len(vocab), n))


def _pdf_line(rng: np.random.Generator) -> str:
    return _words(rng, PDF_VOCAB, int(rng.integers(2, 6)))


def _foreign_line(rng: np.random.Generator) -> str:
    return _words(rng, FOREIGN_VOCAB, int(rng.integers(2, 6)))


def _make_pdf_doc(
    rng: np.random.Generator, n_pages: int, *, native_text: bool = False,
    encrypted: bool = False, distort: bool = True,
) -> tuple[bytes, str]:
    """Build one mini-PDF and its golden extracted text."""
    specs: list[PageSpec] = []
    golden_parts: list[str] = []
    for _ in range(n_pages):
        if rng.random() < 0.10:
            specs.append(
                PageSpec(blank=True, blank_w_u=int(rng.integers(60, 120)),
                         blank_h_u=int(rng.integers(80, 160)))
            )
            golden_parts.append("")
            continue
        lines = [_pdf_line(rng) for _ in range(int(rng.integers(2, 5)))]
        rot_k = int(rng.integers(0, 4)) if (distort and rng.random() < 0.3) else 0
        shear = (
            float(DESKEW_SLOPES[rng.integers(0, len(DESKEW_SLOPES))])
            if (distort and rng.random() < 0.3)
            else 0.0
        )
        color = bool(rng.random() < 0.2)
        specs.append(PageSpec(lines=lines, dpi=72, rot_k=rot_k, shear=shear, color=color))
        golden_parts.append(normalize_ligatures("\n".join(lines)) + "\n")
    data = build_pdf(specs, encrypted=encrypted, native_text=native_text)
    return data, "".join(golden_parts)


def _render_scan(rng: np.random.Generator) -> tuple[np.ndarray, str]:
    lines = [_pdf_line(rng) for _ in range(int(rng.integers(1, 4)))]
    img = render_page(lines, dpi=72, ink=COLOR_INK if rng.random() < 0.2 else (0, 0, 0))
    if rng.random() < 0.3:
        img = apply_shear(img, float(DESKEW_SLOPES[rng.integers(0, len(DESKEW_SLOPES))]))
    if rng.random() < 0.3:
        img = apply_rot90(img, int(rng.integers(0, 4)))
    return img, normalize_ligatures("\n".join(lines)) + "\n"


def _pad_to(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """White-pad a scan render to (h, w) — animated-GIF frames must share
    the logical screen size; white margin is OCR-invariant."""
    out = np.full((h, w, 3), 255, np.uint8)
    out[: img.shape[0], : img.shape[1]] = img
    return out


def _make_image_doc(rng: np.random.Generator) -> tuple[bytes, str, int]:
    """One image document: PNG (~30%), baseline JPEG (~18%), progressive
    JPEG (~9%), lossless WebP (~5%), lossy-VP8 WebP (~5%), single-frame
    GIF (~6%, mixed interlace/local-palette), BMP (~4%), P6 PPM (~3%),
    multi-frame TIFF (~14%) or animated GIF (~6%) — the last two hit the
    S5 fan-out path.  Returns (payload, golden_text, n_pages).  JPEG at
    quality 95 and VP8 at q_index 6 are lossy but verified above the OCR
    engine's binarization robustness margin; the others are exact."""
    fmt = rng.random()
    if fmt < 0.14:
        from ..functions.tiffcodec import encode_tiff

        n_frames = int(rng.integers(2, 4))
        frames, texts = [], []
        for _ in range(n_frames):
            img, text = _render_scan(rng)
            frames.append(img)
            texts.append(text)
        # incl. the fax family (bilevel CCITT strips — COLOR_INK min
        # channel 40 < 128 so thresholding keeps the glyphs),
        # JPEG-in-TIFF (compression 7, quality 95), tiled layouts
        # (tags 322-325) and 16-bit samples (high byte == the 8-bit
        # render, so decode is exact)
        variant = int(rng.integers(0, 11))
        if variant >= 8:
            if variant == 10:  # 16-bit samples (strip layout)
                frames = [
                    (f.astype(np.uint16) << 8) | f for f in frames]
            comp, pred, tile = [
                ("deflate", False, (16, 16)),
                ("lzw", True, (32, 16)),
                ("none", False, None),
            ][variant - 8]
            return (
                encode_tiff(frames, compression=comp, predictor=pred,
                            tile=tile),
                "".join(texts),
                n_frames,
            )
        comp, pred = [("none", False), ("lzw", False), ("lzw", True),
                      ("packbits", False), ("g4", False), ("g3_2d", False),
                      ("jpeg", False), ("deflate", False)][variant]
        return (
            encode_tiff(frames, compression=comp, predictor=pred),
            "".join(texts),
            n_frames,
        )
    if fmt < 0.2:
        from ..functions.gifcodec import encode_gif

        # Animated GIF frames must share ONE logical screen size, but the
        # padding has to land on the margin sides of the PRE-rotation
        # page (pad-after-rot puts white on a side the OCR's derotation
        # maps elsewhere, skewing the joint rot+deskew estimate): shear
        # first, square-pad right/bottom, THEN rotate.
        n_frames = int(rng.integers(2, 4))
        rendered, texts, rots = [], [], []
        for _ in range(n_frames):
            lines = [_pdf_line(rng) for _ in range(int(rng.integers(1, 4)))]
            img = render_page(
                lines, dpi=72,
                ink=COLOR_INK if rng.random() < 0.2 else (0, 0, 0))
            if rng.random() < 0.3:
                img = apply_shear(
                    img,
                    float(DESKEW_SLOPES[rng.integers(0, len(DESKEW_SLOPES))]))
            rots.append(int(rng.integers(0, 4)) if rng.random() < 0.3 else 0)
            rendered.append(img)
            texts.append(normalize_ligatures("\n".join(lines)) + "\n")
        side = max(max(f.shape[0] for f in rendered),
                   max(f.shape[1] for f in rendered))
        frames = [apply_rot90(_pad_to(f, side, side), k)
                  for f, k in zip(rendered, rots)]
        r = rng.random()
        if r < 0.3:  # animated WebP variant (VP8X/ANIM/ANMF)
            from ..functions.webpcodec import encode_webp_anim

            return encode_webp_anim(frames), "".join(texts), n_frames
        if r < 0.5:  # APNG variant (acTL/fcTL/fdAT)
            from ..functions.pngcodec import encode_png_anim

            return encode_png_anim(frames), "".join(texts), n_frames
        return (
            encode_gif(frames, interlace=bool(rng.random() < 0.5)),
            "".join(texts),
            n_frames,
        )
    img, text = _render_scan(rng)
    if fmt < 0.38:
        from ..functions.jpegcodec import encode_jpeg

        jv = rng.random()
        if jv < 0.3:
            # camera-style EXIF orientation: store the rotated pixels +
            # tag 274; the decoder auto-orients (browsers/ImageMagick
            # behavior), so the OCR sees the upright page
            o, k_store = ((3, 2), (6, 1), (8, 3))[int(rng.integers(0, 3))]
            stored = np.ascontiguousarray(np.rot90(img, k_store))
            return encode_jpeg(stored, quality=95, exif_orientation=o), text, 1
        if jv < 0.45:
            # Adobe 4-component JPEG (print-pipeline files in crawls):
            # direct CMYK (transform 0) or YCCK (transform 2), APP14
            from ..functions.jpegcodec import encode_jpeg_cmyk

            t = 0 if rng.random() < 0.5 else 2
            return encode_jpeg_cmyk(img, quality=95, transform=t), text, 1
        return encode_jpeg(img, quality=95), text, 1
    if fmt < 0.47:
        from ..functions.jpegcodec import encode_jpeg_progressive

        return encode_jpeg_progressive(img, quality=95), text, 1
    if fmt < 0.52:
        from ..functions.webpcodec import encode_webp

        # palette path: scan pages are few-color, so this exercises the
        # color-indexing decode (incl. bundled sub-byte widths) for real
        return encode_webp(img, palette=True), text, 1
    if fmt < 0.57:
        from ..functions.webpcodec import encode_webp_lossy

        # lossy VP8 (the dominant real-crawl webp flavor): q_index 6 is
        # far above the OCR binarization robustness margin, like JPEG 95
        return encode_webp_lossy(img, q_index=6), text, 1
    if fmt < 0.63:
        from ..functions.gifcodec import encode_gif

        # exercise interlace and local-color-table decode paths for real
        return (
            encode_gif(img, interlace=bool(rng.random() < 0.5),
                       local_palettes=bool(rng.random() < 0.3)),
            text,
            1,
        )
    if fmt < 0.67:
        from ..functions.bmpcodec import encode_bmp

        return encode_bmp(img), text, 1
    if fmt < 0.7:
        from ..functions.pnmcodec import encode_pnm

        # P6 PPM: what the reference's pdftoppm emits (pdf2pdfocr.py:56-75)
        return encode_pnm(img), text, 1
    if fmt < 0.85:
        # real-crawl PNG flavors: palette / gray color types, adaptive
        # per-row filters (libpng default), Adam7 — exercises the full
        # decode surface; scan renders are few-color so palette is exact
        ct = ("palette", "gray", "rgb")[int(rng.integers(0, 3))]
        if ct == "gray" and not (
            (img[..., 0] == img[..., 1]).all()
            and (img[..., 1] == img[..., 2]).all()
        ):
            ct = "rgb"
        return (
            encode_png(img, colortype=ct,
                       filter_type="adaptive" if rng.random() < 0.7 else 4,
                       interlace=bool(rng.random() < 0.3)),
            text,
            1,
        )
    return encode_png(img), text, 1


def _html_paragraph(rng: np.random.Generator) -> str:
    while True:
        t = _words(rng, HTML_VOCAB, int(rng.integers(6, 15))).capitalize() + "."
        if len(t) >= 30:
            return t


def _make_html_doc(rng: np.random.Generator) -> tuple[bytes, str]:
    """One synthetic web page + its golden main text.

    Pages vary the way real crawl HTML does — inline markup inside
    paragraphs, script/style/comment junk between blocks, blockquote
    content, unclosed tags, uppercase tag names, entities — while the
    golden stays hand-derivable: it is always the collapsed text of the
    content blocks in document order ("\\n\\n"-joined), never computed by
    the extractor under test."""
    paras = [_html_paragraph(rng) for _ in range(int(rng.integers(2, 7)))]
    nav_items = "".join(
        f'<li><a href="/{w}">{w}</a></li>' for w in ("home", "about", "contact", "blog")
    )
    farm = "".join(
        f'<a href="/t/{i}">{_words(rng, HTML_VOCAB, 2)}</a> ' for i in range(6)
    )
    title = _words(rng, HTML_VOCAB, 3)
    variant = rng.random()
    # charset mix (real crawls are far from all-UTF-8): windows-1252 and
    # iso-8859-1 declared via <meta charset>, UTF-16 via BOM, declared
    # UTF-8, or undeclared UTF-8 (the default) — decoded by the WHATWG
    # sniffing order in functions/boilerplate.decode_html_bytes
    enc_r = rng.random()
    if enc_r < 0.06:
        charset_label, codec = "windows-1252", "cp1252"
    elif enc_r < 0.12:
        charset_label, codec = "iso-8859-1", "cp1252"
    elif enc_r < 0.18:
        charset_label, codec = None, "utf-16"  # BOM carries the signal
    elif enc_r < 0.26:
        charset_label, codec = "UTF-8", "utf-8"
    else:
        charset_label, codec = None, "utf-8"
    meta = f'<meta charset="{charset_label}">' if charset_label else ""
    body = [
        f"<html><head>{meta}<title>{title}</title></head><body>",
        f"<header><h1>{title}</h1></header>",
        f"<nav><ul>{nav_items}</ul></nav>",
        "<article>",
    ]
    golden_parts = []
    for p in paras:
        text = p  # golden text of this block (markup-free, collapsed)
        markup = p.replace("&", "&amp;")
        if variant < 0.25:
            # inline markup: bold the first word, em-dash entity appended,
            # and (r5p) an inline SVG share-icon whose <title>/<text>
            # accessibility labels must NOT leak into the extracted text
            first, _, rest = markup.partition(" ")
            icon = ('<svg viewBox="0 0 24 24"><title>Share</title>'
                    '<text x="0" y="12">Menu</text><path d="M3 6h18"/></svg>')
            markup = f"<b>{first}</b> {rest}{icon} &#8212; more"
            text = f"{p} — more"
        elif variant < 0.45:
            # junk between/inside blocks: comments, script, style
            body.append("<!-- ad slot 3 -->")
            body.append("<script>var x = '<p>not text</p>';</script>")
            body.append("<style>p { color: red }</style>")
        elif variant < 0.6:
            # messy real-world markup: unclosed <p>, uppercase tags
            body.append(f"  <P CLASS='lead'>\n    {markup}")
            golden_parts.append(text)
            continue
        body.append(f"  <p>\n    {markup}\n  </p>")
        golden_parts.append(text)
    if variant >= 0.6 and variant < 0.8:
        # blockquote content block after the paragraphs + a short list
        # (items < MIN_CHARS are dropped by the extractor)
        q = _html_paragraph(rng)
        body.append(f"<blockquote>{q.replace('&', '&amp;')}</blockquote>")
        body.append("<ul><li>tiny</li><li>items</li></ul>")
        golden_parts.append(q)
    body.append("</article>")
    body.append(f"<aside><div>{farm}</div></aside>")
    body.append("<footer><div>© 2026 example.org</div></footer>")
    body.append("</body></html>")
    html = "\n".join(body)
    payload = html.encode(codec)  # utf-16 adds its BOM itself
    if variant >= 0.8 and codec == "utf-8":
        payload = b"\xef\xbb\xbf\n  " + payload  # BOM + leading whitespace
    return payload, "\n\n".join(golden_parts)


GIANT_EVERY = 150  # every 150th doc is a skewed giant PDF (repartition/skew path)

# Bump when generated content changes — cache keys (bench corpus dirs)
# embed it so stale corpora from earlier generators never get reused.
CORPUS_VERSION = "r5p"  # r3: WebP image docs; r3b/c: scanned-page PDFs
# (DCT / gray-Flate / CCITT-G4 / JBIG2 embedded images, 2% of docs);
# r3d: realistic HTML variants (inline markup, nested script junk,
# blockquotes, unclosed tags, BOM payloads); r4a: lossy-VP8 image docs;
# r4b: symbol-coded JBIG2 scanned pages; r4c: G3 (T.4) scanned pages;
# r4d: GIF (single + animated) / BMP / PPM image docs + variant PNG
# flavors (palette/gray color types, adaptive filters, Adam7);
# r4e: animated-GIF frames square-pad BEFORE rotation (25/120k joint
# rot+deskew misestimates on pad-after-rot frames); r4f: multi-frame
# TIFF gains fax (G4/G3-2D) and JPEG-in-TIFF compressions;
# r4g: animated-WebP multi-frame docs; r4h: APNG multi-frame docs;
# r5a: tiled-TIFF (deflate 16x16, LZW+predictor 32x16) and 16-bit-sample
# TIFF document kinds; r5b: foreign-PDF content streams in LZW /
# RunLength / ASCIIHex+Flate / ASCII85+Flate filters; r5c: HTML charset
# mix (windows-1252 / iso-8859-1 meta, UTF-16 BOM, declared UTF-8);
# r5d: EXIF-oriented JPEG image docs (tag 274 = 3/6/8, auto-oriented);
# r5e: ~6% gzip-wrapped payloads (Content-Encoding residue);
# r5f: +~3% zlib-wrapped payloads (Content-Encoding: deflate residue);
# r5g: ~4% of well-formed PDFs permissions-encrypted (standard security
# handler, empty user password, RC4-40/RC4-128/AESV2/AESV3 rotation);
# r5h: Adobe 4-component JPEGs (direct CMYK + YCCK, APP14) as image docs
# and as /DeviceCMYK DCT frames inside scanned-page PDFs;
# r5i: foreign-PDF strings stored via /Differences subset encodings and
# 2-byte /ToUnicode CMaps (40% of pdf_foreign docs);
# r5j: foreign-PDF text drawn from FOREIGN_VOCAB (adds currency signs,
# fractions, guillemets, cp1252-region letters...) so the byte-identity
# gate certifies the widened AGL glyph-name table AND the matching 5x7
# font extension (foreign PDFs rasterize + OCR in the flagship);
# r5k: INLINE-image scanned pages (BI/ID/EI, PDF 1.7 §8.9.7 — gray/Fl,
# RGB/[AHx Fl] chained armor, G4/CCF, DCT) next to the XObject forms;
# r5l: non-device image colorspaces (§8.6: [/Indexed /DeviceRGB],
# [/ICCBased /N 1], /DeviceCMYK raw, 4-bit gray, /Decode [1 0]
# photometric-inverted 1-bit) in the scanned-page rotation;
# r5m: Form XObject organizations in pdf_foreign (wrap/split/nested,
# §8.10) and form-wrapped page rasters in pdf_scanned;
# r5n: PDF 1.5 layout (cross-reference STREAM + /ObjStm-packed document
# dicts — what most modern writers emit) on ~25% of pdf_foreign docs;
# r5o: half of those as HYBRID-reference files (classic table marking
# ObjStm residents free + trailer /XRefStm, §7.5.8.4 — Acrobat's
# back-compat layout);
# r5p: inline SVG icons (<title>/<text> accessibility labels) inside
# content paragraphs — foreign content the extractor must drop


def _gen_doc(i: int, seed: int):
    """Generate document i (independent of n_docs: rng seeded per doc)."""
    rng = np.random.default_rng([seed, i])
    r = rng.random()
    if i % GIANT_EVERY == 0:
        kind = "pdf_giant"
    elif r < 0.70:
        kind = "html"
    elif r < 0.85:
        kind = "pdf"
    elif r < 0.88:
        kind = "pdf_foreign"
    elif r < 0.90:
        kind = "pdf_scanned"
    elif r < 0.95:
        kind = "image"
    else:
        kind = ("encrypted", "junk", "zero", "native", "badpdf")[
            int(rng.integers(0, 5))
        ]

    url = f"https://example.org/{kind}/{i:08d}"
    if kind == "html":
        payload, golden = _make_html_doc(rng)
        route, n_pages, error = "html", 1, None
    elif kind == "pdf":
        payload, golden = _make_pdf_doc(rng, int(rng.integers(1, 6)))
        route, n_pages, error = "pdf", payload_pages(payload), None
    elif kind == "pdf_giant":
        payload, golden = _make_pdf_doc(rng, int(rng.integers(40, 81)), distort=False)
        route, n_pages, error = "pdf", payload_pages(payload), None
    elif kind == "pdf_foreign":
        # real-world-syntax PDF (FlateDecode, CRLF, hex strings, TJ arrays,
        # nested page tree, sometimes an incremental /Prev update) written
        # by the "foreign" builder — exercises the tolerant pdfparse front
        # end inside the flagship pipeline.
        from ..functions.minipdf import build_foreign_pdf

        n_pages = int(rng.integers(1, 4))
        pages_lines = [
            [_foreign_line(rng) for _ in range(int(rng.integers(2, 5)))]
            for _ in range(n_pages)
        ]
        # classic content-stream filters (PDF 1.7 §7.4): deflate is the
        # modern default; LZW / RunLength / ASCII armor show up in the
        # long tail of old crawled PDFs
        sfilter = ("flate", "flate", "lzw", "rl", "ahx+flate",
                   "a85+flate")[int(rng.integers(0, 6))]
        # r5i: real-world string storage — /Differences-remapped subset
        # encodings and 2-byte /ToUnicode CMaps next to plain UTF-8
        tenc = ("plain", "plain", "plain", "differences",
                "tounicode")[int(rng.integers(0, 5))]
        # r5m: Form XObject organizations (§8.10) — wrapped, split
        # mid-content, and depth-2 nested forms next to direct layout
        fmode = ("none", "none", "none", "wrap", "split",
                 "nested")[int(rng.integers(0, 6))]
        # r5n: ~25% of foreign PDFs use the PDF 1.5 file organization
        # (xref STREAM + /ObjStm-packed dicts, §7.5.7/§7.5.8 — the
        # layout most modern writers emit); document structure replaces
        # the classic builder's filter/encoding/form options there.
        # r5o: half of those are HYBRID-reference files (§7.5.8.4 —
        # classic table with ObjStm residents marked free + /XRefStm).
        if rng.random() < 0.25:
            from ..functions.minipdf import build_foreign_pdf_15

            payload = build_foreign_pdf_15(
                pages_lines, hybrid=bool(rng.random() < 0.5))
        else:
            payload = build_foreign_pdf(
                pages_lines, incremental=bool(rng.random() < 0.3),
                stream_filter=sfilter, text_encoding=tenc, form_mode=fmode,
            )
        golden = "".join(
            normalize_ligatures("\n".join(ls)) + "\n" for ls in pages_lines
        )
        route, error = "pdf", None
    elif kind == "pdf_scanned":
        # scanned-page PDF: every page is one embedded image XObject
        # (no text) in one of the four real-world encodings — DCTDecode
        # JPEG, 8-bit gray Flate, CCITT Group 4, or JBIG2 generic region
        # — exercising pdfparse.page_image_payloads end-to-end in the
        # flagship.
        from ..functions.jpegcodec import encode_jpeg
        from ..functions.minipdf import build_scanned_pdf

        n_pages = int(rng.integers(1, 3))
        frames, parts = [], []
        for _ in range(n_pages):
            lines = [_pdf_line(rng) for _ in range(int(rng.integers(1, 4)))]
            img = render_page(lines, dpi=72)
            enc = rng.random()
            if enc < 0.25:
                if enc < 0.08:  # Adobe CMYK/YCCK DCT (print-origin scans)
                    from ..functions.jpegcodec import encode_jpeg_cmyk

                    frames.append(
                        ("jpeg_cmyk",
                         encode_jpeg_cmyk(
                             img, quality=95,
                             transform=0 if enc < 0.04 else 2),
                         img.shape[1], img.shape[0])
                    )
                elif enc < 0.21:
                    frames.append(
                        ("jpeg", encode_jpeg(img, quality=95),
                         img.shape[1], img.shape[0])
                    )
                else:  # r5k: inline DCT (BI/ID/EI in the content stream)
                    frames.append(
                        ("inline_dct", encode_jpeg(img, quality=95),
                         img.shape[1], img.shape[0])
                    )
            elif enc < 0.5:
                gray8 = img.mean(axis=2).astype(np.uint8)
                if enc < 0.33:
                    frames.append(("gray", gray8))
                elif enc < 0.36:  # r5m: raster behind a Form XObject
                    frames.append(("form_gray", gray8))
                elif enc < 0.40:  # r5k: inline gray /Fl
                    frames.append(("inline_gray", gray8))
                elif enc < 0.43:  # r5k: inline RGB, chained [/AHx /Fl]
                    frames.append(("inline_rgb", img))
                # r5l: non-device colorspace forms (§8.6)
                elif enc < 0.45:  # 4-bit /DeviceGray
                    frames.append(("gray4", gray8))
                elif enc < 0.47:  # /DeviceCMYK raw samples
                    frames.append(("cmyk_raw", img))
                elif enc < 0.485:  # [/ICCBased /N 1]
                    frames.append(("icc_gray", gray8))
                else:  # [/Indexed /DeviceRGB hival <pal>]
                    frames.append(("indexed", img))
            else:
                bil = np.where(img.mean(axis=2) < 128, 0, 255).astype(
                    np.uint8
                )
                kind3 = ("g4" if enc < 0.66
                         else "g3" if enc < 0.73      # fax-era 1D (K=0)
                         else "g3_2d" if enc < 0.79   # mixed T.4 (K>0)
                         else "jbig2" if enc < 0.86
                         else "jbig2sym" if enc < 0.93
                         else "inline_g4" if enc < 0.97  # r5k: /CCF K=-1
                         else "raw1_invert")  # r5l: /Decode [1 0] 1-bit
                frames.append((kind3, bil))
            parts.append(normalize_ligatures("\n".join(lines)) + "\n")
        payload = build_scanned_pdf(frames)
        golden = "".join(parts)
        route, error = "pdf", None
    elif kind == "image":
        payload, golden, n_pages = _make_image_doc(rng)
        route, error = "image", None
    elif kind == "encrypted":
        payload, _ = _make_pdf_doc(rng, int(rng.integers(1, 4)), encrypted=True)
        route, golden, n_pages, error = "pdf", None, payload_pages(payload), "encrypted"
    elif kind == "native":
        # PDF that already has a text layer: extracted normally (reference
        # default without -t processes them; has_native_text is a column)
        payload, golden = _make_pdf_doc(rng, int(rng.integers(1, 4)), native_text=True)
        route, n_pages, error = "pdf", payload_pages(payload), None
    elif kind == "zero":
        payload, golden = b"", None
        route, n_pages, error = "error", 0, "unsupported_type"
    elif kind == "badpdf":
        good, _ = _make_pdf_doc(rng, 2)
        payload = good[: len(good) // 3]  # truncated: no trailer/%%EOF
        golden, route, n_pages, error = None, "pdf", 0, "corrupt_pdf"
    else:  # junk: leading NUL guarantees no magic-prefix collision
        payload = b"\x00" + bytes(
            rng.integers(1, 255, int(rng.integers(16, 200)), dtype=np.uint8)
        )
        golden, route, n_pages, error = None, "error", 0, "unsupported_type"

    # r5g: ~4% of well-formed PDFs arrive permissions-encrypted (standard
    # security handler with an EMPTY user password — the crawl-typical
    # case, rotating RC4-40/RC4-128/AESV2/AESV3); pdfparse decrypts them
    # transparently, so route/golden/n_pages are unchanged.
    if route == "pdf" and error is None and payload.startswith(b"%PDF-"):
        if rng.random() < 0.04:
            from ..functions.pdfcrypt import encrypt_pdf

            variant = ("rc4-40", "rc4-128", "aes-128", "aes-256")[
                int(rng.integers(0, 4))
            ]
            payload = encrypt_pdf(payload, variant)

    # Content-Encoding residue (r5e/r5f): ~6% of well-formed payloads
    # arrive gzip-wrapped and ~3% zlib-wrapped (deflate residue), as in
    # real crawl dumps; the sniff stage decompresses transparently, so
    # route/golden/error are unchanged.
    if error is None and payload:
        wrap = rng.random()
        if wrap < 0.06:
            import gzip as _gzip

            payload = _gzip.compress(payload, 6, mtime=0)
        elif wrap < 0.09:
            import zlib as _zlib

            payload = _zlib.compress(payload, 6)

    noisy = (golden or "")[:80] + (" …" if golden and len(golden) > 80 else "")
    page_row = {
        "url": url,
        "warc_ts": EPOCH_US + i * 1_000_000,
        "html": payload,
        "text": noisy,
        "lang": LANGS[int(rng.integers(0, len(LANGS)))],
    }
    golden_row = {
        "url": url,
        "route": route,
        "extracted_text": golden,
        "n_pages": n_pages,
        "error": error,
    }
    return page_row, golden_row


def generate_corpus(n_docs: int, seed: int = 42) -> tuple[pa.Table, pa.Table]:
    """Return (pages_table, golden_table).  Deterministic per (seed, doc id) —
    doc i's content is independent of n_docs, so any prefix/shard of the
    corpus is stable (what lets generation itself run as a Ray job)."""
    urls, tss, payloads, texts, langs = [], [], [], [], []
    g_routes, g_texts, g_npages, g_errors = [], [], [], []
    for i in range(n_docs):
        p, g = _gen_doc(i, seed)
        urls.append(p["url"])
        tss.append(p["warc_ts"])
        payloads.append(p["html"])
        texts.append(p["text"])
        langs.append(p["lang"])
        g_routes.append(g["route"])
        g_texts.append(g["extracted_text"])
        g_npages.append(g["n_pages"])
        g_errors.append(g["error"])

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
    golden = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "route": pa.array(g_routes, pa.string()),
            "extracted_text": pa.array(g_texts, pa.string()),
            "n_pages": pa.array(g_npages, pa.int32()),
            "error": pa.array(g_errors, pa.string()),
        },
        schema=GOLDEN_SCHEMA,
    )
    return pages, golden


def payload_pages(pdf_bytes: bytes) -> int:
    import re

    m = re.search(rb"/Count (\d+)", pdf_bytes)
    return int(m.group(1)) if m else 0


COMBINED_SCHEMA = pa.schema(
    list(PAGES_SCHEMA)
    + [
        ("g_route", pa.string()),
        ("g_text", pa.string()),
        ("g_npages", pa.int32()),
        ("g_error", pa.string()),
    ]
)


def _gen_batch(batch: pa.Table, seed: int) -> pa.Table:
    """Ray batch fn: block of doc ids -> combined pages+golden rows."""
    cols: dict[str, list] = {n: [] for n in COMBINED_SCHEMA.names}
    for i in batch.column("id").to_pylist():
        p, g = _gen_doc(int(i), seed)
        cols["url"].append(p["url"])
        cols["warc_ts"].append(p["warc_ts"])
        cols["html"].append(p["html"])
        cols["text"].append(p["text"])
        cols["lang"].append(p["lang"])
        cols["g_route"].append(g["route"])
        cols["g_text"].append(g["extracted_text"])
        cols["g_npages"].append(g["n_pages"])
        cols["g_error"].append(g["error"])
    return pa.table(cols, schema=COMBINED_SCHEMA)


def write_corpus_parquet_ray(
    out_dir: str, n_docs: int, seed: int = 42, docs_per_block: int = 500
) -> str:
    """Generate the corpus AS a Ray job (bench-scale path): range(n) →
    map_batches(_gen_doc) → write_parquet.  Combined pages+golden columns in
    one layout; consumers prune (`columns=[...]`) at the read."""
    import functools

    import ray.data

    n_blocks = max(1, (n_docs + docs_per_block - 1) // docs_per_block)
    ds = ray.data.range(n_docs, override_num_blocks=n_blocks)
    ds.map_batches(
        functools.partial(_gen_batch, seed=seed), batch_format="pyarrow"
    ).write_parquet(out_dir)
    return out_dir


def write_corpus_parquet(
    out_dir: str, n_docs: int, seed: int = 42, n_shards: int = 4
) -> tuple[str, str]:
    """Write pages/ (sharded parquet) + golden.parquet under out_dir."""
    import os

    import pyarrow.parquet as pq

    pages, golden = generate_corpus(n_docs, seed)
    pages_dir = os.path.join(out_dir, "pages")
    os.makedirs(pages_dir, exist_ok=True)
    n = pages.num_rows
    per = max(1, (n + n_shards - 1) // n_shards)
    for s in range(0, n, per):
        pq.write_table(pages.slice(s, per), os.path.join(pages_dir, f"part-{s//per:05d}.parquet"))
    golden_path = os.path.join(out_dir, "golden.parquet")
    pq.write_table(golden, golden_path)
    return pages_dir, golden_path
