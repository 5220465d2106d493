"""Document → page fan-out (S3 validate + S4/S5 rasterize + F1-F4 guards +
M13 HTML extraction), emitting a unified page-row stream.

Reference mapping:
* validate/metadata: PyPDF2 read at /root/reference/pdf2pdfocr.py:1169-1198
  → ``minipdf.parse_pdf`` per row, errors captured into the ``error`` column
  (row-level fault isolation replacing the per-file abort at 1505-1533);
* guards: --min-kbytes 1207-1213 (F1), -b max pages 1200-1205 (F2),
  pdffonts has-text 1215-1227 (F3), encrypted 1196-1198 (F4);
* rasterize: pdftoppm page JPEGs at 56-75/1100-1141 (S4) → in-process render
  of each page's text + stored scan-distortion profile, PNG-encoded;
* image inputs: convert-to-page-images at 1133-1138 (S5) → single-frame
  payloads pass through as one page row; multi-frame TIFFs are split into
  numbered page rows (the reference's `convert -scene 1` numbering becomes
  the explicit ``page_no`` column), each frame PNG-encoded;
* HTML rows (north-rule M13) are extracted here directly — they fan out to a
  single already-final row, so the downstream OCR stage never sees them.

Scale notes: one input row of B bytes becomes N page rows of ~B/N bytes —
giant PDFs spread across blocks (the skew design demanded by
BASELINE.json). Output rows interleave "done" rows (page_text set, image
null) and "todo" rows (image set) so the whole pipeline stays one lineage.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import PipelineConfig
from ..functions.boilerplate import decode_html_bytes, extract_main_text
from ..functions.minipdf import parse_pdf
from ..functions.pagerender import (
    BLACK_INK,
    COLOR_INK,
    apply_rot90,
    apply_shear,
    render_blank_page,
    render_page,
)
from ..functions.imagecodec import encode_raw
from ..functions.pngcodec import encode_png
from .sniff import ROUTE_ERROR, ROUTE_HTML, ROUTE_IMAGE, ROUTE_PDF

PAGE_ROW_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("route", pa.string()),
        ("page_no", pa.int32()),
        ("n_pages", pa.int32()),
        ("dpi", pa.int32()),
        ("image", pa.binary()),
        ("page_text", pa.string()),
        ("error", pa.string()),
    ]
)


def _rasterize_scan(spec, compress: bool) -> bytes:
    """PageSpec -> image bytes of the simulated scan (render then distort —
    the inverse of what preprocess+OCR must do).

    ``compress=False`` (the fused fan-out→OCR path, default): RAWB frames
    — the payload never leaves the actor, so PNG deflate would cost
    ~0.8 ms/page for nothing.  ``compress=True`` (page_rebalance: pages
    cross the object store to other workers): PNG, the reference's
    bound-the-temp-size posture (pdf2pdfocr.py:477-478)."""
    if spec.blank:
        img = render_blank_page(spec.blank_w_u, spec.blank_h_u, spec.dpi)
    else:
        ink = COLOR_INK if spec.color else BLACK_INK
        img = render_page(spec.lines, dpi=spec.dpi, ink=ink)
        if spec.shear:
            img = apply_shear(img, spec.shear)
        if spec.rot_k:
            img = apply_rot90(img, spec.rot_k)
    return encode_png(img) if compress else encode_raw(img)


class FanOut:
    """Stateless-in-spirit batch fn (class only to hold config)."""

    def __init__(self, config: PipelineConfig | None = None) -> None:
        self.config = config or PipelineConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.config
        out: dict[str, list] = {name: [] for name in PAGE_ROW_SCHEMA.names}
        # doc-level title passthrough for metadata-preserving sinks
        # (sandwich pipeline); populated per-doc via _title below
        titles: list = [] if cfg.emit_doc_title else None  # type: ignore[assignment]
        _cur_title: list = [None]

        def emit(url, ts, route, page_no, n_pages, dpi, image, page_text, error):
            out["url"].append(url)
            out["warc_ts"].append(ts)
            out["route"].append(route)
            out["page_no"].append(page_no)
            out["n_pages"].append(n_pages)
            out["dpi"].append(dpi)
            out["image"].append(image)
            out["page_text"].append(page_text)
            out["error"].append(error)
            if titles is not None:
                titles.append(_cur_title[0])

        urls = batch.column("url").to_pylist()
        tss = batch.column("warc_ts").to_pylist()
        payloads = batch.column("html").to_pylist()
        routes = batch.column("route").to_pylist()

        for url, ts, payload, route in zip(urls, tss, payloads, routes):
            _cur_title[0] = None
            if route == ROUTE_ERROR:
                # typed sub-reason for compression formats this container
                # cannot decode (no zstandard/lz4 libs): at crawl scale
                # "how much of the input is zstd" is a census question,
                # not a generic junk bucket
                if payload[:4] == b"\x28\xb5\x2f\xfd":
                    reason = "unsupported_compression: zstd"
                elif payload[:4] == b"\x04\x22\x4d\x18":
                    reason = "unsupported_compression: lz4"
                else:
                    reason = "unsupported_type"
                emit(url, ts, ROUTE_ERROR, 0, 0, 0, None, None, reason)
                continue
            if cfg.min_kbytes and len(payload) / 1024.0 < cfg.min_kbytes:
                emit(url, ts, route, 0, 0, 0, None, None, "too_small")
                continue
            if route == ROUTE_HTML:
                try:
                    # WHATWG-style charset sniff: BOM -> <meta charset>
                    # -> strict UTF-8 -> windows-1252 fallback
                    text = extract_main_text(decode_html_bytes(payload))
                    emit(url, ts, route, 0, 1, 0, None, text, None)
                except Exception as e:  # noqa: BLE001 — row-level isolation
                    emit(url, ts, route, 0, 1, 0, None, None, f"html_parse: {e}")
                continue
            if route == ROUTE_IMAGE:
                # S5: multi-frame containers (TIFF IFD chain, animated
                # GIF, animated WebP, APNG) fan out to numbered page
                # rows (reference pdf2pdfocr.py:1133-1138); single-frame
                # payloads pass through undecoded (the OCR stage owns
                # the decode).  WebP/PNG route here only when an
                # ANMF/acTL animation chunk is present.
                from ..functions.imagecodec import (
                    decode_image_frames,
                    png_has_actl,
                    webp_has_animation,
                )

                if payload[:4] in (b"II*\x00", b"MM\x00*") or payload[:6] in (
                    b"GIF87a", b"GIF89a"
                ) or webp_has_animation(payload) or png_has_actl(payload):
                    try:
                        frames = decode_image_frames(payload)
                    except Exception as e:  # noqa: BLE001 — row-level
                        # isolation: truncated GIFs raise IndexError /
                        # struct.error, corrupt APNG IDAT raises
                        # zlib.error; one malformed crawl payload must
                        # not kill the FanOut task.
                        emit(url, ts, route, 0, 1, 0, None, None,
                             f"image_decode: {e}")
                        continue
                    enc = encode_png if cfg.page_rebalance else encode_raw
                    for i, frame in enumerate(frames):
                        emit(url, ts, route, i, len(frames), 72,
                             enc(frame), None, None)
                    continue
                emit(url, ts, route, 0, 1, 72, payload, None, None)
                continue
            # PDF route
            try:
                doc = parse_pdf(payload)
            except ValueError:
                emit(url, ts, route, 0, 0, 0, None, None, "corrupt_pdf")
                continue
            _cur_title[0] = doc.metadata.get("Title") or None
            if doc.is_encrypted or (cfg.check_protection and doc.was_encrypted):
                emit(url, ts, route, 0, doc.n_pages, 0, None, None, "encrypted")
                continue
            if cfg.max_pages and doc.n_pages > cfg.max_pages:
                emit(url, ts, route, 0, doc.n_pages, 0, None, None, "too_many_pages")
                continue
            if cfg.skip_native_text and doc.has_native_text:
                emit(url, ts, route, 0, doc.n_pages, 0, None, None, "has_native_text")
                continue
            if cfg.prefer_native_text and doc.has_native_text:
                # S6 fast path: trust the existing text layer; pages become
                # already-final rows (no raster, no OCR).  Ligature
                # normalization (M6) applies so output matches the OCR path
                # byte-for-byte (reference HocrTransform 356-366).
                from ..functions.hocr import normalize_ligatures

                for i, spec in enumerate(doc.pages):
                    text = (
                        ""
                        if spec.blank
                        else normalize_ligatures("\n".join(spec.lines)) + "\n"
                    )
                    emit(url, ts, route, i, doc.n_pages, 0, None, text, None)
                continue
            for i, spec in enumerate(doc.pages):
                if spec.image_bytes is not None:
                    # scanned-page PDF: the embedded image (DCT JPEG /
                    # RAWB) goes straight to OCR, no re-rasterization
                    emit(url, ts, route, i, doc.n_pages, spec.dpi,
                         spec.image_bytes, None, None)
                    continue
                try:
                    png = _rasterize_scan(spec, compress=cfg.page_rebalance)
                except Exception as e:  # noqa: BLE001
                    emit(url, ts, route, i, doc.n_pages, spec.dpi, None, None,
                         f"rasterize: {e}")
                    continue
                emit(url, ts, route, i, doc.n_pages, spec.dpi, png, None, None)

        t = pa.table(out, schema=PAGE_ROW_SCHEMA)
        if titles is not None:
            t = t.append_column("doc_title", pa.array(titles, pa.string()))
        return t
