"""Searchable-PDF pipeline: pages table -> extracted table + PDF sandwich.

The reference's end product is ``<input>-OCR.pdf`` — the original page
rasters with an invisible OCR text layer merged under/over them
(/root/reference/pdf2pdfocr.py:769-827, 942-956, 1333-1374;
pdf2pdfocr_multibackground.py:34-95).  This pipeline is the flagship
extraction with a PDF artifact per document:

    read(pages)
      → sniff_route
      → FanOut(emit_doc_title)                # doc title rides the fan-out
      → SandwichOcrStage (actor pool)         # OCR + per-page fragment
      → groupby(url): page sort + text concat + assemble_pdf

Scale shape: unlike the text flagship (shuffle carries text only), the
assembly shuffle here MUST carry the compressed page images — they are
the product.  Fragments hold flate-compressed raster + ops (≈ the final
PDF's own page payload), so shuffle volume ≈ output volume, the floor for
any engine that emits sandwiches.  The reference moves the same bytes
through its temp dir + qpdf/ghostscript merge instead.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import PipelineConfig
from ..functions.imagecodec import decode_image
from ..functions.sandwich import PRODUCER, assemble_pdf, build_page_fragment
from ..stages.fanout import FanOut
from ..stages.ocr import OcrStage
from ..stages.sniff import ROUTE_HTML, sniff_route

if TYPE_CHECKING:
    import ray.data

SANDWICH_COLUMNS = [
    "url", "warc_ts", "route", "extracted_text", "n_pages", "error",
    "pdf_bytes",
]


class SandwichOcrStage(OcrStage):
    """OCR actor that ALSO emits the page's sandwich fragment.

    Fused on purpose: the raster is already in this actor's memory from
    the OCR decode — building the fragment here means the uncompressed
    image never crosses the object store; only the flate-compressed
    fragment (≈ final PDF payload) rides to assembly."""

    def __init__(self, config: PipelineConfig | None = None):
        super().__init__(config, keep_spans=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        images = batch.column("image").to_pylist()
        dpis = batch.column("dpi").to_pylist()
        out = super().__call__(batch)
        spans = out.column("spans").to_pylist()
        widths = out.column("width_px").to_pylist()
        heights = out.column("height_px").to_pylist()
        errs = out.column("error").to_pylist()
        greys = out.column("is_greyscale").to_pylist()
        frags: list[bytes | None] = []
        for img_bytes, dpi, sp, w, h, err, grey in zip(
            images, dpis, spans, widths, heights, errs, greys
        ):
            if img_bytes is None or err is not None:
                frags.append(None)
                continue
            try:
                img = decode_image(img_bytes)
                if grey:
                    img = np.ascontiguousarray(img[:, :, 0])
                frags.append(
                    build_page_fragment(img, dpi, sp or [], w, h)
                )
            except Exception:  # noqa: BLE001 — row-level isolation
                frags.append(None)
        return out.append_column("pdf_frag", pa.array(frags, pa.binary()))


def _assemble_sandwich_block(df: pd.DataFrame) -> pd.DataFrame:
    if len(df) == 0:
        return pd.DataFrame(
            {
                "url": pd.Series([], dtype="object"),
                "warc_ts": pd.Series([], dtype="datetime64[us]"),
                "route": pd.Series([], dtype="object"),
                "extracted_text": pd.Series([], dtype="object"),
                "n_pages": pd.Series([], dtype="int32"),
                "error": pd.Series([], dtype="object"),
                "pdf_bytes": pd.Series([], dtype="object"),
            }
        )
    df = df.sort_values(["url", "page_no"], kind="stable")
    g = df.groupby("url", sort=True)
    firsts = g.agg(
        warc_ts=("warc_ts", "first"),
        route=("route", "first"),
        n_pages=("n_pages", "first"),
        error=("error", "first"),
        doc_title=("doc_title", "first"),
    )
    texts = g["page_text"].agg(
        lambda s: "".join(t for t in s if isinstance(t, str))
    )
    frag_lists = g["pdf_frag"].agg(list)

    urls = firsts.index.to_numpy(dtype=object)
    err = firsts["error"].to_numpy(dtype=object)
    routes = firsts["route"].to_numpy(dtype=object)
    titles = firsts["doc_title"].to_numpy(dtype=object)
    text_vals = texts.to_numpy(dtype=object)
    pdfs: list[bytes | None] = []
    for u, e, route, title in zip(urls, err, routes, titles):
        if isinstance(e, str) or route == ROUTE_HTML:
            pdfs.append(None)  # no raster product: error docs, html docs
            continue
        frags = [f for f in frag_lists[u] if f is not None]
        if not frags:
            pdfs.append(None)
            continue
        pdfs.append(
            assemble_pdf(
                frags,
                title=title if isinstance(title, str) else None,
                producer=PRODUCER,
            )
        )
    has_err = np.array([isinstance(e, str) for e in err])
    text_vals[has_err] = None
    err[~has_err] = None
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": firsts["warc_ts"].to_numpy(),
            "route": routes,
            "extracted_text": text_vals,
            "n_pages": firsts["n_pages"].to_numpy(dtype="int32"),
            "error": err,
            "pdf_bytes": pd.Series(pdfs, index=firsts.index).to_numpy(dtype=object),
        }
    )


def extract_sandwich(
    pages_ds: "ray.data.Dataset",
    config: PipelineConfig | None = None,
) -> "ray.data.Dataset":
    """pages Dataset -> one row per url with ``extracted_text`` (same
    byte-identity contract as the text flagship) plus ``pdf_bytes`` — a
    real searchable PDF (raster + invisible text layer) for PDF/image
    docs, null for html/error docs."""
    cfg = config or PipelineConfig()
    if not cfg.emit_doc_title:
        import dataclasses

        cfg = dataclasses.replace(cfg, emit_doc_title=True)
    sniffed = pages_ds.map_batches(
        sniff_route, batch_format="pyarrow", batch_size=cfg.doc_batch_size
    )
    page_rows = sniffed.map_batches(
        FanOut(cfg), batch_format="pyarrow", batch_size=cfg.doc_batch_size
    )
    ocred = page_rows.map_batches(
        SandwichOcrStage,
        fn_constructor_kwargs={"config": cfg},
        batch_format="pyarrow",
        batch_size=cfg.page_batch_size,
        concurrency=cfg.resolve_ocr_concurrency(),
        num_cpus=1,
    )
    from ..ops.grouped import sorted_groupby

    keep = [
        "url", "warc_ts", "route", "page_no", "n_pages", "page_text",
        "error", "doc_title", "pdf_frag",
    ]
    slim = ocred.map_batches(
        lambda t, cols=keep: t.select(cols), batch_format="pyarrow"
    )
    return sorted_groupby(
        slim, "url", _assemble_sandwich_block,
        partitions=cfg.shuffle_partitions,
    )
