"""T1 — the stateful OCR stage (actor pool).

Ray mapping of the reference's warm external OCR engine
(/root/reference/pdf2pdfocr.py:104-160: tesseract per page, pool of
``cpu_count * -j`` processes, OMP_THREAD_LIMIT=1): a callable class passed to
``map_batches(OcrStage, concurrency=N, batch_size=B, num_cpus=1)`` — engine
state (glyph template table, config) is bound once per actor in ``__init__``;
``__call__`` OCRs one Arrow batch of page rows.

Fused per page (one image decode, per SURVEY.md §7.2 note):
* M1/M2 greyscale + blank checks (reference 227-252, 1005-1016);
* M4/M5 orientation detect + rotation apply and M3 deskew via
  ``normalize_page`` (reference 78-101, 1018-1098);
* OCR proper → hOCR emit → hOCR parse → normalized page text + spans
  (reference 104-160 + HocrTransform 278-437);
* M11 failure stub: any per-page exception yields the empty A4 stub page
  (reference cuneiform repair, 192-205) — never an exception past the batch.

Rows with a null ``image`` (already-final HTML rows, error rows) pass
through untouched.  The ``image`` column is DROPPED from the output: the
downstream groupby('url') shuffle carries text and small ints only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig
from ..functions.hocr import A4_STUB_BBOX, emit_hocr, parse_hocr
from ..functions.image_ops import is_blank, is_greyscale
from ..functions import ocr_core
from ..functions.ocr_core import OcrDeadlineExceeded, normalize_page_full
from ..functions.imagecodec import decode_image
from ..functions.pagerender import BASE_DPI

OCR_OUT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("route", pa.string()),
        ("page_no", pa.int32()),
        ("n_pages", pa.int32()),
        ("page_text", pa.string()),
        ("error", pa.string()),
        ("is_blank", pa.bool_()),
        ("is_greyscale", pa.bool_()),
        ("rotate_deg", pa.int32()),
        ("skew", pa.float64()),
        ("width_px", pa.int32()),
        ("height_px", pa.int32()),
    ]
)

SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("text", pa.string()),
            ("x1", pa.int32()),
            ("y1", pa.int32()),
            ("x2", pa.int32()),
            ("y2", pa.int32()),
            ("kind", pa.string()),
        ]
    )
)


class OcrStage:
    """Warm-engine OCR actor.  ``keep_spans`` adds a ``spans`` list<struct>
    column (the M8/M9 span layout path) — off for the flagship pipeline.

    Engine selection (reference -c, pdf2pdfocr.py:556-558):
    * ``template``        — the deterministic template matcher (T1);
    * ``template_retry``  — T2 shape (cuneiform's per-page
      retry-with-English, reference 163-190): if the page yields no text,
      retry once with normalization forced on;
    * ``no_ocr``          — skip OCR, pages pass through textless;
    * ``external:<module>:<attr>`` or a registered name — any
      model-backed engine, resolved through
      :mod:`..functions.ocr_engines` and LOADED ONCE PER ACTOR here in
      ``__init__`` (the reference's -c tesseract/cuneiform slot).
    A per-page time guard (``ocr_timeout_s``) marks overruns as error rows
    — the actor-level analog of the reference's --timeout future
    (pdf2pdfocr.py:1511-1528)."""

    def __init__(self, config: PipelineConfig | None = None, keep_spans: bool = False):
        # Engine warm-up, once per actor: resolve + load the engine (the
        # template table for the built-in; a real model import/construct
        # for external engines). Reference loads tesseract's models per
        # process invocation; here the cost is paid once per pool worker.
        from ..functions.ocr_engines import OcrEngineError, resolve_ocr_engine

        self.config = config or PipelineConfig()
        self.keep_spans = keep_spans
        if self.config.ocr_engine == "no_ocr":
            self._engine = None
        else:
            try:
                self._engine = resolve_ocr_engine(self.config.ocr_engine)
            except OcrEngineError as exc:
                # T3 fail-fast: a bad engine name/path kills the actor at
                # init, before any batch is consumed
                raise ValueError(str(exc)) from exc

    def _ocr_one(self, png: bytes, dpi: int, force_normalize: bool = False):
        """One page image (PNG/JPEG/TIFF) -> (text, spans, stats...).
        Never raises (except the cooperative deadline)."""
        try:
            img = decode_image(png)
            h, w = img.shape[:2]
            if is_blank(img):
                return "", [], True, True, 0, 0.0, w, h, None
            grey = is_greyscale(img)
            scale = max(1, dpi // BASE_DPI)
            norm_lines = None
            if force_normalize or self.config.autorotate or self.config.deskew:
                img, k, slope, norm_lines = normalize_page_full(img, scale)
            else:
                k, slope = 0, 0.0
            if norm_lines is not None and getattr(
                self._engine, "reuse_normalized_lines", False
            ):
                # the verification recognition normalize_page_full already
                # ran on this exact image — identical output, half the work
                lines = norm_lines
            else:
                lines = self._engine.recognize(img, scale)
            hocr = emit_hocr(lines, img.shape[1], img.shape[0], dpi)
            page = parse_hocr(hocr)
            spans = [
                {"text": s.text, "x1": s.x1, "y1": s.y1, "x2": s.x2, "y2": s.y2,
                 "kind": s.kind}
                for s in page.spans
            ]
            return (page.text, spans, False, grey, k * 90, slope,
                    page.width_px, page.height_px, None)
        except OcrDeadlineExceeded:
            raise  # handled by the per-page deadline wrapper in __call__
        except Exception:  # noqa: BLE001 — M11 stub, row-level isolation
            return ("", [], False, True, 0, 0.0,
                    A4_STUB_BBOX[2], A4_STUB_BBOX[3], None)

    def __call__(self, batch: pa.Table) -> pa.Table:
        images = batch.column("image").to_pylist()
        dpis = batch.column("dpi").to_pylist()
        texts = batch.column("page_text").to_pylist()
        errors = batch.column("error").to_pylist()

        out_text: list[str | None] = []
        out_err: list[str | None] = []
        blanks, greys, rots, skews, widths, heights = [], [], [], [], [], []
        spans_col: list[list | None] = []
        for png, dpi, text, err in zip(images, dpis, texts, errors):
            if png is None:
                out_text.append(text)
                out_err.append(err)
                blanks.append(False)
                greys.append(True)
                rots.append(0)
                skews.append(0.0)
                widths.append(0)
                heights.append(0)
                spans_col.append([] if self.keep_spans else None)
                continue
            if self.config.ocr_engine == "no_ocr":
                # Reference -c no_ocr: OCR skipped entirely, pages pass
                # through with no text layer (pdf2pdfocr.py:958-1003,
                # 819-821 "ocr_ignored").
                t, spans, blank, grey, rot, skew, w, h, e = (
                    "", [], False, True, 0, 0.0, 0, 0, None
                )
            else:
                import time as _time

                t0 = _time.monotonic()
                # Preemptive per-page budget: the engine's scan loops check
                # this deadline and bail mid-page, so a pathological page
                # stops at ~timeout instead of holding the actor (reference
                # --timeout actually interrupts, pdf2pdfocr.py:1511-1528).
                # The budget spans the retry too (it is a PAGE budget).
                if self.config.ocr_timeout_s:
                    ocr_core.set_deadline(t0 + self.config.ocr_timeout_s)
                try:
                    t, spans, blank, grey, rot, skew, w, h, e = self._ocr_one(
                        png, dpi
                    )
                    bad = (not t) or (
                        t.count("�")
                        / max(1, len(t.replace(" ", "").replace("\n", "")))
                        > 0.3
                    )
                    if (
                        self.config.ocr_engine == "template_retry"
                        and bad
                        and not blank
                        and e is None
                        and not (self.config.autorotate and self.config.deskew)
                    ):
                        # T2 retry (low-confidence page: empty or mostly
                        # unrecognized glyphs): re-run with normalization on.
                        t, spans, blank, grey, rot, skew, w, h, e = self._ocr_one(
                            png, dpi, force_normalize=True
                        )
                    if (
                        self.config.ocr_timeout_s
                        and (_time.monotonic() - t0) > self.config.ocr_timeout_s
                    ):
                        # post-hoc fallback for time sunk in uninstrumented
                        # code (e.g. decoding a giant image)
                        t, spans, e = None, [], "ocr_timeout"
                except OcrDeadlineExceeded:
                    t, spans, e = None, [], "ocr_timeout"
                    blank, grey, rot, skew, w, h = False, True, 0, 0.0, 0, 0
                finally:
                    ocr_core.set_deadline(None)
            out_text.append(t)
            out_err.append(err if err is not None else e)
            blanks.append(blank)
            greys.append(grey)
            rots.append(rot)
            skews.append(skew)
            widths.append(w)
            heights.append(h)
            spans_col.append(spans)

        cols = {
            "url": batch.column("url"),
            "warc_ts": batch.column("warc_ts"),
            "route": batch.column("route"),
            "page_no": batch.column("page_no"),
            "n_pages": batch.column("n_pages"),
            "page_text": pa.array(out_text, pa.string()),
            "error": pa.array(out_err, pa.string()),
            "is_blank": pa.array(blanks, pa.bool_()),
            "is_greyscale": pa.array(greys, pa.bool_()),
            "rotate_deg": pa.array(rots, pa.int32()),
            "skew": pa.array(skews, pa.float64()),
            "width_px": pa.array(widths, pa.int32()),
            "height_px": pa.array(heights, pa.int32()),
        }
        names = list(OCR_OUT_SCHEMA.names)
        arrays = [cols[n] for n in names]
        if self.keep_spans:
            names.append("spans")
            arrays.append(pa.array(spans_col, SPAN_TYPE))
        # Carry through any extra input columns (e.g. raster_bytes attached
        # between fan-out and OCR): lets downstream zips stay FUSED in this
        # single pass instead of branching the fan-out lineage into a join
        # (SURVEY §2.4 J1 — "no physical join needed").  `image`/`dpi` are
        # consumed and intentionally dropped (the shuffle carries text only).
        for n in batch.schema.names:
            if n not in names and n not in ("image", "dpi"):
                names.append(n)
                arrays.append(batch.column(n))
        return pa.table(dict(zip(names, arrays)))
