"""Typed pipeline configuration (the Ray-native equivalent of the reference's
CLI namespace threaded into operators, /root/reference/pdf2pdfocr.py:1413-1491
— see SURVEY.md §2.10)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PipelineConfig:
    # guard filters (reference flags --min-kbytes, -b, -t, -a;
    # pdf2pdfocr.py:1200-1227)
    min_kbytes: float = 0.0  # F1: skip docs smaller than this (0 = off)
    max_pages: int = 0  # F2: skip docs with more pages (0 = off)
    skip_native_text: bool = False  # F3: skip PDFs that already have fonts
    # F4: LOCKED PDFs (empty user password fails) always yield error rows;
    # empty-user-password standard-security files decrypt transparently
    # (functions/pdfcrypt), matching the reference's default poppler
    # behavior.  check_protection=True refuses ANY /Encrypt-bearing doc —
    # the reference's -a check_protection_mode (pdf2pdfocr.py:1196-1198).
    check_protection: bool = False
    # S6 inverse: when True, PDFs with a native text layer short-circuit to
    # direct text extraction (no rasterize, no OCR) — the engine addition
    # the reference lacks; default False = rasterize+OCR everything, i.e.
    # the reference's --ignore-existing-text posture where the raster is
    # the source of truth (pdf2pdfocr.py:1104-1111).
    prefer_native_text: bool = False

    # preprocessing (reference -d deskew, -u autorotate; pdf2pdfocr.py:94-101,
    # 1018-1083)
    deskew: bool = True
    autorotate: bool = True

    # OCR engine selection (reference -c; pdf2pdfocr.py:556-558):
    # "template" (T1), "template_retry" (T2: retry-with-normalization on
    # empty pages, cuneiform's retry-with-English analog), "no_ocr".
    ocr_engine: str = "template"
    # Per-page OCR time guard in seconds (0 = off) — pages exceeding it
    # become 'ocr_timeout' error rows (reference --timeout,
    # pdf2pdfocr.py:1511-1528, at page granularity).
    ocr_timeout_s: float = 0.0

    # execution sizing (reference -j parallel percent; pdf2pdfocr.py:527-529)
    # Rows (docs) per sniff/fan-out batch.  Small on purpose: the narrow path
    # (sniff→fanout→OCR) fuses into the actor pool, so the batch is the unit
    # of load balancing across actors — 4 docs bounds a skewed giant doc's
    # task to ~the giant itself (measured: dbs=4 → 395 docs/s vs dbs=32 →
    # 216 docs/s at 32 CPUs; see BASELINE.md).
    doc_batch_size: int = 4
    page_batch_size: int = 16  # page-image rows per OCR batch
    # OCR actor pool size. None = size from cluster CPUs at pipeline build:
    # cpus - max(2, cpus//8), leaving headroom for the read and assemble
    # stages — a pool equal to the cluster CPU count starves the read stage
    # (observed deadlock on an 8-CPU local cluster with concurrency=8).
    ocr_concurrency: int | tuple[int, int] | None = None
    # Split/coalesce page blocks to ~page_batch_size rows between fan-out and
    # OCR (streaming repartition, no all-to-all): spreads one giant doc's
    # pages across the whole actor pool, at the cost of unfusing the narrow
    # path (separate fan-out tasks + a block-split barrier).  Default OFF:
    # with doc_batch_size=4 the fused path is ~1.8x faster at this page size
    # (72 DPI ≈ 50 KB rows).  Turn ON when page rows are wide (300 DPI ≈
    # multi-MB rows) or docs exceed ~1k pages: then one doc's pages must not
    # sit in one actor task's heap.
    page_rebalance: bool = False
    shuffle_partitions: int = 0  # 0 = cluster CPU count (assemble shuffle)
    # Emit a ``doc_title`` column from the fan-out (source PDF /Title,
    # null for html/image docs) — needed by sinks that preserve source
    # metadata (the searchable-PDF sandwich; reference metadata edit at
    # pdf2pdfocr.py:1333-1374).  Off for the text flagship: one fewer
    # column through the shuffle.
    emit_doc_title: bool = False
    # Two-level re-assembly: pages concat per (url, page_no // chunk) then
    # chunks merge per url — spreads a hot url's concat work over
    # ~n_pages/chunk reducers (range salt preserves byte order).  0 = off
    # (single-level); enable (e.g. 256) when docs can exceed ~10k pages.
    assembly_chunk_pages: int = 0

    def resolve_ocr_concurrency(self) -> int | tuple[int, int]:
        if self.ocr_concurrency is not None:
            return self.ocr_concurrency
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        # Never the full cluster: a pool of width == CPUs starves the read
        # stage (observed deadlock); floor of 1 actor for tiny clusters.
        # Reserve ~1 core per 16 (round-5 A/B: the fused OCR stage is now
        # ~99% of pipeline CPU, so the old 1-per-8 reserve idled cores —
        # pool 28->30 at 32 cpus measured +12-17%, pool 6->7 at 8 cpus
        # +27%; pool 31 at 32 cpus was SLOWER than 30, so the reserve
        # stays >= 1 per 16, min 1).
        return max(1, min(cpus - 1, cpus - max(1, cpus // 16)))
