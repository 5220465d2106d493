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
    # F4: encrypted PDFs always yield error rows (content unreadable)

    # preprocessing (reference -d deskew, -u autorotate; pdf2pdfocr.py:94-101,
    # 1018-1083)
    deskew: bool = True
    autorotate: bool = True

    # OCR engine selection (reference -c; pdf2pdfocr.py:556-558)
    ocr_engine: str = "template"  # "template" | "no_ocr"

    # execution sizing (reference -j parallel percent; pdf2pdfocr.py:527-529)
    doc_batch_size: int = 32  # rows per fan-out batch (binary payloads are wide)
    page_batch_size: int = 16  # page-image rows per OCR batch
    # OCR actor pool size. An autoscaling (min, max) tuple: a fixed pool equal
    # to the cluster CPU count starves the read stage (observed deadlock on an
    # 8-CPU local cluster with concurrency=8).
    ocr_concurrency: int | tuple[int, int] = (1, 8)
    shuffle_partitions: int = 0  # 0 = let Ray pick (groupby num_partitions)
