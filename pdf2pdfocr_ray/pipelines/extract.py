"""The flagship pipeline: pages table -> extracted table.

Ray-Data-first composition (SURVEY.md §3.1's stage chain re-expressed):

    read_parquet(pages)
      → map_batches(sniff_route)            # S2, zero-copy Arrow
      → map_batches(FanOut(cfg))            # S3-S5, F1-F4, M13; doc→page rows
      → map_batches(OcrStage, concurrency)  # T1 actor pool; M1-M5, M11, hOCR
      → groupby(url).map_groups(assemble)   # A3 — the only wide stage
      → extracted(url, warc_ts, route, extracted_text, n_pages, error)

The whole thing is ONE lazy lineage: html rows become already-final page rows
at fan-out and pass through OCR untouched, so no dataset branching / double
read.  Images exist only between fan-out and OCR; the shuffle carries text.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from ..config import PipelineConfig
from ..stages.assemble import reassemble, reassemble_two_level
from ..stages.fanout import FanOut
from ..stages.ocr import OcrStage
from ..stages.sniff import sniff_route

if TYPE_CHECKING:
    import ray.data


def extract(
    pages_ds: "ray.data.Dataset",
    config: PipelineConfig | None = None,
    keep_spans: bool = False,
) -> "ray.data.Dataset":
    """pages Dataset -> extracted Dataset (lazy; caller consumes/writes).
    ``keep_spans`` adds a doc-level ``spans`` list<struct> column (word
    bboxes concatenated in page order) — off by default: spans multiply
    the shuffle payload."""
    cfg = config or PipelineConfig()
    sniffed = pages_ds.map_batches(
        sniff_route, batch_format="pyarrow", batch_size=cfg.doc_batch_size
    )
    page_rows = sniffed.map_batches(
        FanOut(cfg),
        batch_format="pyarrow",
        batch_size=cfg.doc_batch_size,
    )
    if cfg.page_rebalance:
        # Streaming split/coalesce (NOT an all-to-all): evens out giant-doc
        # page runs so the OCR pool sees uniform ~page_batch_size blocks.
        page_rows = page_rows.repartition(
            target_num_rows_per_block=cfg.page_batch_size
        )
    ocred = page_rows.map_batches(
        OcrStage,
        fn_constructor_kwargs={"config": cfg, "keep_spans": keep_spans},
        batch_format="pyarrow",
        batch_size=cfg.page_batch_size,
        concurrency=cfg.resolve_ocr_concurrency(),
        num_cpus=1,
    )
    if cfg.assembly_chunk_pages > 0:
        return reassemble_two_level(
            ocred,
            chunk_pages=cfg.assembly_chunk_pages,
            shuffle_partitions=cfg.shuffle_partitions,
        )
    return reassemble(ocred, shuffle_partitions=cfg.shuffle_partitions)


def extract_from_parquet(
    pages_path: str | list[str], config: PipelineConfig | None = None
) -> "ray.data.Dataset":
    import ray.data

    return extract(ray.data.read_parquet(pages_path), config)
