"""Pluggable OCR engine slot (reference -c tesseract/cuneiform,
/root/reference/pdf2pdfocr.py:104-207, 556-558): external model-backed
engine adapters drop into the T1 actor pool without touching the stage."""

import numpy as np
import pyarrow as pa
import pytest

from pdf2pdfocr_ray.config import PipelineConfig
from pdf2pdfocr_ray.functions.ocr_core import LineBox, WordBox
from pdf2pdfocr_ray.functions.ocr_engines import (
    OcrEngineError,
    coerce_lines,
    register_ocr_engine,
    resolve_ocr_engine,
)
from pdf2pdfocr_ray.stages.ocr import OcrStage


def _page_batch(lines) -> pa.Table:
    from pdf2pdfocr_ray.functions.pagerender import render_page
    from pdf2pdfocr_ray.functions.pngcodec import encode_png

    img = render_page(lines, dpi=72)
    return pa.table(
        {
            "url": pa.array(["u"], pa.string()),
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "route": pa.array(["pdf"], pa.string()),
            "page_no": pa.array([0], pa.int32()),
            "n_pages": pa.array([1], pa.int32()),
            "dpi": pa.array([72], pa.int32()),
            "image": pa.array([encode_png(img)], pa.binary()),
            "page_text": pa.array([None], pa.string()),
            "error": pa.array([None], pa.string()),
        }
    )


def test_coerce_lines_accepts_common_shapes():
    lb = LineBox(words=[WordBox("hi", 0, 0, 10, 8)])
    out = coerce_lines(
        [
            lb,
            {"text": "from dict", "x1": 0, "y1": 10, "x2": 50, "y2": 18},
            ("from tuple", 0, 20, 50, 28),
            "bare string line",
        ]
    )
    assert [l.text for l in out] == [
        "hi", "from dict", "from tuple", "bare string line"
    ]
    # word boxes were apportioned inside the line box
    d = out[1]
    assert len(d.words) == 2
    assert d.words[0].x1 == 0 and d.words[-1].x2 <= 50
    assert coerce_lines(None) == []
    with pytest.raises(ValueError):
        coerce_lines([object()])
    with pytest.raises(ValueError):
        coerce_lines(42)


def test_external_demo_model_matches_template_engine():
    """The external-adapter path (load-per-actor factory -> predict ->
    dict lines -> coercion) must reproduce the template engine's page
    text exactly — proving a real model can take the slot."""
    batch = _page_batch(["External Engine Row 3"])
    builtin = OcrStage(PipelineConfig())(batch)
    external = OcrStage(
        PipelineConfig(
            ocr_engine="external:pdf2pdfocr_ray.functions.ocr_engines:demo_model"
        )
    )(batch)
    assert (
        external.column("page_text").to_pylist()
        == builtin.column("page_text").to_pylist()
        == ["External Engine Row 3\n"]
    )
    assert external.column("error").to_pylist() == [None]


def test_registered_engine_used_by_stage():
    def fixed_lines(img: np.ndarray, scale: int):
        return [{"text": "canned model output", "x1": 0, "y1": 0,
                 "x2": img.shape[1], "y2": 10}]

    register_ocr_engine("canned", lambda: fixed_lines)
    out = OcrStage(PipelineConfig(ocr_engine="canned"))(_page_batch(["ignored"]))
    assert out.column("page_text").to_pylist() == ["canned model output\n"]


def test_bad_engine_paths_fail_fast_at_init():
    # T3 capability probe: the actor dies at __init__, not mid-batch
    with pytest.raises(ValueError, match="unknown ocr_engine"):
        OcrStage(PipelineConfig(ocr_engine="tesseract5000"))
    with pytest.raises(ValueError, match="cannot load"):
        OcrStage(PipelineConfig(ocr_engine="external:no.such.module:fn"))
    with pytest.raises(ValueError, match="cannot load"):
        OcrStage(
            PipelineConfig(
                ocr_engine="external:pdf2pdfocr_ray.functions.ocr_engines:nope"
            )
        )
    with pytest.raises(OcrEngineError):
        resolve_ocr_engine("external:malformed-no-colon")


@pytest.mark.usefixtures("ray_session")
def test_external_engine_through_flagship_pipeline():
    """End-to-end: the flagship extract pipeline with an external engine
    configured — the model loads once per pool actor inside map_batches —
    stays byte-identical to the built-in engine on the same docs."""
    from pdf2pdfocr_ray.pipelines.extract import extract
    from pdf2pdfocr_ray.sources.corpus import generate_corpus

    tbl, _ = generate_corpus(n_docs=12, seed=5)
    import ray.data

    base = (
        extract(ray.data.from_arrow(tbl))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    ext = (
        extract(
            ray.data.from_arrow(tbl),
            config=PipelineConfig(
                ocr_engine=(
                    "external:pdf2pdfocr_ray.functions.ocr_engines:demo_model"
                )
            ),
        )
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    # .equals (not ==): error rows (e.g. the corpus's encrypted doc) carry
    # a null extracted_text in BOTH runs, and pandas == calls nulls unequal
    assert base["extracted_text"].equals(ext["extracted_text"])
    assert base["error"].equals(ext["error"])
