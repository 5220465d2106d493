"""WARC source tests: record parsing, gzip members, HTTP envelope strip,
end-to-end ingest -> flagship extraction."""

from __future__ import annotations

import pandas as pd
import pytest

from pdf2pdfocr_ray.sources.warc import build_warc, parse_warc, read_warc


def _fixture_records():
    from pdf2pdfocr_ray.functions.minipdf import PageSpec, build_pdf

    html = b"<html><body><article><p>" + b"Warc ingest paragraph with enough characters to pass the content rule." + b"</p></article></body></html>"
    pdf = build_pdf([PageSpec(lines=["warc pdf page"])])
    return [
        ("https://w.example/html/1", 1_700_000_000_000_000, html),
        ("https://w.example/pdf/2", 1_700_000_001_000_000, pdf),
    ]


@pytest.mark.parametrize("gz", [False, True])
@pytest.mark.parametrize("env", [False, True])
def test_parse_warc_roundtrip(gz, env):
    recs = _fixture_records()
    data = build_warc(recs, gzip_members=gz, http_envelope=env)
    rows = parse_warc(data)
    assert [r["url"] for r in rows] == [u for u, _, _ in recs]
    assert [r["warc_ts"] for r in rows] == [t for _, t, _ in recs]
    assert [r["html"] for r in rows] == [p for _, _, p in recs]


def test_parse_warc_skips_non_capture_records():
    recs = _fixture_records()
    data = build_warc(recs)
    # splice a warcinfo record in front
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 9\r\n\r\n"
        b"info-body\r\n\r\n"
    )
    rows = parse_warc(info + data)
    assert len(rows) == 2


def test_parse_warc_rejects_junk():
    with pytest.raises(ValueError):
        parse_warc(b"not a warc at all")


def test_warc_ingest_end_to_end(ray_session, tmp_path):
    from pdf2pdfocr_ray.pipelines.extract import extract

    recs = _fixture_records()
    p = tmp_path / "capture.warc.gz"
    p.write_bytes(build_warc(recs, gzip_members=True))
    ds = read_warc(str(p))
    res = extract(ds).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(res) == 2
    assert res["route"].tolist() == ["html", "pdf"]
    assert res["extracted_text"][1] == "warc pdf page\n"
    assert "Warc ingest paragraph" in res["extracted_text"][0]
    assert res["error"].isna().all()
