"""WET sink + source — the Common-Crawl extracted-text interchange format.

A WET file is a WARC/1.0 file whose records are ``conversion`` records:
one per page, ``Content-Type: text/plain``, body = the extracted text.
It is the ecosystem's standard carrier for exactly what this engine
produces, so the extraction pipeline can emit WET shards that any
downstream Common-Crawl consumer reads — and re-ingest WET produced
elsewhere.

Scale shape:

* ``write_wet`` is a streaming map over blocks: each block becomes ONE
  ``.warc.wet.gz`` shard (warcinfo header record + per-row conversion
  records, per-record gzip members — the Common-Crawl layout the WARC
  reader streams incrementally).  Shard names are content-derived
  (md5 of the block's first url), so a re-run overwrites the same shards
  idempotently — resumable partitioned output, never one giant file.
* ``read_wet`` rides the WARC source's streaming record cutter
  (sources/warc.py): chunked gunzip, bounded memory, per-file fault
  isolation.
"""

from __future__ import annotations

import datetime
import gzip as _gzip
import hashlib
import os
from typing import TYPE_CHECKING

import pandas as pd

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

_CRLF2 = b"\r\n\r\n"


def _iso(ts_us: int) -> bytes:
    return datetime.datetime.fromtimestamp(
        ts_us / 1_000_000, tz=datetime.timezone.utc
    ).strftime("%Y-%m-%dT%H:%M:%SZ").encode()


def _conversion_record(url: str, ts_us: int, text: str) -> bytes:
    body = text.encode("utf-8")
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: " + url.encode() + b"\r\n"
        b"WARC-Date: " + _iso(ts_us) + b"\r\n"
        b"Content-Type: text/plain\r\n"
        b"Content-Length: " + str(len(body)).encode()
        + _CRLF2 + body + _CRLF2
    )


def _warcinfo_record(ts_us: int, n_records: int) -> bytes:
    body = (b"software: pdf2pdfocr_ray\r\nformat: WARC File Format 1.0\r\n"
            b"conversion-records: " + str(n_records).encode() + b"\r\n")
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"WARC-Date: " + _iso(ts_us) + b"\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: " + str(len(body)).encode()
        + _CRLF2 + body + _CRLF2
    )


def write_wet(
    ds: "ray.data.Dataset",
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "extracted_text",
) -> int:
    """Extracted rows -> sharded ``.warc.wet.gz`` under ``out_dir``.

    One shard per input block, named by the md5 of the block's full
    record payload (every url + timestamp + text), so two blocks that
    happen to start with the same url — duplicate urls are routine in
    crawls — can never overwrite each other, and a re-run with identical
    content is still idempotent.  Stale shards from a previous run with
    different partitioning are cleared from ``out_dir`` first so
    ``read_wet`` never mixes them in.  Rows with null text are skipped
    (error rows have no conversion record — the same contract as Common
    Crawl's WET, which only carries successful conversions).  Returns
    the number of records written."""
    os.makedirs(out_dir, exist_ok=True)
    for name in os.listdir(out_dir):
        if name.startswith("part-") and name.endswith(".warc.wet.gz"):
            os.unlink(os.path.join(out_dir, name))

    def sink(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[~df[text_col].isna()]
        if keep.empty:
            return pd.DataFrame({"n": [0]})
        parts = []
        ts0 = None
        for url, ts, text in zip(keep[url_col], keep[ts_col], keep[text_col]):
            if isinstance(ts, datetime.datetime):
                ts_us = int(
                    ts.replace(tzinfo=datetime.timezone.utc).timestamp()
                    * 1_000_000)
            else:
                ts_us = int(ts)
            ts0 = ts_us if ts0 is None else min(ts0, ts_us)
            parts.append(_conversion_record(str(url), ts_us, str(text)))
        shard = hashlib.md5(b"".join(parts)).hexdigest()
        path = os.path.join(out_dir, f"part-{shard}.warc.wet.gz")
        with open(path, "wb") as f:
            f.write(_gzip.compress(
                _warcinfo_record(ts0, len(parts)), mtime=0))
            for rec in parts:
                f.write(_gzip.compress(rec, mtime=0))
        return pd.DataFrame({"n": [len(parts)]})

    counts = ds.map_batches(sink, batch_format="pandas").to_pandas()
    return int(counts["n"].sum())


def read_wet(paths: str | list[str]) -> "ray.data.Dataset":
    """WET shards -> Dataset (url, warc_ts, extracted_text) — streams
    through the WARC record cutter, conversion records only."""
    import pyarrow as pa
    import ray.data

    from .warc import _iter_chunks, _list_warc_files, iter_warc_records

    files = _list_warc_files(paths)

    def load(batch: pd.DataFrame) -> pa.Table:
        import os as _os

        urls, tss, texts = [], [], []

        def sentinel(path: str, e: Exception) -> None:
            # same row-level fault posture as read_warc: one damaged
            # shard/record flags itself instead of killing the task
            urls.append(f"wet:error:{_os.path.basename(path)}:{e}")
            tss.append(0)
            texts.append(None)

        for path in batch["path"]:
            try:
                with open(path, "rb") as f:
                    # _iter_chunks auto-detects gzip vs plain (same
                    # sniff read_warc uses) — uncompressed .wet files
                    # occur in the wild
                    for rec in iter_warc_records(
                        _iter_chunks(f), types=("conversion",)
                    ):
                        try:
                            text = rec["html"].decode("utf-8")
                        except UnicodeDecodeError as e:
                            sentinel(path, e)  # bad record, keep reading
                            continue
                        urls.append(rec["url"])
                        tss.append(rec["warc_ts"])
                        texts.append(text)
            except (ValueError, OSError) as e:
                sentinel(path, e)  # corrupt gzip/framing: rest of file lost
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "extracted_text": pa.array(texts, pa.string()),
        })

    src = ray.data.from_items([{"path": p} for p in files])
    return src.map_batches(load, batch_format="pandas", batch_size=1)
