"""WARC (Web ARChive) source: Common-Crawl's container format -> the
engine's ``pages`` table.

The north-rule frames the corpus as Common-Crawl-style captures; the
canonical on-disk form of those captures is WARC/1.0-1.1 (ISO 28500):
records of ``WARC/1.x`` header blocks + payload, double-CRLF separated.
This module reads ``response``/``resource`` records (the ones carrying
captured payloads), strips the HTTP response envelope when present, and
emits ``(url, warc_ts, html, text, lang)`` rows — so a corpus laid out
as raw WARC files feeds the same flagship pipeline as Parquet.

Distributed shape: ``ray.data.read_binary_files`` lists and ships one
WARC file per row (WARC files are the natural shard unit — Common Crawl
publishes ~1 GB gzip members); a ``flat_map``-style ``map_batches``
parses each file into its page rows.  Record-level gzip members
(`.warc.gz` as concatenated gzip streams, the Common-Crawl layout) are
handled via ``zlib`` multi-member decompression.

A fixture writer (``build_warc``) exists for deterministic tests; no
external data is ever fetched.
"""

from __future__ import annotations

import zlib
from typing import TYPE_CHECKING

import pyarrow as pa

if TYPE_CHECKING:
    import ray.data

_CRLF2 = b"\r\n\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the .warc.gz layout)."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out += d.decompress(data[pos:])
        out += d.flush()
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return bytes(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # line 0 = WARC/1.x version
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1", "replace"
            )
    return headers


def _strip_http_envelope(payload: bytes) -> bytes:
    """response records wrap the capture in an HTTP/1.x response; the
    body starts after the header block."""
    if payload[:5] in (b"HTTP/",):
        idx = payload.find(_CRLF2)
        if idx >= 0:
            return payload[idx + 4 :]
    return payload


def parse_warc(data: bytes) -> list[dict]:
    """WARC bytes (plain or multi-member gzip) -> list of page-row dicts
    (url, warc_ts microseconds, html payload bytes)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    if not data.startswith(b"WARC/"):
        raise ValueError("not a WARC file (missing WARC/ version line)")
    rows: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        if not data.startswith(b"WARC/", pos):
            nxt = data.find(b"WARC/", pos)
            if nxt < 0:
                break
            pos = nxt
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            break
        headers = _parse_headers(data[pos:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError as e:
            raise ValueError("WARC record missing Content-Length") from e
        body_start = hdr_end + 4
        payload = data[body_start : body_start + length]
        pos = body_start + length
        # records end with two CRLFs
        while data.startswith(b"\r\n", pos):
            pos += 2

        rtype = headers.get("warc-type", "")
        if rtype not in ("response", "resource"):
            continue  # warcinfo/request/metadata records carry no capture
        url = headers.get("warc-target-uri", "")
        ts = headers.get("warc-date", "1970-01-01T00:00:00Z")
        rows.append(
            {
                "url": url,
                "warc_ts": _iso_to_us(ts),
                "html": _strip_http_envelope(payload)
                if rtype == "response"
                else payload,
            }
        )
    return rows


def _iso_to_us(ts: str) -> int:
    """WARC-Date (ISO-8601 Zulu) -> microseconds since epoch, no wall
    clock involved."""
    import datetime

    try:
        dt = datetime.datetime.fromisoformat(ts.replace("Z", "+00:00"))
    except ValueError:
        return 0
    return int(dt.timestamp() * 1_000_000)


PAGES_FROM_WARC_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def read_warc(paths: str | list[str]) -> "ray.data.Dataset":
    """WARC file(s)/dir -> pages Dataset (url, warc_ts, html, text, lang).

    One input row per WARC file (the shard unit); each parses into its
    page rows inside ``map_batches`` — the S1 corpus-discovery shape for
    raw-capture corpora (SURVEY §2.1 S1 ``read_binary_files`` branch)."""
    import ray.data

    files = ray.data.read_binary_files(paths)

    def explode(batch: pa.Table) -> pa.Table:
        urls, tss, payloads = [], [], []
        for blob in batch.column("bytes").to_pylist():
            for row in parse_warc(blob):
                urls.append(row["url"])
                tss.append(row["warc_ts"])
                payloads.append(row["html"])
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(payloads, pa.binary()),
                "text": pa.array([""] * len(urls), pa.string()),
                "lang": pa.array([""] * len(urls), pa.string()),
            },
            schema=PAGES_FROM_WARC_SCHEMA,
        )

    return files.map_batches(explode, batch_format="pyarrow", batch_size=1)


def build_warc(
    records: list[tuple[str, int, bytes]],
    *,
    gzip_members: bool = False,
    http_envelope: bool = True,
) -> bytes:
    """Fixture writer: (url, ts_us, payload) triples -> WARC/1.0 bytes
    (optionally as concatenated per-record gzip members, the Common-Crawl
    .warc.gz layout)."""
    import datetime
    import gzip as _gzip

    out = bytearray()
    for url, ts_us, payload in records:
        if http_envelope:
            body = (
                b"HTTP/1.1 200 OK\r\nContent-Type: application/octet-stream\r\n"
                b"Content-Length: " + str(len(payload)).encode() + _CRLF2[:2]
                + b"\r\n" + payload
            )
        else:
            body = payload
        iso = (
            datetime.datetime.fromtimestamp(
                ts_us / 1_000_000, tz=datetime.timezone.utc
            ).strftime("%Y-%m-%dT%H:%M:%SZ")
        )
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: " + (b"response" if http_envelope else b"resource") + b"\r\n"
            b"WARC-Target-URI: " + url.encode() + b"\r\n"
            b"WARC-Date: " + iso.encode() + b"\r\n"
            b"Content-Length: " + str(len(body)).encode()
            + _CRLF2  # terminates the last header line AND the block
            + body
            + _CRLF2
        )
        if gzip_members:
            out += _gzip.compress(rec, mtime=0)
        else:
            out += rec
    return bytes(out)
