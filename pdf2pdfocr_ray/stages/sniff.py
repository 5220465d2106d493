"""S2 — content-type sniff + routing (reference shells out to
``file -b --mime-type`` per file, /root/reference/pdf2pdfocr.py:1229-1236;
here: vectorized magic-byte prefix checks on the ``html`` binary column inside
``map_batches(batch_format="pyarrow")``)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

ROUTE_PDF = "pdf"
ROUTE_IMAGE = "image"
ROUTE_HTML = "html"
ROUTE_ERROR = "error"

_IMAGE_MAGICS = (b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff", b"II*\x00", b"MM\x00*",
                 b"GIF87a", b"GIF89a")


_GZIP_CAP = 128 << 20  # decompression-bomb guard per payload


def _gunzip_capped(payload: bytes, wbits: int = 31) -> bytes:
    import zlib

    out = bytearray()
    while payload:  # loop: gzip bodies may concatenate members
        d = zlib.decompressobj(wbits=wbits)
        out += d.decompress(payload, _GZIP_CAP - len(out))
        if d.unconsumed_tail:
            raise ValueError("gzip payload exceeds the 128 MiB decompress cap")
        if not d.eof:
            # a truncated member would silently yield a prefix; keep the
            # raw bytes instead so the row lands on the error route
            raise ValueError("truncated gzip payload")
        payload = d.unused_data
        if payload and not (wbits == 31 and payload[:3] == b"\x1f\x8b\x08"):
            # residual junk after the last member (padding, stray CRLFs)
            # is routine in wire captures; keep what decoded cleanly.
            # zlib (wbits=15) never concatenates members.
            break
    return bytes(out)


# zlib (Content-Encoding: deflate residue) leads with CMF 0x78 + an FLG
# byte passing the %31 check; the four bytes below are the only FLG
# values emitted by standard compression levels.  A text payload can't
# collide ('\x01'/'\x5e'/'\x9c'/'\xda' after 'x' is not prose), and a
# random collision still has to pass the full inflate + adler32 before
# the bytes are replaced.
_ZLIB_MAGICS = (b"\x78\x01", b"\x78\x5e", b"\x78\x9c", b"\x78\xda")


def sniff_route(batch: pa.Table) -> pa.Table:
    """Append a ``route`` column derived from payload magic bytes.

    pdf: ``%PDF-`` prefix; image: PNG/JPEG/TIFF magics; html: leading ``<``;
    anything else (including empty payloads) -> error route.

    Gzip- and zlib-wrapped payloads (Content-Encoding gzip/deflate
    residue, routine in crawl dumps) are transparently decompressed
    FIRST — bounded by a 128 MiB bomb guard — and every downstream
    stage sees the decompressed bytes; only the compressed subset pays
    the Python loop."""
    col = batch.column("html")
    is_gz = pc.starts_with(col, pattern=b"\x1f\x8b\x08")
    is_zl = pc.starts_with(col, pattern=_ZLIB_MAGICS[0])
    for magic in _ZLIB_MAGICS[1:]:
        is_zl = pc.or_(is_zl, pc.starts_with(col, pattern=magic))
    if pc.any(pc.or_(is_gz, is_zl)).as_py():
        gz_mask = is_gz.to_numpy(zero_copy_only=False)
        zl_mask = is_zl.to_numpy(zero_copy_only=False)
        payloads = col.to_pylist()
        for i in range(len(payloads)):
            if gz_mask[i] or zl_mask[i]:
                try:
                    payloads[i] = _gunzip_capped(
                        payloads[i], wbits=31 if gz_mask[i] else 15)
                except Exception:  # noqa: BLE001 — row-level isolation:
                    pass  # corrupt member keeps its raw bytes -> error route
        col = pa.array(payloads, pa.binary())
        batch = batch.set_column(
            batch.schema.get_field_index("html"), "html", col)
    is_pdf = pc.starts_with(col, pattern=b"%PDF-")
    is_img = pc.starts_with(col, pattern=_IMAGE_MAGICS[0])
    for magic in _IMAGE_MAGICS[1:]:
        is_img = pc.or_(is_img, pc.starts_with(col, pattern=magic))
    # WebP: RIFF container with a WEBP form type at offset 8
    is_img = pc.or_(
        is_img, pc.match_substring_regex(col, r"^RIFF(?s:.{4})WEBP")
    )
    # BMP: "BM" + 4-byte size + two reserved words, zero per spec ("BM"
    # alone is too weak a prefix for crawl payloads)
    is_img = pc.or_(
        is_img, pc.match_substring_regex(col, r"^BM(?s:.{4})\x00\x00\x00\x00")
    )
    # PNM: P1-P6 magic then whitespace or a '#' comment (pdftoppm's output
    # family, reference pdf2pdfocr.py:56-75)
    is_img = pc.or_(
        is_img, pc.match_substring_regex(col, r"^P[1-6][\s#]")
    )
    # ICO: reserved 0 + type 1 + a plausible entry count (favicons)
    is_img = pc.or_(
        is_img,
        pc.match_substring_regex(col, r"^\x00\x00\x01\x00[\x01-\x40]\x00"),
    )
    # html: first non-whitespace (or post-BOM) byte is '<' — crawl payloads
    # frequently lead with whitespace or a UTF-8 BOM.
    is_html = pc.match_substring_regex(col, r"^[\s\xef\xbb\xbf]*<")
    # UTF-16 HTML: a UTF-16 BOM followed by '<' in either byte order
    # (charset decode happens in the fan-out's HTML branch)
    is_html = pc.or_(
        is_html,
        pc.match_substring_regex(
            col, r"^(?:\xff\xfe<\x00|\xfe\xff\x00<)"),
    )
    route = pc.if_else(
        is_pdf,
        ROUTE_PDF,
        pc.if_else(is_img, ROUTE_IMAGE, pc.if_else(is_html, ROUTE_HTML, ROUTE_ERROR)),
    )
    return batch.append_column("route", route)
