"""S2 content-type sniff unit tests (reference `file -b --mime-type`
routing, pdf2pdfocr.py:1229-1236): magic-byte routing of PDF / image /
HTML / junk payloads."""

from __future__ import annotations

import pyarrow as pa

from pdf2pdfocr_ray.stages.sniff import (
    ROUTE_ERROR,
    ROUTE_HTML,
    ROUTE_IMAGE,
    ROUTE_PDF,
    sniff_route,
)


def _route_of(payload: bytes) -> str:
    t = pa.table(
        {
            "url": pa.array(["u"], pa.string()),
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": pa.array([payload], pa.binary()),
            "text": pa.array([""], pa.string()),
            "lang": pa.array(["eng"], pa.string()),
        }
    )
    return sniff_route(t).column("route").to_pylist()[0]


def test_pdf_magic():
    assert _route_of(b"%PDF-1.4\nrest") == ROUTE_PDF


def test_png_magic():
    assert _route_of(b"\x89PNG\r\n\x1a\nrest") == ROUTE_IMAGE


def test_jpeg_magic():
    assert _route_of(b"\xff\xd8\xff\xe0JFIF") == ROUTE_IMAGE


def test_tiff_magics():
    assert _route_of(b"II*\x00data") == ROUTE_IMAGE
    assert _route_of(b"MM\x00*data") == ROUTE_IMAGE


def test_html_fallback():
    assert _route_of(b"<html><body>x</body></html>") == ROUTE_HTML
    assert _route_of(b"  <!DOCTYPE html><p>y</p>") == ROUTE_HTML


def test_junk_routed_error():
    assert _route_of(b"\x00\x01\x02\x03 binary junk") == ROUTE_ERROR
    assert _route_of(b"") == ROUTE_ERROR


def test_non_utf8_html_decodes_via_fallback():
    """A payload that sniffs as HTML but isn't valid UTF-8 decodes via
    the windows-1252 fallback (WHATWG sniffing order) instead of being
    dropped — real crawls are full of undeclared latin-ish bytes, and an
    error row here would be a silent coverage gap."""
    from pdf2pdfocr_ray.stages.fanout import FanOut

    t = pa.table(
        {
            "url": pa.array(["u"], pa.string()),
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": pa.array([b"<html>\xff\xfe\xfa broken bytes</html>"], pa.binary()),
            "text": pa.array([""], pa.string()),
            "lang": pa.array(["eng"], pa.string()),
        }
    )
    out = FanOut()(sniff_route(t))
    assert out.num_rows == 1
    assert out.column("error").to_pylist()[0] is None
    assert out.column("page_text").to_pylist()[0] is not None


def test_sniff_preserves_columns_and_rows():
    t = pa.table(
        {
            "url": pa.array(["a", "b"], pa.string()),
            "warc_ts": pa.array([0, 1], pa.timestamp("us")),
            "html": pa.array([b"%PDF-x", b"<p>hi</p>"], pa.binary()),
            "text": pa.array(["", ""], pa.string()),
            "lang": pa.array(["eng", "por"], pa.string()),
        }
    )
    out = sniff_route(t)
    assert out.num_rows == 2
    assert set(t.column_names) <= set(out.column_names)
    assert out.column("route").to_pylist() == [ROUTE_PDF, ROUTE_HTML]


def test_gzip_residue_payloads_transparently_decompress():
    """Content-Encoding residue: a gzip-wrapped HTML/PDF payload routes
    and extracts as its decompressed self; corrupt gzip and bombs keep
    their raw bytes (-> error route), never crash the task."""
    import gzip
    import zlib

    html = b"<html><body><p>" + b"research content analysis " * 4 + b"</p></body></html>"
    gz = gzip.compress(html, mtime=0)
    t = pa.table({
        "url": pa.array(["a", "b", "c"], pa.string()),
        "warc_ts": pa.array([0, 0, 0], pa.timestamp("us")),
        "html": pa.array([gz, gz[:12], b"\x1f\x8b\x08" + b"\xff" * 20],
                         pa.binary()),
        "text": pa.array(["", "", ""], pa.string()),
        "lang": pa.array(["eng"] * 3, pa.string()),
    })
    out = sniff_route(t)
    routes = dict(zip(out.column("url").to_pylist(),
                      out.column("route").to_pylist()))
    assert routes["a"] == ROUTE_HTML
    assert routes["b"] == ROUTE_ERROR  # truncated gzip keeps raw bytes
    assert routes["c"] == ROUTE_ERROR  # corrupt deflate keeps raw bytes
    assert out.column("html").to_pylist()[0] == html  # decompressed inline

    # bomb guard: highly-compressible payload over the cap -> error route
    from pdf2pdfocr_ray.stages.sniff import _GZIP_CAP, _gunzip_capped

    big = gzip.compress(b"\x00" * (_GZIP_CAP + 1), 9, mtime=0)
    import pytest

    with pytest.raises(ValueError, match="decompress cap"):
        _gunzip_capped(big)
    t2 = pa.table({
        "url": pa.array(["bomb"], pa.string()),
        "warc_ts": pa.array([0], pa.timestamp("us")),
        "html": pa.array([big], pa.binary()),
        "text": pa.array([""], pa.string()),
        "lang": pa.array(["eng"], pa.string()),
    })
    assert sniff_route(t2).column("route").to_pylist() == [ROUTE_ERROR]




def _scanned_inline_and_colorspace_pdf() -> bytes:
    """Fuzz base: a scanned PDF mixing inline images (BI/ID/EI), the
    round-5l colorspace forms and a form-wrapped raster, so bit-flips
    hit the inline scanner, the palette/ICC resolution, the /Decode
    inversion and the Form-XObject image recursion paths."""
    import numpy as np

    from pdf2pdfocr_ray.functions.jpegcodec import encode_jpeg
    from pdf2pdfocr_ray.functions.minipdf import build_scanned_pdf

    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    gray = img[:, :, 0].copy()
    bil = np.where(gray < 128, 0, 255).astype(np.uint8)
    return build_scanned_pdf([
        ("inline_gray", gray),
        ("inline_rgb", img),
        ("inline_g4", bil),
        ("inline_dct", encode_jpeg(img, 90), 24, 24),
        ("indexed", (img // 64) * 64),
        ("icc_gray", gray),
        ("cmyk_raw", img),
        ("gray4", gray),
        ("raw1_invert", bil),
        ("form_gray", gray),
    ])

def test_fanout_truncation_fuzz_round5_kinds():
    """300 random truncations of every round-5 container kind (tiled
    TIFF, 16-bit TIFF, EXIF JPEG, ASCII85 PDF, gzip HTML, zlib HTML)
    flow through sniff+fanout with zero stage crashes — every malformed
    payload becomes an error row or a passthrough row, never an
    exception."""
    import gzip
    import zlib

    import numpy as np

    from pdf2pdfocr_ray.functions.jpegcodec import encode_jpeg
    from pdf2pdfocr_ray.functions.minipdf import (
        build_foreign_pdf,
        build_foreign_pdf_15,
    )
    from pdf2pdfocr_ray.functions.pdfcrypt import encrypt_pdf
    from pdf2pdfocr_ray.functions.tiffcodec import encode_tiff
    from pdf2pdfocr_ray.stages.fanout import FanOut

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    bases = [
        encode_tiff([img, img], tile=(16, 16), compression="deflate"),
        encode_tiff([(img.astype(np.uint16) << 8) | img]),
        encode_jpeg(img, 90, exif_orientation=6),
        build_foreign_pdf([["alpha beta"]], stream_filter="a85+flate"),
        build_foreign_pdf([["€½ «Škoda» beta"]], text_encoding="differences"),
        build_foreign_pdf([["form alpha"], ["beta gamma"]],
                          form_mode="nested"),
        build_foreign_pdf_15([["modern xref"], ["objstm page"]]),
        build_foreign_pdf_15([["hybrid table"], ["xrefstm page"]], hybrid=True),
        encrypt_pdf(
            build_foreign_pdf([["€½ «Škoda» beta"]], text_encoding="tounicode"),
            variant="aes-128"),
        gzip.compress(
            b"<html><body><p>" + b"x" * 64 + b"</p></body></html>",
            mtime=0),
        zlib.compress(
            b"<html><body><p>" + b"y" * 64 + b"</p></body></html>", 6),
        _scanned_inline_and_colorspace_pdf(),
    ]
    payloads, urls = [], []
    for bi, b in enumerate(bases):
        for j in range(60):
            cut = int(rng.integers(4, len(b)))
            payloads.append(b[:cut])
            urls.append(f"u{bi}_{j}")
    t = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array([0] * len(urls), pa.timestamp("us")),
        "html": pa.array(payloads, pa.binary()),
        "text": pa.array([""] * len(urls), pa.string()),
        "lang": pa.array(["eng"] * len(urls), pa.string()),
    })
    out = FanOut()(sniff_route(t))  # must not raise
    assert out.num_rows >= len(urls) - 1  # multi-frame may add rows


def test_zlib_residue_payloads_transparently_decompress():
    """Content-Encoding: deflate residue (zlib-wrapped, CMF/FLG header):
    every standard-level FLG byte decompresses inline like gzip; a
    payload that merely STARTS with a zlib magic but fails the inflate
    (or its adler32) keeps its raw bytes; PDFs wrapped in zlib route as
    pdf after inflation."""
    import zlib

    html = (b"<html><body><p>" + b"deflate residue body " * 6
            + b"</p></body></html>")
    pdfish = b"%PDF-1.4 fake"
    rows = []
    for level, _flg in ((1, 0x01), (6, 0x9C), (9, 0xDA)):
        z = zlib.compress(html, level)
        assert z[0] == 0x78
        rows.append(z)
    rows.append(zlib.compress(pdfish, 6))
    rows.append(b"\x78\x9c" + b"\xff" * 30)  # bad inflate -> raw kept
    rows.append(b"\x78\x01")                 # truncated -> raw kept
    t = pa.table({
        "url": pa.array([f"u{i}" for i in range(len(rows))], pa.string()),
        "warc_ts": pa.array([0] * len(rows), pa.timestamp("us")),
        "html": pa.array(rows, pa.binary()),
        "text": pa.array([""] * len(rows), pa.string()),
        "lang": pa.array(["eng"] * len(rows), pa.string()),
    })
    out = sniff_route(t)
    routes = out.column("route").to_pylist()
    payloads = out.column("html").to_pylist()
    assert routes[:3] == [ROUTE_HTML] * 3
    assert payloads[:3] == [html] * 3
    assert routes[3] == ROUTE_PDF and payloads[3] == pdfish
    assert routes[4] == ROUTE_ERROR and payloads[4] == rows[4]
    assert routes[5] == ROUTE_ERROR and payloads[5] == rows[5]


def test_multi_member_gzip_payload_fully_decompresses():
    """HTTP gzip bodies occasionally concatenate members; all members
    decode (not silently just the first), trailing non-gzip junk after
    the last member is tolerated, and the bomb cap spans the SUM of
    members."""
    import gzip

    import pytest

    from pdf2pdfocr_ray.stages.sniff import _GZIP_CAP, _gunzip_capped

    a = gzip.compress(b"<html><body>first ", mtime=0)
    b = gzip.compress(b"second</body></html>", mtime=0)
    assert _gunzip_capped(a + b) == b"<html><body>first second</body></html>"
    # trailing junk after the final member: keep what decoded
    assert _gunzip_capped(a + b"\r\n\r\n") == b"<html><body>first "
    # sum-of-members bomb: two members each just under the cap
    half = gzip.compress(b"\x00" * (_GZIP_CAP // 2 + 16), 9, mtime=0)
    with pytest.raises(ValueError, match="decompress cap"):
        _gunzip_capped(half + half)
    # zlib payloads never loop: a second zlib stream after the first is
    # trailing junk, and the first stream still decodes
    import zlib

    z = zlib.compress(b"<html>z</html>", 6)
    assert _gunzip_capped(z + z, wbits=15) == b"<html>z</html>"


def test_fanout_bitflip_fuzz_never_stalls():
    """640 random BIT-FLIPS (not just truncations) of every container
    kind through sniff+fanout: corrupted headers can declare absurd
    dimensions or counts (a flipped 32-bit TIFF IFD count once built a
    GB-sized struct format string; flipped PNG/TIFF dims once allocated
    TB-sized arrays) — the decode-time caps in functions/limits.py must
    turn every such payload into a prompt error row.  The whole sweep
    must finish in seconds, not minutes."""
    import gzip
    import time
    import zlib

    import numpy as np

    from pdf2pdfocr_ray.functions.bmpcodec import encode_bmp
    from pdf2pdfocr_ray.functions.gifcodec import encode_gif
    from pdf2pdfocr_ray.functions.icocodec import encode_ico
    from pdf2pdfocr_ray.functions.jpegcodec import encode_jpeg
    from pdf2pdfocr_ray.functions.minipdf import (
        build_foreign_pdf,
        build_foreign_pdf_15,
    )
    from pdf2pdfocr_ray.functions.pdfcrypt import encrypt_pdf
    from pdf2pdfocr_ray.functions.pngcodec import encode_png
    from pdf2pdfocr_ray.functions.pnmcodec import encode_pnm
    from pdf2pdfocr_ray.functions.tiffcodec import encode_tiff
    from pdf2pdfocr_ray.functions.webpcodec import (
        encode_webp,
        encode_webp_anim,
        encode_webp_lossy,
    )
    from pdf2pdfocr_ray.stages.fanout import FanOut

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    pal = (img // 64) * 64
    bases = [
        encode_tiff([img, img], tile=(16, 16), compression="deflate"),
        encode_tiff([(img.astype(np.uint16) << 8) | img]),
        encode_jpeg(img, 90, exif_orientation=6),
        encode_png(img),
        encode_gif([pal, pal]),
        encode_webp(img),
        encode_webp_lossy(img),
        encode_webp_anim([img, img]),
        encode_bmp(img),
        encode_ico(img),
        encode_pnm(img),
        build_foreign_pdf([["alpha beta"]], stream_filter="a85+flate"),
        build_foreign_pdf([["€½ «Škoda» beta"]], text_encoding="differences"),
        build_foreign_pdf([["form alpha"], ["beta gamma"]],
                          form_mode="nested"),
        build_foreign_pdf_15([["modern xref"], ["objstm page"]]),
        build_foreign_pdf_15([["hybrid table"], ["xrefstm page"]], hybrid=True),
        encrypt_pdf(
            build_foreign_pdf([["€½ «Škoda» beta"]], text_encoding="tounicode"),
            variant="aes-128"),
        gzip.compress(
            b"<html><body><p>" + b"x" * 64 + b"</p></body></html>",
            mtime=0),
        zlib.compress(
            b"<html><body><p>" + b"y" * 64 + b"</p></body></html>", 6),
        _scanned_inline_and_colorspace_pdf(),
    ]
    payloads, urls = [], []
    for bi, b in enumerate(bases):
        for j in range(80):
            bb = bytearray(b)
            for _ in range(int(rng.integers(1, 8))):
                bb[int(rng.integers(0, len(bb)))] = int(rng.integers(0, 256))
            payloads.append(bytes(bb))
            urls.append(f"u{bi}_{j}")
    t = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array([0] * len(urls), pa.timestamp("us")),
        "html": pa.array(payloads, pa.binary()),
        "text": pa.array([""] * len(urls), pa.string()),
        "lang": pa.array(["eng"] * len(urls), pa.string()),
    })
    t0 = time.time()
    out = FanOut()(sniff_route(t))  # must not raise
    elapsed = time.time() - t0
    assert out.num_rows >= len(urls) - 1
    assert elapsed < 60, f"bit-flip sweep took {elapsed:.1f}s (decode caps broken?)"


def test_decode_caps_reject_bombs_and_absurd_dims():
    """The limits.py guards directly: header-declared petabyte images
    raise promptly; deflate bombs stop at the byte cap."""
    import struct
    import zlib

    import pytest

    from pdf2pdfocr_ray.functions.limits import MAX_DECODE_BYTES, MAX_PIXELS, capped_inflate, guard_dims

    with pytest.raises(ValueError, match="implausible"):
        guard_dims(1 << 20, 1 << 20, "test")
    with pytest.raises(ValueError, match="implausible"):
        guard_dims(0, 5, "test")
    guard_dims(8192, 8192, "test")  # 67 MP: legal

    # PNG declaring 2^30 x 2^30 raises from the IHDR parse, no allocation
    from pdf2pdfocr_ray.functions.pngcodec import decode_png, encode_png
    import numpy as np

    good = bytearray(encode_png(np.zeros((4, 4, 3), np.uint8)))
    ihdr_at = good.find(b"IHDR") + 4
    struct.pack_into(">II", good, ihdr_at, 1 << 30, 1 << 30)
    with pytest.raises(ValueError):
        decode_png(bytes(good))

    # deflate bomb: 1 MB of zeros compressed ~1000:1, cap at 64 KiB
    bomb = zlib.compress(b"\x00" * (1 << 20), 9)
    with pytest.raises(ValueError, match="cap"):
        capped_inflate(bomb, "test", cap=1 << 16)
    # honest stream under the cap passes through
    assert capped_inflate(zlib.compress(b"abc"), "t") == b"abc"
    assert MAX_DECODE_BYTES > MAX_PIXELS * 3  # cap clears a max-size RGB image


def test_zstd_lz4_payloads_get_typed_error_reason():
    """Payloads in compression formats this container cannot decode
    (zstd, lz4 — no libs available offline) become TYPED error rows, so
    a crawl census can count them; arbitrary junk keeps the generic
    reason."""
    import zlib

    from pdf2pdfocr_ray.stages.fanout import FanOut

    t = pa.table({
        "url": pa.array(["zstd", "lz4", "junk"], pa.string()),
        "warc_ts": pa.array([0, 0, 0], pa.timestamp("us")),
        "html": pa.array([
            b"\x28\xb5\x2f\xfd" + zlib.compress(b"data") ,
            b"\x04\x22\x4d\x18" + b"\x00" * 16,
            b"\x00\x01\x02 junk",
        ], pa.binary()),
        "text": pa.array(["", "", ""], pa.string()),
        "lang": pa.array(["eng"] * 3, pa.string()),
    })
    out = FanOut()(sniff_route(t))
    errs = dict(zip(out.column("url").to_pylist(),
                    out.column("error").to_pylist()))
    assert errs["zstd"] == "unsupported_compression: zstd"
    assert errs["lz4"] == "unsupported_compression: lz4"
    assert errs["junk"] == "unsupported_type"
