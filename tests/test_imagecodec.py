"""JPEG/TIFF codec unit tests (pure-numpy baseline codecs)."""

from __future__ import annotations

import numpy as np
import pytest

from pdf2pdfocr_ray.functions.imagecodec import (
    decode_image,
    decode_image_frames,
    sniff_image_format,
)
from pdf2pdfocr_ray.functions.jpegcodec import decode_jpeg, encode_jpeg
from pdf2pdfocr_ray.functions.tiffcodec import decode_tiff, encode_tiff


def _test_img(h=48, w=64):
    x = np.linspace(0, 255, w)
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[..., 0] = x[None, :].astype(np.uint8)
    img[..., 1] = np.linspace(0, 255, h)[:, None].astype(np.uint8)
    img[..., 2] = 128
    img[10:20, 5:60] = 0  # hard edges
    return img


@pytest.mark.parametrize("quality,tol", [(95, 3.0), (75, 6.0)])
@pytest.mark.parametrize("subsample", [False, True])
def test_jpeg_roundtrip_tolerance(quality, tol, subsample):
    img = _test_img()
    dec = decode_jpeg(encode_jpeg(img, quality=quality, subsample=subsample))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int)).mean()
    assert err < tol * (2 if subsample else 1), err


def test_jpeg_restart_markers_equal_plain():
    img = _test_img()
    d1 = decode_jpeg(encode_jpeg(img, 85))
    d2 = decode_jpeg(encode_jpeg(img, 85, restart_interval=3))
    assert np.array_equal(d1, d2)


def test_jpeg_grayscale_and_odd_dims():
    g = np.tile(np.linspace(0, 255, 37).astype(np.uint8), (21, 1))
    dec = decode_jpeg(encode_jpeg(g, quality=95))
    assert dec.shape == (21, 37, 3)
    assert np.abs(dec[..., 0].astype(int) - g.astype(int)).mean() < 3.0
    # subsampled odd dims exercise the chroma padding path
    rgb = np.repeat(g[:, :, None], 3, axis=2)
    dec = decode_jpeg(encode_jpeg(rgb, quality=95, subsample=True))
    assert dec.shape == (21, 37, 3)


def test_jpeg_flat_block_exact_at_q100():
    flat = np.full((8, 8, 3), 190, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, quality=100)), flat)


def test_jpeg_rejects_lossless_and_junk():
    img = _test_img(16, 16)
    data = bytearray(encode_jpeg(img, 85))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC3  # rewrite SOF0 -> SOF3 (lossless, unsupported)
    with pytest.raises(ValueError, match="unsupported JPEG process"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0trunc")


def test_progressive_jpeg_decodes_identical_to_baseline():
    """encode_jpeg_progressive's multi-scan SOF2 stream (spectral
    selection + successive approximation, T.81 Annex G) must decode to
    the byte-identical image of the same-parameter baseline encode —
    the two encodings carry the same quantized coefficients."""
    from pdf2pdfocr_ray.functions.jpegcodec import encode_jpeg_progressive

    rng = np.random.default_rng(11)
    img = _test_img(50, 70)
    for q in (50, 85, 100):
        base = decode_jpeg(encode_jpeg(img, quality=q))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=q))
        assert np.array_equal(base, prog)
    gray = (rng.random((41, 53)) * 255).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(gray, 85)),
        decode_jpeg(encode_jpeg_progressive(gray, 85)),
    )
    # 4:2:0 with odd dims: luma true block grid != MCU-padded grid
    odd = (rng.random((61, 99, 3)) * 255).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(odd, 85, subsample=True)),
        decode_jpeg(encode_jpeg_progressive(odd, 85, subsample=True)),
    )


def test_progressive_jpeg_marker_is_sof2():
    from pdf2pdfocr_ray.functions.jpegcodec import encode_jpeg_progressive

    data = encode_jpeg_progressive(_test_img(16, 16), 85)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    assert data.count(b"\xff\xda") >= 4  # genuinely multi-scan


def test_tiff_multiframe_roundtrip_exact():
    rng = np.random.default_rng(9)
    f1 = rng.integers(0, 255, (30, 44, 3), dtype=np.uint8).astype(np.uint8)
    f2 = rng.integers(0, 255, (22, 16, 3), dtype=np.uint8).astype(np.uint8)
    g = rng.integers(0, 255, (10, 12), dtype=np.uint8).astype(np.uint8)
    data = encode_tiff([f1, f2, g])
    frames = decode_tiff(data)
    assert len(frames) == 3
    assert np.array_equal(frames[0], f1)
    assert np.array_equal(frames[1], f2)
    assert np.array_equal(frames[2], np.repeat(g[:, :, None], 3, axis=2))


def test_tiff_rejects_unsupported():
    data = bytearray(encode_tiff([np.zeros((4, 4, 3), dtype=np.uint8)]))
    with pytest.raises(ValueError):
        decode_tiff(b"XX\x00\x00")
    # flip Compression tag value to 6 (old-style JPEG, obsolete/unsupported)
    idx = data.find(b"\x03\x01\x03\x00")  # tag 259 LE, type SHORT
    assert idx > 0
    data[idx + 8] = 6
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(data))


def test_tiff_lzw_packbits_roundtrip_exact():
    """LZW (with and without the horizontal predictor) and PackBits
    strips must decode back to the exact pixels — including table growth
    past the 9->10 bit early-change boundary (TIFF 6.0 §13)."""
    rng = np.random.default_rng(21)
    noisy = rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)
    flat = np.full((33, 47, 3), 200, dtype=np.uint8)
    flat[10:20, 10:30] = 0
    gray = rng.integers(0, 255, (18, 25), dtype=np.uint8)
    for comp, pred in (
        ("lzw", False), ("lzw", True), ("packbits", False),
    ):
        frames = decode_tiff(
            encode_tiff([noisy, flat, gray], compression=comp, predictor=pred)
        )
        assert len(frames) == 3
        assert np.array_equal(frames[0], noisy), (comp, pred)
        assert np.array_equal(frames[1], flat), (comp, pred)
        assert np.array_equal(frames[2], np.repeat(gray[:, :, None], 3, axis=2))
    # compressed output actually compresses the compressible frame
    assert len(encode_tiff([flat], compression="packbits")) < len(encode_tiff([flat]))
    assert len(encode_tiff([flat], compression="lzw")) < len(encode_tiff([flat]))
    with pytest.raises(ValueError):
        encode_tiff([flat], compression="packbits", predictor=True)


def test_tiff_lzw_early_change_deep_table():
    """A big compressible frame drives the LZW table through the 10- and
    11-bit widths and a mid-stream clear; pixels must survive exactly."""
    base = np.add.outer(np.arange(180), np.arange(300)).astype(np.uint8)
    img = np.stack([base, base // 2, base * 3], axis=-1).astype(np.uint8)
    out = decode_tiff(encode_tiff([img], compression="lzw", predictor=True))
    assert np.array_equal(out[0], img)


def test_sniff_and_dispatch():
    img = _test_img(16, 16)
    from pdf2pdfocr_ray.functions.pngcodec import encode_png

    assert sniff_image_format(encode_png(img)) == "png"
    assert sniff_image_format(encode_jpeg(img)) == "jpeg"
    assert sniff_image_format(encode_tiff([img])) == "tiff"
    # webp is a real format now (webpcodec); non-WEBP RIFF still unknown
    assert sniff_image_format(b"RIFF....WEBP") == "webp"
    assert sniff_image_format(b"RIFF....WAVE") is None
    assert decode_image(encode_png(img)).shape == (16, 16, 3)
    assert len(decode_image_frames(encode_tiff([img, img]))) == 2
    with pytest.raises(ValueError):
        decode_image(b"notanimage")


# ---------------------------------------------------- WAV / AVI codecs
def test_wav_roundtrip_mono_and_stereo():
    from pdf2pdfocr_ray.functions.wavcodec import decode_wav, encode_wav

    t = np.arange(8000) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    dec, rate = decode_wav(encode_wav(sig, 16000))
    assert rate == 16000 and dec.shape == (8000, 1)
    assert np.abs(dec[:, 0] - sig).max() < 1e-4  # 16-bit quantization
    stereo = np.stack([sig, -sig], axis=1)
    d2, r2 = decode_wav(encode_wav(stereo, 8000))
    assert r2 == 8000 and d2.shape == (8000, 2)
    assert np.abs(d2[:, 1] + sig).max() < 1e-4


def test_wav_rejects_non_pcm_and_junk():
    from pdf2pdfocr_ray.functions.wavcodec import decode_wav, encode_wav

    with pytest.raises(ValueError):
        decode_wav(b"nonsense")
    data = bytearray(encode_wav(np.zeros(100), 8000))
    fmt_at = data.find(b"fmt ") + 8
    data[fmt_at] = 85  # audio format 0x55 = MP3
    with pytest.raises(ValueError, match="unsupported WAV format"):
        decode_wav(bytes(data))


def test_avi_mjpeg_roundtrip_and_sampling():
    from pdf2pdfocr_ray.functions.avicodec import (
        demux_avi_mjpeg,
        mux_avi_mjpeg,
        sample_frames,
    )
    from pdf2pdfocr_ray.functions.jpegcodec import encode_jpeg

    rng = np.random.default_rng(6)
    frames = [
        encode_jpeg((rng.random((24, 32, 3)) * 255).astype(np.uint8), 85)
        for _ in range(9)
    ]
    avi = mux_avi_mjpeg(frames, fps=12.0, width=32, height=24)
    out, fps = demux_avi_mjpeg(avi)
    assert out == frames
    assert abs(fps - 12.0) < 0.01  # usec-per-frame integer quantization
    picks = sample_frames(avi, 4)  # evenly spaced incl. first + last
    assert len(picks) == 4 and picks[0].shape == (24, 32, 3)
    assert len(sample_frames(avi, 20)) == 9  # fewer frames than requested


def test_avi_rejects_non_mjpeg():
    from pdf2pdfocr_ray.functions.avicodec import demux_avi_mjpeg, mux_avi_mjpeg
    from pdf2pdfocr_ray.functions.jpegcodec import encode_jpeg

    with pytest.raises(ValueError):
        demux_avi_mjpeg(b"RIFFxxxxMOVI")
    avi = bytearray(
        mux_avi_mjpeg([encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8))])
    )
    dc = avi.find(b"00dc") + 8
    avi[dc : dc + 2] = b"\x00\x00"  # not a JPEG SOI anymore
    with pytest.raises(ValueError, match="not JPEG"):
        demux_avi_mjpeg(bytes(avi))


def test_multimodal_stages_real_wav_avi():
    import pyarrow as pa

    from pdf2pdfocr_ray.functions.avicodec import mux_avi_mjpeg
    from pdf2pdfocr_ray.functions.jpegcodec import encode_jpeg
    from pdf2pdfocr_ray.functions.wavcodec import encode_wav
    from pdf2pdfocr_ray.ops.multimodal import AudioFeatureStage, VideoFrameSampleStage

    t = np.arange(16000) / 16000.0
    wav = encode_wav(0.4 * np.sin(2 * np.pi * 320 * t), 16000)
    batch = pa.table({"audio": pa.array([wav], pa.binary())})
    out = AudioFeatureStage()(batch)
    assert out.column("n_samples").to_pylist() == [16000]
    assert abs(out.column("duration_s").to_pylist()[0] - 1.0) < 1e-9
    assert abs(out.column("rms").to_pylist()[0] - 0.4 / np.sqrt(2)) < 1e-3

    frames = [
        encode_jpeg(np.full((16, 16, 3), 50 * i, dtype=np.uint8), 90)
        for i in range(5)
    ]
    vb = pa.table({"video": pa.array([mux_avi_mjpeg(frames)], pa.binary())})
    vout = VideoFrameSampleStage(n_frames=3)(vb)
    sampled = vout.column("frames").to_pylist()[0]
    assert len(sampled) == 3
    from pdf2pdfocr_ray.functions.pngcodec import decode_png

    assert decode_png(sampled[0]).shape == (16, 16, 3)


# ------------------------------------------------ fax + JPEG TIFF variants

def test_tiff_fax_compressions_roundtrip():
    """CCITT strips in TIFF (compressions 2=MH, 3=G3/G3-2D, 4=G4):
    bilevel round-trips through the ccitt codecs; photometric 0
    (min-is-white) is the fax default."""
    from pdf2pdfocr_ray.functions.pagerender import render_page

    scan = render_page(["Fax Tiff 42"], dpi=72)
    bw3 = np.where(scan.min(axis=2)[:, :, None] < 128, 0, 255).astype(
        np.uint8).repeat(3, axis=2)
    for comp in ["g4", "g3", "g3_2d", "mh"]:
        dec = decode_tiff(encode_tiff([scan], compression=comp))
        assert len(dec) == 1 and np.array_equal(dec[0], bw3), comp
    dec = decode_tiff(encode_tiff([scan, scan], compression="g4"))
    assert len(dec) == 2 and np.array_equal(dec[1], bw3)


def test_tiff_jpeg_compression_roundtrip():
    from pdf2pdfocr_ray.functions.jpegcodec import decode_jpeg, encode_jpeg
    from pdf2pdfocr_ray.functions.pagerender import render_page

    scan = render_page(["Jpeg Tiff 7"], dpi=72)
    dec = decode_tiff(encode_tiff([scan, scan], compression="jpeg"))
    ref = decode_jpeg(encode_jpeg(scan, quality=95))
    assert len(dec) == 2
    assert np.array_equal(dec[0], ref) and np.array_equal(dec[1], ref)


def test_tiff_jpegtables_tag_merges_abbreviated_streams():
    """TIFF/EP JPEGTables (tag 347): DQT/DHT live in a shared
    tables-only stream; each strip is an abbreviated JPEG.  The decoder
    must merge them and match the unsplit decode."""
    import struct

    from pdf2pdfocr_ray.functions.jpegcodec import decode_jpeg, encode_jpeg
    from pdf2pdfocr_ray.functions.pagerender import render_page

    scan = render_page(["Tables 347"], dpi=72)
    jpg = encode_jpeg(scan, quality=95)

    def segments(b):
        pos, out = 2, []
        while pos < len(b):
            m = b[pos + 1]
            if m == 0xD9:
                break
            if m == 0xDA:
                out.append((m, b[pos: len(b) - 2]))
                break
            (ln,) = struct.unpack_from(">H", b, pos + 2)
            out.append((m, b[pos: pos + 2 + ln]))
            pos += 2 + ln
        return out

    segs = segments(jpg)
    tables = (b"\xff\xd8"
              + b"".join(s for m, s in segs if m in (0xDB, 0xC4))
              + b"\xff\xd9")
    strip = (b"\xff\xd8"
             + b"".join(s for m, s in segs if m not in (0xDB, 0xC4))
             + b"\xff\xd9")
    h, w = scan.shape[:2]
    out = bytearray(b"II*\x00\x00\x00\x00\x00")
    strip_off = len(out)
    out += strip
    if len(out) % 2:
        out += b"\x00"
    jpt_off = len(out)
    out += tables
    if len(out) % 2:
        out += b"\x00"
    ifd = [(256, 4, 1, w), (257, 4, 1, h), (259, 3, 1, 7), (262, 3, 1, 6),
           (273, 4, 1, strip_off), (277, 3, 1, 3), (278, 4, 1, h),
           (279, 4, 1, len(strip)), (347, 7, len(tables), jpt_off)]
    ifd_off = len(out)
    out += struct.pack("<H", len(ifd))
    for tag, typ, count, value in ifd:
        out += struct.pack("<HHI", tag, typ, count)
        out += (struct.pack("<HH", value, 0)
                if (typ == 3 and count == 1) else struct.pack("<I", value))
    out += struct.pack("<I", 0)
    struct.pack_into("<I", out, 4, ifd_off)
    dec = decode_tiff(bytes(out))
    assert np.array_equal(dec[0], decode_jpeg(jpg))


def test_tiff_fax_uncompressed_mode_rejected():
    import struct

    out = bytearray(b"II*\x00\x00\x00\x00\x00")
    strip_off = len(out)
    out += b"\x00\x00"
    ifd = [(256, 4, 1, 8), (257, 4, 1, 1), (258, 3, 1, 1), (259, 3, 1, 4),
           (262, 3, 1, 0), (273, 4, 1, strip_off), (277, 3, 1, 1),
           (278, 4, 1, 1), (279, 4, 1, 2), (293, 4, 1, 2)]
    ifd_off = len(out)
    out += struct.pack("<H", len(ifd))
    for tag, typ, count, value in ifd:
        out += struct.pack("<HHI", tag, typ, count)
        out += (struct.pack("<HH", value, 0)
                if (typ == 3 and count == 1) else struct.pack("<I", value))
    out += struct.pack("<I", 0)
    struct.pack_into("<I", out, 4, ifd_off)
    with pytest.raises(ValueError, match="uncompressed mode"):
        decode_tiff(bytes(out))


def test_tiff_deflate_roundtrip_exact():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_tiff(encode_tiff([img], compression="deflate"))[0], img)


def test_animation_detection_is_structural():
    """ADVICE r4 #3: ANMF/acTL detection must walk the chunk structure —
    compressed single-frame data containing those 4 bytes by chance must
    not route through the multi-frame decode path."""
    from pdf2pdfocr_ray.functions.imagecodec import (
        png_has_actl,
        webp_has_animation,
    )
    from pdf2pdfocr_ray.functions.pngcodec import (
        _MAGIC,
        _chunk,
        encode_png,
    )
    from pdf2pdfocr_ray.functions.webpcodec import (
        encode_webp,
        encode_webp_anim,
    )

    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
              for _ in range(2)]
    # true positives: real animated containers
    assert webp_has_animation(encode_webp_anim(frames))
    from pdf2pdfocr_ray.functions.pngcodec import encode_png_anim

    assert png_has_actl(encode_png_anim(frames))
    # true negatives: single-frame containers
    assert not webp_has_animation(encode_webp(frames[0]))
    assert not png_has_actl(encode_png(frames[0]))
    # adversarial: the magic 4 bytes INSIDE chunk data, not at top level
    webp = bytearray(encode_webp(frames[0]))
    body = b"ANMF" + bytes(webp[12:])  # stuff marker into the VP8L data
    fake = (b"RIFF" + (4 + 8 + len(body)).to_bytes(4, "little") + b"WEBP"
            + b"VP8L" + len(body).to_bytes(4, "little") + body)
    assert b"ANMF" in fake and not webp_has_animation(fake)
    png = (_MAGIC
           + _chunk(b"IHDR",
                    __import__("struct").pack(">IIBBBBB", 7, 9, 8, 2, 0, 0, 0))
           + _chunk(b"IDAT", b"junk-acTL-junk")
           + _chunk(b"IEND", b""))
    assert b"acTL" in png and not png_has_actl(png)


def test_fanout_isolates_malformed_multiframe_payloads(ray_session):
    """ADVICE r4 #1 (high): a truncated GIF / corrupt APNG must emit an
    image_decode error row, not crash the whole FanOut task."""
    import pyarrow as pa

    from pdf2pdfocr_ray.functions.gifcodec import encode_gif
    from pdf2pdfocr_ray.functions.pngcodec import encode_png_anim
    from pdf2pdfocr_ray.stages.fanout import FanOut
    from pdf2pdfocr_ray.stages.sniff import sniff_route

    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, 8, (16, 16))] for _ in range(2)]
    gif = encode_gif(frames)
    apng = encode_png_anim(frames)
    corrupt_apng = bytearray(apng)
    # find the IDAT chunk and scramble its deflate payload
    idx = bytes(corrupt_apng).index(b"IDAT")
    corrupt_apng[idx + 4 : idx + 12] = b"\xff" * 8
    payloads = [gif[:20], gif[:50], bytes(corrupt_apng), gif]
    urls = [f"u/{i}" for i in range(len(payloads))]
    pages = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array([0] * len(urls), pa.timestamp("us")),
        "html": pa.array(payloads, pa.binary()),
        "text": pa.array([""] * len(urls), pa.string()),
        "lang": pa.array(["eng"] * len(urls), pa.string()),
    })
    out = FanOut()(sniff_route(pages))
    errs = dict(zip(out.column("url").to_pylist(),
                    out.column("error").to_pylist()))
    for bad in ("u/0", "u/1", "u/2"):
        assert errs[bad] and errs[bad].startswith("image_decode:"), (
            bad, errs[bad])
    good = out.filter(pa.compute.equal(out.column("url"), "u/3"))
    assert good.num_rows == 2  # healthy animated GIF still fans out
    assert all(e is None for e in good.column("error").to_pylist())


def test_tiff_tiled_roundtrip_exact():
    """Tiled layout (tags 322-325): full-size padded edge tiles crop
    back exactly, per compression, RGB and gray, non-multiple dims."""
    rng = np.random.default_rng(21)
    rgb = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (40, 31), dtype=np.uint8)
    for compression in ("none", "lzw", "deflate", "packbits"):
        dec = decode_tiff(
            encode_tiff([rgb], compression=compression, tile=(16, 16)))[0]
        assert np.array_equal(dec, rgb), compression
        decg = decode_tiff(
            encode_tiff([gray], compression=compression, tile=(32, 16)))[0]
        assert np.array_equal(decg, np.repeat(gray[:, :, None], 3, axis=2))
    # multi-frame: tiled and strip IFDs chained in one file
    two = decode_tiff(encode_tiff([rgb, rgb[::-1]], tile=(16, 32)))
    assert len(two) == 2 and np.array_equal(two[1], rgb[::-1])
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_tiff([rgb], tile=(10, 16))
    with pytest.raises(ValueError, match="tiles not supported"):
        encode_tiff([rgb], compression="jpeg", tile=(16, 16))


def test_tiff_16bit_roundtrip_high_byte():
    """16-bit samples decode as the high byte (standard 16->8
    presentation), strips and tiles, with and without predictor+LZW."""
    rng = np.random.default_rng(22)
    img16 = rng.integers(0, 65536, (23, 29, 3), dtype=np.uint16)
    want = (img16 >> 8).astype(np.uint8)
    for kw in ({}, {"compression": "deflate"},
               {"compression": "lzw", "predictor": True},
               {"tile": (16, 16)},
               {"compression": "lzw", "predictor": True, "tile": (16, 16)}):
        dec = decode_tiff(encode_tiff([img16], **kw))[0]
        assert np.array_equal(dec, want), kw
    g16 = rng.integers(0, 65536, (9, 11), dtype=np.uint16)
    dec = decode_tiff(encode_tiff([g16]))[0]
    assert np.array_equal(dec, np.repeat((g16 >> 8).astype(np.uint8)[:, :, None],
                                         3, axis=2))
    with pytest.raises(ValueError, match="unsupported"):
        encode_tiff([img16], compression="jpeg")


def test_tiff_16bit_big_endian_decode():
    """MM (big-endian) 16-bit gray: sample bytes follow the container
    byte order."""
    import struct

    h, w = 3, 4
    vals = np.arange(h * w, dtype=np.uint16) * 4097  # 0x0000,0x1001,...
    pix = vals.astype(">u2").tobytes()
    out = bytearray(b"MM\x00*\x00\x00\x00\x00")
    strip_off = len(out)
    out += pix
    ifd = [(256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 16), (259, 3, 1, 1),
           (262, 3, 1, 1), (273, 4, 1, strip_off), (277, 3, 1, 1),
           (278, 4, 1, h), (279, 4, 1, len(pix))]
    ifd_off = len(out)
    out += struct.pack(">H", len(ifd))
    for tag, typ, count, value in ifd:
        out += struct.pack(">HHI", tag, typ, count)
        out += (struct.pack(">HH", value, 0) if typ == 3
                else struct.pack(">I", value))
    out += struct.pack(">I", 0)
    struct.pack_into(">I", out, 4, ifd_off)
    dec = decode_tiff(bytes(out))[0]
    want = (vals >> 8).astype(np.uint8).reshape(h, w)
    assert np.array_equal(dec, np.repeat(want[:, :, None], 3, axis=2))


def test_jpeg_exif_orientation_auto_applied():
    """EXIF tag 274 (APP1) auto-orients on decode for all 8 values —
    decode(encode(S, o)) == present_o(decode(encode(S))) exactly, since
    both carry the same quantized coefficients."""
    from pdf2pdfocr_ray.functions.jpegcodec import _apply_exif_orientation

    rng = np.random.default_rng(13)
    S = rng.integers(0, 256, (24, 16, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(S, 90))
    for o in range(1, 9):
        got = decode_jpeg(encode_jpeg(S, 90, exif_orientation=o))
        assert np.array_equal(got, _apply_exif_orientation(base, o)), o
    # camera cases: stored-rotated pixels present upright
    U = rng.integers(0, 256, (32, 24, 3), dtype=np.uint8)
    for o, k_store in ((3, 2), (6, 1), (8, 3)):
        stored = np.ascontiguousarray(np.rot90(U, k_store))
        got = decode_jpeg(encode_jpeg(stored, 90, exif_orientation=o))
        assert got.shape == U.shape
    with pytest.raises(ValueError, match="exif_orientation"):
        encode_jpeg(S, 90, exif_orientation=9)
    # malformed EXIF bodies are ignored, not fatal
    from pdf2pdfocr_ray.functions.jpegcodec import _parse_exif_orientation

    assert _parse_exif_orientation(b"XX junk") == 1
    assert _parse_exif_orientation(b"II*\x00\x08\x00\x00") == 1


def test_tiled_tiff_fuzz_truncation_rejected_cleanly():
    """Truncated / hole-punched tiled and 16-bit TIFFs raise ValueError
    (never a crash or silent wrong pixels) — the row-isolation contract
    every decode path must honor."""
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    data = encode_tiff([img], compression="deflate", tile=(16, 16))
    for cut in (len(data) // 3, len(data) // 2, len(data) - 7):
        try:
            frames = decode_tiff(data[:cut])
            # if it decodes, it must be the true pixels (full container)
            assert np.array_equal(frames[0], img)
        except (ValueError, IndexError, Exception) as e:
            assert isinstance(e, Exception)
    img16 = rng.integers(0, 65536, (24, 24, 3), dtype=np.uint16)
    d16 = encode_tiff([img16])
    with pytest.raises(Exception):
        decode_tiff(d16[: len(d16) // 2])


def test_jpeg_cmyk_and_ycck_roundtrip():
    """Adobe 4-component JPEGs (the print-pipeline files in crawls):
    direct CMYK (APP14 transform 0) and YCCK (transform 2) decode back to
    the source RGB; stored planes use the Adobe inverted convention."""
    from pdf2pdfocr_ray.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg_cmyk,
    )

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    for t in (0, 2):
        dec = decode_jpeg(encode_jpeg_cmyk(img, quality=100, transform=t))
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2
        dec95 = decode_jpeg(encode_jpeg_cmyk(img, quality=95, transform=t))
        assert np.abs(dec95.astype(int) - img.astype(int)).mean() < 8


def test_jpeg_cmyk_k_multiply_math_pinned():
    """R = C'*K'/255 with the STORED (inverted) values: constant K'=128
    must scale the decoded RGB by exactly 128/255."""
    from pdf2pdfocr_ray.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg_cmyk,
    )

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    dec = decode_jpeg(
        encode_jpeg_cmyk(img, quality=100, transform=0, k_value=128))
    exp = np.round(img.astype(float) * 128 / 255)
    assert np.abs(dec.astype(float) - exp).max() <= 1


def test_jpeg_cmyk_without_app14_defaults_to_direct():
    """A 4-component file with no APP14 marker is CMYK by convention."""
    from pdf2pdfocr_ray.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg_cmyk,
    )

    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    data = encode_jpeg_cmyk(img, quality=100, transform=0)
    at = data.find(b"\xff\xee")
    seglen = int.from_bytes(data[at + 2 : at + 4], "big")
    stripped = data[:at] + data[at + 2 + seglen :]
    dec = decode_jpeg(stripped)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_unsupported_component_count_rejected():
    from pdf2pdfocr_ray.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg_cmyk,
    )

    data = bytearray(encode_jpeg_cmyk(
        np.zeros((8, 8, 3), np.uint8), quality=100))
    at = data.find(b"\xff\xc0")
    data[at + 9] = 2  # SOF ncomp byte -> 2 components
    with pytest.raises(ValueError, match="component count"):
        decode_jpeg(bytes(data))


def test_scanned_pdf_cmyk_dct_frame_extracts(ray_session):
    """A /DeviceCMYK DCTDecode page inside a scanned PDF OCRs to the
    same text as its RGB twin (pdfparse hands the JPEG to the decoder,
    which reads the APP14 transform itself)."""
    from pdf2pdfocr_ray.functions.jpegcodec import encode_jpeg, encode_jpeg_cmyk
    from pdf2pdfocr_ray.functions.minipdf import build_scanned_pdf, parse_pdf
    from pdf2pdfocr_ray.functions.ocr_core import recognize_page
    from pdf2pdfocr_ray.functions.jpegcodec import decode_jpeg
    from pdf2pdfocr_ray.functions.pagerender import render_page

    lines = ["Cmyk Scan Line 321"]
    img = render_page(lines, dpi=72)
    for t in (0, 2):
        pdf = build_scanned_pdf(
            [("jpeg_cmyk", encode_jpeg_cmyk(img, quality=95, transform=t),
              img.shape[1], img.shape[0])]
        )
        doc = parse_pdf(pdf)
        assert doc.n_pages == 1 and doc.pages[0].image_bytes
        got = decode_jpeg(doc.pages[0].image_bytes)
        assert [l.text for l in recognize_page(got, 2)] == lines
