"""Format-dispatching image decode over the engine's pure-numpy codecs.

One entry point for every stage that consumes an opaque image ``binary``
column (OCR, multimodal decode/resize/re-encode): magic-byte dispatch to
the PNG (pngcodec), JPEG (jpegcodec), TIFF (tiffcodec), WebP (webpcodec,
lossless VP8L and lossy VP8), GIF (gifcodec), BMP (bmpcodec) or PNM
(pnmcodec) decoder.  Mirrors the reference's reliance on
`file -b --mime-type` + ImageMagick's own dispatch
(/root/reference/pdf2pdfocr.py:1229-1236, 1133-1141) without external
binaries.
"""

from __future__ import annotations

import numpy as np

from .bmpcodec import decode_bmp
from .gifcodec import GIF_MAGICS, decode_gif
from .icocodec import decode_ico, sniff_ico
from .jpegcodec import decode_jpeg
from .pngcodec import decode_png
from .pnmcodec import PNM_MAGIC_RE, decode_pnm
from .tiffcodec import decode_tiff
from .webpcodec import decode_webp

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
JPEG_MAGIC = b"\xff\xd8\xff"
TIFF_MAGICS = (b"II*\x00", b"MM\x00*")
WEBP_RIFF = b"RIFF"
# Engine-internal uncompressed frame: "RAWB" + h(u32le) + w(u32le) + RGB
# bytes.  Used for the FUSED fan-out -> OCR handoff where the payload
# never leaves the actor: PNG deflate there cost ~0.8 ms/page for nothing
# (shuffles still carry text only; external inputs keep their real codec).
RAW_MAGIC = b"RAWB"


def encode_raw(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    return RAW_MAGIC + h.to_bytes(4, "little") + w.to_bytes(4, "little") + img.tobytes()


def sniff_image_format(payload: bytes) -> str | None:
    if payload.startswith(PNG_MAGIC):
        return "png"
    if payload.startswith(JPEG_MAGIC):
        return "jpeg"
    if payload.startswith(TIFF_MAGICS[0]) or payload.startswith(TIFF_MAGICS[1]):
        return "tiff"
    if payload.startswith(RAW_MAGIC):
        return "raw"
    if payload.startswith(WEBP_RIFF) and payload[8:12] == b"WEBP":
        return "webp"
    if payload[:6] in GIF_MAGICS:
        return "gif"
    # BMP: "BM" + 4-byte size + the two reserved words, zero per spec
    if payload[:2] == b"BM" and payload[6:10] == b"\x00\x00\x00\x00":
        return "bmp"
    if PNM_MAGIC_RE.match(payload):
        return "pnm"
    if sniff_ico(payload):
        return "ico"
    return None


def webp_has_animation(payload: bytes) -> bool:
    """True iff the RIFF container holds a TOP-LEVEL ANMF chunk.

    A raw ``b"ANMF" in payload`` substring scan false-positives on
    compressed VP8/VP8L data that happens to contain those four bytes;
    walking the chunk structure cannot.
    """
    if payload[:4] != WEBP_RIFF or payload[8:12] != b"WEBP":
        return False
    pos, n = 12, len(payload)
    while pos + 8 <= n:
        fourcc = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if fourcc == b"ANMF":
            return True
        pos += 8 + size + (size & 1)  # chunks are padded to even size
    return False


def png_has_actl(payload: bytes) -> bool:
    """True iff a structural ``acTL`` chunk appears before ``IDAT``
    (the APNG spec's placement rule) — not a raw substring match, which
    can hit 4 bytes of compressed IDAT data by chance."""
    if payload[:8] != PNG_MAGIC:
        return False
    pos, n = 8, len(payload)
    while pos + 8 <= n:
        length = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        if ctype == b"acTL":
            return True
        if ctype in (b"IDAT", b"IEND"):
            return False
        pos += 12 + length  # len + type + data + CRC
    return False


def decode_image(payload: bytes) -> np.ndarray:
    """Image bytes -> (H,W,3) uint8 RGB.  Multi-frame TIFF -> first frame
    (use :func:`decode_image_frames` to get all frames)."""
    fmt = sniff_image_format(payload)
    if fmt == "png":
        return decode_png(payload)
    if fmt == "jpeg":
        return decode_jpeg(payload)
    if fmt == "tiff":
        return decode_tiff(payload)[0]
    if fmt == "webp":
        # lossless (VP8L) and lossy VP8 keyframes both decode for real
        return decode_webp(payload)
    if fmt == "gif":
        return decode_gif(payload)[0]
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "pnm":
        return decode_pnm(payload)
    if fmt == "ico":
        return decode_ico(payload)
    if fmt == "raw":
        h = int.from_bytes(payload[4:8], "little")
        w = int.from_bytes(payload[8:12], "little")
        if len(payload) < 12 + h * w * 3:
            raise ValueError("truncated RAWB frame")
        return np.frombuffer(payload, np.uint8, h * w * 3, offset=12).reshape(h, w, 3)
    raise ValueError(
        "unknown image format (not PNG/JPEG/TIFF/WebP/GIF/BMP/PNM/ICO/RAWB)")


def decode_image_frames(payload: bytes) -> list[np.ndarray]:
    """Image bytes -> list of (H,W,3) uint8 frames (len > 1 only for
    multi-frame TIFF, animated GIF/WebP/APNG — the S5 fan-out cases)."""
    fmt = sniff_image_format(payload)
    if fmt == "tiff":
        return decode_tiff(payload)
    if fmt == "gif":
        return decode_gif(payload)
    if fmt == "png":
        from .pngcodec import decode_png_frames

        return decode_png_frames(payload)
    if fmt == "webp":
        from .webpcodec import decode_webp_frames

        return decode_webp_frames(payload)
    return [decode_image(payload)]
