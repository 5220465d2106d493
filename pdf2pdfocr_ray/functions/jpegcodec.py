"""JFIF/JPEG codec, pure numpy — no native image libraries.

The reference's whole page-raster world is JPEG (`pdftoppm -jpeg`,
/root/reference/pdf2pdfocr.py:70; jpg chosen to bound temp size at
477-478), so a Ray engine whose multimodal stages only understood PNG kept
its largest stub here.  This module implements ITU-T T.81 Huffman DCT:

* decoder — SOI/APP*/COM/DQT/SOF0/SOF1/SOF2/DHT/DRI/SOS/RSTn/EOI parsing,
  canonical Huffman entropy decode, dequantize + inverse zigzag + 8x8 IDCT
  (orthonormal DCT matrix, vectorized over all blocks), chroma upsampling
  for sampling factors 1-2 (4:4:4, 4:2:2, 4:2:0), YCbCr→RGB.  Both the
  baseline sequential process and the PROGRESSIVE process (SOF2: multiple
  scans with spectral selection and successive approximation, T.81 Annex
  G.2 — the web's dominant large-photo encoding).  Hierarchical and
  arithmetic-coded streams raise ``ValueError``.
* encoder — quality-scaled Annex-K quantization tables, standard Annex-K
  Huffman tables, 4:4:4 or 4:2:0 subsampling, grayscale or RGB input;
  baseline (`encode_jpeg`) or progressive (`encode_jpeg_progressive`,
  a libjpeg-style scan script exercising both spectral selection and
  successive-approximation refinement).

Everything is deterministic; the DCT is exact float64 matrix math, so
encode→decode round-trips are pinned by value in tests, and a progressive
encode decodes to the byte-identical image of its baseline twin.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

ZIGZAG = np.array(
    [
        0,  1,  8, 16,  9,  2,  3, 10,
       17, 24, 32, 25, 18, 11,  4,  5,
       12, 19, 26, 33, 40, 48, 41, 34,
       27, 20, 13,  6,  7, 14, 21, 28,
       35, 42, 49, 56, 57, 50, 43, 36,
       29, 22, 15, 23, 30, 37, 44, 51,
       58, 59, 52, 45, 38, 31, 39, 46,
       53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K quantization tables (T.81 K.1/K.2)
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)

# Annex K Huffman tables: (bits[1..16], values)
HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8x8 DCT-II matrix
_C = np.zeros((8, 8))
for _i in range(8):
    for _j in range(8):
        _C[_i, _j] = np.cos((2 * _j + 1) * _i * np.pi / 16) * (
            np.sqrt(1 / 8) if _i == 0 else np.sqrt(2 / 8)
        )


def _dct2(blocks: np.ndarray) -> np.ndarray:
    """(N,8,8) spatial -> (N,8,8) DCT coefficients."""
    return np.einsum("ij,njk,lk->nil", _C, blocks, _C, optimize=True)


def _idct2(coefs: np.ndarray) -> np.ndarray:
    return np.einsum("ji,njk,kl->nil", _C, coefs, _C, optimize=True)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(100, max(1, int(quality)))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (QT_LUMA, QT_CHROMA):
        t = np.floor((base * scale + 50) / 100)
        out.append(np.clip(t, 1, 255))
    return out[0], out[1]


# ------------------------------------------------------------------ encoder


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad to byte boundary


def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (size, appended bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, v if v > 0 else v + (1 << size) - 1


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _plane_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad plane to multiples of 8 (edge replicate) and cut into blocks."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    if (ph, pw) != (h, w):
        plane = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = (
        plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    return blocks, ph // 8, pw // 8


def _prepare_components(
    img: np.ndarray, quality: int, subsample: bool
) -> tuple[bool, int, int, list, list, list, np.ndarray, np.ndarray]:
    """Color-convert, subsample, DCT and quantize: shared encoder front
    half.  Returns (gray, h, w, samp, comp_zz, comp_grid, qt_l, qt_c)
    where comp_zz[ci] is the (n_blocks, 64) int64 zigzag-order quantized
    coefficients of component ci and comp_grid[ci] its (bh, bw)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qt_l, qt_c = _quality_tables(quality)

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(img)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    comp_zz: list[np.ndarray] = []
    comp_grid: list[tuple[int, int]] = []
    for ci, plane in enumerate(planes):
        blocks, bh, bw = _plane_blocks(plane)
        qt = qt_l if ci == 0 else qt_c
        coefs = _dct2(blocks - 128.0)
        q = np.round(coefs.reshape(-1, 64) / qt)  # qt is raster-order 64-vec
        zz = q[:, ZIGZAG].astype(np.int64)
        comp_zz.append(zz)
        comp_grid.append((bh, bw))
    return gray, h, w, samp, comp_zz, comp_grid, qt_l, qt_c


def _encode_headers(
    gray: bool,
    h: int,
    w: int,
    samp: list,
    qt_l: np.ndarray,
    qt_c: np.ndarray,
    sof_marker: int,
    restart_interval: int = 0,
) -> bytearray:
    """SOI..DHT (+DRI) header bytes shared by both encoders."""
    out = bytearray()
    out += b"\xFF\xD8"  # SOI
    out += (
        b"\xFF\xE0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    # DQT
    for tid, qt in ([(0, qt_l)] if gray else [(0, qt_l), (1, qt_c)]):
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(v) for v in qt.reshape(-1)[ZIGZAG])
    ncomp = 1 if gray else 3
    out += bytes([0xFF, sof_marker]) + struct.pack(
        ">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp
    )
    for ci in range(ncomp):
        hs, vs = samp[ci]
        out += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    # DHT
    tables = [(0x00, HT_DC_LUMA), (0x10, HT_AC_LUMA)]
    if not gray:
        tables += [(0x01, HT_DC_CHROMA), (0x11, HT_AC_CHROMA)]
    for tclass_id, (bits, values) in tables:
        out += b"\xFF\xC4" + struct.pack(">H", 19 + len(values)) + bytes([tclass_id])
        out += bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    return out


def _exif_app1(orientation: int) -> bytes:
    """Minimal EXIF APP1 segment: little-endian TIFF header + a 1-entry
    IFD0 holding tag 274 (Orientation)."""
    tiff = (b"II*\x00" + struct.pack("<I", 8)
            + struct.pack("<H", 1)
            + struct.pack("<HHIHH", 274, 3, 1, orientation, 0)
            + struct.pack("<I", 0))
    body = b"Exif\x00\x00" + tiff
    return b"\xFF\xE1" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
    exif_orientation: int = 1,
) -> bytes:
    """Encode (H,W,3) RGB or (H,W) grayscale uint8 -> baseline JFIF bytes.

    ``subsample=True`` writes 4:2:0 chroma; otherwise 4:4:4.
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many MCUs
    (what a robust producer writes so decoders can resync after corruption).
    ``exif_orientation`` != 1 writes an EXIF APP1 tag-274 segment — the
    camera convention where the stored pixels need the given transform to
    display upright (the decoder auto-orients, like browsers).
    """
    gray, h, w, samp, comp_zz, comp_grid, qt_l, qt_c = _prepare_components(
        img, quality, subsample
    )
    planes = comp_zz  # one entry per component
    out = _encode_headers(gray, h, w, samp, qt_l, qt_c, 0xC0, restart_interval)
    if exif_orientation != 1:
        if not 1 <= exif_orientation <= 8:
            raise ValueError("exif_orientation must be 1..8")
        out = out[:2] + _exif_app1(exif_orientation) + out[2:]
    # SOS
    ncomp = 1 if gray else 3
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3F\x00"

    dc_l = _build_codes(*HT_DC_LUMA)
    ac_l = _build_codes(*HT_AC_LUMA)
    dc_c = _build_codes(*HT_DC_CHROMA)
    ac_c = _build_codes(*HT_AC_CHROMA)

    writer = _BitWriter()
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcu_rows = -(-h // (8 * vmax))
    mcu_cols = -(-w // (8 * hmax))
    prev_dc = [0] * len(planes)
    mcu_count = 0
    rst = 0
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()
                writer.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                prev_dc = [0] * len(planes)
            mcu_count += 1
            for ci in range(len(planes)):
                hs, vs = samp[ci]
                bh, bw = comp_grid[ci]
                dc_codes = dc_l if ci == 0 else dc_c
                ac_codes = ac_l if ci == 0 else ac_c
                for by in range(vs):
                    for bx in range(hs):
                        row_i = min(my * vs + by, bh - 1)
                        col_i = min(mx * hs + bx, bw - 1)
                        row = comp_zz[ci][row_i * bw + col_i]
                        dc = int(row[0])
                        size, bits_v = _magnitude(dc - prev_dc[ci])
                        prev_dc[ci] = dc
                        c, ln = dc_codes[size]
                        writer.write(c, ln)
                        writer.write(bits_v, size)
                        nz = np.flatnonzero(row[1:])
                        pos = 0
                        for idx in nz:
                            run = int(idx) - pos
                            while run >= 16:
                                c, ln = ac_codes[0xF0]
                                writer.write(c, ln)
                                run -= 16
                            v = int(row[1 + idx])
                            size, bits_v = _magnitude(v)
                            c, ln = ac_codes[(run << 4) | size]
                            writer.write(c, ln)
                            writer.write(bits_v, size)
                            pos = int(idx) + 1
                        if pos < 63:
                            c, ln = ac_codes[0x00]
                            writer.write(c, ln)
    writer.flush()
    out += writer.buf
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


def encode_jpeg_cmyk(
    img: np.ndarray, quality: int = 85, transform: int = 0,
    k_value: int = 255,
) -> bytes:
    """Encode (H,W,3) RGB -> 4-component Adobe baseline JPEG fixture:
    ``transform=0`` direct CMYK, ``transform=2`` YCCK (both with the APP14
    Adobe marker real producers write).  Stored planes use the Adobe
    INVERTED convention with a constant K'=255 (no black), so the decoder's
    R = C'*K'/255 combine reproduces the input RGB exactly at quality 100.
    Follows libjpeg's table assignment: CMYK puts every component on the
    luma tables; YCCK puts Cb/Cr on the chroma tables.  ``k_value``
    writes a different constant stored K' (decoded RGB scales by
    K'/255 — lets tests pin the four-component combine math)."""
    img = np.asarray(img)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("CMYK encoder needs (H,W,3) RGB input")
    h, w = img.shape[:2]
    qt_l, qt_c = _quality_tables(quality)
    k_plane = np.full((h, w), float(k_value))
    if transform == 2:
        ycc = _rgb_to_ycbcr(img)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2], k_plane]
        tsel = [0, 1, 1, 0]  # luma / chroma / chroma / luma
    elif transform == 0:
        planes = [
            img[..., 0].astype(np.float64),
            img[..., 1].astype(np.float64),
            img[..., 2].astype(np.float64),
            k_plane,
        ]
        tsel = [0, 0, 0, 0]
    else:
        raise ValueError("transform must be 0 (CMYK) or 2 (YCCK)")

    comp_zz, grid = [], None
    for ci, plane in enumerate(planes):
        blocks, bh, bw = _plane_blocks(plane)
        qt = qt_l if tsel[ci] == 0 else qt_c
        q = np.round(_dct2(blocks - 128.0).reshape(-1, 64) / qt)
        comp_zz.append(q[:, ZIGZAG].astype(np.int64))
        grid = (bh, bw)
    bh, bw = grid

    out = bytearray(b"\xFF\xD8")
    out += (
        b"\xFF\xEE" + struct.pack(">H", 14) + b"Adobe"
        + b"\x00\x64\x00\x00\x00\x00" + bytes([transform])
    )
    qtabs = [(0, qt_l)] + ([(1, qt_c)] if 1 in tsel else [])
    for tid, qt in qtabs:
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(v) for v in qt.reshape(-1)[ZIGZAG])
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * 4, 8, h, w, 4)
    for ci in range(4):
        out += bytes([ci + 1, 0x11, tsel[ci]])
    tables = [(0x00, HT_DC_LUMA), (0x10, HT_AC_LUMA)]
    if 1 in tsel:
        tables += [(0x01, HT_DC_CHROMA), (0x11, HT_AC_CHROMA)]
    for tclass_id, (bits, values) in tables:
        out += b"\xFF\xC4" + struct.pack(">H", 19 + len(values))
        out += bytes([tclass_id]) + bytes(bits) + bytes(values)
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * 4, 4)
    for ci in range(4):
        out += bytes([ci + 1, 0x00 if tsel[ci] == 0 else 0x11])
    out += b"\x00\x3F\x00"

    dc_l, ac_l = _build_codes(*HT_DC_LUMA), _build_codes(*HT_AC_LUMA)
    dc_c, ac_c = _build_codes(*HT_DC_CHROMA), _build_codes(*HT_AC_CHROMA)
    writer = _BitWriter()
    prev_dc = [0, 0, 0, 0]
    for bi in range(bh * bw):  # 4:4:4 -> MCU = one block per component
        for ci in range(4):
            dc_codes = dc_l if tsel[ci] == 0 else dc_c
            ac_codes = ac_l if tsel[ci] == 0 else ac_c
            row = comp_zz[ci][bi]
            dc = int(row[0])
            size, bits_v = _magnitude(dc - prev_dc[ci])
            prev_dc[ci] = dc
            c, ln = dc_codes[size]
            writer.write(c, ln)
            writer.write(bits_v, size)
            nz = np.flatnonzero(row[1:])
            pos = 0
            for idx in nz:
                run = int(idx) - pos
                while run >= 16:
                    c, ln = ac_codes[0xF0]
                    writer.write(c, ln)
                    run -= 16
                v = int(row[1 + idx])
                size, bits_v = _magnitude(v)
                c, ln = ac_codes[(run << 4) | size]
                writer.write(c, ln)
                writer.write(bits_v, size)
                pos = int(idx) + 1
            if pos < 63:
                c, ln = ac_codes[0x00]
                writer.write(c, ln)
    writer.flush()
    out += writer.buf + b"\xFF\xD9"
    return bytes(out)


# ------------------------------------------------------- progressive encoder


def _sos_header(scomps: list[tuple[int, int, int]], ss: int, se: int, ah: int, al: int) -> bytes:
    out = b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * len(scomps), len(scomps))
    for cid, tdc, tac in scomps:
        out += bytes([cid, (tdc << 4) | tac])
    return out + bytes([ss, se, (ah << 4) | al])


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 85, subsample: bool = False
) -> bytes:
    """Encode (H,W,3) RGB or (H,W) grayscale uint8 -> PROGRESSIVE (SOF2)
    JFIF bytes (T.81 Annex G), libjpeg-style scan script: an interleaved
    first DC scan at Al=1, per-component spectral-selection AC first scans
    at Al>0, then successive-approximation refinement scans down to Al=0.
    EOB runs are kept per-block (EOBRUN<=1) so the standard Annex-K
    Huffman tables (which lack EOBn>0 symbols) stay valid.  Decodes to the
    byte-identical image of the same-parameter baseline encode."""
    gray, h, w, samp, comp_zz, comp_grid, qt_l, qt_c = _prepare_components(
        img, quality, subsample
    )
    out = _encode_headers(gray, h, w, samp, qt_l, qt_c, 0xC2)
    ncomp = 1 if gray else 3
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcu_rows = -(-h // (8 * vmax))
    mcu_cols = -(-w // (8 * hmax))
    dc_codes = [_build_codes(*(HT_DC_LUMA if ci == 0 else HT_DC_CHROMA)) for ci in range(ncomp)]
    ac_codes = [_build_codes(*(HT_AC_LUMA if ci == 0 else HT_AC_CHROMA)) for ci in range(ncomp)]

    def dc_scan(al: int, ah: int) -> bytes:
        wtr = _BitWriter()
        prev_dc = [0] * ncomp
        for my in range(mcu_rows):
            for mx in range(mcu_cols):
                for ci in range(ncomp):
                    hs, vs = samp[ci]
                    bh, bw = comp_grid[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            row_i = min(my * vs + by, bh - 1)
                            col_i = min(mx * hs + bx, bw - 1)
                            dc = int(comp_zz[ci][row_i * bw + col_i, 0])
                            if ah == 0:  # first scan: shifted diff
                                v = dc >> al  # arithmetic shift (T.81 G.1.2.1)
                                size, bits_v = _magnitude(v - prev_dc[ci])
                                prev_dc[ci] = v
                                c, ln = dc_codes[ci][size]
                                wtr.write(c, ln)
                                wtr.write(bits_v, size)
                            else:  # refinement: one raw bit per block
                                wtr.write((dc >> al) & 1, 1)
        wtr.flush()
        return bytes(wtr.buf)

    def ac_first_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        wtr = _BitWriter()
        codes = ac_codes[ci]
        bh, bw = comp_grid[ci]
        for bi in range(bh * bw):
            row = comp_zz[ci][bi]
            r = 0
            for k in range(ss, se + 1):
                v = int(row[k])
                t = abs(v) >> al
                if t == 0:
                    r += 1
                    continue
                while r > 15:
                    c, ln = codes[0xF0]
                    wtr.write(c, ln)
                    r -= 16
                size = t.bit_length()
                tv = t if v > 0 else -t
                bits_v = tv if tv > 0 else tv + (1 << size) - 1
                c, ln = codes[(r << 4) | size]
                wtr.write(c, ln)
                wtr.write(bits_v, size)
                r = 0
            if r > 0:
                c, ln = codes[0x00]  # per-block EOB (EOBRUN = 1)
                wtr.write(c, ln)
        wtr.flush()
        return bytes(wtr.buf)

    def ac_refine_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        # T.81 G.1.2.3 / libjpeg encode_mcu_AC_refine: newly-nonzero coefs
        # get (run, 1) symbols + sign; already-sent coefs ride as buffered
        # correction bits flushed after the next emitted symbol.
        wtr = _BitWriter()
        codes = ac_codes[ci]
        bh, bw = comp_grid[ci]
        for bi in range(bh * bw):
            row = comp_zz[ci][bi]
            # last newly-nonzero index: ZRLs after it fold into the EOB
            eob = ss - 1
            for k in range(ss, se + 1):
                if abs(int(row[k])) >> al == 1:
                    eob = k
            r = 0
            br: list[int] = []
            for k in range(ss, se + 1):
                v = int(row[k])
                t = abs(v) >> al
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob:
                    c, ln = codes[0xF0]
                    wtr.write(c, ln)
                    r -= 16
                    for b in br:
                        wtr.write(b, 1)
                    br = []
                if t > 1:  # history coef: buffer its correction bit
                    br.append(t & 1)
                    continue
                c, ln = codes[(r << 4) | 1]
                wtr.write(c, ln)
                wtr.write(1 if v > 0 else 0, 1)
                for b in br:
                    wtr.write(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                c, ln = codes[0x00]  # EOB; decoder refines the rest
                wtr.write(c, ln)
                for b in br:
                    wtr.write(b, 1)
        wtr.flush()
        return bytes(wtr.buf)

    all_comps = [(ci + 1, 0 if ci == 0 else 1, 0 if ci == 0 else 1) for ci in range(ncomp)]
    # scan script: DC@Al=1 -> AC first scans -> AC/DC refinements to Al=0
    out += _sos_header(all_comps, 0, 0, 0, 1) + dc_scan(1, 0)
    out += _sos_header([all_comps[0]], 1, 5, 0, 2) + ac_first_scan(0, 1, 5, 2)
    for ci in range(1, ncomp):
        out += _sos_header([all_comps[ci]], 1, 63, 0, 1) + ac_first_scan(ci, 1, 63, 1)
    out += _sos_header([all_comps[0]], 6, 63, 0, 2) + ac_first_scan(0, 6, 63, 2)
    out += _sos_header([all_comps[0]], 1, 63, 2, 1) + ac_refine_scan(0, 1, 63, 1)
    out += _sos_header(all_comps, 0, 0, 1, 0) + dc_scan(0, 1)
    out += _sos_header([all_comps[0]], 1, 63, 1, 0) + ac_refine_scan(0, 1, 63, 0)
    for ci in range(1, ncomp):
        out += _sos_header([all_comps[ci]], 1, 63, 1, 0) + ac_refine_scan(ci, 1, 63, 0)
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# ------------------------------------------------------------------ decoder


class _HuffTable:
    __slots__ = ("mincode", "maxcode", "valptr", "values")

    def __init__(self, bits: list[int], values: list[int]):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.values = values
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    def __init__(self, bits: np.ndarray):
        self.bits = bits
        self.pos = 0

    def read_bit(self) -> int:
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        chunk = self.bits[self.pos : self.pos + n]
        self.pos += n
        v = 0
        for b in chunk:
            v = (v << 1) | int(b)
        return v

    def align_to(self, byte_pos: int) -> None:
        self.pos = byte_pos * 8


def _decode_huff(reader: _BitReader, table: _HuffTable) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        if table.maxcode[length] >= 0 and code <= table.maxcode[length]:
            if code >= table.mincode[length]:
                return table.values[table.valptr[length] + code - table.mincode[length]]
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _entropy_segment(data: bytes, pos: int) -> tuple[bytes, list[int], int]:
    """One scan's entropy-coded bytes from ``pos``: strips 0xFF00
    stuffing, records restart-marker byte boundaries, stops at the next
    real marker (returned ``pos`` points at its 0xFF)."""
    n = len(data)
    ecs = bytearray()
    restarts: list[int] = []
    while pos < n:
        b = data[pos]
        if b == 0xFF:
            m = data[pos + 1] if pos + 1 < n else 0xD9
            if m == 0x00:
                ecs.append(0xFF)
                pos += 2
            elif 0xD0 <= m <= 0xD7:
                restarts.append(len(ecs))
                pos += 2
            else:
                break
        else:
            ecs.append(b)
            pos += 1
    return bytes(ecs), restarts, pos


def _decode_scan(
    ecs: bytes,
    restarts: list[int],
    scan: list[tuple[int, int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
    geom: dict,
    grids: dict[int, np.ndarray],
    htables: dict[tuple[int, int], _HuffTable],
    dri: int,
    progressive: bool,
) -> None:
    """Decode one scan's entropy data into the coefficient ``grids``.

    Handles all four progressive scan kinds (T.81 G.2: DC first / DC
    refine / AC first / AC refine) plus the baseline full-band scan, in
    interleaved (MCU) order for multi-component scans and component
    block-raster order for single-component scans."""
    reader = _BitReader(np.unpackbits(np.frombuffer(ecs, dtype=np.uint8)))
    comp_info = geom["comps"]  # cid -> (hs, vs, qid, bw_pad, bw_true, bh_true)
    prev_dc = {cid: 0 for cid, _, _ in scan}
    state = {"eobrun": 0, "unit": 0, "ri": 0}

    def maybe_restart() -> None:
        if dri and state["unit"] and state["unit"] % dri == 0:
            if state["ri"] < len(restarts):
                reader.align_to(restarts[state["ri"]])
                state["ri"] += 1
            for cid in prev_dc:
                prev_dc[cid] = 0
            state["eobrun"] = 0

    def full_block(row: np.ndarray, cid: int, dc_t: _HuffTable, ac_t: _HuffTable) -> None:
        size = _decode_huff(reader, dc_t)
        diff = _extend(reader.read(size), size)
        prev_dc[cid] += diff
        row[0] = prev_dc[cid]
        k = 1
        while k < 64:
            sym = _decode_huff(reader, ac_t)
            if sym == 0x00:  # EOB
                break
            run, size = sym >> 4, sym & 0xF
            if size == 0:
                if run == 15:  # ZRL
                    k += 16
                    continue
                break
            k += run
            if k > 63:
                raise ValueError("AC coefficient overflow")
            row[k] = _extend(reader.read(size), size)
            k += 1

    def dc_first(row: np.ndarray, cid: int, dc_t: _HuffTable) -> None:
        size = _decode_huff(reader, dc_t)
        diff = _extend(reader.read(size), size)
        prev_dc[cid] += diff
        row[0] = prev_dc[cid] << al

    def dc_refine(row: np.ndarray) -> None:
        if reader.read_bit():
            row[0] = int(row[0]) | (1 << al)

    def ac_first(row: np.ndarray, ac_t: _HuffTable) -> None:
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            sym = _decode_huff(reader, ac_t)
            r, s = sym >> 4, sym & 0xF
            if s:
                k += r
                if k > se:
                    raise ValueError("AC coefficient overflow")
                row[k] = _extend(reader.read(s), s) << al
                k += 1
            elif r < 15:  # EOBn: run of (1<<r)+bits all-done blocks
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += reader.read(r)
                return
            else:  # ZRL
                k += 16

    def ac_refine(row: np.ndarray, ac_t: _HuffTable) -> None:
        # T.81 G.2 / libjpeg decode_mcu_AC_refine: each symbol's run
        # skips zero-HISTORY positions, reading a correction bit for
        # every already-nonzero coefficient passed on the way.
        p1, m1 = 1 << al, -(1 << al)
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                sym = _decode_huff(reader, ac_t)
                r, s = sym >> 4, sym & 0xF
                newval = 0
                if s == 0:
                    if r < 15:
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += reader.read(r)
                        break
                    # ZRL: skip 16 zero-history positions
                elif s == 1:
                    newval = p1 if reader.read_bit() else m1
                else:
                    raise ValueError("invalid AC refinement symbol")
                while k <= se:
                    c = int(row[k])
                    if c != 0:
                        if reader.read_bit() and (c & p1) == 0:
                            row[k] = c + (p1 if c >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s and k <= se:
                    row[k] = newval
                k += 1
        if state["eobrun"] > 0:
            while k <= se:  # refine the rest of the band
                c = int(row[k])
                if c != 0:
                    if reader.read_bit() and (c & p1) == 0:
                        row[k] = c + (p1 if c >= 0 else m1)
                k += 1
            state["eobrun"] -= 1

    def do_block(row: np.ndarray, cid: int, tdc: int, tac: int) -> None:
        if not progressive:
            full_block(row, cid, htables[(0, tdc)], htables[(1, tac)])
        elif ss == 0:
            if ah == 0:
                dc_first(row, cid, htables[(0, tdc)])
            else:
                dc_refine(row)
        elif ah == 0:
            ac_first(row, htables[(1, tac)])
        else:
            ac_refine(row, htables[(1, tac)])

    if progressive and ss > 0 and len(scan) != 1:
        raise ValueError("progressive AC scan must be non-interleaved")
    if progressive and ss == 0 and se != 0:
        raise ValueError("progressive DC scan must have Se=0")

    if len(scan) == 1:  # non-interleaved: component block-raster order
        cid, tdc, tac = scan[0]
        _, _, _, bw_pad, bw_true, bh_true = comp_info[cid]
        grid = grids[cid]
        for by in range(bh_true):
            for bx in range(bw_true):
                maybe_restart()
                do_block(grid[by * bw_pad + bx], cid, tdc, tac)
                state["unit"] += 1
    else:  # interleaved MCU order
        for my in range(geom["mcu_rows"]):
            for mx in range(geom["mcu_cols"]):
                maybe_restart()
                for cid, tdc, tac in scan:
                    hs, vs, _, bw_pad, _, _ = comp_info[cid]
                    grid = grids[cid]
                    for by in range(vs):
                        for bx in range(hs):
                            row = grid[(my * vs + by) * bw_pad + (mx * hs + bx)]
                            do_block(row, cid, tdc, tac)
                state["unit"] += 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline or progressive JFIF bytes -> (H,W,3) uint8 RGB
    (grayscale replicated)."""
    if not data.startswith(b"\xFF\xD8"):
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    frame = None  # (h, w, comps) ; comps = [(cid, hs, vs, qid)]
    progressive = False
    dri = 0
    exif_orientation = 1
    adobe_transform = None  # APP14: 0=RGB/CMYK direct, 1=YCbCr, 2=YCCK
    geom: dict = {}
    grids: dict[int, np.ndarray] = {}
    n_scans = 0

    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    vals = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.float64)
                    p += 128
                else:
                    vals = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.float64)
                    p += 64
                qtables[tq] = vals[UNZIGZAG].reshape(8, 8)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            _prec, fh, fw, ncomp = struct.unpack(">BHHB", seg[:6])
            if ncomp not in (1, 3, 4):
                raise ValueError(
                    f"unsupported JPEG component count {ncomp} "
                    "(grayscale, YCbCr/RGB, or CMYK/YCCK only)"
                )
            from .limits import guard_dims

            # grids allocate int32 per 4:2:0-padded block — 16x the
            # pixel count in bytes, so guard the padded geometry
            guard_dims(fw + 16, fh + 16, "JPEG")
            comps = []
            for ci in range(ncomp):
                cid, hv, qid = seg[6 + ci * 3 : 9 + ci * 3]
                comps.append((cid, hv >> 4, hv & 0xF, qid))
            frame = (fh, fw, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcu_cols = -(-fw // (8 * hmax))
            mcu_rows = -(-fh // (8 * vmax))
            geom = {"mcu_rows": mcu_rows, "mcu_cols": mcu_cols, "comps": {}}
            for cid, hs, vs, qid in comps:
                bw_pad, bh_pad = mcu_cols * hs, mcu_rows * vs
                comp_w = -(-fw * hs // hmax)  # ceil(fw*hs/hmax)
                comp_h = -(-fh * vs // vmax)
                bw_true = -(-comp_w // 8)
                bh_true = -(-comp_h // 8)
                geom["comps"][cid] = (hs, vs, qid, bw_pad, bw_true, bh_true)
                grids[cid] = np.zeros((bh_pad * bw_pad, 64), dtype=np.int32)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (SOF{marker - 0xC0}): only "
                "baseline sequential and progressive DCT are implemented"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                values = list(seg[p + 17 : p + 17 + nv])
                htables[(tc, th)] = _HuffTable(bits, values)
                p += 17 + nv
        elif marker == 0xE1 and seg[:6] == b"Exif\x00\x00":  # APP1 EXIF
            exif_orientation = _parse_exif_orientation(seg[6:])
        elif marker == 0xEE and seg[:5] == b"Adobe" and len(seg) >= 12:
            # APP14 Adobe: version(2) flags0(2) flags1(2) transform(1)
            adobe_transform = seg[11]
        elif marker == 0xDD:  # DRI
            dri = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("truncated JPEG: SOS before SOF")
            ns = seg[0]
            scan = []
            for ci in range(ns):
                cid, tt = seg[1 + ci * 2 : 3 + ci * 2]
                scan.append((cid, tt >> 4, tt & 0xF))
            ss, se, ahal = seg[1 + ns * 2 : 4 + ns * 2]
            pos += seglen
            ecs, restarts, pos = _entropy_segment(data, pos)
            _decode_scan(
                ecs, restarts, scan, ss, se, ahal >> 4, ahal & 0xF,
                geom, grids, htables, dri, progressive,
            )
            n_scans += 1
            continue
        pos += seglen

    if frame is None or n_scans == 0:
        raise ValueError("truncated JPEG: missing SOF/SOS")
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_cols, mcu_rows = geom["mcu_cols"], geom["mcu_rows"]

    # reconstruct planes
    planes = {}
    for cid, hs, vs, qid in comps:
        bw, bh = mcu_cols * hs, mcu_rows * vs
        zz = grids[cid].astype(np.float64)
        coefs = np.zeros_like(zz)
        coefs[:, ZIGZAG] = zz  # inverse zigzag
        coefs = coefs.reshape(-1, 8, 8) * qtables[qid][None, :, :]
        spatial = _idct2(coefs) + 128.0
        plane = (
            spatial.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        # upsample to full resolution
        if hs != hmax or vs != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        planes[cid] = plane[:fh, :fw]

    def ycbcr_to_rgb(cy, ccb, ccr):
        cb = ccb - 128.0
        cr = ccr - 128.0
        r = cy + 1.402 * cr
        g = cy - 0.344136 * cb - 0.714136 * cr
        b = cy + 1.772 * cb
        return np.stack([r, g, b], axis=-1)

    if len(comps) == 1:
        y = np.clip(np.round(planes[comps[0][0]]), 0, 255).astype(np.uint8)
        rgb8 = np.repeat(y[:, :, None], 3, axis=2)
    elif len(comps) == 4:
        # Adobe CMYK (transform 0 / no APP14) or YCCK (transform 2).
        # Adobe stores CMYK INVERTED (the historical "Adobe bug" every
        # decoder honors), so with stored values: R = C'*K'/255 etc.;
        # YCCK first converts its YCbCr channels back to inverted CMY.
        p0, p1, p2 = (planes[c[0]] for c in comps[:3])
        pk = np.clip(planes[comps[3][0]], 0.0, 255.0)
        if adobe_transform == 2:
            cmy = np.clip(ycbcr_to_rgb(p0, p1, p2), 0.0, 255.0)
        else:
            cmy = np.clip(np.stack([p0, p1, p2], axis=-1), 0.0, 255.0)
        rgb = cmy * (pk / 255.0)[:, :, None]
        rgb8 = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    elif adobe_transform == 0:
        # APP14 transform 0 with 3 components: planes are RGB directly
        rgb = np.stack([planes[c[0]] for c in comps[:3]], axis=-1)
        rgb8 = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    else:
        cy, ccb, ccr = (planes[c[0]] for c in comps[:3])
        rgb = ycbcr_to_rgb(cy, ccb, ccr)
        rgb8 = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return _apply_exif_orientation(rgb8, exif_orientation)


def _parse_exif_orientation(tiff: bytes) -> int:
    """EXIF APP1 body (after the Exif\\0\\0 header) -> tag 274 value,
    1 if absent/malformed.  Only IFD0 is walked — orientation lives
    there (EXIF 2.3 §4.6.4)."""
    try:
        if tiff[:2] == b"II":
            bo = "<"
        elif tiff[:2] == b"MM":
            bo = ">"
        else:
            return 1
        (off,) = struct.unpack_from(bo + "I", tiff, 4)
        (n_ent,) = struct.unpack_from(bo + "H", tiff, off)
        for i in range(n_ent):
            tag, typ, _cnt = struct.unpack_from(
                bo + "HHI", tiff, off + 2 + 12 * i)
            if tag == 274 and typ == 3:
                (val,) = struct.unpack_from(
                    bo + "H", tiff, off + 2 + 12 * i + 8)
                return val if 1 <= val <= 8 else 1
        return 1
    except (struct.error, IndexError):
        return 1


def _apply_exif_orientation(img: np.ndarray, o: int) -> np.ndarray:
    """Present the stored pixels upright per EXIF tag 274, the way
    browsers and ImageMagick's auto-orient do (the reference inherits
    this from `convert`, /root/reference/pdf2pdfocr.py:1133-1141)."""
    if o == 2:
        img = img[:, ::-1]
    elif o == 3:
        img = img[::-1, ::-1]
    elif o == 4:
        img = img[::-1]
    elif o == 5:
        img = img.transpose(1, 0, 2)
    elif o == 6:
        img = np.rot90(img, 3)
    elif o == 7:
        img = img.transpose(1, 0, 2)[::-1, ::-1]
    elif o == 8:
        img = np.rot90(img, 1)
    return np.ascontiguousarray(img) if o != 1 else img
