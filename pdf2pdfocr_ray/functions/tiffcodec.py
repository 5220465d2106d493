"""Minimal baseline TIFF codec, pure numpy — multi-frame (IFD chain) aware.

The reference splits multi-frame images (TIFF being the canonical case)
into numbered page images before OCR (`convert -scene 1`,
/root/reference/pdf2pdfocr.py:1133-1138).  The engine's S5 parity needs an
in-process reader for the same: this module parses the baseline TIFF 6.0
subset — II/MM byte orders, uncompressed (Compression=1) 8-bit grayscale
(Photometric 0/1) and RGB (Photometric 2), strip layout, and the IFD
*chain* that makes a TIFF multi-page.  Anything else (LZW/JPEG-in-TIFF,
tiles, 16-bit) raises ``ValueError`` — honest documented limits.

The encoder exists to build deterministic multi-frame fixtures and writes
one uncompressed strip per frame.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_ifd(data: bytes, off: int, bo: str) -> tuple[dict[int, list[int]], int]:
    (n_entries,) = struct.unpack_from(bo + "H", data, off)
    tags: dict[int, list[int]] = {}
    p = off + 2
    for _ in range(n_entries):
        tag, typ, count = struct.unpack_from(bo + "HHI", data, p)
        size = _TYPE_SIZES.get(typ, 1) * count
        if size <= 4:
            raw = data[p + 8 : p + 8 + size]
        else:
            (voff,) = struct.unpack_from(bo + "I", data, p + 8)
            raw = data[voff : voff + size]
        if typ == 3:  # SHORT
            vals = list(struct.unpack(bo + "H" * count, raw))
        elif typ == 4:  # LONG
            vals = list(struct.unpack(bo + "I" * count, raw))
        elif typ == 1:  # BYTE
            vals = list(raw)
        elif typ == 5:  # RATIONAL
            nums = struct.unpack(bo + "I" * (2 * count), raw)
            vals = [nums[i] for i in range(0, 2 * count, 2)]
        else:
            vals = []
        tags[tag] = vals
        p += 12
    (next_off,) = struct.unpack_from(bo + "I", data, p)
    return tags, next_off


def decode_tiff(data: bytes) -> list[np.ndarray]:
    """TIFF bytes -> list of (H,W,3) uint8 frames (one per IFD)."""
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    (magic,) = struct.unpack_from(bo + "H", data, 2)
    if magic != 42:
        raise ValueError("not a TIFF (magic != 42)")
    (off,) = struct.unpack_from(bo + "I", data, 4)

    frames: list[np.ndarray] = []
    seen = set()
    while off and off not in seen:
        seen.add(off)
        tags, off = _read_ifd(data, off, bo)
        w = tags.get(256, [0])[0]
        h = tags.get(257, [0])[0]
        comp = tags.get(259, [1])[0]
        photo = tags.get(262, [1])[0]
        spp = tags.get(277, [1])[0]
        bps = tags.get(258, [8])[:1][0]
        if comp != 1:
            raise ValueError(f"unsupported TIFF compression {comp} (only 1=none)")
        if bps != 8:
            raise ValueError(f"unsupported TIFF bits-per-sample {bps} (only 8)")
        if photo not in (0, 1, 2):
            raise ValueError(f"unsupported TIFF photometric {photo}")
        offsets = tags.get(273, [])
        counts = tags.get(279, [])
        if not offsets or not w or not h:
            raise ValueError("malformed TIFF IFD (missing strips/dims)")
        raw = b"".join(
            data[o : o + c] for o, c in zip(offsets, counts)
        )
        need = w * h * spp
        if len(raw) < need:
            raise ValueError("truncated TIFF strip data")
        arr = np.frombuffer(raw[:need], dtype=np.uint8).reshape(h, w, spp)
        if spp == 1:
            plane = 255 - arr[..., 0] if photo == 0 else arr[..., 0]
            arr = np.repeat(plane[:, :, None], 3, axis=2)
        elif spp >= 3:
            arr = arr[..., :3]
        frames.append(np.ascontiguousarray(arr))
    if not frames:
        raise ValueError("TIFF contains no frames")
    return frames


def encode_tiff(frames: list[np.ndarray]) -> bytes:
    """List of (H,W,3) or (H,W) uint8 arrays -> multi-frame little-endian
    uncompressed TIFF (one IFD + one strip per frame)."""
    if not frames:
        raise ValueError("no frames")
    bo = "<"
    out = bytearray(b"II*\x00\x00\x00\x00\x00")

    ifd_offsets: list[int] = []
    for frame in frames:
        frame = np.asarray(frame, dtype=np.uint8)
        gray = frame.ndim == 2
        h, w = frame.shape[:2]
        spp = 1 if gray else 3
        pix = frame.tobytes()

        strip_off = len(out)
        out += pix
        if len(out) % 2:
            out += b"\x00"  # word-align the IFD

        entries = [
            (256, 4, 1, w),  # ImageWidth
            (257, 4, 1, h),  # ImageLength
            (259, 3, 1, 1),  # Compression = none
            (262, 3, 1, 1 if gray else 2),  # Photometric
            (273, 4, 1, strip_off),  # StripOffsets
            (277, 3, 1, spp),  # SamplesPerPixel
            (278, 4, 1, h),  # RowsPerStrip
            (279, 4, 1, len(pix)),  # StripByteCounts
        ]
        if gray:
            entries.insert(2, (258, 3, 1, 8))  # BitsPerSample
            ifd = entries
        else:
            # BitsPerSample for RGB needs 3 shorts (6 bytes) -> out-of-line
            bps_off = len(out)
            out += struct.pack(bo + "HHH", 8, 8, 8)
            if len(out) % 2:
                out += b"\x00"
            ifd = entries[:2] + [(258, 3, 3, bps_off)] + entries[2:]

        ifd.sort(key=lambda e: e[0])
        ifd_off = len(out)
        ifd_offsets.append(ifd_off)
        out += struct.pack(bo + "H", len(ifd))
        for tag, typ, count, value in ifd:
            out += struct.pack(bo + "HHI", tag, typ, count)
            if typ == 3 and count == 1:
                out += struct.pack(bo + "HH", value, 0)
            else:
                out += struct.pack(bo + "I", value)
        out += struct.pack(bo + "I", 0)  # next-IFD placeholder

    # link the IFD chain
    struct.pack_into(bo + "I", out, 4, ifd_offsets[0])
    for i in range(len(ifd_offsets) - 1):
        # next-IFD field sits after count + entries of IFD i
        (n_entries,) = struct.unpack_from(bo + "H", out, ifd_offsets[i])
        pos = ifd_offsets[i] + 2 + 12 * n_entries
        struct.pack_into(bo + "I", out, pos, ifd_offsets[i + 1])
    return bytes(out)
