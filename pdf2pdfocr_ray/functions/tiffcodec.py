"""Minimal baseline TIFF codec, pure numpy — multi-frame (IFD chain) aware.

The reference splits multi-frame images (TIFF being the canonical case)
into numbered page images before OCR (`convert -scene 1`,
/root/reference/pdf2pdfocr.py:1133-1138).  The engine's S5 parity needs an
in-process reader for the same: this module parses the baseline TIFF 6.0
subset plus the document-scan family — II/MM byte orders, uncompressed
(Compression=1), LZW (Compression=5, TIFF early-change variant, with or
without the horizontal-differencing Predictor=2), PackBits (32773),
Deflate (8/32946), CCITT fax strips (2=MH, 3=G3/T.4 incl. 2D lines,
4=G4/T.6 — via functions/ccitt.py), and JPEG-in-TIFF (7, incl. the
TIFF/EP shared JPEGTables tag 347) — 8/16-bit grayscale (Photometric
0/1), 8/16-bit RGB (Photometric 2; 16-bit samples follow the container
byte order and present as the high byte), YCbCr-JPEG (6), bilevel fax
(bps=1), strip AND tile layouts (tags 322-325, full-size edge tiles per
TIFF 6.0 §15), and the IFD *chain* that makes a TIFF multi-page.
Anything else (fax/JPEG tiles, old-style JPEG 6) raises ``ValueError``
— honest documented limits.

The encoder exists to build deterministic multi-frame fixtures and writes
one strip per frame in any supported compression, or a tiled layout via
``tile=(tw, th)``; uint16 input frames are written as 16-bit samples.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}

_LZW_CLEAR, _LZW_EOI = 256, 257

# LZW expands up to ~4096:1 — a small corrupt/hostile stream can emit
# gigabytes; same bomb posture as limits.capped_inflate
from .limits import MAX_DECODE_BYTES as _LZW_CAP  # noqa: E402


def _lzw_decode(buf: bytes, early_change: int = 1) -> bytes:
    """TIFF-variant LZW (T.6.0 §13): 9..12-bit MSB-first codes with the
    'early change' width bump one code before the table fills.
    ``early_change=0`` gives the PDF /LZWDecode EarlyChange=0 variant
    (width bumps exactly when the table fills)."""
    out = bytearray()
    nbits = len(buf) * 8
    bitpos = 0
    table: list[bytes] = []
    code_w = 9
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, code_w, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        code_w = 9
        prev = None

    reset()
    while bitpos + code_w <= nbits:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(buf[byte_i : byte_i + 3].ljust(3, b"\0"), "big")
        code = (chunk >> (24 - (bitpos & 7) - code_w)) & ((1 << code_w) - 1)
        bitpos += code_w
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            reset()
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt LZW stream (bad first code)")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream (code beyond table)")
        out += entry
        if len(out) > _LZW_CAP:
            raise ValueError(
                f"LZW output exceeds the {_LZW_CAP} byte decode cap")
        prev = entry
        if len(table) == (1 << code_w) - early_change and code_w < 12:
            code_w += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, accbits
        acc = (acc << width) | code
        accbits += width
        while accbits >= 8:
            out.append((acc >> (accbits - 8)) & 0xFF)
            accbits -= 8
        acc &= (1 << accbits) - 1

    table: dict[bytes, int] = {}
    next_code = 258
    code_w = 9

    def reset() -> None:
        nonlocal table, next_code, code_w
        table = {bytes([i]): i for i in range(256)}
        next_code = 258
        code_w = 9

    reset()
    emit(_LZW_CLEAR, code_w)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w], code_w)
        table[wc] = next_code
        next_code += 1
        # decoder adds each entry one code later than the encoder, so its
        # early-change bump (after adding entry 510/1022/2046) aligns with
        # an encoder bump one entry later (libtiff pairing)
        if next_code == (1 << code_w) and code_w < 12:
            code_w += 1
        if next_code == 4094:  # keep headroom below the 12-bit ceiling
            emit(_LZW_CLEAR, code_w)
            reset()
        w = bytes([byte])
    if w:
        emit(table[w], code_w)
    emit(_LZW_EOI, code_w)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(buf: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(buf)
    while i < n and len(out) < expected:
        ctrl = buf[i]
        i += 1
        if ctrl < 128:  # literal run of ctrl+1 bytes
            out += buf[i : i + ctrl + 1]
            i += ctrl + 1
        elif ctrl > 128:  # repeat next byte 257-ctrl times
            out += bytes([buf[i]]) * (257 - ctrl)
            i += 1
        # ctrl == 128: no-op
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 2:  # repeat run
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
            continue
        # literal run: until the next >=3 repeat or 128 bytes
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def _undo_predictor(arr: np.ndarray) -> np.ndarray:
    """Predictor=2 (horizontal differencing): cumulative sum along each
    row per sample, uint8 wraparound."""
    return np.add.accumulate(arr, axis=1, dtype=np.uint8)


def _apply_predictor(arr: np.ndarray) -> np.ndarray:
    out = arr.copy()
    out[:, 1:] = arr[:, 1:] - arr[:, :-1]  # uint8 wraps
    return out


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
        if len(raw) < size:
            # corrupt count/offset: the value array overruns the file —
            # reject BEFORE building a count-sized unpack format string
            # (a bit-flipped 32-bit count once stalled a worker here)
            raise ValueError("TIFF IFD entry overruns file")
        if typ == 3:  # SHORT
            vals = list(struct.unpack(bo + "H" * count, raw))
        elif typ == 4:  # LONG
            vals = list(struct.unpack(bo + "I" * count, raw))
        elif typ in (1, 7):  # BYTE / UNDEFINED (e.g. JPEGTables)
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


def _decode_fax_ifd(data, tags, w, h, comp, photo, offsets, counts,
                    rows_per_strip) -> np.ndarray:
    """CCITT strips (TIFF compressions 2/3/4) -> (h, w, 3) uint8 frame.

    2 = Modified Huffman (1D rows, each byte-aligned, no EOL);
    3 = T.4 with T4Options (292): bit0 = 2D lines allowed, bit2 = fill
    to byte boundary before EOL; 4 = T.6 with T6Options (293).
    Photometric 0 (min-is-white, the fax default) matches the ccitt
    decoder's visual output directly; 1 inverts."""
    from .ccitt import decode_g3, decode_g4

    t4opts = tags.get(292, [0])[0]
    t6opts = tags.get(293, [0])[0]
    if (comp == 3 and t4opts & 2) or (comp == 4 and t6opts & 2):
        raise ValueError("TIFF fax: uncompressed mode not supported")
    rows = []
    for si, (o, c) in enumerate(zip(offsets, counts)):
        n_rows = min(rows_per_strip, h - si * rows_per_strip)
        strip = data[o: o + c]
        if comp == 4:
            img = decode_g4(strip, w, n_rows)
        elif comp == 3:
            img = decode_g3(strip, w, n_rows, k=(4 if t4opts & 1 else 0),
                            byte_align=bool(t4opts & 4), end_of_line=True)
        else:  # MH: 1D rows, byte-aligned, no EOL framing
            img = decode_g3(strip, w, n_rows, k=0, byte_align=True,
                            end_of_line=False)
        rows.append(img)
    plane = np.concatenate(rows, axis=0)
    if photo == 1:  # min-is-black: invert the visual convention
        plane = 255 - plane
    return np.ascontiguousarray(np.repeat(plane[:, :, None], 3, axis=2))


def _decode_jpeg_ifd(data, tags, offsets, counts) -> np.ndarray:
    """JPEG-in-TIFF (compression 7): strips hold a JPEG stream; a shared
    JPEGTables tag (347) carries an abbreviated tables-only stream that
    prefixes each strip (TIFF/EP convention)."""
    from .jpegcodec import decode_jpeg

    jpt = tags.get(347)
    strips = [data[o: o + c] for o, c in zip(offsets, counts)]
    if len(strips) != 1:
        raise ValueError("TIFF JPEG: multi-strip JPEG not supported")
    blob = strips[0]
    if jpt is not None:
        tables = bytes(jpt)
        if tables[:2] == b"\xff\xd8" and blob[:2] == b"\xff\xd8":
            blob = tables[:-2] + blob[2:]  # drop tables EOI + strip SOI
    img = decode_jpeg(blob)
    return img if img.ndim == 3 else np.repeat(img[:, :, None], 3, axis=2)


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
        predictor = tags.get(317, [1])[0]
        if comp not in (1, 2, 3, 4, 5, 7, 8, 32946, 32773):
            raise ValueError(
                f"unsupported TIFF compression {comp} (only 1=none, "
                "2=MH, 3=G3, 4=G4, 5=LZW, 7=JPEG, 8/32946=Deflate, "
                "32773=PackBits)"
            )
        offsets = tags.get(273, [])
        counts = tags.get(279, [])
        tile_w = tags.get(322, [0])[0]
        tile_h = tags.get(323, [0])[0]
        tiled = bool(tile_w and tile_h and tags.get(324))
        if (not offsets and not tiled) or not w or not h:
            raise ValueError("malformed TIFF IFD (missing strips/dims)")
        from .limits import guard_dims

        guard_dims(w, h, "TIFF")
        if tiled:
            # padded tile grid allocates ceil(w/tw)*tw x ceil(h/th)*th
            guard_dims(tile_w, tile_h, "TIFF tile")
            guard_dims(w + tile_w, h + tile_h, "TIFF tile grid")
        rows_per_strip = tags.get(278, [h])[0] or h
        if tiled and comp in (2, 3, 4, 7):
            raise ValueError("tiled TIFF: fax/JPEG tiles not supported")

        if comp in (2, 3, 4):  # CCITT fax strips (bilevel, bps=1)
            if bps != 1:
                raise ValueError(
                    f"TIFF fax compression {comp} requires 1 bit/sample")
            frames.append(_decode_fax_ifd(
                data, tags, w, h, comp, photo, offsets, counts,
                rows_per_strip))
            continue
        if comp == 7:  # JPEG-in-TIFF: optional shared JPEGTables prefix
            frames.append(_decode_jpeg_ifd(data, tags, offsets, counts))
            continue

        if bps not in (8, 16):
            raise ValueError(
                f"unsupported TIFF bits-per-sample {bps} (only 8/16)")
        if photo not in (0, 1, 2):
            raise ValueError(f"unsupported TIFF photometric {photo}")
        if predictor not in (1, 2):
            raise ValueError(f"unsupported TIFF predictor {predictor}")
        import zlib as _zlib

        itemsize = bps // 8

        def _decompress(blob: bytes, need: int) -> bytes:
            # LZW/PackBits/Deflate state resets per strip/tile
            # (TIFF 6.0 §13/§9/§15)
            if comp == 1:
                return blob
            if comp == 5:
                return _lzw_decode(blob)[:need]
            if comp in (8, 32946):  # Adobe / old-style Deflate
                from .limits import capped_inflate

                # cap at the strip's own declared size: output
                # beyond `need` is discarded anyway
                return capped_inflate(
                    blob, "TIFF deflate strip", cap=need,
                    require_eof=False)[:need]
            return _packbits_decode(blob, need)

        def _to_plane(raw: bytes, n_rows: int, width: int) -> np.ndarray:
            """Decompressed bytes -> (n_rows, width, spp) uint8.  16-bit
            samples follow the container byte order and present as the
            high byte (predictor 2 differencing runs on the 16-bit
            values first)."""
            need = n_rows * width * spp * itemsize
            if len(raw) < need:
                raise ValueError("truncated TIFF pixel data")
            if bps == 8:
                arr = np.frombuffer(raw, np.uint8, need).reshape(
                    n_rows, width, spp)
                return _undo_predictor(arr) if predictor == 2 else arr
            dt = np.dtype(np.uint16).newbyteorder(bo)
            arr = np.frombuffer(raw, dt, n_rows * width * spp).reshape(
                n_rows, width, spp).astype(np.uint16)
            if predictor == 2:
                arr = np.add.accumulate(arr, axis=1, dtype=np.uint16)
            return (arr >> 8).astype(np.uint8)

        if tiled:
            # TIFF 6.0 §15: every tile decompresses to the FULL tile
            # size; edge tiles are cropped when placed on the canvas
            toffs = tags[324]
            tcnts = tags.get(325, [])
            across = -(-w // tile_w)
            down = -(-h // tile_h)
            if len(toffs) < across * down or len(tcnts) < across * down:
                raise ValueError("malformed tiled TIFF (missing tiles)")
            tneed = tile_h * tile_w * spp * itemsize
            arr = np.zeros((h, w, spp), np.uint8)
            for ti in range(down):
                for tj in range(across):
                    o = toffs[ti * across + tj]
                    c = tcnts[ti * across + tj]
                    tile = _to_plane(
                        _decompress(data[o : o + c], tneed), tile_h, tile_w)
                    y, x = ti * tile_h, tj * tile_w
                    ch, cw = min(tile_h, h - y), min(tile_w, w - x)
                    arr[y : y + ch, x : x + cw] = tile[:ch, :cw]
        else:
            parts = []
            for si, (o, c) in enumerate(zip(offsets, counts)):
                n_rows = min(rows_per_strip, h - si * rows_per_strip)
                strip_need = n_rows * w * spp * itemsize
                parts.append(_to_plane(
                    _decompress(data[o : o + c], strip_need), n_rows, w))
            arr = np.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        if spp == 1:
            plane = 255 - arr[..., 0] if photo == 0 else arr[..., 0]
            arr = np.repeat(plane[:, :, None], 3, axis=2)
        elif spp >= 3:
            arr = arr[..., :3]
        frames.append(np.ascontiguousarray(arr))
    if not frames:
        raise ValueError("TIFF contains no frames")
    return frames


_COMPRESSIONS = {"none": 1, "lzw": 5, "packbits": 32773, "deflate": 8,
                 "mh": 2, "g3": 3, "g3_2d": 3, "g4": 4, "jpeg": 7}


def encode_tiff(
    frames: list[np.ndarray],
    compression: str = "none",
    predictor: bool = False,
    tile: tuple[int, int] | None = None,
) -> bytes:
    """List of (H,W,3) or (H,W) uint8 — or uint16, written as 16-bit
    samples — arrays -> multi-frame little-endian TIFF (one IFD + one
    strip per frame, or tiled when ``tile=(tw, th)``).  ``compression``:
    "none", "lzw", "packbits", "deflate", "jpeg", or the fax family
    "g4" / "g3" / "g3_2d" / "mh" (bilevel: pixels < 128 become black,
    photometric 0 min-is-white, 1 bit/sample); ``predictor=True`` adds
    horizontal differencing (Predictor=2, the usual companion of LZW —
    only valid with it)."""
    if not frames:
        raise ValueError("no frames")
    if compression not in _COMPRESSIONS:
        raise ValueError(f"unknown compression {compression!r}")
    if predictor and compression != "lzw":
        raise ValueError("predictor=2 is only written with LZW")
    comp_id = _COMPRESSIONS[compression]
    fax = compression in ("g4", "g3", "g3_2d", "mh")
    if tile is not None and (fax or compression == "jpeg"):
        raise ValueError("tiled output: fax/JPEG tiles not supported")
    bo = "<"
    out = bytearray(b"II*\x00\x00\x00\x00\x00")

    ifd_offsets: list[int] = []
    for frame in frames:
        frame = np.asarray(frame)
        if frame.dtype != np.uint16:
            frame = frame.astype(np.uint8)
        elif fax or compression == "jpeg":
            raise ValueError("16-bit samples: fax/JPEG output unsupported")
        bits = 16 if frame.dtype == np.uint16 else 8
        gray = frame.ndim == 2
        h, w = frame.shape[:2]
        if fax:
            from .ccitt import encode_g3, encode_g4

            bw = np.where(
                (frame if gray else frame.min(axis=2)) < 128, 0, 255
            ).astype(np.uint8)
            if compression == "g4":
                pix = encode_g4(bw)
            elif compression == "g3":
                pix = encode_g3(bw, k=0, end_of_line=True)
            elif compression == "g3_2d":
                pix = encode_g3(bw, k=4)
            else:  # mh: independent byte-aligned 1D rows, no EOL
                pix = b"".join(
                    encode_g3(bw[y: y + 1], k=0, end_of_line=False)
                    for y in range(h))
            strip_off = len(out)
            out += pix
            if len(out) % 2:
                out += b"\x00"
            ifd = [
                (256, 4, 1, w),
                (257, 4, 1, h),
                (258, 3, 1, 1),  # BitsPerSample: bilevel
                (259, 3, 1, comp_id),
                (262, 3, 1, 0),  # Photometric: min-is-white (fax default)
                (273, 4, 1, strip_off),
                (277, 3, 1, 1),
                (278, 4, 1, h),
                (279, 4, 1, len(pix)),
            ]
            if compression == "g3_2d":
                ifd.append((292, 4, 1, 1))  # T4Options: 2D lines allowed
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
            out += struct.pack(bo + "I", 0)
            continue
        if compression == "jpeg":  # JPEG-in-TIFF: one full JFIF strip
            from .jpegcodec import encode_jpeg

            rgb = (np.repeat(frame[:, :, None], 3, axis=2)
                   if gray else frame)
            pix = encode_jpeg(rgb, quality=95)
            strip_off = len(out)
            out += pix
            if len(out) % 2:
                out += b"\x00"
            ifd = [
                (256, 4, 1, w),
                (257, 4, 1, h),
                (259, 3, 1, 7),
                (262, 3, 1, 6),  # Photometric: YCbCr (JFIF)
                (273, 4, 1, strip_off),
                (277, 3, 1, 3),
                (278, 4, 1, h),
                (279, 4, 1, len(pix)),
            ]
            ifd_off = len(out)
            ifd_offsets.append(ifd_off)
            out += struct.pack(bo + "H", len(ifd))
            for tag, typ, count, value in ifd:
                out += struct.pack(bo + "HHI", tag, typ, count)
                if typ == 3 and count == 1:
                    out += struct.pack(bo + "HH", value, 0)
                else:
                    out += struct.pack(bo + "I", value)
            out += struct.pack(bo + "I", 0)
            continue
        spp = 1 if gray else 3
        plane = frame.reshape(h, w, spp)

        def _compress(block: np.ndarray) -> bytes:
            # predictor runs per independently-compressed segment (each
            # tile is its own unit; a decoder undoes it tile-locally)
            if predictor:
                block = _apply_predictor(block)
            pix = block.astype("<u2").tobytes() if bits == 16 else block.tobytes()
            if compression == "lzw":
                return _lzw_encode(pix)
            if compression == "packbits":
                return _packbits_encode(pix)
            if compression == "deflate":
                import zlib as _zlib

                return _zlib.compress(pix, 6)
            return pix

        if tile is not None:
            # TIFF 6.0 §15: tiles are ALWAYS full-size; pad edge tiles
            tw, th = tile
            if tw % 16 or th % 16:
                raise ValueError("TIFF tile dims must be multiples of 16")
            across, down = -(-w // tw), -(-h // th)
            padded = np.zeros((down * th, across * tw, spp), plane.dtype)
            padded[:h, :w] = plane
            toffs, tcnts = [], []
            for ti in range(down):
                for tj in range(across):
                    blk = _compress(
                        padded[ti * th : (ti + 1) * th,
                               tj * tw : (tj + 1) * tw])
                    toffs.append(len(out))
                    tcnts.append(len(blk))
                    out += blk
                    if len(out) % 2:
                        out += b"\x00"
            layout = [
                (322, 4, 1, tw),  # TileWidth
                (323, 4, 1, th),  # TileLength
                (324, 4, toffs),  # TileOffsets
                (325, 4, tcnts),  # TileByteCounts
            ]
        else:
            pix = _compress(plane)
            strip_off = len(out)
            out += pix
            if len(out) % 2:
                out += b"\x00"  # word-align the IFD
            layout = [
                (273, 4, 1, strip_off),  # StripOffsets
                (278, 4, 1, h),  # RowsPerStrip
                (279, 4, 1, len(pix)),  # StripByteCounts
            ]

        entries = [
            (256, 4, 1, w),  # ImageWidth
            (257, 4, 1, h),  # ImageLength
            (259, 3, 1, comp_id),  # Compression
            (262, 3, 1, 1 if gray else 2),  # Photometric
            (277, 3, 1, spp),  # SamplesPerPixel
        ] + layout
        if predictor:
            entries.append((317, 3, 1, 2))  # horizontal differencing
        entries.append((258, 3, [bits] * spp))  # BitsPerSample

        # resolve array-valued entries: <=4 bytes inline, else out-of-line
        ifd = []
        for ent in entries:
            if len(ent) == 4:
                ifd.append(ent)
                continue
            tag, typ, vals = ent
            unit = _TYPE_SIZES[typ]
            fmt = {3: "H", 4: "I"}[typ]
            if len(vals) * unit <= 4:
                if len(vals) == 1:
                    ifd.append((tag, typ, 1, vals[0]))
                else:
                    packed = struct.pack(bo + fmt * len(vals), *vals)
                    packed += b"\x00" * (4 - len(packed))
                    (as_long,) = struct.unpack(bo + "I", packed)
                    ifd.append((tag, typ, len(vals), ("raw", as_long)))
                continue
            voff = len(out)
            out += struct.pack(bo + fmt * len(vals), *vals)
            if len(out) % 2:
                out += b"\x00"
            ifd.append((tag, typ, len(vals), voff))

        ifd.sort(key=lambda e: e[0])
        ifd_off = len(out)
        ifd_offsets.append(ifd_off)
        out += struct.pack(bo + "H", len(ifd))
        for tag, typ, count, value in ifd:
            out += struct.pack(bo + "HHI", tag, typ, count)
            if isinstance(value, tuple):  # pre-packed inline short array
                out += struct.pack(bo + "I", value[1])
            elif typ == 3 and count == 1:
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
