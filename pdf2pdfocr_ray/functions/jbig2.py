"""JBIG2 (ITU-T T.88) — embedded-stream generic regions.

The third scanned-document encoding PDFs embed (after DCT JPEG and
CCITT G4): /JBIG2Decode streams in the "embedded" organization (segment
headers without the file header, page association, region segments).
The reference never decodes these itself — pdftoppm does
(/root/reference/pdf2pdfocr.py:56-75).

Scope — the GENERIC REGION coding system, both directions:

* arithmetic coding with GB template 0 (the 16-pixel context with four
  nominal adaptive pixels) via the in-repo MQ coder (functions/mq.py),
  including TPGDON typical-prediction rows;
* MMR=1 regions, which are T.6 Group-4 coded — routed to the in-repo
  CCITT codec (functions/ccitt.py);
* segment parsing: page info, immediate/intermediate generic regions,
  end-of-page/stripe/file; OR-composition onto the page bitmap.

Symbol-dictionary / text-region / refinement segments (the OTHER JBIG2
coding systems) raise ValueError — callers treat the image as
undecodable and fall back, same as any unsupported filter.

Context layout for template 0 follows the spec's figure (pixel offsets
-> context bit positions as in the widely-mirrored reference
implementation): bits 0-3 current row x-1..x-4, bit 4 AT1, bits 5-9 row
y-1 x+2..x-2, bit 10 AT2, bit 11 AT3, bits 12-14 row y-2 x+1..x-1, bit
15 AT4.  Nominal ATs: A1=(+3,-1) A2=(-3,-1) A3=(+2,-2) A4=(-2,-2).
1 = black (JBIG2 convention); the public API returns 0=black/255=white
uint8 to match the engine's other codecs.
"""

from __future__ import annotations

import struct

import numpy as np

from .mq import MQDecoder, MQEncoder

_NOMINAL_AT = ((3, -1), (-3, -1), (2, -2), (-2, -2))
_TPGDON_CTX = 0x9B25


def _px(img: np.ndarray, x: int, y: int) -> int:
    if x < 0 or y < 0 or y >= img.shape[0] or x >= img.shape[1]:
        return 0
    return int(img[y, x])


def _context0(img: np.ndarray, x: int, y: int, at) -> int:
    c = _px(img, x - 1, y)
    c |= _px(img, x - 2, y) << 1
    c |= _px(img, x - 3, y) << 2
    c |= _px(img, x - 4, y) << 3
    c |= _px(img, x + at[0][0], y + at[0][1]) << 4
    c |= _px(img, x + 2, y - 1) << 5
    c |= _px(img, x + 1, y - 1) << 6
    c |= _px(img, x, y - 1) << 7
    c |= _px(img, x - 1, y - 1) << 8
    c |= _px(img, x - 2, y - 1) << 9
    c |= _px(img, x + at[1][0], y + at[1][1]) << 10
    c |= _px(img, x + at[2][0], y + at[2][1]) << 11
    c |= _px(img, x + 1, y - 2) << 12
    c |= _px(img, x, y - 2) << 13
    c |= _px(img, x - 1, y - 2) << 14
    c |= _px(img, x + at[3][0], y + at[3][1]) << 15
    return c


def decode_generic_arith(
    data: bytes, w: int, h: int, at=_NOMINAL_AT, tpgdon: bool = False
) -> np.ndarray:
    """Arithmetic generic region (template 0) -> (h, w) uint8 of 0/1."""
    dec = MQDecoder(data, 1 << 16)
    img = np.zeros((h, w), np.uint8)
    ltp = 0
    for y in range(h):
        if tpgdon:
            ltp ^= dec.decode(_TPGDON_CTX)
            if ltp:  # typical row: copy the row above
                if y > 0:
                    img[y] = img[y - 1]
                continue
        for x in range(w):
            img[y, x] = dec.decode(_context0(img, x, y, at))
    return img


def encode_generic_arith(bits: np.ndarray, at=_NOMINAL_AT) -> bytes:
    """(h, w) 0/1 array -> arithmetic generic region bytes (template 0,
    no TPGDON)."""
    h, w = bits.shape
    enc = MQEncoder(1 << 16)
    for y in range(h):
        for x in range(w):
            enc.encode(_context0(bits, x, y, at), int(bits[y, x]))
    return enc.flush()


# ------------------------------------------------------ embedded streams

_PAGE_INFO = 48
_GENERIC_IMMEDIATE = (36, 38, 39)  # intermediate, immediate, imm. lossless
_SKIPPABLE = (49, 50, 51, 62)  # end-of-page, end-of-stripe, end-of-file, ext


def _parse_segment_header(data: bytes, pos: int):
    """-> (seg_num, seg_type, page, data_start, data_len, next_pos)."""
    if pos + 11 > len(data):
        raise ValueError("truncated JBIG2 segment header")
    (seg_num,) = struct.unpack_from(">I", data, pos)
    flags = data[pos + 4]
    seg_type = flags & 0x3F
    page4 = bool(flags & 0x40)
    pos += 5
    rts = data[pos]
    count = rts >> 5
    if count == 7:
        (count,) = struct.unpack_from(">I", data, pos)
        count &= 0x1FFFFFFF
        pos += 4 + (count + 8) // 8  # long form + retain bits
    else:
        pos += 1
    ref_size = 1 if seg_num <= 256 else 2 if seg_num <= 65536 else 4
    pos += count * ref_size
    if page4:
        (page,) = struct.unpack_from(">I", data, pos)
        pos += 4
    else:
        page = data[pos]
        pos += 1
    (dlen,) = struct.unpack_from(">I", data, pos)
    pos += 4
    if dlen == 0xFFFFFFFF:
        raise ValueError("JBIG2 unknown-length segment not supported")
    return seg_num, seg_type, page, pos, dlen, pos + dlen


def decode_jbig2_embedded(data: bytes, globals_data: bytes = b"") -> np.ndarray:
    """PDF-embedded JBIG2 (/JBIG2Decode [+ /JBIG2Globals]) -> (h, w)
    uint8, 0=black 255=white.  Generic regions only; symbol-dictionary /
    text-region streams raise ValueError."""
    page: np.ndarray | None = None
    for blob in (globals_data, data):
        pos = 0
        while pos < len(blob):
            seg_num, seg_type, _pg, dstart, dlen, nxt = _parse_segment_header(
                blob, pos
            )
            body = blob[dstart : dstart + dlen]
            if seg_type == _PAGE_INFO:
                pw, ph = struct.unpack_from(">II", body, 0)
                if ph == 0xFFFFFFFF:
                    ph = 0  # striped page, unknown height: grow per region
                page = np.zeros((ph, pw), np.uint8)
            elif seg_type in _GENERIC_IMMEDIATE:
                rw, rh, rx, ry = struct.unpack_from(">IIII", body, 0)
                gflags = body[17]
                mmr = gflags & 1
                template = (gflags >> 1) & 3
                tpgdon = bool(gflags & 8)
                p = 18
                if not mmr:
                    n_at = 4 if template == 0 else 1
                    at = []
                    for _ in range(n_at):
                        ax = int(np.int8(body[p]))
                        ay = int(np.int8(body[p + 1]))
                        at.append((ax, ay))
                        p += 2
                    if template != 0:
                        raise ValueError(
                            f"JBIG2 generic template {template} not supported"
                        )
                    bits = decode_generic_arith(
                        body[p:], rw, rh, tuple(at), tpgdon
                    )
                else:
                    if tpgdon:
                        raise ValueError("JBIG2 MMR with TPGDON is invalid")
                    from .ccitt import decode_g4

                    # MMR bits are T.6; G4 decode returns 0=black/255=white
                    bits = (decode_g4(body[p:], rw, rh) == 0).astype(np.uint8)
                if page is None:
                    page = np.zeros((ry + rh, rx + rw), np.uint8)
                elif page.shape[0] < ry + rh:  # striped/auto-height page
                    grown = np.zeros((ry + rh, page.shape[1]), np.uint8)
                    grown[: page.shape[0]] = page
                    page = grown
                page[ry : ry + rh, rx : rx + rw] |= bits
            elif seg_type in _SKIPPABLE:
                pass
            else:
                raise ValueError(
                    f"JBIG2 segment type {seg_type} (symbol/text/refinement "
                    "coding) not supported — generic regions only"
                )
            pos = nxt
    if page is None:
        raise ValueError("JBIG2 stream contains no page or region")
    return np.where(page > 0, 0, 255).astype(np.uint8)


def encode_jbig2_embedded(img: np.ndarray, mmr: bool = False) -> bytes:
    """(h, w) uint8 (0=black, else white) -> embedded JBIG2 bytes: one
    page-info segment + one immediate lossless generic region (template
    0 arithmetic, or MMR/G4 when ``mmr``)."""
    if img.ndim != 2:
        raise ValueError("encode_jbig2_embedded expects a (h, w) image")
    h, w = img.shape
    bits = (img == 0).astype(np.uint8)
    if mmr:
        from .ccitt import encode_g4

        payload = encode_g4(np.where(bits > 0, 0, 255).astype(np.uint8))
        gflags = 1
        at_bytes = b""
    else:
        payload = encode_generic_arith(bits)
        gflags = 0
        at_bytes = b"".join(
            bytes([ax & 0xFF, ay & 0xFF]) for ax, ay in _NOMINAL_AT
        )

    def segment(num: int, stype: int, body: bytes) -> bytes:
        return (
            struct.pack(">IB", num, stype)
            + b"\x00"  # no referred-to segments
            + b"\x01"  # page association 1
            + struct.pack(">I", len(body))
            + body
        )

    page_body = struct.pack(">IIII", w, h, 0, 0) + struct.pack(">BH", 0, 0)
    region_body = (
        struct.pack(">IIII", w, h, 0, 0)
        + b"\x00"  # external combination operator OR
        + bytes([gflags])
        + at_bytes
        + payload
    )
    return segment(0, _PAGE_INFO, page_body) + segment(
        1, 39, region_body  # immediate lossless generic region
    )
