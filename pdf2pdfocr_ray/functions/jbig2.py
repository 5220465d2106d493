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

Round 4 adds the SYMBOL-CODED organization production scanners emit
(T.88 SS6.4-6.5 + Annex A): arithmetic integer decoding (IADH/IADW/
IAEX/IADT/IAFS/IADS/IAIT/IARI + IAID tree), symbol dictionaries
(SDHUFF=0, SDREFAGG=0; height classes share ONE MQ coder and context
set), and text regions (SBHUFF=0, TRANSPOSED=0; all four reference
corners, OR/AND/XOR/XNOR composition, strip coding).
``encode_jbig2_symbolic`` emits that organization from any bilevel
page (connected components -> deduplicated symbol dictionary + one
text region).  Huffman-coded, transposed, and refinement streams raise
ValueError — callers treat the image as undecodable and fall back.

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

from .limits import guard_dims
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


def _generic_region(dec: MQDecoder, w: int, h: int, at=_NOMINAL_AT,
                    tpgdon: bool = False, gb_off: int = 0) -> np.ndarray:
    """Arithmetic generic region (template 0) using a SHARED decoder and
    a context space at offset ``gb_off`` — symbol dictionaries decode
    many bitmaps through one decoder/context set (T.88 SS6.5.8.2)."""
    img = np.zeros((h, w), np.uint8)
    ltp = 0
    for y in range(h):
        if tpgdon:
            ltp ^= dec.decode(gb_off + _TPGDON_CTX)
            if ltp:  # typical row: copy the row above
                if y > 0:
                    img[y] = img[y - 1]
                continue
        for x in range(w):
            img[y, x] = dec.decode(gb_off + _context0(img, x, y, at))
    return img


def decode_generic_arith(
    data: bytes, w: int, h: int, at=_NOMINAL_AT, tpgdon: bool = False
) -> np.ndarray:
    """Arithmetic generic region (template 0) -> (h, w) uint8 of 0/1."""
    return _generic_region(MQDecoder(data, 1 << 16), w, h, at, tpgdon)


def encode_generic_arith(bits: np.ndarray, at=_NOMINAL_AT) -> bytes:
    """(h, w) 0/1 array -> arithmetic generic region bytes (template 0,
    no TPGDON)."""
    h, w = bits.shape
    enc = MQEncoder(1 << 16)
    for y in range(h):
        for x in range(w):
            enc.encode(_context0(bits, x, y, at), int(bits[y, x]))
    return enc.flush()


# ------------------------------------------------ integer arithmetic coding
# Context-space layout inside one shared MQ coder (per segment): generic
# bitmap contexts first, then one 512-slot space per integer class
# (T.88 Annex A), then the IAID tree space.
_GB_OFF = 0
_INT_OFF = 1 << 16
(_IADH, _IADW, _IAEX, _IAAI, _IADT, _IAFS, _IADS, _IAIT,
 _IARI, _IARDW, _IARDH, _IARDX, _IARDY) = (
    _INT_OFF + 512 * i for i in range(13)
)
_IAID_OFF = _INT_OFF + 512 * 13


def _n_contexts(symcodelen: int) -> int:
    return _IAID_OFF + (1 << (symcodelen + 1))


_INT_BUCKETS = (  # (prefix-1-count, value bits, base) — T.88 Annex A.2
    (0, 2, 0), (1, 4, 4), (2, 6, 20), (3, 8, 84), (4, 12, 340),
    (5, 32, 4436),
)


def _int_decode(dec: MQDecoder, off: int) -> int | None:
    """T.88 A.2 IAx integer decode; returns None for OOB."""
    prev = 1

    def bit() -> int:
        nonlocal prev
        b = dec.decode(off + prev)
        prev = ((prev << 1) | b) if prev < 256 else (
            ((((prev << 1) | b) & 511) | 256)
        )
        return b

    s = bit()
    for ones, nbits, base in _INT_BUCKETS:
        if ones == 5 or not bit():
            v = 0
            for _ in range(nbits):
                v = (v << 1) | bit()
            v += base
            break
    if s and v == 0:
        return None  # OOB
    return -v if s else v


def _int_encode(enc: MQEncoder, off: int, value: int | None) -> None:
    """T.88 A.2 inverse: encode an integer (None = OOB)."""
    prev = 1

    def bit(b: int) -> None:
        nonlocal prev
        enc.encode(off + prev, b)
        prev = ((prev << 1) | b) if prev < 256 else (
            ((((prev << 1) | b) & 511) | 256)
        )

    if value is None:
        s, v = 1, 0
    else:
        s, v = (1, -value) if value < 0 else (0, value)
    bit(s)
    for i, (ones, nbits, base) in enumerate(_INT_BUCKETS):
        hi = base + (1 << nbits) - 1 if nbits < 32 else None
        if hi is None or v <= hi:
            for _ in range(ones):
                bit(1)
            if ones < 5:
                bit(0)
            rem = v - base
            for k in range(nbits - 1, -1, -1):
                bit((rem >> k) & 1)
            return
    raise AssertionError  # pragma: no cover


def _iaid_decode(dec: MQDecoder, symcodelen: int) -> int:
    prev = 1
    for _ in range(symcodelen):
        prev = (prev << 1) | dec.decode(_IAID_OFF + prev)
    return prev - (1 << symcodelen)


def _iaid_encode(enc: MQEncoder, symcodelen: int, sid: int) -> None:
    prev = 1
    for k in range(symcodelen - 1, -1, -1):
        b = (sid >> k) & 1
        enc.encode(_IAID_OFF + prev, b)
        prev = (prev << 1) | b


def _symcodelen(nsyms: int) -> int:
    """ceil(log2(nsyms)), min 1 — the (nsyms - 1).bit_length() form; the
    min-1 floor matches common embedded-stream practice for 1 symbol."""
    return max(1, (nsyms - 1).bit_length())


# ------------------------------------------------ symbol dict + text region
def decode_symbol_dict(body: bytes, input_syms: list[np.ndarray]):
    """T.88 SS6.5 symbol dictionary (SDHUFF=0, SDREFAGG=0) -> exported
    symbol bitmaps (uint8 0/1 arrays)."""
    flags = struct.unpack_from(">H", body, 0)[0]
    sdhuff = flags & 1
    sdrefagg = (flags >> 1) & 1
    template = (flags >> 10) & 3
    if sdhuff:
        raise ValueError("JBIG2 Huffman-coded symbol dictionary unsupported")
    if sdrefagg:
        raise ValueError("JBIG2 refinement/aggregate symbols unsupported")
    if template != 0:
        raise ValueError(f"JBIG2 symbol dict template {template} unsupported")
    p = 2
    at = []
    for _ in range(4):
        at.append((int(np.int8(body[p])), int(np.int8(body[p + 1]))))
        p += 2
    numex, numnew = struct.unpack_from(">II", body, p)
    p += 8
    dec = MQDecoder(body[p:], _n_contexts(1))
    newsyms: list[np.ndarray] = []
    hcheight = 0
    while len(newsyms) < numnew:
        dh = _int_decode(dec, _IADH)
        if dh is None:
            raise ValueError("JBIG2 symbol dict: OOB height delta")
        hcheight += dh
        symwidth = 0
        while True:
            dw = _int_decode(dec, _IADW)
            if dw is None:
                break  # end of height class
            symwidth += dw
            if len(newsyms) >= numnew or symwidth <= 0 or hcheight <= 0:
                raise ValueError("JBIG2 symbol dict: corrupt symbol counts")
            newsyms.append(
                _generic_region(dec, symwidth, hcheight, tuple(at)))
    # export flags: alternating not-exported/exported run lengths (IAEX)
    syms = list(input_syms) + newsyms
    exported: list[np.ndarray] = []
    i, flag, guard = 0, 0, 0
    while i < len(syms):
        run = _int_decode(dec, _IAEX)
        if run is None or run < 0:
            raise ValueError("JBIG2 symbol dict: bad export run")
        if flag:
            exported.extend(syms[i: i + run])
        i += run
        flag ^= 1
        guard += 1
        if guard > 2 * len(syms) + 4:
            raise ValueError("JBIG2 symbol dict: export loop diverges")
    if len(exported) != numex:
        raise ValueError("JBIG2 symbol dict: export count mismatch")
    return exported


def decode_text_region(body: bytes, syms: list[np.ndarray]):
    """T.88 SS6.4 text region (SBHUFF=0, TRANSPOSED=0) -> (bits, x, y)
    where bits is the (h, w) uint8 0/1 region bitmap."""
    rw, rh, rx, ry = struct.unpack_from(">IIII", body, 0)
    guard_dims(rx + rw, ry + rh, "JBIG2 region")
    flags = struct.unpack_from(">H", body, 17)[0]
    sbhuff = flags & 1
    refine = (flags >> 1) & 1
    log_strips = (flags >> 2) & 3
    refcorner = (flags >> 4) & 3
    transposed = (flags >> 6) & 1
    combop = (flags >> 7) & 3
    defpixel = (flags >> 9) & 1
    dsoffset = (flags >> 10) & 0x1F
    if dsoffset > 15:
        dsoffset -= 32
    rtemplate = (flags >> 15) & 1
    if sbhuff:
        raise ValueError("JBIG2 Huffman-coded text region unsupported")
    if transposed:
        raise ValueError("JBIG2 transposed text region unsupported")
    p = 19
    if refine and rtemplate == 0:
        p += 4  # refinement AT pixels (parsed over only; RI must be 0)
    (numinst,) = struct.unpack_from(">I", body, p)
    p += 4
    sbstrips = 1 << log_strips
    if not syms:
        raise ValueError("JBIG2 text region with no symbols in scope")
    symcodelen = _symcodelen(len(syms))
    dec = MQDecoder(body[p:], _n_contexts(symcodelen))
    bits = np.full((rh, rw), defpixel, np.uint8)
    stript = _int_decode(dec, _IADT)
    if stript is None:
        raise ValueError("JBIG2 text region: OOB initial DT")
    stript = -stript * sbstrips
    firsts = 0
    ninst = 0
    guard = 0
    while ninst < numinst:
        dt = _int_decode(dec, _IADT)
        if dt is None:
            raise ValueError("JBIG2 text region: OOB strip DT")
        stript += dt * sbstrips
        first = True
        curs = 0
        while True:
            if first:
                dfs = _int_decode(dec, _IAFS)
                if dfs is None:
                    raise ValueError("JBIG2 text region: OOB first S")
                firsts += dfs
                curs = firsts
                first = False
            else:
                ids = _int_decode(dec, _IADS)
                if ids is None:
                    break  # end of strip
                curs += ids + dsoffset
            curt = (_int_decode(dec, _IAIT) or 0) if sbstrips > 1 else 0
            ti = stript + curt
            if refine and _int_decode(dec, _IARI):
                raise ValueError("JBIG2 refined text instance unsupported")
            sid = _iaid_decode(dec, symcodelen)
            if sid >= len(syms):
                raise ValueError("JBIG2 text region: symbol id out of range")
            bmp = syms[sid]
            hi, wi = bmp.shape
            if refcorner in (2, 3):  # BOTTOMRIGHT / TOPRIGHT
                curs += wi - 1
                x0 = curs - wi + 1
            else:
                x0 = curs
            y0 = ti if refcorner in (1, 3) else ti - hi + 1  # TOP vs BOTTOM
            _blit(bits, bmp, x0, y0, combop)
            if refcorner in (0, 1):  # BOTTOMLEFT / TOPLEFT
                curs += wi - 1
            ninst += 1
            if ninst >= numinst:
                # consume the strip's closing OOB (spec decodes strips to
                # completion; a well-formed stream ends the strip here)
                break
        guard += 1
        if guard > numinst + 16:
            raise ValueError("JBIG2 text region: strip loop diverges")
    return bits, rx, ry


def _blit(page: np.ndarray, bmp: np.ndarray, x0: int, y0: int,
          combop: int) -> None:
    h, w = bmp.shape
    ph, pw = page.shape
    ys, xs = max(0, y0), max(0, x0)
    ye, xe = min(ph, y0 + h), min(pw, x0 + w)
    if ye <= ys or xe <= xs:
        return
    sub = bmp[ys - y0: ye - y0, xs - x0: xe - x0]
    if combop == 0:  # OR
        page[ys:ye, xs:xe] |= sub
    elif combop == 1:  # AND
        page[ys:ye, xs:xe] &= sub
    elif combop == 2:  # XOR
        page[ys:ye, xs:xe] ^= sub
    else:  # XNOR
        page[ys:ye, xs:xe] = 1 - (page[ys:ye, xs:xe] ^ sub)


# ------------------------------------------------------ embedded streams

_PAGE_INFO = 48
_SYMBOL_DICT = 0
_TEXT_IMMEDIATE = (4, 6, 7)  # intermediate, immediate, imm. lossless
_GENERIC_IMMEDIATE = (36, 38, 39)  # intermediate, immediate, imm. lossless
_SKIPPABLE = (49, 50, 51, 62)  # end-of-page, end-of-stripe, end-of-file, ext


def _parse_segment_header(data: bytes, pos: int):
    """-> (seg_num, seg_type, refs, page, data_start, data_len, next)."""
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
    refs = []
    for _ in range(count):
        if ref_size == 1:
            refs.append(data[pos])
        elif ref_size == 2:
            refs.append(struct.unpack_from(">H", data, pos)[0])
        else:
            refs.append(struct.unpack_from(">I", data, pos)[0])
        pos += ref_size
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
    return seg_num, seg_type, refs, page, pos, dlen, pos + dlen


def decode_jbig2_embedded(data: bytes, globals_data: bytes = b"") -> np.ndarray:
    """PDF-embedded JBIG2 (/JBIG2Decode [+ /JBIG2Globals]) -> (h, w)
    uint8, 0=black 255=white.  Generic regions only; symbol-dictionary /
    text-region streams raise ValueError."""
    page: np.ndarray | None = None
    sym_dicts: dict[int, list[np.ndarray]] = {}  # seg_num -> exported syms
    for blob in (globals_data, data):
        pos = 0
        while pos < len(blob):
            (seg_num, seg_type, refs, _pg, dstart, dlen,
             nxt) = _parse_segment_header(blob, pos)
            body = blob[dstart : dstart + dlen]
            if seg_type == _SYMBOL_DICT:
                input_syms: list[np.ndarray] = []
                for r in refs:
                    input_syms.extend(sym_dicts.get(r, []))
                sym_dicts[seg_num] = decode_symbol_dict(body, input_syms)
                pos = nxt
                continue
            if seg_type in _TEXT_IMMEDIATE:
                syms: list[np.ndarray] = []
                if refs:
                    for r in refs:
                        syms.extend(sym_dicts.get(r, []))
                else:  # no explicit refs: all dictionaries in scope
                    for v in sym_dicts.values():
                        syms.extend(v)
                bits, rx, ry = decode_text_region(body, syms)
                rh, rw = bits.shape
                if page is None:
                    page = np.zeros((ry + rh, rx + rw), np.uint8)
                elif page.shape[0] < ry + rh:
                    grown = np.zeros((ry + rh, page.shape[1]), np.uint8)
                    grown[: page.shape[0]] = page
                    page = grown
                page[ry : ry + rh, rx : rx + rw] |= bits
                pos = nxt
                continue
            if seg_type == _PAGE_INFO:
                pw, ph = struct.unpack_from(">II", body, 0)
                guard_dims(pw, max(ph if ph != 0xFFFFFFFF else 1, 1), "JBIG2 page")
                if ph == 0xFFFFFFFF:
                    ph = 0  # striped page, unknown height: grow per region
                page = np.zeros((ph, pw), np.uint8)
            elif seg_type in _GENERIC_IMMEDIATE:
                rw, rh, rx, ry = struct.unpack_from(">IIII", body, 0)
                guard_dims(rx + rw, ry + rh, "JBIG2 region")
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


def _connected_components(bits: np.ndarray):
    """8-connected components of a 0/1 bitmap -> [(y0, x0, bitmap)].
    Iterative flood fill; each black pixel visited once."""
    h, w = bits.shape
    seen = np.zeros((h, w), bool)
    ys, xs = np.nonzero(bits)
    comps = []
    for sy, sx in zip(ys.tolist(), xs.tolist()):
        if seen[sy, sx]:
            continue
        stack = [(sy, sx)]
        seen[sy, sx] = True
        px = []
        while stack:
            y, x = stack.pop()
            px.append((y, x))
            for dy in (-1, 0, 1):
                ny = y + dy
                if ny < 0 or ny >= h:
                    continue
                for dx in (-1, 0, 1):
                    nx = x + dx
                    if 0 <= nx < w and bits[ny, nx] and not seen[ny, nx]:
                        seen[ny, nx] = True
                        stack.append((ny, nx))
        ay = np.fromiter((p[0] for p in px), np.int64, len(px))
        ax = np.fromiter((p[1] for p in px), np.int64, len(px))
        y0, x0 = int(ay.min()), int(ax.min())
        bmp = np.zeros((int(ay.max()) - y0 + 1, int(ax.max()) - x0 + 1),
                       np.uint8)
        bmp[ay - y0, ax - x0] = 1
        comps.append((y0, x0, bmp))
    return comps


def _generic_encode_shared(enc: MQEncoder, bits: np.ndarray,
                           at=_NOMINAL_AT) -> None:
    h, w = bits.shape
    for y in range(h):
        for x in range(w):
            enc.encode(_GB_OFF + _context0(bits, x, y, at), int(bits[y, x]))


def encode_jbig2_symbolic(img: np.ndarray) -> bytes:
    """(h, w) uint8 (0=black, else white) -> embedded JBIG2 bytes using
    the SYMBOL-CODED organization production scanners emit: connected
    components become a symbol dictionary (deduplicated glyph bitmaps,
    height-class coded) and the page becomes one text region of
    (symbol id, position) instances.  Falls back to the generic-region
    encoder for an all-white page."""
    if img.ndim != 2:
        raise ValueError("encode_jbig2_symbolic expects a (h, w) image")
    h, w = img.shape
    bits = (img == 0).astype(np.uint8)
    comps = _connected_components(bits)
    if not comps:
        return encode_jbig2_embedded(img)

    # dedup identical bitmaps -> symbol table sorted by (h, w, bytes)
    # (height classes must be non-decreasing in the dictionary)
    uniq: dict[tuple, int] = {}
    keys = []
    for y0, x0, bmp in comps:
        k = (bmp.shape[0], bmp.shape[1], bmp.tobytes())
        if k not in uniq:
            uniq[k] = 0
            keys.append(k)
    keys.sort()
    sym_of = {k: i for i, k in enumerate(keys)}
    symbols = [np.frombuffer(k[2], np.uint8).reshape(k[0], k[1])
               for k in keys]
    instances = sorted(
        (y0, x0, sym_of[(bmp.shape[0], bmp.shape[1], bmp.tobytes())])
        for y0, x0, bmp in comps
    )

    # ---- symbol dictionary segment body (SDHUFF=0, SDREFAGG=0, tmpl 0)
    enc = MQEncoder(_n_contexts(1))
    hcheight = 0
    i = 0
    while i < len(symbols):
        sh = symbols[i].shape[0]
        _int_encode(enc, _IADH, sh - hcheight)
        hcheight = sh
        symwidth = 0
        while i < len(symbols) and symbols[i].shape[0] == sh:
            _int_encode(enc, _IADW, symbols[i].shape[1] - symwidth)
            symwidth = symbols[i].shape[1]
            _generic_encode_shared(enc, symbols[i])
            i += 1
        _int_encode(enc, _IADW, None)  # OOB: end of height class
    _int_encode(enc, _IAEX, 0)  # zero not-exported, then export all
    _int_encode(enc, _IAEX, len(symbols))
    at_bytes = b"".join(
        bytes([ax & 0xFF, ay & 0xFF]) for ax, ay in _NOMINAL_AT)
    dict_body = (
        struct.pack(">H", 0)  # flags: arith, no refagg, template 0
        + at_bytes
        + struct.pack(">II", len(symbols), len(symbols))
        + enc.flush()
    )

    # ---- text region segment body (TOPLEFT corner, SBSTRIPS=1, OR)
    symcodelen = _symcodelen(len(symbols))
    tenc = MQEncoder(_n_contexts(symcodelen))
    _int_encode(tenc, _IADT, 0)  # initial STRIPT = 0
    stript = 0
    firsts = 0
    j = 0
    while j < len(instances):
        top = instances[j][0]
        _int_encode(tenc, _IADT, top - stript)
        stript = top
        first = True
        curs = 0
        while j < len(instances) and instances[j][0] == top:
            y0, x0, sid = instances[j]
            if first:
                _int_encode(tenc, _IAFS, x0 - firsts)
                firsts = x0
                curs = firsts
                first = False
            else:
                _int_encode(tenc, _IADS, x0 - curs)
                curs = x0
            _iaid_encode(tenc, symcodelen, sid)
            curs += symbols[sid].shape[1] - 1
            j += 1
        _int_encode(tenc, _IADS, None)  # OOB: end of strip
    text_body = (
        struct.pack(">IIII", w, h, 0, 0)
        + b"\x00"  # external combination op OR
        + struct.pack(">H", 1 << 4)  # flags: REFCORNER=TOPLEFT
        + struct.pack(">I", len(instances))
        + tenc.flush()
    )

    def segment(num: int, stype: int, body: bytes,
                refs: tuple[int, ...] = ()) -> bytes:
        head = struct.pack(">IB", num, stype)
        head += bytes([len(refs) << 5]) + bytes(refs)  # 1-byte ref numbers
        head += b"\x01"  # page association 1
        head += struct.pack(">I", len(body))
        return head + body

    page_body = struct.pack(">IIII", w, h, 0, 0) + struct.pack(">BH", 0, 0)
    return (
        segment(0, _PAGE_INFO, page_body)
        + segment(1, _SYMBOL_DICT, dict_body)
        + segment(2, 6, text_body, refs=(1,))  # immediate text region
    )
