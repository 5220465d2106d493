"""CCITT Group 4 (ITU-T T.6, MMR) fax codec — pure Python/numpy.

Scanned-document PDFs overwhelmingly store their 1-bit page rasters as
/CCITTFaxDecode streams with /K < 0 (pure two-dimensional G4 coding).
The reference never decodes these itself — pdftoppm does
(/root/reference/pdf2pdfocr.py:56-75) — so for parity this engine
implements the T.6 bitstream from the public ITU-T T.4/T.6 specs:

* ``decode_g4``: modes P/H/V(0,±1,±2,±3), the full T.4 modified-Huffman
  run-length alphabets (white/black terminating + make-up + the shared
  extended make-up codes to 2560), optional EOFB, ``/BlackIs1`` and
  ``/EncodedByteAlign`` handling.
* ``encode_g4``: the matching coder (vertical preferred, pass when the
  reference run ends early, horizontal otherwise) — used for roundtrip
  verification and for building scanned-PDF fixtures.

Changing-element bookkeeping follows the T.6 coding model: each line is
its sorted list of color-change columns (first run is white).  Bits are
MSB-first within bytes (fax order).  Decoded output is a (h, w) uint8
image, 0 = black, 255 = white.
"""

from __future__ import annotations

import numpy as np

# T.4 modified-Huffman run-length code tables, as (run_length, bitstring).
# Terminating codes 0-63, make-up codes 64-1728 per color, shared extended
# make-up 1792-2560.
_WHITE_CODES = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100",
    1024: "011010101", 1088: "011010110", 1152: "011010111",
    1216: "011011000", 1280: "011011001", 1344: "011011010",
    1408: "011011011", 1472: "010011000", 1536: "010011001",
    1600: "010011010", 1664: "011000", 1728: "010011011",
}

_BLACK_CODES = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

_EXT_MAKEUP = {  # shared by both colors (T.4 §2 extended codes)
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

_EOFB = "000000000001000000000001"  # two EOLs


def _decode_table(codes: dict[int, str]) -> dict[tuple[int, int], int]:
    t = {}
    for run, bits in codes.items():
        t[(len(bits), int(bits, 2))] = run
    for run, bits in _EXT_MAKEUP.items():
        t[(len(bits), int(bits, 2))] = run
    return t


_WHITE_DEC = _decode_table(_WHITE_CODES)
_BLACK_DEC = _decode_table(_BLACK_CODES)


class _Bits:
    """MSB-first bit reader (fax bit order)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read_bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("truncated CCITT G4 stream")
        b = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def peek(self, n: int) -> int:
        """Next n bits (zero-padded past the end), MSB-first."""
        out = 0
        for i in range(n):
            p = self.pos + i
            byte = p >> 3
            bit = (
                (self.data[byte] >> (7 - (p & 7))) & 1
                if byte < len(self.data)
                else 0
            )
            out = (out << 1) | bit
        return out

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_run(br: _Bits, table: dict[tuple[int, int], int]) -> int:
    """One complete run length: make-up codes accumulate until a
    terminating (< 64) code closes the run."""
    total = 0
    while True:
        acc, ln = 0, 0
        while True:
            acc = (acc << 1) | br.read_bit()
            ln += 1
            if ln > 14:
                raise ValueError("invalid CCITT run-length code")
            run = table.get((ln, acc))
            if run is not None:
                break
        total += run
        if run < 64:
            return total


def _changes_to_row(changes: list[int], width: int) -> np.ndarray:
    row = np.full(width, 255, np.uint8)
    for i in range(0, len(changes) - 1, 2):
        row[changes[i] : changes[i + 1]] = 0
    if len(changes) % 2 == 1:
        row[changes[-1] :] = 0
    return row


def decode_g4(
    data: bytes,
    width: int,
    height: int,
    black_is_1: bool = False,
    byte_align: bool = False,
) -> np.ndarray:
    """T.6 (Group 4) stream -> (height, width) uint8, 0=black 255=white.

    ``black_is_1`` mirrors /BlackIs1 (it flips which color the FIRST run
    codes for — G4 itself always starts lines in the "white" state);
    ``byte_align`` mirrors /EncodedByteAlign (each coded line starts on a
    byte boundary)."""
    br = _Bits(data)
    rows = []
    ref: list[int] = []  # changing elements of the reference line
    for _ in range(height):
        if byte_align:
            br.align()
        if br.peek(24) == int(_EOFB, 2):
            break  # EOFB before all rows: remaining rows stay white
        cur = _decode_2d_row(br, ref, width)
        rows.append(_changes_to_row(cur, width))
        ref = cur
    while len(rows) < height:
        rows.append(np.full(width, 255, np.uint8))
    img = np.stack(rows)
    if black_is_1:
        img = 255 - img
    return img


def _decode_2d_row(br: "_Bits", ref: list[int], width: int) -> list[int]:
    """Decode ONE two-dimensionally-coded line (shared by T.6 G4 and the
    2D rows of T.4 G3) -> the line's changing-element columns."""
    cur: list[int] = []
    a0 = -1
    color = 0  # 0 = white run in progress, 1 = black
    while a0 < width:
        # b1: first ref change > a0 with opposite color to a0's run.
        # Ref changes alternate white->black (even idx), black->white
        # (odd): for a white run we need an even-index change, for a
        # black run an odd-index one.
        i = np.searchsorted(ref, a0, side="right") if ref else 0
        while i < len(ref) and (i & 1) != color:
            i += 1
        while i < len(ref) and ref[i] <= a0:
            i += 1
            while i < len(ref) and (i & 1) != color:
                i += 1
        b1 = ref[i] if i < len(ref) else width
        b2 = ref[i + 1] if i + 1 < len(ref) else width
        # mode decode
        if br.peek(1) == 0b1:  # V0
            br.pos += 1
            a1 = b1
            delta = 0
            mode = "v"
        elif br.peek(3) == 0b011:
            br.pos += 3
            a1 = b1 + 1
            mode = "v"
        elif br.peek(3) == 0b010:
            br.pos += 3
            a1 = b1 - 1
            mode = "v"
        elif br.peek(3) == 0b001:  # horizontal
            br.pos += 3
            start = max(a0, 0)
            t1 = _read_run(br, _WHITE_DEC if color == 0 else _BLACK_DEC)
            t2 = _read_run(br, _BLACK_DEC if color == 0 else _WHITE_DEC)
            a1 = start + t1
            a2 = a1 + t2
            cur.append(min(a1, width))
            cur.append(min(a2, width))
            a0 = a2
            continue
        elif br.peek(4) == 0b0001:  # pass
            br.pos += 4
            a0 = b2
            continue
        elif br.peek(6) == 0b000011:
            br.pos += 6
            a1 = b1 + 2
            mode = "v"
        elif br.peek(6) == 0b000010:
            br.pos += 6
            a1 = b1 - 2
            mode = "v"
        elif br.peek(7) == 0b0000011:
            br.pos += 7
            a1 = b1 + 3
            mode = "v"
        elif br.peek(7) == 0b0000010:
            br.pos += 7
            a1 = b1 - 3
            mode = "v"
        else:
            raise ValueError(
                f"invalid CCITT G4 mode code at bit {br.pos}"
            )
        # vertical: change at a1, color flips
        cur.append(max(0, min(a1, width)))
        a0 = a1
        color ^= 1
    return cur


# ---------------------------------------------------------------- encoder


class _BitW:
    __slots__ = ("bits",)

    def __init__(self) -> None:
        self.bits: list[str] = []

    def put(self, s: str) -> None:
        self.bits.append(s)

    def to_bytes(self) -> bytes:
        s = "".join(self.bits)
        s += "0" * (-len(s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _put_run(bw: _BitW, run: int, codes: dict[int, str]) -> None:
    while run >= 64:
        step = min(2560, (run // 64) * 64)
        bw.put(codes[step] if step in codes else _EXT_MAKEUP[step])
        run -= step
    bw.put(codes[run])


def _row_changes(row: np.ndarray) -> list[int]:
    black = row == 0
    diff = np.diff(black.astype(np.int8))
    idx = (np.nonzero(diff)[0] + 1).tolist()
    if black[0]:
        idx = [0] + idx
    return idx


def encode_g4(img: np.ndarray, eofb: bool = True) -> bytes:
    """(h, w) uint8 (0=black, else white) -> T.6 G4 bytes."""
    if img.ndim != 2:
        raise ValueError("encode_g4 expects a (h, w) bilevel image")
    h, w = img.shape
    bw = _BitW()
    ref: list[int] = []
    for y in range(h):
        cur = _row_changes(img[y])
        a0 = -1
        color = 0
        ci = 0  # index into cur of the next change > a0
        while a0 < w:
            while ci < len(cur) and cur[ci] <= a0:
                ci += 1
            a1 = cur[ci] if ci < len(cur) else w
            a2 = cur[ci + 1] if ci + 1 < len(cur) else w
            i = 0
            while i < len(ref) and ((i & 1) != color or ref[i] <= a0):
                i += 1
            b1 = ref[i] if i < len(ref) else w
            b2 = ref[i + 1] if i + 1 < len(ref) else w
            if b2 < a1:  # pass
                bw.put("0001")
                a0 = b2
                continue
            d = a1 - b1
            if -3 <= d <= 3:  # vertical
                bw.put(
                    {0: "1", 1: "011", -1: "010", 2: "000011",
                     -2: "000010", 3: "0000011", -3: "0000010"}[d]
                )
                a0 = a1
                color ^= 1
                continue
            # horizontal
            bw.put("001")
            start = max(a0, 0)
            _put_run(bw, a1 - start, _WHITE_CODES if color == 0 else _BLACK_CODES)
            _put_run(bw, a2 - a1, _BLACK_CODES if color == 0 else _WHITE_CODES)
            a0 = a2
        ref = cur
    if eofb:
        bw.put(_EOFB)
    return bw.to_bytes()


# --------------------------------------------------------- Group 3 (T.4)
_EOL = "000000000001"


def _decode_1d_row(br: _Bits, width: int) -> list[int]:
    """One T.4 one-dimensionally (MH) coded line -> changing-element
    columns.  Lines always start in the white state (a zero-length
    white run codes a line that begins black)."""
    changes: list[int] = []
    pos = 0
    color = 0
    while pos < width:
        run = _read_run(br, _WHITE_DEC if color == 0 else _BLACK_DEC)
        pos += run
        changes.append(min(pos, width))
        color ^= 1
    return changes


def _skip_eol(br: _Bits, require: bool) -> bool:
    """Consume fill bits + one EOL (T.4: zeros then '1').  Returns True
    if an EOL was consumed; with ``require=False`` leaves the reader
    untouched when no EOL is present."""
    start = br.pos
    zeros = 0
    try:
        while True:
            b = br.read_bit()
            if b == 1:
                if zeros >= 11:
                    return True
                break
            zeros += 1
    except ValueError:
        pass
    if require:
        raise ValueError("missing CCITT G3 EOL")
    br.pos = start
    return False


def decode_g3(
    data: bytes,
    width: int,
    height: int,
    k: int = 0,
    black_is_1: bool = False,
    byte_align: bool = False,
    end_of_line: bool = False,
) -> np.ndarray:
    """T.4 (Group 3) stream -> (height, width) uint8, 0=black 255=white.

    Mirrors /CCITTFaxDecode with /K >= 0: ``k == 0`` is pure
    one-dimensional MH coding; ``k > 0`` is mixed 1D/2D, where every
    line starts with an EOL followed by a tag bit (1 = the line is 1D,
    0 = 2D against the previous line).  ``end_of_line`` accepts/requires
    EOLs between K=0 lines (PDF default is no EOLs); trailing RTC/EOFB
    is tolerated; short streams leave remaining rows white."""
    br = _Bits(data)
    rows: list[np.ndarray] = []
    ref: list[int] = []
    for _ in range(height):
        if byte_align:
            br.align()
        try:
            if k > 0:
                _skip_eol(br, require=True)
                tag = br.read_bit()
                cur = (_decode_1d_row(br, width) if tag
                       else _decode_2d_row(br, ref, width))
            else:
                _skip_eol(br, require=end_of_line)
                if (br.pos >> 3) >= len(data):
                    break  # stream exhausted: remaining rows stay white
                cur = _decode_1d_row(br, width)
        except ValueError:
            if not rows:
                raise
            break  # RTC / trailing fill: remaining rows stay white
        rows.append(_changes_to_row(cur, width))
        ref = cur
    while len(rows) < height:
        rows.append(np.full(width, 255, np.uint8))
    img = np.stack(rows)
    if black_is_1:
        img = 255 - img
    return img


def _encode_1d_row(bw: _BitW, row: np.ndarray, width: int) -> None:
    changes = _row_changes(row) + [width]
    pos = 0
    color = 0
    for c in changes:
        if c > width:
            break
        _put_run(bw, c - pos, _WHITE_CODES if color == 0 else _BLACK_CODES)
        pos = c
        color ^= 1
    if pos < width:
        _put_run(bw, width - pos,
                 _WHITE_CODES if color == 0 else _BLACK_CODES)


def encode_g3(img: np.ndarray, k: int = 0,
              end_of_line: bool | None = None) -> bytes:
    """(h, w) uint8 (0=black, else white) -> T.4 G3 bytes.

    ``k == 0``: pure MH lines (EOLs only when ``end_of_line``, which is
    the fax framing; PDF streams default to none).  ``k > 0``: every
    line gets EOL + tag; the first line of each K-group is 1D, the next
    k-1 lines 2D against their predecessor."""
    if img.ndim != 2:
        raise ValueError("encode_g3 expects a (h, w) bilevel image")
    h, w = img.shape
    if end_of_line is None:
        end_of_line = k > 0
    bw = _BitW()
    ref: list[int] = []
    for y in range(h):
        one_d = k <= 0 or (y % k == 0)
        if k > 0:
            bw.put(_EOL)
            bw.put("1" if one_d else "0")
        elif end_of_line:
            bw.put(_EOL)
        if one_d:
            _encode_1d_row(bw, img[y], w)
            ref = _row_changes(img[y])
        else:
            cur = _row_changes(img[y])
            _encode_2d_row(bw, cur, ref, w)
            ref = cur
    return bw.to_bytes()


def _encode_2d_row(bw: _BitW, cur: list[int], ref: list[int],
                   w: int) -> None:
    """Encode ONE line two-dimensionally against ``ref`` (the inner loop
    of encode_g4, shared with G3 K>0 lines)."""
    a0 = -1
    color = 0
    ci = 0
    while a0 < w:
        while ci < len(cur) and cur[ci] <= a0:
            ci += 1
        a1 = cur[ci] if ci < len(cur) else w
        a2 = cur[ci + 1] if ci + 1 < len(cur) else w
        i = 0
        while i < len(ref) and ((i & 1) != color or ref[i] <= a0):
            i += 1
        b1 = ref[i] if i < len(ref) else w
        b2 = ref[i + 1] if i + 1 < len(ref) else w
        if b2 < a1:  # pass
            bw.put("0001")
            a0 = b2
            continue
        d = a1 - b1
        if -3 <= d <= 3:  # vertical
            bw.put(
                {0: "1", 1: "011", -1: "010", 2: "000011",
                 -2: "000010", 3: "0000011", -3: "0000010"}[d]
            )
            a0 = a1
            color ^= 1
            continue
        bw.put("001")  # horizontal
        start = max(a0, 0)
        _put_run(bw, a1 - start, _WHITE_CODES if color == 0 else _BLACK_CODES)
        _put_run(bw, a2 - a1, _BLACK_CODES if color == 0 else _WHITE_CODES)
        a0 = a2
