"""Tolerant real-syntax PDF structure parser (pure Python, no PyPDF2).

The reference opens arbitrary PDFs via PyPDF2 + external poppler tools
(/root/reference/pdf2pdfocr.py:1169-1198 validate/metadata, 1215-1227
pdffonts has-text check); the engine needs the same tolerance without
binaries.  This module implements the subset that matters for a
validate/extract front end:

* a real object lexer — dicts, arrays, names (with #xx escapes), literal
  strings (nested parens, octal/char escapes), hex strings, numbers,
  refs, booleans, null, streams (with /Length int or indirect, and a
  defensive ``endstream`` search when /Length lies);
* cross-reference navigation — ``startxref`` → classic xref table(s),
  following ``/Prev`` chains, newest-wins merging; malformed or
  xref-stream files fall back to a full-file RECOVERY SCAN for
  ``N G obj`` headers (what real readers do for damaged files);
* trailer parsing with fallbacks — a missing/corrupt trailer dict is
  reconstructed by scanning for the ``/Type /Catalog`` object;
* ``/FlateDecode`` stream decoding (zlib, with truncated-stream
  tolerance) — other filters raise;
* page-tree walking with nested ``/Pages`` nodes and kid-count
  validation;
* content-stream text extraction — ``Tj``, ``'``, ``"`` and ``TJ``
  operators, one extracted line per text-showing operator (hex and
  literal strings).

Every failure path raises ``ValueError`` (callers map it to the
``corrupt_pdf`` error row — row-level fault isolation, never a crash).
"""

from __future__ import annotations

import re
import zlib

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class PdfRef:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num = num
        self.gen = gen

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"PdfRef({self.num},{self.gen})"

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, PdfRef)
            and (self.num, self.gen) == (other.num, other.gen)
        )

    def __hash__(self) -> int:
        return hash((self.num, self.gen))


class PdfName(str):
    """A /Name (distinct from a string value)."""


def _runlength_decode(data: bytes) -> bytes:
    """/RunLengthDecode (PDF 1.7 §7.4.5): length byte L — L<=127 copies
    the next L+1 bytes literally, L>=129 repeats the next byte 257-L
    times, L==128 is EOD."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        ln = data[i]
        i += 1
        if ln == 128:
            break
        if ln <= 127:
            if i + ln + 1 > n:
                raise ValueError("truncated RunLengthDecode literal run")
            out += data[i : i + ln + 1]
            i += ln + 1
        else:
            if i >= n:
                raise ValueError("truncated RunLengthDecode repeat run")
            out += bytes([data[i]]) * (257 - ln)
            i += 1
    return bytes(out)


class PdfStream:
    __slots__ = ("dict", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.dict = d
        self.raw = raw

    def data(self) -> bytes:
        """Decoded stream bytes: identity, /FlateDecode, /LZWDecode
        (EarlyChange 1 — the PDF default, same convention as TIFF §13 —
        or 0 via DecodeParms), /RunLengthDecode, /ASCIIHexDecode or
        /ASCII85Decode, in filter-chain order (PDF 1.7 §7.4)."""
        filt = self.dict.get("Filter")
        filters = (
            [filt] if isinstance(filt, (PdfName, str)) and filt else (filt or [])
        )
        out = self.raw
        for f in filters:
            if f == "FlateDecode":
                from .limits import capped_inflate

                try:
                    out = capped_inflate(out, "FlateDecode")
                except ValueError:
                    # tolerate truncated deflate tails like real readers
                    # (still bomb-capped)
                    out = capped_inflate(
                        out, "FlateDecode", require_eof=False)
            elif f == "LZWDecode":
                parms = self.dict.get("DecodeParms") or {}
                if isinstance(parms, list):
                    parms = next((p for p in parms if p), {}) or {}
                from .tiffcodec import _lzw_decode

                ec = parms.get("EarlyChange")
                out = _lzw_decode(
                    out, early_change=1 if ec is None else int(ec))
            elif f == "RunLengthDecode":
                out = _runlength_decode(out)
            elif f == "ASCIIHexDecode":
                body = out.split(b">", 1)[0]
                body = re.sub(rb"\s+", b"", body)
                if len(body) % 2:
                    body += b"0"  # odd count: implicit trailing 0 (§7.4.2)
                try:
                    out = bytes.fromhex(body.decode("ascii"))
                except ValueError as e:
                    raise ValueError(f"bad ASCIIHexDecode stream: {e}") from e
            elif f == "ASCII85Decode":
                import base64

                body = re.sub(rb"\s+", b"", out)
                if body.endswith(b"~>"):
                    body = body[:-2]
                try:
                    out = base64.a85decode(body)
                except ValueError as e:
                    raise ValueError(f"bad ASCII85Decode stream: {e}") from e
            else:
                raise ValueError(f"unsupported stream filter /{f}")
        return out


class _Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment to EOL
                while self.pos < n and d[self.pos] not in (0x0A, 0x0D):
                    self.pos += 1
            else:
                return

    def _keyword(self) -> str:
        start = self.pos
        d, n = self.data, len(self.data)
        while self.pos < n and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            self.pos += 1
        return d[start : self.pos].decode("latin-1")

    def parse_name(self) -> PdfName:
        assert self.data[self.pos] == 0x2F  # /
        self.pos += 1
        start = self.pos
        d, n = self.data, len(self.data)
        while self.pos < n and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            self.pos += 1
        raw = d[start : self.pos]
        if b"#" in raw:
            raw = re.sub(rb"#([0-9A-Fa-f]{2})", lambda m: bytes([int(m.group(1), 16)]), raw)
        return PdfName(raw.decode("latin-1"))

    def parse_literal_string(self) -> bytes:
        assert self.data[self.pos] == 0x28  # (
        self.pos += 1
        out = bytearray()
        depth = 1
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= n:
                    break
                e = d[self.pos]
                if 0x30 <= e <= 0x37:  # octal
                    oct_digits = bytearray([e])
                    self.pos += 1
                    while (
                        len(oct_digits) < 3
                        and self.pos < n
                        and 0x30 <= d[self.pos] <= 0x37
                    ):
                        oct_digits.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits.decode(), 8) & 0xFF)
                    continue
                mapped = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08, 0x66: 0x0C}
                if e in mapped:
                    out.append(mapped[e])
                elif e in (0x0A, 0x0D):  # line continuation
                    if e == 0x0D and self.pos + 1 < n and d[self.pos + 1] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
                self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                self.pos += 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)
                self.pos += 1
        raise ValueError("unterminated literal string")

    def parse_hex_string(self) -> bytes:
        assert self.data[self.pos] == 0x3C  # <
        self.pos += 1
        end = self.data.find(b">", self.pos)
        if end < 0:
            raise ValueError("unterminated hex string")
        hx = re.sub(rb"[^0-9A-Fa-f]", b"", self.data[self.pos : end])
        self.pos = end + 1
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode())

    def parse_object(self):
        self.skip_ws()
        if self.pos >= len(self.data):
            raise ValueError("unexpected end of data")
        d = self.data
        c = d[self.pos]
        if c == 0x2F:  # /Name
            return self.parse_name()
        if c == 0x28:  # (string)
            return self.parse_literal_string()
        if d.startswith(b"<<", self.pos):
            return self.parse_dict_or_stream()
        if c == 0x3C:  # <hex>
            return self.parse_hex_string()
        if c == 0x5B:  # [array]
            self.pos += 1
            arr = []
            while True:
                self.skip_ws()
                if self.pos >= len(d):
                    raise ValueError("unterminated array")
                if d[self.pos] == 0x5D:
                    self.pos += 1
                    return arr
                arr.append(self.parse_object())
        if c in b"+-.0123456789":
            return self._parse_number_or_ref()
        kw = self._keyword()
        if kw == "true":
            return True
        if kw == "false":
            return False
        if kw == "null":
            return None
        raise ValueError(f"unexpected token {kw[:20]!r}")

    def _parse_number_or_ref(self):
        start = self.pos
        d, n = self.data, len(self.data)
        while self.pos < n and d[self.pos] in b"+-.0123456789eE":
            self.pos += 1
        tok = d[start : self.pos]
        if b"." in tok or b"e" in tok.lower():
            return float(tok)
        num = int(tok)
        # lookahead for "<gen> R"
        save = self.pos
        self.skip_ws()
        gstart = self.pos
        while self.pos < n and d[self.pos] in b"0123456789":
            self.pos += 1
        gtok = d[gstart : self.pos]
        if gtok:
            self.skip_ws()
            if self.pos < n and d[self.pos : self.pos + 1] == b"R" and (
                self.pos + 1 >= n
                or d[self.pos + 1] in _WS
                or d[self.pos + 1] in _DELIM
            ):
                self.pos += 1
                return PdfRef(num, int(gtok))
        self.pos = save
        return num

    def parse_dict_or_stream(self):
        assert self.data.startswith(b"<<", self.pos)
        self.pos += 2
        out: dict = {}
        d, n = self.data, len(self.data)
        while True:
            self.skip_ws()
            if self.pos >= n:
                raise ValueError("unterminated dictionary")
            if d.startswith(b">>", self.pos):
                self.pos += 2
                break
            if d[self.pos] != 0x2F:
                raise ValueError("dictionary key is not a name")
            key = self.parse_name()
            out[str(key)] = self.parse_object()
        # stream?
        save = self.pos
        self.skip_ws()
        if d.startswith(b"stream", self.pos):
            self.pos += 6
            if d.startswith(b"\r\n", self.pos):
                self.pos += 2
            elif d.startswith(b"\n", self.pos) or d.startswith(b"\r", self.pos):
                self.pos += 1
            length = out.get("Length")
            raw = None
            if isinstance(length, int):
                cand = d[self.pos : self.pos + length]
                after = d[self.pos + length : self.pos + length + 20]
                if re.match(rb"\s*endstream", after):
                    raw = cand
                    self.pos += length
            if raw is None:  # /Length wrong or indirect: search endstream
                end = d.find(b"endstream", self.pos)
                if end < 0:
                    raise ValueError("unterminated stream")
                raw = d[self.pos : end].rstrip(b"\r\n")
                self.pos = end
            self.skip_ws()
            if d.startswith(b"endstream", self.pos):
                self.pos += 9
            return PdfStream(out, raw)
        self.pos = save
        return out


# ------------------------------------------------- inline images (§8.9.7)

# abbreviated key / filter / colorspace names allowed only in BI dicts
_INLINE_KEY = {
    "W": "Width", "H": "Height", "BPC": "BitsPerComponent",
    "CS": "ColorSpace", "F": "Filter", "DP": "DecodeParms",
    "IM": "ImageMask", "D": "Decode", "I": "Interpolate",
}
_INLINE_FILTER = {
    "AHx": "ASCIIHexDecode", "A85": "ASCII85Decode", "LZW": "LZWDecode",
    "Fl": "FlateDecode", "RL": "RunLengthDecode", "CCF": "CCITTFaxDecode",
    "DCT": "DCTDecode",
}
_INLINE_CS = {"G": "DeviceGray", "RGB": "DeviceRGB", "CMYK": "DeviceCMYK",
              "I": "Indexed"}


def _apply_prefilters(raw: bytes, prefilters: list[str]) -> bytes:
    """Filters preceding a terminal image codec (DCT/CCF/JBIG2) — the
    deflate + ASCII-armor subset real writers chain there."""
    for f in prefilters:
        if f == "FlateDecode":
            from .limits import capped_inflate

            raw = capped_inflate(raw, "image pre-filter")
        elif f in ("ASCIIHexDecode", "ASCII85Decode", "RunLengthDecode",
                   "LZWDecode"):
            raw = PdfStream({"Filter": PdfName(f)}, raw).data()
        else:
            raise ValueError(f"unsupported pre-filter /{f}")
    return raw


def _is_token_at(data: bytes, tok: bytes, pos: int) -> bool:
    if not data.startswith(tok, pos):
        return False
    if pos > 0 and data[pos - 1] not in _WS and data[pos - 1] not in _DELIM:
        return False
    after = pos + len(tok)
    return (after >= len(data)
            or data[after] in _WS or data[after] in _DELIM)


def _find_token(data: bytes, tok: bytes, start: int) -> int:
    pos = start
    while True:
        pos = data.find(tok, pos)
        if pos < 0:
            return -1
        if _is_token_at(data, tok, pos):
            return pos
        pos += 1


def _has_token(data: bytes, tok: bytes) -> bool:
    return _find_token(data, tok, 0) >= 0


def _decode_is_inverted(decode, ch: int, bpc: int,
                        indexed: bool) -> bool:
    """True when a /Decode array fully inverts the samples (the [1 0]
    per-component form — the one inversion real writers emit, e.g. for
    photometric-inverted fax rasters).  Indexed images invert over
    [0, 2^bpc - 1] per §8.9.5.2.  Other decode ramps are ignored
    (treated as default)."""
    if not isinstance(decode, list) or len(decode) != 2 * ch:
        return False
    try:
        vals = [float(x) for x in decode]
    except (TypeError, ValueError):
        return False
    hi = float((1 << bpc) - 1) if indexed else 1.0
    return all(vals[2 * i] == hi and vals[2 * i + 1] == 0.0
               for i in range(ch))


def _normalize_inline_dict(d: dict) -> dict:
    out: dict = {}
    for k, v in d.items():
        out[_INLINE_KEY.get(k, k)] = v
    filt = out.get("Filter")
    if isinstance(filt, (PdfName, str)):
        out["Filter"] = PdfName(_INLINE_FILTER.get(str(filt), str(filt)))
    elif isinstance(filt, list):
        out["Filter"] = [
            PdfName(_INLINE_FILTER.get(str(f), str(f))) for f in filt
        ]
    cs = out.get("ColorSpace")
    if isinstance(cs, (PdfName, str)):
        out["ColorSpace"] = PdfName(_INLINE_CS.get(str(cs), str(cs)))
    elif isinstance(cs, list) and cs and isinstance(cs[0], (PdfName, str)):
        # inline [/I base hival <palette>] — expand the head and base
        expanded = list(cs)
        expanded[0] = PdfName(_INLINE_CS.get(str(cs[0]), str(cs[0])))
        if len(cs) >= 2 and isinstance(cs[1], (PdfName, str)):
            expanded[1] = PdfName(_INLINE_CS.get(str(cs[1]), str(cs[1])))
        out["ColorSpace"] = expanded
    return out


def _inline_unfiltered_len(d: dict) -> int | None:
    """Exact sample byte count of an UNFILTERED inline image (the only
    case where the data length is knowable up front)."""
    try:
        w = int(d.get("Width") or 0)
        h = int(d.get("Height") or 0)
        bpc = int(d.get("BitsPerComponent") or (1 if d.get("ImageMask")
                                                else 0))
        if d.get("ImageMask"):
            ch = 1
            bpc = 1
        else:
            cs = d.get("ColorSpace")
            if (isinstance(cs, list) and cs
                    and str(cs[0]) in ("Indexed", "I")):
                ch = 1  # indexed: one palette index per sample
            else:
                ch = {"DeviceGray": 1, "DeviceRGB": 3,
                      "DeviceCMYK": 4}.get(str(cs or ""), 0)
    except (TypeError, ValueError):
        return None
    if not (w and h and bpc and ch):
        return None
    return ((w * ch * bpc + 7) // 8) * h


def _inline_data_ok(d: dict, data: bytes) -> bool:
    """Validate a candidate EI split by decoding the filter chain — a
    premature EI inside compressed data fails here and the scan moves
    to the next candidate."""
    filt = d.get("Filter")
    filters = [str(f) for f in (
        [filt] if isinstance(filt, (PdfName, str)) and filt else (filt or [])
    )]
    if not filters:
        return True
    try:
        if filters[-1] == "DCTDecode":
            raw = _apply_prefilters(data, filters[:-1])
            return raw[:2] == b"\xff\xd8" and b"\xff\xd9" in raw
        if filters[-1] == "CCITTFaxDecode":
            parms = d.get("DecodeParms") or {}
            if isinstance(parms, list):
                parms = parms[-1] or {}
            raw = _apply_prefilters(data, filters[:-1])
            from .ccitt import decode_g3, decode_g4
            from .limits import guard_dims

            w = int(parms.get("Columns") or d.get("Width") or 1728)
            h = int(d.get("Height") or 0)
            if not h:
                return False
            guard_dims(w, h, "CCITT inline image")
            kval = int(parms.get("K") or 0)
            black1 = bool(parms.get("BlackIs1"))
            align = bool(parms.get("EncodedByteAlign"))
            if kval < 0:
                decode_g4(raw, w, h, black_is_1=black1, byte_align=align)
            else:
                decode_g3(raw, w, h, k=kval, black_is_1=black1,
                          byte_align=align,
                          end_of_line=bool(parms.get("EndOfLine")))
            return True
        if filters[-1] == "JBIG2Decode":
            from .jbig2 import decode_jbig2_embedded

            raw = _apply_prefilters(data, filters[:-1])
            decode_jbig2_embedded(raw, b"")
            return True
        decoded = PdfStream(d, data).data()
        want = _inline_unfiltered_len(d)
        return want is None or len(decoded) >= want
    except (ValueError, zlib.error, OverflowError):
        return False


def parse_inline_images(content: bytes, *, with_spans: bool = False):
    """Scan a DECODED content stream for inline images (``BI`` dict
    ``ID`` data ``EI``, PDF 1.7 §8.9.7) and return them as
    :class:`PdfStream` objects whose dicts use the full (non-abbreviated)
    key/filter/colorspace names — so the image-payload machinery treats
    them exactly like image XObjects.

    Unfiltered data is cut at its exact computed byte length; filtered
    data scans forward to each whitespace-delimited ``EI`` candidate and
    accepts the first one whose filter chain decodes (compressed bytes
    that happen to contain " EI " cannot truncate the image).  Malformed
    inline images are skipped, never raised.

    ``with_spans=True`` returns ``(start, end, PdfStream)`` tuples
    covering the whole BI..EI byte range (used to blank inline binary
    data out of text extraction)."""
    out = []
    pos = 0
    n = len(content)
    while pos < n:
        bi = _find_token(content, b"BI", pos)
        if bi < 0:
            break
        try:
            lex = _Lexer(content, bi + 2)
            raw_dict: dict = {}
            while True:
                lex.skip_ws()
                if lex.pos >= n:
                    raise ValueError("unterminated BI dict")
                if content[lex.pos] == 0x2F:
                    key = str(lex.parse_name())
                    raw_dict[key] = lex.parse_object()
                else:
                    kw = lex._keyword()
                    if kw == "ID":
                        break
                    raise ValueError(f"unexpected BI token {kw[:10]!r}")
            d = _normalize_inline_dict(raw_dict)
            # exactly one whitespace byte separates ID from the data
            # (tolerate CRLF, the one two-byte case real writers emit)
            dpos = lex.pos
            if content.startswith(b"\r\n", dpos):
                dpos += 2
            elif dpos < n and content[dpos] in _WS:
                dpos += 1
            if not d.get("Filter"):
                want = _inline_unfiltered_len(d)
                if want is None or dpos + want > n:
                    raise ValueError("bad unfiltered inline image")
                data = content[dpos : dpos + want]
                tail = _Lexer(content, dpos + want)
                tail.skip_ws()
                if not _is_token_at(content, b"EI", tail.pos):
                    raise ValueError("inline image data not closed by EI")
                end = tail.pos + 2
            else:
                search, data, end = dpos, None, -1
                while True:
                    ei = _find_token(content, b"EI", search)
                    if ei < 0:
                        raise ValueError("unterminated inline image data")
                    cand = content[dpos:ei]
                    # drop the single whitespace byte before EI
                    if cand and cand[-1] in _WS:
                        if cand.endswith(b"\r\n"):
                            cand = cand[:-2]
                        else:
                            cand = cand[:-1]
                    if _inline_data_ok(d, cand):
                        data, end = cand, ei + 2
                        break
                    search = ei + 2
            s = PdfStream(d, data)
            out.append((bi, end, s) if with_spans else s)
            pos = end
        except ValueError:
            pos = bi + 2  # malformed: skip this BI, keep scanning
    return out


# form-invocation operator ("/Fx0 Do")
_DO_RE = re.compile(rb"/([^\s/<>\[\]()%]+)\s+Do(?![^\s/<>\[\]()%])")


def _blank_inline_spans(content: bytes) -> bytes:
    """Replace inline-image BI..EI byte ranges with spaces — binary
    image data can contain runs that alias text/Do operators."""
    if b"BI" not in content or not _has_token(content, b"BI"):
        return content
    spans = parse_inline_images(content, with_spans=True)
    if not spans:
        return content
    buf = bytearray(content)
    for start, end, _s in spans:
        buf[start:end] = b" " * (end - start)
    return bytes(buf)


def _undo_predictor(raw: bytes, parms) -> bytes:
    """Undo /DecodeParms predictors on decoded stream bytes: 1 = none,
    2 = TIFF horizontal, >= 10 = PNG per-row filters (the common
    /Predictor 12 'Up' case in xref streams)."""
    if not isinstance(parms, dict):
        return raw
    pred = int(parms.get("Predictor", 1) or 1)
    if pred <= 1:
        return raw
    cols = int(parms.get("Columns", 1) or 1)
    colors = int(parms.get("Colors", 1) or 1)
    bpc = int(parms.get("BitsPerComponent", 8) or 8)
    bpp = max(1, colors * bpc // 8)
    row = cols * bpp
    if pred == 2:  # TIFF horizontal differencing
        out = bytearray(raw)
        for r0 in range(0, len(out) - row + 1, row):
            for i in range(bpp, row):
                out[r0 + i] = (out[r0 + i] + out[r0 + i - bpp]) & 0xFF
        return bytes(out)
    # PNG predictors: each row prefixed by a filter-type byte
    out = bytearray()
    prev = bytearray(row)
    pos = 0
    while pos + 1 <= len(raw):
        ft = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + row])
        if len(line) < row:
            break
        pos += 1 + row
        if ft == 1:  # Sub
            for i in range(bpp, row):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(row):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(row):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(row):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred_v = a if (pa <= pb and pa <= pc_) else (b if pb <= pc_ else c)
                line[i] = (line[i] + pred_v) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG predictor filter {ft}")
        out += line
        prev = line
    return bytes(out)


class PdfDocument:
    """Lazily-parsed PDF: object offsets from xref or recovery scan."""

    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF-"):
            raise ValueError("not a PDF (missing %PDF- header)")
        self.data = data
        self._cache: dict[int, object] = {}
        self.offsets: dict[int, int] = {}
        # objects living inside /ObjStm containers: num -> (container, idx)
        self.compressed: dict[int, tuple[int, int]] = {}
        self._objstm_cache: dict[int, list] = {}
        self.trailer: dict = {}
        self.recovered = False
        self._crypt = None  # StandardSecurityHandler once unlocked
        self._encrypt_obj_num = None
        self.was_encrypted = False
        try:
            self._load_xref()
        except ValueError:
            self._recover()
        if not self.offsets:
            self._recover()
        if not self.offsets:
            raise ValueError("corrupt PDF (no objects found)")
        if "Root" not in self.trailer:
            self._find_root()
        # standard-security decryption (reference parity: poppler/pdftoppm
        # transparently opens empty-user-password files, and the reference
        # only refuses encrypted input under check_protection_mode,
        # pdf2pdfocr.py:1196-1198).  A locked or unsupported /Encrypt
        # leaves _crypt=None -> is_encrypted() True -> "encrypted" row.
        self.was_encrypted = "Encrypt" in self.trailer
        if self.was_encrypted:
            enc_ref = self.trailer["Encrypt"]
            if isinstance(enc_ref, PdfRef):
                self._encrypt_obj_num = enc_ref.num
            try:
                enc = self.resolve(enc_ref)
                ids = self.trailer.get("ID")
                id0 = (
                    ids[0]
                    if isinstance(ids, list) and ids
                    and isinstance(ids[0], bytes)
                    else b""
                )
                from .pdfcrypt import StandardSecurityHandler

                handler = StandardSecurityHandler(enc, id0)
                if handler.authenticate(b""):
                    self._crypt = handler
                    self._cache.clear()  # anything fetched pre-handler
            except Exception:  # noqa: BLE001 — malformed /Encrypt => locked
                self._crypt = None

    # -------------------------------------------------------------- xref
    def _load_xref(self) -> None:
        tail = self.data[-2048:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise ValueError("no startxref")
        off = int(m.group(1))
        seen = set()
        while off and off not in seen:
            seen.add(off)
            off = self._load_xref_section(off)

    def _load_xref_section(self, off: int) -> int:
        lex = _Lexer(self.data, off)
        lex.skip_ws()
        if not self.data.startswith(b"xref", lex.pos):
            if re.match(rb"\d+\s+\d+\s+obj\b", self.data[lex.pos : lex.pos + 40]):
                return self._load_xref_stream(lex.pos)  # PDF 1.5+ xref stream
            raise ValueError("bad startxref offset")
        lex.pos += 4
        while True:
            lex.skip_ws()
            if self.data.startswith(b"trailer", lex.pos):
                lex.pos += 7
                trailer = lex.parse_object()
                if not isinstance(trailer, dict):
                    raise ValueError("trailer is not a dictionary")
                for k, v in trailer.items():
                    self.trailer.setdefault(k, v)  # newest section wins
                xstm = trailer.get("XRefStm")
                if isinstance(xstm, (int, float)):
                    # hybrid-reference file (§7.5.8.4): the table marks
                    # ObjStm-resident objects free; their real type-2
                    # entries live in the /XRefStm stream.  Its own
                    # /Prev (if any) duplicates the table's — the
                    # table's drives the chain walk.
                    try:
                        self._load_xref_stream(int(xstm))
                    except ValueError:
                        pass  # damaged hybrid stream: table entries stand
                prev = trailer.get("Prev")
                return int(prev) if isinstance(prev, (int, float)) else 0
            m = re.match(rb"(\d+)\s+(\d+)", self.data[lex.pos : lex.pos + 40])
            if m is None:
                raise ValueError("malformed xref subsection header")
            start, count = int(m.group(1)), int(m.group(2))
            lex.pos += m.end()
            lex.skip_ws()
            for i in range(count):
                ent = self.data[lex.pos : lex.pos + 20]
                em = re.match(rb"(\d{10})\s+(\d{5})\s+([nf])", ent)
                if em is None:
                    raise ValueError("malformed xref entry")
                if em.group(3) == b"n":
                    self.offsets.setdefault(start + i, int(em.group(1)))
                lex.pos += em.end()
                # entry terminator: 1-2 bytes of space/EOL (19/20-byte forms)
                while lex.pos < len(self.data) and self.data[lex.pos] in b" \r\n":
                    lex.pos += 1

    def _load_xref_stream(self, off: int) -> int:
        """PDF 1.5+ cross-reference STREAM (/Type /XRef): binary entry
        rows of /W-field widths, optional /Index subsections, optional
        PNG/TIFF predictor; type-2 entries point into /ObjStm containers."""
        m = re.match(rb"(\d+)\s+(\d+)\s+obj\b", self.data[off : off + 40])
        if m is None:
            # a junk offset (e.g. a damaged /XRefStm value) must raise the
            # typed error the callers' fallbacks catch, not AttributeError
            raise ValueError("startxref does not point at an xref stream")
        lex = _Lexer(self.data, off + m.end())
        obj = lex.parse_object()
        if not isinstance(obj, PdfStream) or obj.dict.get("Type") != "XRef":
            raise ValueError("startxref does not point at an xref stream")
        d = obj.dict
        raw = obj.data()
        raw = _undo_predictor(raw, d.get("DecodeParms") or {})
        w = [int(x) for x in (d.get("W") or [])]
        if len(w) != 3:
            raise ValueError("xref stream missing /W")
        row_len = sum(w)
        index = d.get("Index") or [0, int(d.get("Size", 0))]
        pairs = [
            (int(index[i]), int(index[i + 1])) for i in range(0, len(index), 2)
        ]
        pos = 0
        for start, count in pairs:
            for i in range(count):
                row = raw[pos : pos + row_len]
                if len(row) < row_len:
                    raise ValueError("truncated xref stream")
                pos += row_len
                f1 = int.from_bytes(row[: w[0]], "big") if w[0] else 1
                f2 = int.from_bytes(row[w[0] : w[0] + w[1]], "big")
                f3 = int.from_bytes(row[w[0] + w[1] :], "big")
                num = start + i
                if f1 == 1:
                    if num not in self.compressed:
                        self.offsets.setdefault(num, f2)
                elif f1 == 2:
                    if num not in self.offsets:
                        self.compressed.setdefault(num, (f2, f3))
                # f1 == 0: free
        for k, v in d.items():
            if k in ("Root", "Info", "Encrypt", "Size", "ID"):
                self.trailer.setdefault(k, v)
        prev = d.get("Prev")
        return int(prev) if isinstance(prev, (int, float)) else 0

    def _load_objstm(self, num: int) -> list:
        """Parse an /ObjStm container -> list of its objects (by index)."""
        if num in self._objstm_cache:
            return self._objstm_cache[num]
        stm = self.get(num)
        if not isinstance(stm, PdfStream) or stm.dict.get("Type") != "ObjStm":
            raise ValueError(f"object {num} is not /Type /ObjStm")
        payload = stm.data()
        n = int(stm.dict.get("N", 0))
        first = int(stm.dict.get("First", 0))
        head = _Lexer(payload, 0)
        offs = []
        for _ in range(n):
            head.skip_ws()
            onum = head.parse_object()
            head.skip_ws()
            ooff = head.parse_object()
            offs.append((int(onum), int(ooff)))
        objs = []
        for onum, ooff in offs:
            objs.append(_Lexer(payload, first + ooff).parse_object())
        self._objstm_cache[num] = objs
        return objs

    # ---------------------------------------------------------- recovery
    def _recover(self) -> None:
        """Scan the whole file for object headers (newest wins)."""
        self.recovered = True
        for m in re.finditer(rb"(?<![0-9])(\d+)\s+(\d+)\s+obj\b", self.data):
            self.offsets[int(m.group(1))] = m.start(1)
        if not self.trailer:
            tm = None
            for tm in re.finditer(rb"trailer", self.data):
                pass
            if tm is not None:
                try:
                    t = _Lexer(self.data, tm.end()).parse_object()
                    if isinstance(t, dict):
                        self.trailer = t
                except ValueError:
                    pass

    def _find_root(self) -> None:
        for num in self.offsets:
            try:
                obj = self.get(num)
            except ValueError:
                continue
            if isinstance(obj, dict) and obj.get("Type") == "Catalog":
                self.trailer["Root"] = PdfRef(num, 0)
                return
        raise ValueError("corrupt PDF (no document catalog)")

    # ------------------------------------------------------------ access
    def get(self, num: int):
        if num in self._cache:
            return self._cache[num]
        if num not in self.offsets and num in self.compressed:
            container, idx = self.compressed[num]
            objs = self._load_objstm(container)
            if idx >= len(objs):
                raise ValueError(f"object {num} out of range in ObjStm {container}")
            self._cache[num] = objs[idx]
            return objs[idx]
        off = self.offsets.get(num)
        if off is None:
            raise ValueError(f"missing object {num}")
        m = re.match(rb"(\d+)\s+(\d+)\s+obj\b", self.data[off : off + 40])
        if m is None:
            raise ValueError(f"bad object header at {off}")
        lex = _Lexer(self.data, off + m.end())
        obj = lex.parse_object()
        if self._crypt is not None and num != self._encrypt_obj_num:
            obj = self._decrypt_object(obj, num, int(m.group(2)))
        self._cache[num] = obj
        return obj

    def _decrypt_object(self, obj, num: int, gen: int):
        """Walk a freshly parsed indirect object, decrypting strings and
        stream payloads in place (§7.6.2).  Never applied to objects
        living inside an /ObjStm (their container stream is what is
        encrypted) nor to xref streams (always plaintext by spec)."""
        if isinstance(obj, bytes):
            return self._crypt.decrypt_string(obj, num, gen)
        if isinstance(obj, list):
            return [self._decrypt_object(o, num, gen) for o in obj]
        if isinstance(obj, PdfStream):
            d = self._decrypt_object(obj.dict, num, gen)
            if d.get("Type") == "XRef":
                return PdfStream(d, obj.raw)
            return PdfStream(d, self._crypt.decrypt_stream(obj.raw, num, gen))
        if isinstance(obj, dict):
            return {
                k: self._decrypt_object(v, num, gen) for k, v in obj.items()
            }
        return obj

    def resolve(self, obj, depth: int = 0):
        while isinstance(obj, PdfRef):
            if depth > 32:
                raise ValueError("reference cycle")
            obj = self.get(obj.num)
            depth += 1
        return obj

    # --------------------------------------------------------- structure
    def catalog(self) -> dict:
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise ValueError("corrupt PDF (bad /Root)")
        return root

    def is_encrypted(self) -> bool:
        """True only when the file is LOCKED: carries /Encrypt and the
        empty user password does not open it (or the handler/algorithm is
        unsupported).  Empty-user-password files — the common crawl case —
        decrypt transparently, matching the reference's default poppler
        behavior; ``was_encrypted`` still records the /Encrypt presence
        for metadata / check-protection parity."""
        return self.was_encrypted and self._crypt is None

    def pages(self) -> list[dict]:
        """Walk the page tree -> leaf Page dicts (inherited attrs merged)."""
        cat = self.catalog()
        top = self.resolve(cat.get("Pages"))
        if not isinstance(top, dict):
            raise ValueError("corrupt PDF (no page tree)")
        out: list[dict] = []

        def walk(node: dict, inherited: dict, depth: int) -> None:
            if depth > 64:
                raise ValueError("page tree too deep")
            inh = dict(inherited)
            for k in ("Resources", "MediaBox", "Rotate"):
                if k in node:
                    inh[k] = node[k]
            t = node.get("Type")
            if t == "Pages" or (t is None and "Kids" in node):
                kids = self.resolve(node.get("Kids"))
                if not isinstance(kids, list):
                    raise ValueError("corrupt PDF (bad /Kids)")
                for kid in kids:
                    kd = self.resolve(kid)
                    if not isinstance(kd, dict):
                        raise ValueError("corrupt PDF (missing page object)")
                    walk(kd, inh, depth + 1)
            else:
                page = dict(inh)
                page.update(node)
                out.append(page)

        walk(top, {}, 0)
        declared = self.resolve(top.get("Count"))
        if isinstance(declared, int) and declared != len(out):
            raise ValueError(
                f"corrupt PDF (page count mismatch: /Count {declared} "
                f"vs {len(out)} leaves)"
            )
        if not out:
            raise ValueError("corrupt PDF (no pages)")
        return out

    def page_image_payloads(self, page: dict) -> list[bytes]:
        """Image payloads of a page — image XObjects AND inline images
        (``BI``/``ID``/``EI``, PDF 1.7 §8.9.7) — as bytes the engine's
        image dispatch can decode (reference parity: pdftoppm rasterizes
        any page image for OCR, pdf2pdfocr.py:56-75 — here the common
        scanned-page encodings are extracted directly):

        * /DCTDecode (possibly after earlier filters) -> the JPEG bytes
          verbatim, routed to the in-repo jpegcodec via the image sniffer;
        * /CCITTFaxDecode — /K < 0 (Group 4, the dominant scanned-
          document encoding) via the in-repo T.6 codec, /K >= 0 (Group 3
          1D / mixed, fax-era scans) via the T.4 codec — honoring
          /BlackIs1, /EncodedByteAlign and /EndOfLine;
        * /JBIG2Decode (generic AND symbol-coded organizations);
        * /FlateDecode / /LZWDecode / /RunLengthDecode / ASCII-armored
          or identity 8-bit (or packed 1-bit) /DeviceGray / /DeviceRGB
          raw samples -> the engine's RAWB frame encoding.

        Unsupported encodings (refinement JBIG2, other colorspaces) are
        skipped — callers fall back to their no-image behavior."""
        out: list[bytes] = []
        try:
            res = self.resolve(page.get("Resources"))
        except ValueError:
            res = None
        try:
            content = self.page_content(page)
        except (ValueError, zlib.error):
            content = b""
        self._collect_images(res, content, out, (), set())
        return out

    def _collect_images(self, res, content: bytes, out: list,
                        path: tuple, seen: set) -> None:
        """Image XObjects, inline images, and (recursively) the images
        inside Form XObjects of one content scope (§8.10 — forms wrap
        page rasters in real writers; poppler renders through them).
        ``seen`` dedupes images when a resource-less form re-enters its
        parent's scope; ``path`` cuts form cycles."""
        if len(path) > 6:
            return
        try:
            xobjs = self.resolve(res.get("XObject")) \
                if isinstance(res, dict) else None
        except ValueError:
            xobjs = None
        if isinstance(xobjs, dict):
            for v in xobjs.values():
                key = (v.num, v.gen) if isinstance(v, PdfRef) \
                    else ("anon", id(v))
                if key in path:
                    continue  # cycle
                try:
                    s = self.resolve(v)
                except ValueError:
                    continue
                if not isinstance(s, PdfStream):
                    continue
                sub = s.dict.get("Subtype")
                if sub == "Image":
                    if key in seen:
                        continue
                    seen.add(key)
                    p = self._image_payload(s)
                    if p is not None:
                        out.append(p)
                elif sub == "Form":
                    try:
                        fc = s.data()
                    except (ValueError, zlib.error):
                        continue
                    try:
                        fres = self.resolve(s.dict.get("Resources"))
                    except ValueError:
                        fres = None
                    self._collect_images(
                        fres if isinstance(fres, dict) else res,
                        fc, out, path + (key,), seen)
        # inline images (fax-era writers and some distillers embed the
        # page raster straight in the content stream; poppler renders
        # them like any XObject)
        if _has_token(content, b"BI"):
            for s in parse_inline_images(content):
                p = self._image_payload(s)
                if p is not None:
                    out.append(p)

    def _image_payload(self, s: PdfStream) -> bytes | None:
        """One image stream (XObject or inline) -> engine-decodable
        payload bytes, or None if broken/unsupported (a broken image
        never fails the page)."""
        filt = s.dict.get("Filter")
        filters = [str(f) for f in (
            [filt] if isinstance(filt, (PdfName, str)) and filt
            else (filt or [])
        )]
        try:
            if filters and filters[-1] == "DCTDecode":
                # apply any preceding filters, hand over the JPEG
                raw = _apply_prefilters(s.raw, filters[:-1])
                return raw
            if filters and filters[-1] == "CCITTFaxDecode":
                parms = self.resolve(s.dict.get("DecodeParms")) or {}
                if isinstance(parms, list):
                    parms = self.resolve(parms[-1]) or {}
                kval = int(self.resolve(parms.get("K")) or 0)
                raw = _apply_prefilters(s.raw, filters[:-1])
                import numpy as np

                from .ccitt import decode_g3, decode_g4
                from .imagecodec import encode_raw

                w = int(
                    self.resolve(parms.get("Columns"))
                    or self.resolve(s.dict.get("Width")) or 1728
                )
                h = int(self.resolve(s.dict.get("Height")) or 0)
                if not h:
                    return None
                from .limits import guard_dims

                guard_dims(w, h, "CCITT image")
                black1 = bool(self.resolve(parms.get("BlackIs1")))
                align = bool(
                    self.resolve(parms.get("EncodedByteAlign"))
                )
                if kval < 0:  # Group 4 (T.6)
                    gray = decode_g4(
                        raw, w, h, black_is_1=black1, byte_align=align
                    )
                else:  # Group 3 (T.4): K=0 pure 1D, K>0 mixed
                    gray = decode_g3(
                        raw, w, h, k=kval, black_is_1=black1,
                        byte_align=align,
                        end_of_line=bool(
                            self.resolve(parms.get("EndOfLine"))
                        ),
                    )
                return encode_raw(np.repeat(gray[:, :, None], 3, axis=2))
            if filters and filters[-1] == "JBIG2Decode":
                parms = self.resolve(s.dict.get("DecodeParms")) or {}
                if isinstance(parms, list):
                    parms = self.resolve(parms[-1]) or {}
                gstream = self.resolve(parms.get("JBIG2Globals"))
                gdata = (
                    gstream.data()
                    if isinstance(gstream, PdfStream)
                    else b""
                )
                raw = _apply_prefilters(s.raw, filters[:-1])
                import numpy as np

                from .imagecodec import encode_raw
                from .jbig2 import decode_jbig2_embedded

                # generic regions decode; symbol/text-coded streams
                # raise and fall through to the skip path
                gray = decode_jbig2_embedded(raw, gdata)
                return encode_raw(np.repeat(gray[:, :, None], 3, axis=2))
            samples = s.data()  # full supported filter chain or identity
            w = int(self.resolve(s.dict.get("Width")) or 0)
            h = int(self.resolve(s.dict.get("Height")) or 0)
            bpc = int(self.resolve(s.dict.get("BitsPerComponent")) or 0)
            base, palette = self._resolve_colorspace(
                s.dict.get("ColorSpace"))
            if self.resolve(s.dict.get("ImageMask")):
                base, palette, bpc = "DeviceGray", None, 1  # stencil mask
            ch = {"DeviceGray": 1, "DeviceRGB": 3,
                  "DeviceCMYK": 4}.get(base, 0)
            if palette is not None:
                ch = 1  # indexed: samples are palette indices
            if not (w and h and ch and bpc in (1, 2, 4, 8)):
                return None
            import numpy as np

            from .imagecodec import encode_raw
            from .limits import guard_dims

            guard_dims(w, h, "PDF raw image")
            if bpc < 8:
                if ch != 1:
                    return None  # sub-byte samples: gray/indexed only
                row_bytes = (w * bpc + 7) // 8
                if len(samples) < row_bytes * h:
                    return None
                packed = np.frombuffer(
                    samples[: row_bytes * h], np.uint8
                ).reshape(h, row_bytes)
                bits = np.unpackbits(packed, axis=1)
                vals = bits.reshape(h, -1, bpc)
                weights = 1 << np.arange(bpc - 1, -1, -1)
                idx = (vals * weights).sum(axis=2)[:, :w].astype(np.uint8)
            else:
                if len(samples) < w * h * ch:
                    return None
                idx = np.frombuffer(
                    samples[: w * h * ch], np.uint8
                ).reshape((h, w) if ch == 1 else (h, w, ch))
            if _decode_is_inverted(
                    self.resolve(s.dict.get("Decode")),
                    ch, bpc, palette is not None):
                idx = ((1 << bpc) - 1 - idx.astype(np.int32)).astype(
                    np.uint8) if bpc < 8 else (255 - idx)
            if palette is not None:
                hival = palette.shape[0] - 1
                arr = palette[np.minimum(idx, hival)]
            elif ch == 4:  # DeviceCMYK: r = 255 - min(c + k, 255)
                c = idx.astype(np.int32)
                k = c[:, :, 3]
                arr = (255 - np.minimum(c[:, :, :3] + k[:, :, None], 255)
                       ).astype(np.uint8)
            elif bpc < 8:  # sub-byte gray: scale indices to full range
                arr = (idx.astype(np.uint16) * 255
                       // ((1 << bpc) - 1)).astype(np.uint8)
            else:
                arr = idx
            if arr.ndim == 2:
                arr = np.repeat(arr[:, :, None], 3, axis=2)
            return encode_raw(np.ascontiguousarray(arr))
        except (ValueError, zlib.error):
            return None  # a broken image never fails the page

    def _resolve_colorspace(self, cs):
        """PDF image colorspace -> (device base name, palette | None).

        Handles the forms real crawled PDFs actually carry: the device
        names, [/ICCBased stream] via its /N component count (the
        profile itself is never parsed — poppler falls back the same
        way when a profile is broken), [/CalRGB dict] / [/CalGray dict]
        as their device equivalents, and [/Indexed base hival lookup]
        with a string or stream palette (base resolved recursively, so
        /Indexed-over-/ICCBased works).  Returns ("", None) for
        anything else (Separation, Lab, Pattern...)."""
        import numpy as np

        cs = self.resolve(cs)
        if isinstance(cs, (PdfName, str)):
            name = str(cs)
            return ({"DeviceGray": "DeviceGray", "DeviceRGB": "DeviceRGB",
                     "DeviceCMYK": "DeviceCMYK", "CalGray": "DeviceGray",
                     "CalRGB": "DeviceRGB", "G": "DeviceGray",
                     "RGB": "DeviceRGB", "CMYK": "DeviceCMYK",
                     }.get(name, ""), None)
        if not isinstance(cs, list) or not cs:
            return "", None
        head = str(self.resolve(cs[0]) or "")
        if head == "ICCBased" and len(cs) >= 2:
            prof = self.resolve(cs[1])
            n = 0
            if isinstance(prof, PdfStream):
                n = int(self.resolve(prof.dict.get("N")) or 0)
            return ({1: "DeviceGray", 3: "DeviceRGB",
                     4: "DeviceCMYK"}.get(n, ""), None)
        if head == "CalRGB":
            return "DeviceRGB", None
        if head == "CalGray":
            return "DeviceGray", None
        if head in ("Indexed", "I") and len(cs) >= 4:
            base, base_pal = self._resolve_colorspace(cs[1])
            if base_pal is not None or base not in (
                    "DeviceGray", "DeviceRGB", "DeviceCMYK"):
                return "", None
            nb = {"DeviceGray": 1, "DeviceRGB": 3, "DeviceCMYK": 4}[base]
            hival = int(self.resolve(cs[2]) or 0)
            lookup = self.resolve(cs[3])
            if isinstance(lookup, PdfStream):
                lookup = lookup.data()
            if not isinstance(lookup, (bytes, bytearray)):
                return "", None
            need = (hival + 1) * nb
            if hival < 0 or hival > 255 or len(lookup) < need:
                return "", None
            pal = np.frombuffer(
                bytes(lookup[:need]), np.uint8).reshape(hival + 1, nb)
            if nb == 1:
                pal = np.repeat(pal, 3, axis=1)
            elif nb == 4:  # CMYK palette -> RGB, same transform as images
                k = pal[:, 3].astype(np.int32)
                pal = (255 - np.minimum(
                    pal[:, :3].astype(np.int32) + k[:, None], 255)
                       ).astype(np.uint8)
            return base, pal
        return "", None

    def page_content(self, page: dict) -> bytes:
        """Decoded, concatenated content stream bytes of a page."""
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return b""
        streams = contents if isinstance(contents, list) else [contents]
        parts = []
        for s in streams:
            s = self.resolve(s)
            if isinstance(s, PdfStream):
                parts.append(s.data())
        return b"\n".join(parts)

    def page_content_expanded(self, page: dict) -> tuple[bytes, dict]:
        """Page content with Form XObject invocations SPLICED IN at
        their ``/Name Do`` sites (PDF §8.10 — real writers wrap page
        text in forms routinely; poppler walks them transparently),
        plus the merged font-decoder map.

        A form's own fonts are renamed into a private namespace (its
        ``Tf`` operators rewritten to match) so a form ``/F1`` with a
        different encoding can't collide with the page's ``/F1``; a
        form with NO /Resources inherits the invoking scope's per the
        spec's compatibility note.  Cycles are cut (a self-invoking
        form expands to nothing) and depth is capped.  Inline-image
        data is blanked before splicing so binary bytes can't alias a
        ``Do`` operator."""
        try:
            res = self.resolve(page.get("Resources"))
        except ValueError:
            res = None
        content = _blank_inline_spans(self.page_content(page))
        fonts = self._font_decoders_from_res(res)
        counter = [0]
        content = self._splice_forms(content, res, fonts, counter, ())
        return content, fonts

    def _splice_forms(self, content: bytes, res, fonts_out: dict,
                      counter: list, path: tuple) -> bytes:
        if len(path) > 6:
            return content
        try:
            xobjs = self.resolve(res.get("XObject")) \
                if isinstance(res, dict) else None
        except ValueError:
            return content
        if not isinstance(xobjs, dict) or not xobjs:
            return content

        def repl(m: "re.Match[bytes]") -> bytes:
            name = m.group(1).decode("latin-1")
            v = xobjs.get(name)
            if v is None:
                return m.group(0)
            key = (v.num, v.gen) if isinstance(v, PdfRef) else ("anon",
                                                                id(v))
            if key in path:
                return b""  # cycle: a self-invoking form draws nothing
            try:
                s = self.resolve(v)
            except ValueError:
                return m.group(0)
            if not isinstance(s, PdfStream) \
                    or s.dict.get("Subtype") != "Form":
                return m.group(0)
            try:
                fc = _blank_inline_spans(s.data())
            except (ValueError, zlib.error):
                return b""
            try:
                fres = self.resolve(s.dict.get("Resources"))
            except ValueError:
                fres = None
            own_res = isinstance(fres, dict)
            scope = fres if own_res else res
            fc = self._splice_forms(fc, scope, fonts_out, counter,
                                    path + (key,))
            if own_res:
                ffonts = self._font_decoders_from_res(fres)
                if ffonts:
                    mapping = {}
                    for fname, dec in ffonts.items():
                        counter[0] += 1
                        new = f"{fname}~fx{counter[0]}"
                        mapping[fname.encode('latin-1')] = \
                            new.encode("latin-1")
                        fonts_out[new] = dec
                    fc = re.sub(
                        rb"/([^\s/<>\[\]()%]+)(\s+[-+.\d]+\s+Tf)",
                        lambda tm: (b"/" + mapping.get(
                            tm.group(1), tm.group(1)) + tm.group(2)),
                        fc,
                    )
            return b"\n" + fc + b"\n"

        return _DO_RE.sub(repl, content)

    def info(self) -> dict[str, str]:
        """/Info metadata dict with string values decoded."""
        info = self.trailer.get("Info")
        try:
            info = self.resolve(info)
        except ValueError:
            return {}
        if not isinstance(info, dict):
            return {}
        from .pdftext import pdfdoc_decode

        out = {}
        for k, v in info.items():
            if isinstance(v, bytes):
                out[k] = pdfdoc_decode(v)
            elif isinstance(v, (str, int, float, bool)):
                out[k] = str(v)
        return out

    def page_font_decoders(self, page: dict) -> dict:
        """Per-font text decoders for a page (PDF §9.6-9.10): /ToUnicode
        CMaps win, then simple-font /Encoding (base name or /BaseEncoding
        + /Differences); fonts with neither fall back to the default
        utf-8/latin-1 decoding.  Malformed font dicts are skipped — text
        extraction must never throw for one bad font."""
        try:
            res = self.resolve(page.get("Resources"))
        except ValueError:
            return {}
        return self._font_decoders_from_res(res)

    def _font_decoders_from_res(self, res) -> dict:
        """page_font_decoders body over an already-resolved /Resources
        dict (shared with Form XObject resource scopes)."""
        from .pdftext import (
            FontDecoder,
            encoding_decoder,
            parse_tounicode_cmap,
        )

        out: dict[str, FontDecoder] = {}
        try:
            fonts = self.resolve(res.get("Font")) if isinstance(res, dict) else None
        except ValueError:
            return out
        if not isinstance(fonts, dict):
            return out
        for name, ref in fonts.items():
            try:
                f = self.resolve(ref)
                if not isinstance(f, dict):
                    continue
                tu = self.resolve(f.get("ToUnicode"))
                if isinstance(tu, PdfStream):
                    out[str(name)] = FontDecoder(
                        cmap=parse_tounicode_cmap(tu.data()))
                    continue
                enc = f.get("Encoding")
                if enc is not None:
                    out[str(name)] = encoding_decoder(
                        self.resolve(enc), self.resolve)
            except Exception:  # noqa: BLE001
                continue
        return out

    def has_fonts(self) -> bool:
        """pdffonts stand-in (reference pdf2pdfocr.py:1215-1227): any page
        resources declaring a font => the PDF carries a text layer."""
        try:
            for page in self.pages():
                res = self.resolve(page.get("Resources"))
                if isinstance(res, dict):
                    fonts = self.resolve(res.get("Font"))
                    if isinstance(fonts, dict) and fonts:
                        return True
        except ValueError:
            pass
        # fallback: any object of /Type /Font
        return bool(re.search(rb"/Type\s*/Font\b", self.data))


_TEXT_OP_RE = re.compile(
    rb"""
    (\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>)\s*(Tj|')   # single-string ops
    | (\[(?:[^\]\\]|\\.)*\])\s*TJ                       # array op
    """,
    re.X | re.S,
)
_STR_IN_ARRAY_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>")
# Tf operator: current-font selection ("/F1 11 Tf") — tracked so strings
# decode through the right font's encoding/CMap
_TF_RE = re.compile(rb"/([^\s/<>\[\]()%]+)\s+[-+.\d]+\s+Tf")
_TF_OR_TEXT_RE = re.compile(
    _TF_RE.pattern + rb"|" + _TEXT_OP_RE.pattern, re.X | re.S
)


def _raw_pdf_string(tok: bytes) -> bytes:
    if tok.startswith(b"("):
        lex = _Lexer(tok, 0)
        return lex.parse_literal_string()
    hx = re.sub(rb"[^0-9A-Fa-f]", b"", tok[1:-1])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode())


def _decode_pdf_string(tok: bytes, decoder=None) -> str:
    raw = _raw_pdf_string(tok)
    if decoder is not None:
        return decoder(raw)
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def extract_text_lines(content: bytes, fonts: dict | None = None) -> list[str]:
    """Text-showing operators of a decoded content stream -> lines.

    One line per Tj/'/\" op; a TJ array's strings concatenate into one
    line (kerning numbers dropped) — a deterministic, simple model of the
    reference's text-layer walk (hOCR line semantics).  ``fonts`` (from
    :meth:`PdfDocument.page_font_decoders`) maps resource font names to
    decoders; Tf operators are tracked so each string decodes through the
    font selected at that point (ToUnicode CMaps, /Differences
    encodings).  Without ``fonts`` the historical utf-8/latin-1 decode
    applies."""
    lines: list[str] = []
    decoder = None
    # blank inline-image binary data (it can contain byte runs that
    # look like text-showing operators) before the operator scan
    content = _blank_inline_spans(content)
    for m in _TF_OR_TEXT_RE.finditer(content):
        if m.group(1) is not None:  # Tf: switch current font
            if fonts is not None:
                decoder = fonts.get(m.group(1).decode("latin-1"))
            continue
        if m.group(2) is not None:
            lines.append(_decode_pdf_string(m.group(2), decoder))
        else:
            parts = [
                _decode_pdf_string(t, decoder)
                for t in _STR_IN_ARRAY_RE.findall(m.group(4))
            ]
            lines.append("".join(parts))
    return lines
