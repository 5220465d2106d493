"""Font-encoding-aware PDF text decoding (PDF 32000-1 §9.6-9.10).

Real-world PDFs rarely store text as Latin-1 bytes: simple fonts carry
an /Encoding (a base encoding name plus /Differences remapping byte
codes to glyph NAMES), and composite/subset fonts carry a /ToUnicode
CMap mapping 1- or 2-byte codes to UTF-16BE strings.  The reference
gets all of this free from poppler's text machinery; this module gives
`pdfparse.extract_text_lines` the same capability:

* `parse_tounicode_cmap` — tolerant parser for the CMap operators that
  matter (codespacerange / bfchar / bfrange, incl. array-form ranges),
* `encoding_decoder` — WinAnsi (cp1252), MacRoman, Standard and
  /Differences handling via a core Adobe-Glyph-List subset plus the
  uniXXXX / uXXXXXX algorithmic names,
* `FontDecoder` — per-font callable bytes -> str.

Only public sources: the PDF spec, the Adobe Glyph List convention
(glyph names for ASCII/Latin-1 and the fi/fl ligatures), and Python's
own cp1252 / mac_roman codecs.
"""
from __future__ import annotations

import re

# ---------------------------------------------------------- glyph names
# Core AGL subset: ASCII + Latin-1 punctuation/letters + the ligatures the
# corpus pins (fi/fl).  Algorithmic uniXXXX/uXXXX(XX) names are handled in
# code.  Reverse map (char -> name) drives the fixture writer.
_AGL_BASE = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@",
    "bracketleft": "[", "backslash": "\\", "bracketright": "]",
    "asciicircum": "^", "underscore": "_", "grave": "`",
    "braceleft": "{", "bar": "|", "braceright": "}", "asciitilde": "~",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "endash": "–", "emdash": "—", "bullet": "•",
    "fi": "ﬁ", "fl": "ﬂ",
    "adieresis": "ä", "odieresis": "ö", "udieresis": "ü",
    "Adieresis": "Ä", "Odieresis": "Ö", "Udieresis": "Ü",
    "eacute": "é", "egrave": "è", "ecircumflex": "ê",
    "agrave": "à", "aacute": "á", "acircumflex": "â",
    "ccedilla": "ç", "ntilde": "ñ", "germandbls": "ß",
    "oslash": "ø", "aring": "å", "ae": "æ",
    # common names real subset fonts put in /Differences
    "Euro": "€", "florin": "ƒ", "trademark": "™",
    "copyright": "©", "registered": "®", "degree": "°",
    "plusminus": "±", "multiply": "×", "divide": "÷",
    "onehalf": "½", "onequarter": "¼", "threequarters": "¾",
    "onesuperior": "¹", "twosuperior": "²", "threesuperior": "³",
    "cent": "¢", "sterling": "£", "yen": "¥", "currency": "¤",
    "section": "§", "paragraph": "¶", "brokenbar": "¦",
    "dagger": "†", "daggerdbl": "‡", "ellipsis": "…",
    "perthousand": "‰", "minus": "−", "fraction": "⁄",
    "guillemotleft": "«", "guillemotright": "»",
    "guilsinglleft": "‹", "guilsinglright": "›",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "exclamdown": "¡", "questiondown": "¿",
    "periodcentered": "·",
    "circumflex": "ˆ", "tilde": "˜", "macron": "¯",
    "dieresis": "¨", "acute": "´", "cedilla": "¸",
    "ordfeminine": "ª", "ordmasculine": "º",
    "logicalnot": "¬", "mu": "µ",
    "scaron": "š", "Scaron": "Š", "zcaron": "ž", "Zcaron": "Ž",
    "ydieresis": "ÿ", "Ydieresis": "Ÿ",
    "oe": "œ", "OE": "Œ", "lslash": "ł", "Lslash": "Ł",
    "dotlessi": "ı", "thorn": "þ", "Thorn": "Þ", "eth": "ð",
    "Eth": "Ð", "AE": "Æ", "Oslash": "Ø", "Aring": "Å",
    "icircumflex": "î", "idieresis": "ï", "igrave": "ì",
    "iacute": "í", "ocircumflex": "ô", "ograve": "ò",
    "oacute": "ó", "otilde": "õ", "ucircumflex": "û",
    "ugrave": "ù", "uacute": "ú", "yacute": "ý",
    "atilde": "ã", "edieresis": "ë", "Ccedilla": "Ç",
    "Eacute": "É", "Egrave": "È", "Agrave": "À", "Aacute": "Á",
    "Ntilde": "Ñ",
}
for _c in range(ord("A"), ord("Z") + 1):
    _AGL_BASE[chr(_c)] = chr(_c)
for _c in range(ord("a"), ord("z") + 1):
    _AGL_BASE[chr(_c)] = chr(_c)

GLYPH_TO_CHAR = _AGL_BASE
CHAR_TO_GLYPH = {v: k for k, v in _AGL_BASE.items()}


def glyph_name_to_char(name: str) -> str | None:
    """AGL subset + algorithmic uniXXXX / uXXXX-XXXXXX names."""
    ch = GLYPH_TO_CHAR.get(name)
    if ch is not None:
        return ch
    if name.startswith("uni") and len(name) >= 7:
        try:
            return chr(int(name[3:7], 16))
        except ValueError:
            return None
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            return chr(int(name[1:], 16))
        except ValueError:
            return None
    return None


# ----------------------------------------------------------- encodings
def _codec_table(codec: str) -> dict[int, str]:
    out = {}
    for b in range(256):
        try:
            out[b] = bytes([b]).decode(codec)
        except UnicodeDecodeError:
            pass
    return out


_WINANSI = _codec_table("cp1252")
_MACROMAN = _codec_table("mac_roman")
# Adobe StandardEncoding (PDF 32000-1 Appendix D.2): ASCII range matches
# Latin-1 except quotes/grave; the high region is its own layout
# (ligatures, accents, guillemets) quite unlike Latin-1.
_STANDARD = {b: chr(b) for b in range(32, 127)}
_STANDARD[0x27] = "’"  # quoteright
_STANDARD[0x60] = "‘"  # quoteleft
_STANDARD.update({
    0xA1: "¡", 0xA2: "¢", 0xA3: "£", 0xA4: "⁄", 0xA5: "¥",
    0xA6: "ƒ", 0xA7: "§", 0xA8: "¤", 0xA9: "'", 0xAA: "“",
    0xAB: "«", 0xAC: "‹", 0xAD: "›", 0xAE: "ﬁ", 0xAF: "ﬂ",
    0xB1: "–", 0xB2: "†", 0xB3: "‡", 0xB4: "·", 0xB6: "¶",
    0xB7: "•", 0xB8: "‚", 0xB9: "„", 0xBA: "”", 0xBB: "»",
    0xBC: "…", 0xBD: "‰", 0xBF: "¿",
    0xC1: "`", 0xC2: "´", 0xC3: "ˆ", 0xC4: "˜", 0xC5: "¯",
    0xC6: "˘", 0xC7: "˙", 0xC8: "¨", 0xCA: "˚", 0xCB: "¸",
    0xCD: "˝", 0xCE: "˛", 0xCF: "ˇ",
    0xD0: "—",
    0xE1: "Æ", 0xE3: "ª", 0xE8: "Ł", 0xE9: "Ø", 0xEA: "Œ",
    0xEB: "º",
    0xF1: "æ", 0xF5: "ı", 0xF8: "ł", 0xF9: "ø", 0xFA: "œ",
    0xFB: "ß",
})

_BASE_ENCODINGS = {
    "WinAnsiEncoding": _WINANSI,
    "MacRomanEncoding": _MACROMAN,
    "StandardEncoding": _STANDARD,
}

# PDFDocEncoding (PDF 32000-1 Table D.2): the encoding of text strings
# OUTSIDE content streams (Info dict, outlines).  Identical to Latin-1
# except 0x18-0x1F (accents) and 0x80-0x9F (typographic punctuation) —
# the ranges below; 0x7F and 0xAD are undefined.
_PDFDOC_DELTAS = {
    0x18: "˘", 0x19: "ˇ", 0x1A: "ˆ", 0x1B: "˙",
    0x1C: "˝", 0x1D: "˛", 0x1E: "˚", 0x1F: "˜",
    0x80: "•", 0x81: "†", 0x82: "‡", 0x83: "…",
    0x84: "—", 0x85: "–", 0x86: "ƒ", 0x87: "⁄",
    0x88: "‹", 0x89: "›", 0x8A: "−", 0x8B: "‰",
    0x8C: "„", 0x8D: "“", 0x8E: "”", 0x8F: "‘",
    0x90: "’", 0x91: "‚", 0x92: "™", 0x93: "ﬁ",
    0x94: "ﬂ", 0x95: "Ł", 0x96: "Œ", 0x97: "Š",
    0x98: "Ÿ", 0x99: "Ž", 0x9A: "ı", 0x9B: "ł",
    0x9C: "œ", 0x9D: "š", 0x9E: "ž",
}


def pdfdoc_decode(raw: bytes) -> str:
    """Decode a PDF *text string* (§7.9.2.2) outside a content stream:
    UTF-16BE with BOM, else UTF-8 if it parses (modern producers), else
    PDFDocEncoding."""
    if raw.startswith(b"\xfe\xff"):
        return raw[2:].decode("utf-16-be", "replace")
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return "".join(
            _PDFDOC_DELTAS.get(b, chr(b)) for b in raw)


class FontDecoder:
    """Callable decoding one PDF string's raw bytes to text for a font.

    ``table``: byte -> str (simple fonts).  ``cmap``: (nbytes, dict) for
    ToUnicode composite fonts.  Falls back to the historical behavior
    (utf-8 then latin-1) when neither is given."""

    __slots__ = ("table", "cmap_codelen", "cmap")

    def __init__(self, table: dict[int, str] | None = None,
                 cmap: tuple[int, dict[int, str]] | None = None):
        self.table = table
        if cmap is not None:
            self.cmap_codelen, self.cmap = cmap
        else:
            self.cmap_codelen, self.cmap = 0, None

    def __call__(self, raw: bytes) -> str:
        if self.cmap is not None:
            n = self.cmap_codelen
            out = []
            for i in range(0, len(raw) - n + 1, n):
                code = int.from_bytes(raw[i : i + n], "big")
                out.append(self.cmap.get(code, "�"))
            return "".join(out)
        if self.table is not None:
            return "".join(self.table.get(b, "�") for b in raw)
        try:
            return raw.decode("utf-8")
        except UnicodeDecodeError:
            return raw.decode("latin-1")


DEFAULT_DECODER = FontDecoder()


def encoding_decoder(encoding, resolve) -> FontDecoder:
    """Build a simple-font decoder from an /Encoding entry (a base
    encoding name, or a dict with /BaseEncoding + /Differences)."""
    if isinstance(encoding, str) and not isinstance(encoding, bytes):
        if str(encoding) in ("Identity-H", "Identity-V"):
            # Composite font with NO ToUnicode: codes are 2-byte glyph
            # ids of an embedded font we don't parse.  Poppler reads the
            # font's internal cmap; without that, decoding the id bytes
            # as Latin-1 would be silent mojibake — emit replacement
            # chars instead (honest "text present but undecodable").
            return FontDecoder(cmap=(2, {}))
        table = _BASE_ENCODINGS.get(str(encoding))
        return FontDecoder(table=dict(table)) if table else DEFAULT_DECODER
    if not isinstance(encoding, dict):
        return DEFAULT_DECODER
    base = str(encoding.get("BaseEncoding", "StandardEncoding"))
    table = dict(_BASE_ENCODINGS.get(base, _STANDARD))
    diffs = resolve(encoding.get("Differences"))
    if isinstance(diffs, list):
        code = 0
        for item in diffs:
            if isinstance(item, (int, float)):
                code = int(item)
            else:
                ch = glyph_name_to_char(str(item))
                if ch is not None:
                    table[code] = ch
                else:
                    table.pop(code, None)  # unknown glyph -> replacement
                code += 1
    return FontDecoder(table=table)


# ------------------------------------------------------- ToUnicode CMaps
_HEX = rb"<([0-9A-Fa-f\s]*)>"
_CSR_RE = re.compile(
    rb"begincodespacerange(.*?)endcodespacerange", re.S)
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_PAIR_RE = re.compile(_HEX + rb"\s*" + _HEX)
_RANGE_RE = re.compile(
    _HEX + rb"\s*" + _HEX + rb"\s*(?:" + _HEX + rb"|\[(.*?)\])", re.S)


def _hx(h: bytes) -> bytes:
    h = re.sub(rb"\s+", b"", h)
    return bytes.fromhex(h.decode("ascii")) if h else b""


def _utf16be(b: bytes) -> str:
    try:
        return b.decode("utf-16-be")
    except UnicodeDecodeError:
        return "�"


# Total-WORK bomb guard: a legitimate ToUnicode CMap cannot exceed the
# 2-byte code space (65536 codes); 2x leaves headroom for multi-CMap
# junk.  The budget counts mappings WRITTEN (not distinct codes), so a
# few KB of ranges re-mapping the same span can't buy millions of loop
# iterations either.
_MAX_CMAP_ENTRIES = 1 << 17


def parse_tounicode_cmap(data: bytes) -> tuple[int, dict[int, str]]:
    """ToUnicode CMap stream -> (code_length_bytes, code -> text).

    Tolerant: code length comes from the first codespacerange (falling
    back to the bfchar/bfrange source width, then 1); bfrange supports
    both the incrementing-destination and array forms (§9.10.3).

    Bomb-guarded: a few KB of malicious bfranges (<0000> <FFFF> ...)
    could otherwise expand to hundreds of millions of dict writes —
    total writes are capped at ``_MAX_CMAP_ENTRIES`` (a legitimate
    ToUnicode can't exceed the 2-byte code space anyway)."""
    codelen = 0
    m = _CSR_RE.search(data)
    if m:
        first = re.search(_HEX, m.group(1))
        if first:
            codelen = max(1, len(_hx(first.group(1))))
    mapping: dict[int, str] = {}
    budget = _MAX_CMAP_ENTRIES  # counts WRITES, not distinct codes
    for m in _BFCHAR_RE.finditer(data):
        for src, dst in _PAIR_RE.findall(m.group(1)):
            if budget <= 0:
                return (codelen or 1), mapping
            budget -= 1
            s = _hx(src)
            if not codelen:
                codelen = len(s) or 1
            mapping[int.from_bytes(s, "big")] = _utf16be(_hx(dst))
    for m in _BFRANGE_RE.finditer(data):
        for lo, hi, dst, arr in _RANGE_RE.findall(m.group(1)):
            if budget <= 0:
                return (codelen or 1), mapping
            lo_b, hi_b = _hx(lo), _hx(hi)
            if not codelen:
                codelen = len(lo_b) or 1
            lo_i = int.from_bytes(lo_b, "big")
            hi_i = int.from_bytes(hi_b, "big")
            if hi_i - lo_i > 65535:  # sanity cap on malformed ranges
                hi_i = lo_i + 65535
            hi_i = min(hi_i, lo_i + budget - 1)
            budget -= max(1, hi_i - lo_i + 1)
            if arr:
                dsts = [_hx(h) for h in re.findall(_HEX, arr)]
                for off, d in enumerate(dsts):
                    if lo_i + off > hi_i:
                        break
                    mapping[lo_i + off] = _utf16be(d)
            else:
                base = _hx(dst)
                if not base:
                    continue
                base_i = int.from_bytes(base, "big")
                # incrementing form increments the LAST code unit
                prefix, last = base[:-2], base[-2:]
                last_i = int.from_bytes(last, "big") if len(base) >= 2 else base_i
                for off in range(hi_i - lo_i + 1):
                    if len(base) > 2:
                        u = last_i + off
                        if u > 0xFFFF:  # malformed: last unit overflows
                            break
                        mapping[lo_i + off] = _utf16be(
                            prefix + u.to_bytes(2, "big"))
                    else:
                        u = base_i + off
                        if u > 0xFFFF:
                            break
                        mapping[lo_i + off] = _utf16be(
                            u.to_bytes(max(2, len(base)), "big"))
    return (codelen or 1), mapping
