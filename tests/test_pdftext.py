"""Font-encoding-aware PDF text decoding (functions/pdftext): glyph-name
resolution, /Differences simple-font encodings, ToUnicode CMap parsing
(both bfrange forms), Tf tracking in extract_text_lines, and end-to-end
foreign-PDF fixtures whose strings are stored as private codes yet decode
to the same golden text (PDF 32000-1 §9.6-9.10; the reference gets this
via poppler's text machinery)."""

from __future__ import annotations

import pytest

from pdf2pdfocr_ray.functions.minipdf import build_foreign_pdf, parse_pdf
from pdf2pdfocr_ray.functions.pdfparse import extract_text_lines
from pdf2pdfocr_ray.functions.pdftext import (
    FontDecoder,
    encoding_decoder,
    glyph_name_to_char,
    parse_tounicode_cmap,
)


def test_glyph_name_resolution():
    assert glyph_name_to_char("a") == "a"
    assert glyph_name_to_char("Z") == "Z"
    assert glyph_name_to_char("space") == " "
    assert glyph_name_to_char("seven") == "7"
    assert glyph_name_to_char("fi") == "ﬁ"  # AGL ligature U+FB01
    assert glyph_name_to_char("eacute") == "é"
    assert glyph_name_to_char("uni0041") == "A"
    assert glyph_name_to_char("uni20AC") == "€"
    assert glyph_name_to_char("u1F600") == "😀"
    assert glyph_name_to_char("notaglyphxx") is None


def test_widened_agl_names_resolve_by_name():
    """The widened table region: names real subset fonts put in
    /Differences must resolve via the NAME table (not the uniXXXX
    fallback) — these are what build_foreign_pdf emits for the corpus
    symbol vocabulary."""
    for name, want in [
        ("Euro", "€"), ("florin", "ƒ"), ("trademark", "™"),
        ("onehalf", "½"), ("threequarters", "¾"), ("guillemotleft", "«"),
        ("guillemotright", "»"), ("quotedblbase", "„"), ("Scaron", "Š"),
        ("zcaron", "ž"), ("oe", "œ"), ("OE", "Œ"), ("Lslash", "Ł"),
        ("Thorn", "Þ"), ("eth", "ð"), ("perthousand", "‰"),
        ("daggerdbl", "‡"), ("minus", "−"), ("multiply", "×"),
        ("divide", "÷"), ("logicalnot", "¬"), ("mu", "µ"),
        ("ordfeminine", "ª"), ("ordmasculine", "º"), ("brokenbar", "¦"),
    ]:
        assert glyph_name_to_char(name) == want, name


def test_differences_encoding_decoder():
    enc = {
        "BaseEncoding": "WinAnsiEncoding",
        "Differences": [128, "a", "b", "uni0043", 200, "space"],
    }
    dec = encoding_decoder(enc, resolve=lambda x: x)
    assert dec(bytes([128, 129, 130, 200])) == "abC "
    # untouched codes fall through to the base encoding (cp1252)
    assert dec(b"Hi!") == "Hi!"
    assert dec(bytes([0x93])) == "“"  # cp1252 smart quote
    # unknown glyph name -> replacement char, never a throw
    enc2 = {"Differences": [65, "zzznope"]}
    assert encoding_decoder(enc2, resolve=lambda x: x)(b"A") == "�"


def test_base_encoding_names():
    win = encoding_decoder("WinAnsiEncoding", resolve=lambda x: x)
    assert win(bytes([0xE9])) == "é"
    mac = encoding_decoder("MacRomanEncoding", resolve=lambda x: x)
    assert mac(bytes([0x8E])) == "é"  # mac_roman é
    std = encoding_decoder("StandardEncoding", resolve=lambda x: x)
    assert std(b"abc'") == "abc’"  # quoteright in StandardEncoding


def test_tounicode_cmap_bfchar_and_both_bfrange_forms():
    cmap = b"""
    1 begincodespacerange <0000> <FFFF> endcodespacerange
    2 beginbfchar
    <0001> <0048>
    <0002> <0065006C>
    endbfchar
    2 beginbfrange
    <0010> <0012> <0041>
    <0020> <0021> [<00580059> <005A>]
    endbfrange
    """
    n, m = parse_tounicode_cmap(cmap)
    assert n == 2
    assert m[1] == "H"
    assert m[2] == "el"  # multi-unit destination
    assert (m[0x10], m[0x11], m[0x12]) == ("A", "B", "C")  # incrementing
    assert m[0x20] == "XY" and m[0x21] == "Z"  # array form
    dec = FontDecoder(cmap=(n, m))
    assert dec(bytes.fromhex("0001000200100020")) == "HelAXY"


def test_extract_text_lines_tracks_tf():
    fonts = {
        "F1": FontDecoder(table={0x41: "X", 0x42: "Y"}),
        "F2": FontDecoder(cmap=(2, {1: "one", 2: "two"})),
    }
    content = (
        b"BT /F1 10 Tf (AB) Tj /F2 9.5 Tf <00010002> Tj "
        b"/F1 10 Tf [(A) -250 (B)] TJ ET"
    )
    assert extract_text_lines(content, fonts) == ["XY", "onetwo", "XY"]
    # without fonts: historical utf-8/latin-1 behavior
    assert extract_text_lines(b"(Plain) Tj") == ["Plain"]


@pytest.mark.parametrize("mode", ["differences", "tounicode"])
def test_encoded_foreign_pdf_golden_text(mode):
    pages = [
        ["Hello encoded world", "with ligature ﬁle stuff"],
        ["page two: é and ü chars!"],
    ]
    ref = [p.lines for p in parse_pdf(build_foreign_pdf(pages)).pages]
    d = parse_pdf(build_foreign_pdf(pages, text_encoding=mode))
    assert [p.lines for p in d.pages] == ref


def test_encoded_foreign_pdf_survives_encryption():
    """Encoding + encryption compose: a ToUnicode foreign PDF that is
    also permissions-encrypted still extracts the golden text."""
    from pdf2pdfocr_ray.functions.pdfcrypt import encrypt_pdf

    pages = [["composed crypto text", "second line"]]
    plain = build_foreign_pdf(pages, text_encoding="tounicode")
    ref = [p.lines for p in parse_pdf(plain).pages]
    d = parse_pdf(encrypt_pdf(plain, "aes-128"))
    assert [p.lines for p in d.pages] == ref


def test_malformed_font_dict_never_throws():
    """A damaged /ToUnicode stream or garbage /Encoding must fall back,
    not break the page."""
    pdf = build_foreign_pdf([["fallback text"]], text_encoding="plain")
    # plain build has no encoding machinery; direct API-level checks:
    n, m = parse_tounicode_cmap(b"beginbfchar <01 endbfchar")
    assert isinstance(m, dict)
    dec = encoding_decoder(12345, resolve=lambda x: x)  # nonsense entry
    assert dec(b"ok") == "ok"
    assert parse_pdf(pdf).pages[0].lines == ["fallback text"]


def test_identity_h_without_tounicode_is_honest_replacement():
    """A Type0 /Identity-H font with NO /ToUnicode stores 2-byte glyph
    ids of an embedded font the engine doesn't parse — decoding those
    bytes as Latin-1 would be silent mojibake.  The decoder must emit
    one replacement char per 2-byte code instead."""
    dec = encoding_decoder("Identity-H", resolve=lambda x: x)
    assert dec(b"\x00\x41\x01\x02") == "��"
    dec_v = encoding_decoder("Identity-V", resolve=lambda x: x)
    assert dec_v(b"\x00\x10") == "�"


def test_pdfdoc_encoding_metadata_strings():
    """Text strings outside content streams (Info dict) use
    PDFDocEncoding (Table D.2): typographic punctuation in 0x80-0x9F,
    not Latin-1 control chars; UTF-16BE BOM and valid UTF-8 win."""
    from pdf2pdfocr_ray.functions.pdftext import pdfdoc_decode

    assert pdfdoc_decode(b"Caf\xe9 \x84 title \x8f\x90") == "Café — title ‘’"
    assert pdfdoc_decode(b"\xfe\xff\x00H\x00i") == "Hi"
    assert pdfdoc_decode("utf8 é".encode()) == "utf8 é"
    assert pdfdoc_decode(b"plain") == "plain"


def test_standard_encoding_high_region():
    """Adobe StandardEncoding's high region (Appendix D.2) is NOT
    Latin-1: ligatures, guillemets and accents live at their own codes."""
    dec = encoding_decoder("StandardEncoding", resolve=lambda x: x)
    assert dec(b"\xae\xaf") == "ﬁﬂ"      # fi fl ligatures
    assert dec(b"\xab\xbb") == "«»"      # guillemets
    assert dec(b"\xd0\xb1") == "—–"      # em/en dash
    assert dec(b"\xe1\xf1") == "Ææ"
    assert dec(b"\xfb") == "ß"
    assert dec(b"A b!") == "A b!"        # ASCII unchanged
    assert dec(b"\x27\x60") == "’‘"      # quote remaps


def test_cmap_bomb_and_overflow_guards():
    """A few KB of malicious bfranges (<0000> <FFFF> repeated) must not
    expand to hundreds of millions of dict entries, and an incrementing
    destination that overflows its last UTF-16 code unit must stop, not
    raise OverflowError."""
    import time

    from pdf2pdfocr_ray.functions.pdftext import _MAX_CMAP_ENTRIES

    bomb = (b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
            + b"".join(
                b"1 beginbfrange\n<0000> <FFFF> <0041>\nendbfrange\n"
                for _ in range(64)))
    t0 = time.time()
    n, m = parse_tounicode_cmap(bomb)
    assert len(m) <= _MAX_CMAP_ENTRIES
    assert time.time() - t0 < 30
    # overflow of the incrementing form's last code unit
    n, m = parse_tounicode_cmap(
        b"1 beginbfrange\n<0000> <00FF> <FFFE>\nendbfrange\n")
    assert m[0] == "￾" and 2 not in m  # stopped at 0xFFFF
    n, m = parse_tounicode_cmap(
        b"1 beginbfrange\n<0000> <00FF> <D835FFFE>\nendbfrange\n")
    assert 2 not in m


def test_cmap_random_bytes_never_throw():
    """Arbitrary bytes through the CMap parser and the decoders: no
    exceptions, ever (the fuzz posture of every other parser here)."""
    import numpy as np

    from pdf2pdfocr_ray.functions.pdftext import pdfdoc_decode

    rng = np.random.default_rng(77)
    frags = [b"beginbfchar", b"endbfchar", b"beginbfrange", b"endbfrange",
             b"<", b">", b"[", b"]", b"<0041>", b"<FFFF>",
             b"begincodespacerange", b"endcodespacerange"]
    for _ in range(300):
        parts = [frags[int(rng.integers(0, len(frags)))]
                 for _ in range(int(rng.integers(1, 12)))]
        junk = bytes(rng.integers(0, 256, int(rng.integers(0, 40)),
                                  dtype=np.uint8))
        n, m = parse_tounicode_cmap(b" ".join(parts) + junk)
        assert n >= 1 and isinstance(m, dict)
        raw = bytes(rng.integers(0, 256, int(rng.integers(0, 32)),
                                 dtype=np.uint8))
        FontDecoder(cmap=(n, m))(raw)
        pdfdoc_decode(raw)
