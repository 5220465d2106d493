"""M13 boilerplate-strip unit tests (SURVEY.md §5.2 item 1): container
stripping, link density, min length, nesting, mis-nesting tolerance."""

from __future__ import annotations

from pdf2pdfocr_ray.functions.boilerplate import extract_main_text

PARA = "This is a long enough paragraph of real article content here."


def test_keeps_content_drops_chrome():
    html = f"""
    <html><body>
      <header><h1>Site title that is long enough to pass</h1></header>
      <nav><ul><li><a href="/">home</a></li><li><a href="/b">blog</a></li></ul></nav>
      <article><p>{PARA}</p></article>
      <footer><div>copyright notice that is also long enough here</div></footer>
    </body></html>"""
    assert extract_main_text(html) == PARA


def test_link_farm_dropped():
    farm = " ".join(f'<a href="/t/{i}">some link text {i}</a>' for i in range(8))
    html = f"<body><div>{farm}</div><p>{PARA}</p></body>"
    assert extract_main_text(html) == PARA


def test_short_blocks_dropped():
    html = f"<body><p>tiny</p><p>{PARA}</p></body>"
    assert extract_main_text(html) == PARA


def test_nested_blocks_no_double_count():
    html = f"<body><div><p>{PARA}</p></div></body>"
    # inner <p> owns the text; outer <div> is empty -> exactly one copy
    assert extract_main_text(html) == PARA


def test_document_order_and_separator():
    p2 = "Another sufficiently long paragraph with different words in it."
    html = f"<body><p>{PARA}</p><p>{p2}</p></body>"
    assert extract_main_text(html) == f"{PARA}\n\n{p2}"


def test_misnested_tags_tolerated():
    html = f"<body><div><p>{PARA}</div></p><p>{PARA}</p></body>"
    out = extract_main_text(html)
    assert PARA in out


def test_unclosed_block_flushed_at_eof():
    html = f"<body><p>{PARA}"
    assert extract_main_text(html) == PARA


def test_whitespace_collapsed():
    html = f"<body><p>  {PARA.replace(' ', '   ')}  </p></body>"
    assert extract_main_text(html) == PARA


def test_charrefs_decoded():
    html = "<body><p>R&amp;D spending reached an all-time high this quarter.</p></body>"
    assert "R&D" in extract_main_text(html)


def test_empty_and_textless():
    assert extract_main_text("") == ""
    assert extract_main_text("<body><nav><a href='/'>x</a></nav></body>") == ""


def test_script_nested_in_content_container_never_leaks():
    """Regression: junk inside <script>/<style> nested WITHIN a content
    block (here <article>) used to be attributed to the container block
    and emitted as content."""
    from pdf2pdfocr_ray.functions.boilerplate import extract_main_text

    html = (
        "<article>"
        "<script>var x = '<p>not text</p>'; longer junk here junk</script>"
        "<style>p { color: red; margin: 0 auto too long }</style>"
        "<p>The only real paragraph of this page, long enough to keep.</p>"
        "some stray article tail text that is long enough to keep too"
        "</article>"
    )
    out = extract_main_text(html)
    # block order is OPEN order: the <article> block (carrying its stray
    # direct text) opened before the <p>
    assert out == (
        "some stray article tail text that is long enough to keep too\n\n"
        "The only real paragraph of this page, long enough to keep."
    )


def test_decode_html_bytes_charset_sniffing():
    """WHATWG-ish decode order: BOM -> meta charset -> UTF-8 -> cp1252."""
    from pdf2pdfocr_ray.functions.boilerplate import decode_html_bytes

    s = "<html><body><p>São naïve crédito</p></body></html>"
    assert decode_html_bytes(s.encode("utf-8")) == s
    assert decode_html_bytes(b"\xef\xbb\xbf" + s.encode("utf-8")) == s
    assert decode_html_bytes(s.encode("utf-16")) == s       # LE BOM
    assert decode_html_bytes(
        b"\xfe\xff" + s.encode("utf-16-be")) == s           # BE BOM
    for label in ("windows-1252", "ISO-8859-1", "latin1"):
        tagged = s.replace(
            "<html>", f'<html><head><meta charset="{label}"></head>')
        assert decode_html_bytes(tagged.encode("cp1252")) == tagged
    # http-equiv form
    he = ('<html><head><meta http-equiv="Content-Type" '
          'content="text/html; charset=iso-8859-1"></head>'
          "<body>ação</body></html>")
    assert decode_html_bytes(he.encode("cp1252")) == he
    # mislabeled: declared 8859-1 but bytes are valid UTF-8 that cp1252
    # would mojibake — cp1252 decode "succeeds" byte-wise, so the label
    # wins (same as browsers); undeclared invalid UTF-8 falls to cp1252
    assert decode_html_bytes(b"<p>caf\xe9</p>") == "<p>café</p>"
    # undeclared valid UTF-8 stays UTF-8
    assert decode_html_bytes("<p>café</p>".encode()) == "<p>café</p>"


def test_inline_svg_and_mathml_never_leak():
    """Foreign content inside a kept paragraph (SVG icons with
    <title>/<desc>/<text> accessibility labels, MathML source) is
    markup, not prose — readability-style extractors drop it."""
    from pdf2pdfocr_ray.functions.boilerplate import extract_main_text

    para = "This paragraph carries enough characters to clear the keep threshold."
    html = (
        "<html><body><article><p>"
        + para.replace("threshold.",
                       'threshold.<svg viewBox="0 0 24 24"><title>Share</title>'
                       '<desc>share icon</desc><text x="0" y="9">Menu</text>'
                       '<path d="M3 6h18"/></svg>')
        + '<math><mi>x</mi><mo>=</mo><mn>42</mn></math>'
        + "</p></article></body></html>"
    )
    out = extract_main_text(html)
    assert out == para
    for leak in ("Share", "share icon", "Menu", "42"):
        assert leak not in out


def test_extractor_golden_property_random_dom():
    """Property test over randomized DOM trees: for any interleaving of
    content paragraphs, boilerplate containers, nesting, inline markup
    and foreign content, the extraction equals the hand-derived golden
    (content blocks in document order, collapsed, "\\n\\n"-joined) —
    the context-free contract the byte-identity gate relies on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdf2pdfocr_ray.functions.boilerplate import extract_main_text

    words = st.lists(
        st.text(alphabet="abcdefghijklmnop", min_size=3, max_size=8),
        min_size=8, max_size=20,
    ).map(lambda ws: " ".join(ws))  # >= 8*3+7 = 31 chars > MIN_CHARS

    para = st.tuples(st.just("para"), words)
    junk = st.tuples(
        st.sampled_from(["nav", "footer", "aside", "script", "style",
                         "svg", "template"]),
        words,
    )
    item = st.one_of(para, junk)

    @given(st.lists(item, min_size=1, max_size=12),
           st.integers(min_value=0, max_value=3))
    @settings(max_examples=60, deadline=None)
    def check(items, wrap_depth):
        body, golden = [], []
        for kind, text in items:
            if kind == "para":
                # inline markup + a short link (link density stays far
                # below the 0.3 cutoff: 4 chars over >= 31)
                first, _, rest = text.partition(" ")
                html = f"<p><b>{first}</b> {rest} <a href='/x'>more</a></p>"
                body.append(html)
                golden.append(f"{first} {rest} more")
            else:
                body.append(f"<{kind}><p>{text}</p></{kind}>"
                            if kind not in ("script", "style", "svg")
                            else f"<{kind}>{text}</{kind}>")
        inner = "\n".join(body)
        for _ in range(wrap_depth):  # nesting in block containers
            inner = f"<div>\n{inner}\n</div>"
        doc = f"<html><body><article>{inner}</article></body></html>"
        assert extract_main_text(doc) == "\n\n".join(golden)

    check()


def test_charset_sniff_roundtrip_property():
    """For any latin-region text: declaring the charset in <meta> (or a
    UTF-16/UTF-8 BOM) always decodes back to the original characters
    through the WHATWG sniffing order."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdf2pdfocr_ray.functions.boilerplate import decode_html_bytes

    # cp1252-encodable text incl. the 0x80-0x9F smart-punct region
    latin = st.text(
        alphabet="abc déèñü€”—•œž ", min_size=1, max_size=40
    )

    @given(latin, st.sampled_from(["cp1252-meta", "utf8-meta",
                                   "utf8-bom", "utf16-bom"]))
    @settings(max_examples=80, deadline=None)
    def check(text, mode):
        doc = f"<html><head>META</head><body><p>{text}</p></body></html>"
        if mode == "cp1252-meta":
            payload = doc.replace(
                "META", '<meta charset="windows-1252">').encode("cp1252")
        elif mode == "utf8-meta":
            payload = doc.replace(
                "META", '<meta charset="UTF-8">').encode("utf-8")
        elif mode == "utf8-bom":
            payload = b"\xef\xbb\xbf" + doc.replace("META", "").encode("utf-8")
        else:
            payload = doc.replace("META", "").encode("utf-16")  # BOM'd
        out = decode_html_bytes(payload)
        assert text in out

    check()


def test_meta_robots_directives_parsing():
    """Robots-meta forms real pages carry: case-insensitive tag/attr
    names, quoted/unquoted values, comma splitting, lookalike metas not
    counted, body placement accepted (crawler behavior), truncated
    trailing tags discarded without raising."""
    from pdf2pdfocr_ray.functions.boilerplate import meta_robots_directives as m

    assert m('<head><META NAME="ROBOTS" CONTENT="NOINDEX, nofollow"></head>') \
        == ["noindex", "nofollow"]
    assert m("<meta name=robots content=none>") == ["none"]
    assert m("<meta name='robots' content=' noarchive , nosnippet '>") \
        == ["noarchive", "nosnippet"]
    assert m('<meta name="description" content="noindex is a word">') == []
    assert m('<body><meta name=robots content="noarchive"></body>') \
        == ["noarchive"]
    assert m("<p>broken <<< <meta name=robots content=noindex") == []
    assert m("") == []


def test_meta_robots_flags_stage(ray_session):
    """The flag op over a batch: none implies noindex+nofollow; bytes
    payloads decode through the charset sniff first."""
    import pyarrow as pa

    from pdf2pdfocr_ray.ops.text_analysis import meta_robots_flags
    import ray.data

    pages = [
        b'<html><head><meta name="robots" content="noindex"></head></html>',
        b"<html><head><meta name=robots content=none></head></html>",
        "<html><head><meta name='robots' content='nofollow'></head></html>",
        b"<html><head></head><body>plain</body></html>",
    ]
    t = pa.table({"html": pa.array(
        [p if isinstance(p, bytes) else p.encode() for p in pages],
        pa.binary())})
    out = meta_robots_flags(ray.data.from_arrow(t)).to_pandas()
    assert out["noindex"].tolist() == [True, True, False, False]
    assert out["nofollow"].tolist() == [False, True, True, False]
    assert out["noarchive"].tolist() == [False, False, False, False]


def test_canonical_link_parsing_and_dedup_stage(ray_session):
    """Canonical-link forms: rel token lists, case-insensitive, first
    declaration wins, empty href ignored; the stage flags only pages
    declaring a DIFFERENT url."""
    import pyarrow as pa
    import ray.data

    from pdf2pdfocr_ray.functions.boilerplate import canonical_link as c
    from pdf2pdfocr_ray.ops.text_analysis import canonical_dedup

    assert c('<link rel="canonical" href="https://a/x">') == "https://a/x"
    assert c("<LINK REL='Canonical NOFOLLOW' HREF='https://a/y'>") == "https://a/y"
    assert c('<link rel="canonical" href="">') is None
    assert c('<link rel="stylesheet" href="https://a/css">') is None
    assert c('<link rel=canonical href=/first><link rel=canonical href=/second>') == "/first"
    assert c("") is None

    t = pa.table({
        "url": pa.array(["https://a/1", "https://a/2", "https://a/3"], pa.string()),
        "html": pa.array([
            b'<head><link rel="canonical" href="https://a/1"></head>',  # self
            b'<head><link rel="canonical" href="https://a/1"></head>',  # dup of 1
            b"<head></head>",                                           # none
        ], pa.binary()),
    })
    out = canonical_dedup(ray.data.from_arrow(t)).to_pandas().sort_values("url")
    assert out["is_canonical_dup"].tolist() == [False, True, False]
    assert out["canonical_url"].tolist() == ["https://a/1", "https://a/1", "https://a/3"]


def test_extract_links_forms_and_resolution():
    """Link extraction: duplicates preserved (edge weights), fragment/
    javascript/mailto/tel/data skipped, relative hrefs resolve against
    the base url per RFC 3986, nested markup inside the anchor is fine."""
    from pdf2pdfocr_ray.functions.boilerplate import extract_links as ex

    html = (
        '<a href="https://b.org/x">one</a>'
        '<a href="https://b.org/x"><b>again</b></a>'
        '<a href="#section">frag</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a href="mailto:a@b.c">mail</a>'
        '<a href="/rel/path">rel</a>'
        '<a href="sibling">sib</a>'
        '<a href="../up">up</a>'
    )
    assert ex(html) == ["https://b.org/x", "https://b.org/x", "/rel/path",
                        "sibling", "../up"]
    assert ex(html, base_url="https://a.org/dir/page.html") == [
        "https://b.org/x", "https://b.org/x",
        "https://a.org/rel/path",
        "https://a.org/dir/sibling",
        "https://a.org/up",
    ]
    assert ex("") == []


def test_extract_links_base_href():
    """<base href> overrides the resolution base for relative links
    (first base wins; the base itself resolves against the page url)."""
    from pdf2pdfocr_ray.functions.boilerplate import extract_links as ex

    h = ('<base href="https://cdn.example/assets/">'
         '<base href="https://ignored.example/">'
         '<a href="img/x">l</a><a href="https://abs.org/y">m</a>')
    assert ex(h, base_url="https://a.org/page") == [
        "https://cdn.example/assets/img/x", "https://abs.org/y"]
    # relative base resolves against the page url first
    assert ex('<base href="/en/"><a href="doc">l</a>',
              base_url="https://a.org/fr/page") == ["https://a.org/en/doc"]
    # base without page url: used as-is
    assert ex('<base href="https://b.org/"><a href="p">l</a>') == [
        "https://b.org/p"]
