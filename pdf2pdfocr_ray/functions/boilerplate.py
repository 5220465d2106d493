"""HTML boilerplate stripping: tag-density / link-density main-content
extraction (the north-rule's HTML branch; no reference analog — see
repo:BASELINE.json north_rule and SURVEY.md §2.2 M13).

Algorithm (deterministic, jusText/readability-style, stdlib-only):

1. stream-parse the HTML (``html.parser``, charrefs decoded);
2. text is attributed to the NEAREST enclosing block-level element — nested
   blocks never double-count their children's text;
3. a closed block is classified **content** iff
   - no ancestor is a boilerplate container (nav/header/footer/aside/form/
     script/style/noscript/template/button/select/option/iframe) — and text
     that ARRIVES while inside a boilerplate tag is never attributed at
     all, so junk nested inside a content container can't leak into it —
     and
   - its collapsed text has >= MIN_CHARS characters, and
   - its link density (chars inside <a> / total chars) < MAX_LINK_DENSITY;
4. output = content blocks in document order joined by "\\n\\n", each block's
   whitespace collapsed to single spaces and stripped.

The classification is context-free (no neighbor propagation), which makes the
extracted text an exact, order-stable function of the DOM — the property the
byte-identical golden check relies on.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

BLOCK_TAGS = frozenset(
    {
        "p",
        "h1",
        "h2",
        "h3",
        "h4",
        "h5",
        "h6",
        "li",
        "td",
        "th",
        "blockquote",
        "pre",
        "div",
        "article",
        "section",
        "main",
        "figcaption",
        "dd",
        "dt",
    }
)
BOILERPLATE_TAGS = frozenset(
    {
        "nav",
        "header",
        "footer",
        "aside",
        "form",
        "script",
        "style",
        "noscript",
        "template",
        "button",
        "select",
        "option",
        "iframe",
        # foreign content (SVG icons carry <title>/<desc>/<text>
        # accessibility labels — "Menu", "Search" — that readability-
        # style extractors never count as page text; MathML source
        # likewise is markup, not prose)
        "svg",
        "math",
    }
)
VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)
MIN_CHARS = 30
MAX_LINK_DENSITY = 0.3


def _collapse(text: str) -> str:
    return " ".join(text.split())


class _Block:
    __slots__ = ("order", "chars", "link_chars", "bad")

    def __init__(self, order: int, bad: bool) -> None:
        self.order = order
        self.chars: list[str] = []
        self.link_chars = 0
        self.bad = bad


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.block_stack: list[_Block] = []
        self.tag_stack: list[str] = []
        self.bad_depth = 0
        self.link_depth = 0
        self.order = 0
        self.kept: list[tuple[int, str]] = []

    def handle_starttag(self, tag, attrs):
        if tag in VOID_TAGS:
            return
        self.tag_stack.append(tag)
        if tag in BOILERPLATE_TAGS:
            self.bad_depth += 1
        if tag == "a":
            self.link_depth += 1
        if tag in BLOCK_TAGS:
            self.order += 1
            self.block_stack.append(_Block(self.order, self.bad_depth > 0))

    def handle_endtag(self, tag):
        if tag in VOID_TAGS:
            return
        # pop to the matching open tag (tolerates mis-nesting)
        while self.tag_stack:
            top = self.tag_stack.pop()
            if top in BOILERPLATE_TAGS:
                self.bad_depth -= 1
            if top == "a":
                self.link_depth -= 1
            if top in BLOCK_TAGS:
                self._close_block()
            if top == tag:
                break

    def _close_block(self) -> None:
        blk = self.block_stack.pop()
        text = _collapse("".join(blk.chars))
        if blk.bad or not text:
            return
        n = len(text)
        if n < MIN_CHARS:
            return
        if blk.link_chars / n >= MAX_LINK_DENSITY:
            return
        self.kept.append((blk.order, text))

    def handle_data(self, data):
        # text arriving inside a boilerplate ancestor (a <script> nested
        # in an <article>, style rules, nav text) is never attributed —
        # without this, junk nested inside a content container leaks into
        # the container's own block
        if not data or not self.block_stack or self.bad_depth > 0:
            return
        blk = self.block_stack[-1]
        blk.chars.append(data)
        if self.link_depth > 0:
            blk.link_chars += len(_collapse(data))

    def close(self):
        super().close()
        while self.tag_stack:
            top = self.tag_stack.pop()
            if top in BLOCK_TAGS:
                self._close_block()


_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+?(?:charset\s*=\s*["']?([A-Za-z0-9_\-]+))""",
    re.IGNORECASE,
)
# WHATWG encoding-standard label -> python codec, for the labels that
# dominate real crawls; iso-8859-1 maps to windows-1252 per the standard
_CHARSET_ALIASES = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "iso-8859-1": "cp1252", "iso8859-1": "cp1252", "latin-1": "cp1252",
    "latin1": "cp1252", "windows-1252": "cp1252", "cp1252": "cp1252",
    "us-ascii": "ascii", "ascii": "ascii",
    "utf-16": "utf-16", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
}


def decode_html_bytes(payload: bytes) -> str:
    """Crawl HTML bytes -> str via the WHATWG-style sniffing order:
    BOM first (UTF-8 / UTF-16 LE / UTF-16 BE), then a <meta charset=...>
    / http-equiv declaration scanned in the first 1024 bytes, then
    strict UTF-8, then the windows-1252 fallback (which never fails —
    real crawls are full of undeclared latin-ish bytes and dropping
    those rows would be a silent coverage gap)."""
    if payload[:3] == b"\xef\xbb\xbf":
        return payload.decode("utf-8-sig")
    if payload[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return payload.decode("utf-16")  # codec consumes the BOM
    m = _META_CHARSET_RE.search(payload[:1024])
    if m:
        codec = _CHARSET_ALIASES.get(m.group(1).decode("ascii").lower())
        if codec:
            try:
                return payload.decode(codec)
            except (UnicodeDecodeError, ValueError):
                pass  # mislabeled page: fall through to sniffing
    try:
        return payload.decode("utf-8")
    except UnicodeDecodeError:
        return payload.decode("cp1252", errors="replace")


def extract_main_text(html: str) -> str:
    """HTML string -> main-content text (blocks joined by blank lines)."""
    p = _Extractor()
    p.feed(html)
    p.close()
    return "\n\n".join(text for _, text in sorted(p.kept, key=lambda t: t[0]))


class _MetaRobots(HTMLParser):
    """Collects <meta name="robots" content="..."> directives."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.directives: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag != "meta":
            return
        d = {k.lower(): (v or "") for k, v in attrs}
        if d.get("name", "").strip().lower() != "robots":
            return
        for tok in d.get("content", "").split(","):
            tok = tok.strip().lower()
            if tok:
                self.directives.append(tok)


def meta_robots_directives(html: str) -> list[str]:
    """``<meta name="robots">`` directives of a page, lowercased, in
    document order (duplicates preserved).  Tag/attribute case and
    attribute order are irrelevant; directives split on commas and
    trimmed per the robots-meta convention.  Accepted anywhere in the
    document (crawler behavior — real pages misplace the tag in body).
    The publisher opt-out signal a training-data pipeline must respect:
    ``noindex`` pages should be dropped, ``nofollow`` ignored for link
    extraction."""
    p = _MetaRobots()
    try:
        p.feed(html)
        p.close()
    except Exception:  # malformed markup never blocks the flag scan
        pass
    return p.directives


class _CanonicalLink(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.href: str | None = None

    def handle_starttag(self, tag, attrs):
        if tag != "link" or self.href is not None:
            return
        d = {k.lower(): (v or "") for k, v in attrs}
        rel = d.get("rel", "").strip().lower().split()
        if "canonical" in rel and d.get("href", "").strip():
            self.href = d["href"].strip()


def canonical_link(html: str) -> str | None:
    """First ``<link rel="canonical" href="...">`` of a page, or None.
    ``rel`` is a space-separated token list per HTML (``rel="canonical
    nofollow"`` counts); tag/attribute case is irrelevant; an empty href
    is no declaration.  A page whose canonical differs from its own url
    is a publisher-declared DUPLICATE of the target — the cheapest
    dedup signal a crawl carries."""
    p = _CanonicalLink()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return p.href


class _LinkCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []
        self.base: str | None = None  # first <base href> wins (HTML spec)

    def handle_starttag(self, tag, attrs):
        if tag == "base" and self.base is None:
            d = {k.lower(): (v or "") for k, v in attrs}
            if d.get("href", "").strip():
                self.base = d["href"].strip()
            return
        if tag != "a":
            return
        d = {k.lower(): (v or "") for k, v in attrs}
        href = d.get("href", "").strip()
        if not href or href.startswith("#"):
            return
        if href.split(":", 1)[0].lower() in ("javascript", "mailto", "tel",
                                             "data"):
            return
        self.hrefs.append(href)


def extract_links(html: str, base_url: str | None = None) -> list[str]:
    """All ``<a href>`` targets of a page in document order (duplicates
    preserved — link COUNTS matter for host-graph weights).  Fragment-
    only, javascript:, mailto:, tel: and data: hrefs are skipped;
    relative hrefs resolve against the page's first ``<base href>`` if
    present (itself resolved against ``base_url``, per the HTML spec),
    else against ``base_url`` (RFC 3986 via urllib.parse.urljoin); with
    neither they stay as written.  The edge producer for the crawl link
    graph (PageRank quality prior, host-level analysis)."""
    p = _LinkCollector()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    from urllib.parse import urljoin

    if base_url is not None and p.base is not None:
        base = urljoin(base_url, p.base)
    else:
        base = p.base if base_url is None else base_url
    if base is None:
        return p.hrefs
    return [urljoin(base, h) for h in p.hrefs]
