"""Deterministic HTML -> text extraction (SURVEY.md §2.2 M2).

This is the Ray-native analog of Twine's XSLT processor plugin
(``twine:plug-ins/xslt.c`` — libxml2 parse + libxslt transform of an
XML/HTML payload into RDF/XML), collapsed to the text-extraction core
that the ``input_hint`` byte-identical invariant anchors on.

The spec is FROZEN in docs/EXTRACTION.md: ``html_to_text`` must be a pure
function of the input bytes, so that re-running the pipeline at any
parallelism, block size, or retry count produces byte-identical ``text``
per ``url``.  Any change here is a conformance break and must update the
golden fixtures in tests/.

Stdlib-only by design (the environment has no lxml/html5lib; see
SURVEY.md §7).
"""

from __future__ import annotations

import codecs
import re
from html.parser import HTMLParser

# Tags whose content is dropped entirely.
SKIP_TAGS = frozenset({"script", "style", "template"})

# Block-level elements: emit '\n' at both open and close so consecutive
# blocks end up separated by a blank line after newline collapsing.
BLOCK_TAGS = frozenset(
    {
        "address", "article", "aside", "blockquote", "body", "caption",
        "dd", "details", "div", "dl", "dt", "fieldset", "figcaption",
        "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
        "header", "hr", "html", "li", "main", "nav", "ol", "option", "p",
        "pre", "section", "summary", "table", "tbody", "td", "tfoot",
        "th", "thead", "title", "tr", "ul",
    }
)

_BOM_UTF8 = b"\xef\xbb\xbf"

# Charset sniff over the raw head bytes (decoded latin-1 so the regex is
# total): <meta charset=X> or <meta http-equiv=... content="...charset=X">.
_META_CHARSET_RE = re.compile(
    r"""<meta[^>]+charset\s*=\s*["']?([A-Za-z0-9_\-:.]+)""", re.IGNORECASE
)

_SNIFF_WINDOW = 2048

_WS_RUN_RE = re.compile(r"[ \t\f\v]+")
_SPACE_AROUND_NL_RE = re.compile(r" *\n *")
_MULTI_NL_RE = re.compile(r"\n{2,}")


def sniff_charset(data: bytes) -> str:
    """Return the codec name used to decode ``data`` (frozen-spec step 1).

    Priority: UTF-8 BOM > first <meta charset> in the first 2048 bytes >
    utf-8 fallback.  Unknown/unsupported charset names fall back to
    utf-8.  Deterministic: depends only on the bytes.
    """
    if data.startswith(_BOM_UTF8):
        return "utf-8"
    head = data[:_SNIFF_WINDOW].decode("latin-1", errors="replace")
    m = _META_CHARSET_RE.search(head)
    if m:
        name = m.group(1).strip().lower()
        try:
            return codecs.lookup(name).name
        except LookupError:
            return "utf-8"
    return "utf-8"


class _TextExtractor(HTMLParser):
    """Streaming tag handler implementing the frozen block/inline rules."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._parts: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "br" or tag in BLOCK_TAGS:
            self._parts.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in SKIP_TAGS:
            if self._skip_depth:
                self._skip_depth -= 1
            return
        if self._skip_depth:
            return
        if tag in BLOCK_TAGS:
            self._parts.append("\n")

    # handle_startendtag defaults to starttag+endtag, which matches the
    # spec for <br/> and <hr/> (extra newlines collapse in post).

    def handle_data(self, data: str) -> None:
        if not self._skip_depth and data:
            self._parts.append(data)

    def text(self) -> str:
        return "".join(self._parts)


def html_to_text(data: bytes) -> str:
    """Extract plain text from raw HTML bytes (the frozen conformance fn).

    Pipeline (docs/EXTRACTION.md): decode (BOM/meta-charset sniff,
    errors='replace') -> stdlib html.parser stream -> drop
    script/style/template/comments -> block tags and <br> emit newlines ->
    entity decode -> NBSP->space, CR normalization, collapse space runs,
    trim spaces around newlines, collapse >=2 newlines to exactly two,
    strip.
    """
    codec = sniff_charset(data)
    if data.startswith(_BOM_UTF8):
        data = data[len(_BOM_UTF8):]
    html = data.decode(codec, errors="replace")

    parser = _TextExtractor()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # html.parser is tolerant; a hard failure still must be
        # deterministic — fall back to whatever was emitted so far.
        pass
    text = parser.text()

    text = text.replace("\r\n", "\n").replace("\r", "\n").replace("\u00a0", " ")
    text = _WS_RUN_RE.sub(" ", text)
    text = _SPACE_AROUND_NL_RE.sub("\n", text)
    text = _MULTI_NL_RE.sub("\n\n", text)
    return text.strip()


_TITLE_RE = re.compile(
    r"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL
)


def extract_title(data: bytes) -> str:
    """Page <title> text (for M6 metadata triples), same decode rules.

    Whitespace-collapsed single line; '' when absent.
    """
    codec = sniff_charset(data)
    if data.startswith(_BOM_UTF8):
        data = data[len(_BOM_UTF8):]
    html = data.decode(codec, errors="replace")
    m = _TITLE_RE.search(html)
    if not m:
        return ""
    import html as _html_mod

    title = _html_mod.unescape(m.group(1))
    title = title.replace("\u00a0", " ")
    return re.sub(r"\s+", " ", title).strip()
