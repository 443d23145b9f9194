"""Unit + property tests for the frozen HTML→text spec (docs/EXTRACTION.md).

Covers FIXTURES.md families F1 (plain), F2 (markup stress), F3 (charset).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from twine_ray.functions.html_text import (
    extract_title,
    html_to_text,
    sniff_charset,
)


def test_plain_paragraphs():
    h = b"<html><body><p>Hello world</p><p>Second para</p></body></html>"
    assert html_to_text(h) == "Hello world\n\nSecond para"


def test_title_included_first():
    h = b"<html><head><title>The Title</title></head><body><p>Body</p></body></html>"
    assert html_to_text(h) == "The Title\n\nBody"


def test_script_style_template_stripped():
    h = (
        b"<p>keep</p><script>var x = '<p>no</p>';</script>"
        b"<style>p{color:red}</style><template><p>gone</p></template><p>end</p>"
    )
    assert html_to_text(h) == "keep\n\nend"


def test_comments_stripped():
    assert html_to_text(b"<p>a</p><!-- hidden --><p>b</p>") == "a\n\nb"


def test_br_single_newline():
    assert html_to_text(b"<p>line1<br>line2<br/>line3</p>") == "line1\nline2\nline3"


def test_inline_tags_no_break():
    h = b"<p>one <b>two</b> <i>three</i><span>four</span></p>"
    assert html_to_text(h) == "one two threefour"


def test_entities_decoded():
    h = b"<p>a &amp; b &#xE9; c&nbsp;d</p>"
    assert html_to_text(h) == "a & b \xe9 c d"


def test_whitespace_collapse():
    h = b"<p>a   b\t\tc</p>\n\n\n<p>d</p>"
    assert html_to_text(h) == "a b c\n\nd"


def test_nested_blocks_single_blank_line():
    h = b"<div><div><p>x</p></div></div><div>y</div>"
    assert html_to_text(h) == "x\n\ny"


def test_unclosed_tags():
    # html.parser never synthesizes end events → only the open newlines
    assert html_to_text(b"<p>a<p>b") == "a\nb"


def test_list_items():
    h = b"<ul><li>one</li><li>two</li></ul>"
    assert html_to_text(h) == "one\n\ntwo"


def test_table_cells():
    h = b"<table><tr><td>a</td><td>b</td></tr></table>"
    assert html_to_text(h) == "a\n\nb"


# --- charset (F3) ---


def test_charset_meta_latin1():
    h = '<meta charset="latin-1"><p>caf\xe9</p>'.encode("latin-1")
    assert sniff_charset(h) == "iso8859-1"
    assert html_to_text(h) == "caf\xe9"


def test_charset_http_equiv():
    h = (
        b'<meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">'
        b"<p>na\xefve</p>"
    )
    assert html_to_text(h) == "na\xefve"


def test_charset_bom():
    h = b"\xef\xbb\xbf<p>ok</p>"
    assert sniff_charset(h) == "utf-8"
    assert html_to_text(h) == "ok"


def test_invalid_bytes_replacement():
    h = b"<p>a\xff\xfeb</p>"  # invalid utf-8 → U+FFFD, deterministic
    out = html_to_text(h)
    assert out == "a��b"


def test_unknown_charset_falls_back():
    h = b'<meta charset="no-such-cs"><p>x</p>'
    assert sniff_charset(h) == "utf-8"
    assert html_to_text(h) == "x"


# --- title ---


def test_extract_title():
    assert extract_title(b"<title>A &amp;  B</title>") == "A & B"
    assert extract_title(b"<p>no title</p>") == ""


# --- invariant properties ---


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=512))
def test_deterministic_on_arbitrary_bytes(data):
    assert html_to_text(data) == html_to_text(data)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_output_whitespace_canonical(s):
    out = html_to_text(f"<p>{s}</p>".encode("utf-8", "surrogatepass"))
    assert "\r" not in out
    assert "  " not in out
    assert "\n\n\n" not in out
    assert out == out.strip()
