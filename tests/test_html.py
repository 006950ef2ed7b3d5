"""HTML text extraction units: agreement with stdlib html.parser (an
independent implementation of the WHATWG tokenizer), the tag/charref/
raw-text edge cases the extractor claims, and crash-free fuzz."""

from __future__ import annotations

from html.parser import HTMLParser

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orionld_to_hive_spark.operators.html import (
    _BLOCK,
    decode_charrefs,
    encode_html,
    extract_text,
    normalize_ws,
)


class _StdlibRef(HTMLParser):
    """Reference extraction via the stdlib tokenizer: same block/
    inline and script/style rules, stdlib handles tags + charrefs."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.pieces: list[str] = []
        self.raw_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style"):
            self.raw_depth += 1
        if tag in _BLOCK or tag in ("script", "style"):
            self.pieces.append("\n")

    def handle_endtag(self, tag):
        if tag in ("script", "style"):
            self.raw_depth = max(0, self.raw_depth - 1)
        elif tag in _BLOCK:
            self.pieces.append("\n")

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK:
            self.pieces.append("\n")

    def handle_data(self, data):
        if not self.raw_depth:
            self.pieces.append(data)


def _stdlib_extract(html: str) -> str:
    p = _StdlibRef()
    p.feed(html)
    p.close()
    return normalize_ws("".join(p.pieces))


def test_agrees_with_stdlib_on_fixture_corpus():
    texts = [
        "plain words",
        "",
        "  leading and trailing  ",
        "multi\nline\n\ntext with   runs",
        "entities & <angles> survive roundtrip",
        "unicode — naïve café 日本語",
        "tabs\tand\rcarriage",
    ]
    for i, t in enumerate(texts):
        page = encode_html(i, t)
        assert extract_text(page) == _stdlib_extract(page), t


def test_quoted_attribute_gt_does_not_end_tag():
    assert extract_text('<p data-x="a>b">ok</p>') == "ok"
    assert extract_text("<p data-x='a>b'>ok</p>") == "ok"
    # naive find('>') would emit 'b">ok'


def test_script_style_content_removed_including_fake_close_tags():
    h = '<p>a</p><script>var s = "</p> not markup"; if (1<2) {}</script><p>b</p>'
    assert extract_text(h) == "a\nb"
    assert extract_text("<style>p{}</style><p>x</p>") == "x"
    # case-insensitive close
    assert extract_text("<SCRIPT>junk</SCRIPT><p>x</p>") == "x"


def test_block_vs_inline_separation():
    assert extract_text("a<b>b</b>c") == "abc"
    assert extract_text("<p>a</p><p>b</p>") == "a\nb"
    assert extract_text("<div>a<span>b</span></div><div>c</div>") == "ab\nc"
    assert extract_text("a<br>b") == "a\nb"


def test_comments_and_doctype_removed():
    assert extract_text("<!DOCTYPE html>x<!-- c -->y") == "xy"
    assert extract_text("x<!-- <p>not text</p> -->y") == "xy"


def test_charrefs():
    assert decode_charrefs("&amp;&lt;&gt;&quot;&apos;") == "&<>\"'"
    assert decode_charrefs("&#65;&#x42;&#x63;") == "ABc"
    # bare/malformed ampersands stay literal
    assert decode_charrefs("a & b &nosuch; &# ; &") == "a & b &nosuch; &# ; &"
    # refs spanning the window limit stay literal
    assert decode_charrefs("&averylongentityname;") == "&averylongentityname;"
    # surrogates / out-of-range refused to literal
    assert decode_charrefs("&#xD800;&#x110000;") == "&#xD800;&#x110000;"


def test_lenient_recovery():
    # unterminated tag drops the trailing fragment
    assert extract_text("ok<p attr") == "ok"
    # unterminated raw text drops the rest
    assert extract_text("ok<script>var x") == "ok"
    # unknown elements are inline
    assert extract_text("a<custom-el>b</custom-el>c") == "abc"


def test_whitespace_normalization():
    assert normalize_ws("a \n \n b") == "a\nb"
    assert normalize_ws("  a   b  ") == "a b"
    assert normalize_ws("\n\n") == ""
    assert normalize_ws("a\r\nb") == "a\nb"
    assert normalize_ws("a\rb") == "a b"  # lone CR is not a line break


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=400))
def test_extract_never_crashes_on_arbitrary_text(s):
    out = extract_text(s)
    assert isinstance(out, str)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=120))
def test_roundtrip_through_fixture(s):
    """Escaped text survives the page roundtrip as its normalized
    form — the property the oracle's closed form relies on."""
    page = extract_text(encode_html(3, s))
    nt = normalize_ws(s)
    want = "t3\nDoc 3!\n" + (nt + "\n" if nt else "") + "link 3"
    assert page == want


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200, alphabet=st.characters(min_codepoint=9,
                                                    max_codepoint=0x2FF)))
def test_agrees_with_stdlib_on_random_markup_soup(s):
    """Arbitrary soup (including stray <, >, &) must extract the same
    text as the stdlib tokenizer under the shared block rules, unless
    the soup contains constructs the two tokenizers recover from
    differently (unterminated tags/CDATA) — restrict to terminated
    markup by closing what we open."""
    html = f"<div>{s.replace('<', '&lt;')}</div>"
    assert extract_text(html) == _stdlib_extract(html)


# ------------------------------------------------- main content


def test_block_segmentation_and_link_density():
    from orionld_to_hive_spark.operators.html import extract_blocks

    html = (
        "<body><nav><a href='/'>Home</a> <a href='/b'>About us</a></nav>"
        "<p>This paragraph is long enough to be content for sure.</p>"
        "<div><a href='/x'>link one</a> plus a lot of surrounding prose "
        "that dilutes the link density well below the threshold</div>"
        "</body>"
    )
    blocks = extract_blocks(html)
    texts = [b.text for b in blocks]
    assert texts[0] == "Home About us"
    b0 = blocks[0]
    assert b0.n_link_chars >= len("Home") + len("About us")  # nav is link-dense
    assert b0.n_link_chars / b0.n_chars > 0.5
    p = blocks[1]
    assert p.n_link_chars == 0
    d = blocks[2]
    assert 0 < d.n_link_chars / d.n_chars < 0.5


def test_main_content_drops_boilerplate():
    from orionld_to_hive_spark.operators.html import (
        encode_html_page,
        main_content,
    )

    text = "Real article body. " * 5
    content, n_blocks, n_kept = main_content(encode_html_page(3, text))
    assert (n_blocks, n_kept) == (6, 2)
    assert "Home" not in content and "previous article" not in content
    assert "© site" not in content and "Doc 3" not in content.split("\n")[0][:6]
    assert "Real article body." in content


def test_main_content_short_text_still_two_paragraphs():
    from orionld_to_hive_spark.operators.html import (
        encode_html_page,
        main_content,
    )

    for t in ("", "ab", "  \n  "):
        content, n_blocks, n_kept = main_content(encode_html_page(0, t))
        assert (n_blocks, n_kept) == (6, 2), t
        assert content.startswith("Paragraph one of document 0:")
