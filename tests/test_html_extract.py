"""HTML DOM parsing, boilerplate stripping and markdown serialization."""

from docler_ray.html.dom import parse_html
from docler_ray.html.extract import extract_html, select_main_content
from docler_ray.markers import count_page_breaks

PAGE = """<!DOCTYPE html>
<html><head><title>Example Article — Site Name</title>
<script>var tracking = "evil";</script>
<style>.ad { color: red }</style>
</head>
<body>
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>
<header><h1>Site Name</h1><div class="menu"><a href="/a">A</a><a href="/b">B</a></div></header>
<div class="sidebar"><p>Subscribe to our newsletter for updates, offers, deals.</p></div>
<div class="ad-banner"><p>Buy widgets now! Great deals on widgets, gadgets, doodads.</p></div>
<div id="content">
<h1>Example Article</h1>
<p>This is the first paragraph of the main article, which talks about many
interesting things, with several clauses, and enough length to be scored.</p>
<p>The second paragraph continues the discussion, adding details, nuance,
and even more commas, so that density scoring has something to work with.</p>
<h2>A Subsection</h2>
<p>Content in the subsection with a <a href="https://example.com/link">link</a>
and some <strong>bold text</strong> plus <em>emphasis</em>.</p>
<ul><li>First item</li><li>Second item</li><li>Third item</li></ul>
<img src="/images/figure1.png" alt="A figure">
<table><tr><th>Name</th><th>Value</th></tr><tr><td>alpha</td><td>1</td></tr>
<tr><td>beta</td><td>2</td></tr></table>
<pre>code block
  preserved   spacing</pre>
</div>
<footer><p>Copyright 2026. All rights reserved. Privacy. Terms.</p></footer>
</body></html>
"""


def test_extracts_main_content_drops_boilerplate():
    result = extract_html(PAGE)
    c = result.content
    assert "first paragraph of the main article" in c
    assert "second paragraph continues" in c
    assert "Subscribe to our newsletter" not in c
    assert "Buy widgets now" not in c
    assert "Copyright 2026" not in c
    assert "Home" not in c  # nav link
    assert "var tracking" not in c  # script
    assert ".ad { color: red }" not in c  # style


def test_title_from_title_tag():
    result = extract_html(PAGE)
    assert result.title == "Example Article — Site Name"


def test_markdown_structure():
    c = extract_html(PAGE).content
    assert c.startswith('<!-- docler:page_break {"next_page":1} -->')
    assert count_page_breaks(c) == 1
    assert "# Example Article" in c
    assert "## A Subsection" in c
    assert "- First item\n- Second item\n- Third item" in c
    assert "[link](https://example.com/link)" in c
    assert "**bold text**" in c
    assert "*emphasis*" in c
    assert "| Name | Value |" in c
    assert "| alpha | 1 |" in c
    assert "```\ncode block\n  preserved   spacing\n```" in c


def test_images_registered_sequentially():
    result = extract_html(PAGE)
    assert len(result.images) == 1
    img = result.images[0]
    assert img["id"] == "img-0"
    assert img["filename"] == "img-0.png"
    assert "![img-0](img-0.png)" in result.content


def test_deterministic():
    assert extract_html(PAGE).content == extract_html(PAGE).content


def test_semantic_main_preferred():
    html = """<html><body>
    <div class="big"><p>Huge amounts of sidebar text, repeated, repeated, and repeated,
    with commas, and more commas, to look dense and important to scorers.</p></div>
    <article><p>The real article body, short but semantically marked.</p></article>
    </body></html>"""
    result = extract_html(html)
    assert "real article body" in result.content
    assert "sidebar text" not in result.content


def test_malformed_html_no_crash():
    html = "<html><body><div><p>Unclosed paragraph with plenty of text, commas, and length to score highly here<div><p>Another</body>"
    result = extract_html(html)
    assert "Unclosed paragraph" in result.content


def test_empty_input():
    result = extract_html("")
    assert result.content.startswith("<!-- docler:page_break")


def test_ordered_list():
    html = "<html><body><main><ol><li>one</li><li>two</li></ol></main></body></html>"
    c = extract_html(html).content
    assert "1. one\n2. two" in c


def test_nested_list_indent():
    html = "<html><body><main><ul><li>top<ul><li>inner</li></ul></li></ul></main></body></html>"
    c = extract_html(html).content
    assert "- top\n  - inner" in c


def test_blockquote():
    html = "<html><body><main><blockquote><p>quoted words</p></blockquote></main></body></html>"
    c = extract_html(html).content
    assert "> quoted words" in c


def test_select_main_content_fallback_body():
    root = parse_html("<html><body>just loose text, no containers scoring</body></html>")
    node = select_main_content(root)
    assert node is not None
    assert "loose text" in node.get_text()


def test_boolean_hidden_attribute_pruned():
    """<div hidden> (value normalized to "") must be pruned like
    hidden="hidden" (round-1 ADVICE finding)."""
    from docler_ray.html.extract import extract_html

    html = (
        "<html><body><article><p>"
        + "visible words here " * 30
        + "</p><div hidden><p>secret hidden words</p></div>"
        + '<div hidden="hidden"><p>also hidden</p></div></article></body></html>'
    )
    res = extract_html(html)
    assert "visible words" in res.content
    assert "secret hidden words" not in res.content
    assert "also hidden" not in res.content


def test_extract_metadata_fields():
    from docler_ray.html.metadata import extract_metadata

    html = (
        '<html lang="EN-us"><head><title> A &amp;  B </title>'
        '<meta name="Description" content="ignored-wrong-case-name">'
        '<meta name="description" content="  d1   d2 ">'
        '<meta property="og:title" content="OG title">'
        '<link rel="stylesheet canonical" href="../c">'
        '<meta name="robots" content=" NOINDEX ,nofollow ">'
        "</head><body></body></html>"
    )
    md = extract_metadata(html, base_url="https://h.example/a/b/page")
    assert md.title == "A & B"
    # meta name matching is case-insensitive (WHATWG), so the first
    # description — whatever its name's case — wins
    assert md.description == "ignored-wrong-case-name"
    assert md.og_title == "OG title"
    assert md.canonical == "https://h.example/a/c"
    assert md.noindex is True
    assert md.nofollow is True
    assert md.lang == "en-us"


def test_extract_metadata_first_wins_and_defaults():
    from docler_ray.html.metadata import extract_metadata

    html = (
        "<html><head><title>First</title><title>Second</title>"
        '<link rel="canonical" href="https://x.example/one">'
        '<link rel="canonical" href="https://x.example/two">'
        "</head><body><h1>H</h1></body></html>"
    )
    md = extract_metadata(html)
    assert md.title == "First"
    assert md.canonical == "https://x.example/one"
    assert md.description is None
    assert md.og_title is None
    assert md.noindex is False and md.nofollow is False
    assert md.lang is None


def test_extract_metadata_empty_and_garbage():
    from docler_ray.html.metadata import extract_metadata

    assert extract_metadata("").title is None
    md = extract_metadata("<p>no head at all")
    assert md.title is None and md.canonical is None
