"""ODT / RTF / EPUB extraction tests (reference markitdown coverage:
provider.py:35-46)."""

from __future__ import annotations

import pytest

from docler_ray.mime_types import sniff_mime
from docler_ray.office.epub import extract_epub, make_epub
from docler_ray.office.odf import extract_odt, make_odt
from docler_ray.office.rtf import extract_rtf, make_rtf
from docler_ray.stages.dispatch import DEFAULT_PREFERENCES, EXTRACTORS


def test_odt_round_trip():
    odt = make_odt(
        "Mein Dokument",
        [
            ("h", 1, "Überschrift"),
            ("p", "Erster Absatz."),
            ("h", 2, "Sub"),
            ("p", "Zweiter <&> Absatz."),
        ],
    )
    assert sniff_mime(odt) == "application/vnd.oasis.opendocument.text"
    r = extract_odt(odt)
    assert r.title == "Mein Dokument"
    assert r.metadata == {"office_format": "odt", "n_paragraphs": 4}
    assert "# Überschrift\n\nErster Absatz.\n\n## Sub" in r.content
    assert "Zweiter <&> Absatz." in r.content


def test_odt_whitespace_elements_and_guards():
    # hand-built content.xml with text:s / text:tab / text:line-break
    import io
    import zipfile

    buf = io.BytesIO()
    content = (
        '<?xml version="1.0"?><office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        "<office:body><office:text>"
        '<text:p>a<text:s text:c="3"/>b<text:tab/>c<text:line-break/>d</text:p>'
        "</office:text></office:body></office:document-content>"
    )
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.text")
        zf.writestr("content.xml", content)
    r = extract_odt(buf.getvalue())
    assert "a   b\tc\nd" in r.content
    with pytest.raises(ValueError, match="zip"):
        extract_odt(b"not a zip")
    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.text")
    with pytest.raises(ValueError, match="content.xml"):
        extract_odt(buf2.getvalue())


def test_rtf_round_trip_pages_and_escapes():
    rtf = make_rtf(
        "Tïtle — über",
        ["First paragraph with naïve text.", "Second — em dash."],
        page_break_after={0},
    )
    assert sniff_mime(rtf) == "application/rtf"
    r = extract_rtf(rtf)
    assert r.title == "Tïtle — über"  # \'hh + \uN? both decode
    assert r.metadata["n_paragraphs"] == 2
    assert '{"next_page":2}' in r.content
    assert "First paragraph with naïve text." in r.content
    assert "Second — em dash." in r.content


def test_rtf_destinations_and_info_skipped():
    raw = (
        rb"{\rtf1\ansi{\fonttbl{\f0 Arial;}}{\colortbl;\red0\green0\blue0;}"
        rb"{\info{\title The Title}{\author Hidden Author}}"
        rb"{\*\unknowndest should vanish}"
        rb"Body text \tab here.\par}"
    )
    r = extract_rtf(raw)
    assert r.title == "The Title"
    assert "Arial" not in r.content
    assert "Hidden Author" not in r.content
    assert "should vanish" not in r.content
    assert "Body text \there." in r.content
    with pytest.raises(ValueError, match="RTF"):
        extract_rtf(b"plain text, no rtf magic")


def test_epub_round_trip_spine_order():
    epub = make_epub(
        "The Book",
        [
            ("Chapter One", ["It begins.", "And continues."]),
            ("Chapter Two", ["It ends."]),
        ],
    )
    assert sniff_mime(epub) == "application/epub+zip"
    r = extract_epub(epub)
    assert r.title == "The Book"
    assert r.metadata == {"office_format": "epub", "n_chapters": 2}
    assert "# Chapter One\n\nIt begins.\n\nAnd continues." in r.content
    assert '{"next_page":2}' in r.content
    assert r.content.index("Chapter One") < r.content.index("Chapter Two")
    with pytest.raises(ValueError, match="zip"):
        extract_epub(b"nope")


def test_dispatch_routes_new_formats():
    for mime, name in (
        ("application/vnd.oasis.opendocument.text", "odt_extract"),
        ("application/rtf", "rtf_extract"),
        ("application/epub+zip", "epub_extract"),
    ):
        assert DEFAULT_PREFERENCES[mime] == name
        assert name in EXTRACTORS
    res = EXTRACTORS["rtf_extract"](make_rtf("T", ["b."]), "", {})
    assert "b." in res.content
