"""JSON-LD extraction: type-attr matching, array flattening, author
shapes, malformed-block skipping."""

from __future__ import annotations

from docler_ray.html.jsonld import extract_jsonld


def test_jsonld_full_article():
    h = (
        '<script type="application/ld+json">{"@type":"Article",'
        '"headline":"The \\"Big\\" Story","datePublished":"2026-01-02",'
        '"author":{"@type":"Person","name":"Ada"}}</script>'
    )
    (o,) = extract_jsonld(h)
    assert o == {
        "jtype": "Article",
        "name": 'The "Big" Story',
        "date_published": "2026-01-02",
        "author": "Ada",
    }


def test_jsonld_array_and_attr_forms():
    h = (
        "<script TYPE='application/ld+json'>"
        '[{"@type":"Product","name":"W"},{"@type":"Offer"}]</script>'
        "<script type = application/ld+json >"
        '{"@type":"Org","name":"N","author":["First","Second"]}</script>'
    )
    got = extract_jsonld(h)
    assert [o["jtype"] for o in got] == ["Product", "Offer", "Org"]
    assert got[2]["author"] == "First"  # list-of-strings: first wins


def test_jsonld_skips_garbage():
    h = (
        '<script type="application/ld+json">{broken</script>'
        '<script type="text/javascript">{"@type":"Nope"}</script>'
        '<script type="application/ld+json">"just a string"</script>'
        '<script type="application/ld+json">{"name": 42}</script>'
    )
    got = extract_jsonld(h)
    # only the {"name": 42} object survives, with non-string fields -> ''
    assert got == [
        {"jtype": "", "name": "", "date_published": "", "author": ""}
    ]
    assert extract_jsonld("") == []
    assert extract_jsonld("<script type='application/ld+json'>{}") == []
