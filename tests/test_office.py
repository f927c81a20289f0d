"""Office/OOXML extraction: pinned golden strings, page breaks, zip
sniffing, and dispatch integration through the extract actor stage."""

from __future__ import annotations

import pyarrow as pa
import pytest

from docler_ray.mime_types import DOCX_MIME, PPTX_MIME, XLSX_MIME, ZIP_MIME, sniff_mime
from docler_ray.office.ooxml import (
    extract_docx,
    extract_pptx,
    extract_xlsx,
    make_docx,
    make_pptx,
    make_xlsx,
)

PB1 = '<!-- docler:page_break {"next_page":1} -->'
PB2 = '<!-- docler:page_break {"next_page":2} -->'


def test_docx_golden():
    payload = make_docx(
        "Quarterly Report",
        [(1, "Quarterly Report"), (0, "Revenue grew."), (2, "Details"), (0, "More text.")],
    )
    r = extract_docx(payload)
    assert r.title == "Quarterly Report"
    assert r.content == (
        PB1 + "\n# Quarterly Report\n\nRevenue grew.\n\n## Details\n\nMore text."
    )
    assert r.metadata == {"office_format": "docx", "n_paragraphs": 4}


def test_docx_generator_deterministic():
    a = make_docx("T", [(1, "H"), (0, "body")])
    b = make_docx("T", [(1, "H"), (0, "body")])
    assert a == b


def test_docx_page_breaks():
    from docler_ray.markers import count_page_breaks

    payload = make_docx("T", [(1, "Head"), (0, "p1"), (0, "p2")], page_break_after={1})
    r = extract_docx(payload)
    assert r.content == (
        PB1 + "\n\n\n# Head\n\np1\n\n\n" + PB2 + "\n\n\np2"
    )
    assert count_page_breaks(r.content) == 2


def test_docx_title_falls_back_to_first_heading():
    import io
    import zipfile

    # archive without docProps -> first Heading text becomes the title
    full = make_docx("ignored", [(1, "Fallback Title"), (0, "x")])
    src = zipfile.ZipFile(io.BytesIO(full))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", src.read("word/document.xml"))
    r = extract_docx(buf.getvalue())
    assert r.title == "Fallback Title"


def test_pptx_golden_slides_to_page_breaks():
    payload = make_pptx(
        "Deck", [["Intro", "welcome text"], ["Middle"], ["End", "bye", "now"]]
    )
    r = extract_pptx(payload)
    assert r.title == "Deck"
    assert r.content == (
        PB1 + "\n\n\n# Intro\n\nwelcome text"
        "\n\n\n" + PB2 + "\n\n\n# Middle"
        '\n\n\n<!-- docler:page_break {"next_page":3} -->\n\n\n# End\n\nbye\n\nnow'
    )
    assert r.metadata["n_slides"] == 3


def test_xlsx_golden_table():
    payload = make_xlsx(
        "Book", {"Data": [["name", "n"], ["alpha", 3], ["beta", 4.5]]}
    )
    r = extract_xlsx(payload)
    assert r.title == "Book"
    assert r.content == (
        PB1 + "\n## Data\n\n| name | n |\n| --- | --- |\n| alpha | 3 |\n| beta | 4.5 |"
    )
    assert r.metadata == {"office_format": "xlsx", "n_sheets": 1, "n_cells": 6}


def test_xlsx_multi_sheet_and_shared_string_dedup():
    payload = make_xlsx("B", {"S1": [["a", "a"]], "S2": [["a", 1]]})
    r = extract_xlsx(payload)
    assert "## S1" in r.content and "## S2" in r.content
    assert r.content.index("## S1") < r.content.index("## S2")


def test_sniff_distinguishes_office_from_zip():
    assert sniff_mime(make_docx("t", [(0, "x")])) == DOCX_MIME
    assert sniff_mime(make_pptx("t", [["x"]])) == PPTX_MIME
    assert sniff_mime(make_xlsx("t", {"S": [["x"]]})) == XLSX_MIME
    # a plain zip (no office part layout) stays application/zip
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("readme.txt", "hello")
    assert sniff_mime(buf.getvalue()) == ZIP_MIME
    # torn PK payload also stays application/zip (never raises)
    assert sniff_mime(b"PK\x03\x04 fake body") == ZIP_MIME


def test_malformed_payloads_raise_value_error():
    with pytest.raises(ValueError):
        extract_docx(b"PK\x03\x04 not a real zip")
    # a valid zip without the format's parts
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.xml", "<x/>")
    for fn in (extract_docx, extract_pptx, extract_xlsx):
        with pytest.raises(ValueError):
            fn(buf.getvalue())


def test_extract_stage_dispatches_office_rows():
    """End-to-end through the extract actor stage: office payloads route to
    the zip+XML extractors; an unmapped plain zip becomes a per-row error."""
    from docler_ray.stages.extract import ExtractDocs

    import io
    import zipfile

    plain = io.BytesIO()
    with zipfile.ZipFile(plain, "w") as zf:
        zf.writestr("readme.txt", "hello")
    payloads = [
        make_docx("D", [(1, "D"), (0, "docx body")]),
        make_pptx("P", [["P", "pptx body"]]),
        make_xlsx("X", {"S": [["a", 1]]}),
        plain.getvalue(),
    ]
    batch = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(4)], pa.string()),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array([""] * 4, pa.string()),
            "lang": pa.array(["en"] * 4, pa.string()),
            "mime_type": pa.array([sniff_mime(p) for p in payloads], pa.string()),
        }
    )
    out = ExtractDocs()(batch).to_pylist()
    assert [r["extractor"] for r in out[:3]] == [
        "docx_extract", "pptx_extract", "xlsx_extract",
    ]
    assert all(r["error"] is None for r in out[:3])
    assert [r["title"] for r in out[:3]] == ["D", "P", "X"]
    assert "docx body" in out[0]["content"]
    assert out[1]["page_count"] == 1
    assert "| a | 1 |" in out[2]["content"]
    # plain zip has no registered extractor -> per-row error, not a crash
    assert out[3]["error"] is not None and "application/zip" in out[3]["error"]
