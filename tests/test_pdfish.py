"""pdfish codec + layout extraction (FIXTURES.md §5/§6)."""

import pytest

from docler_ray.markers import count_page_breaks
from docler_ray.pdfish import (
    PdfishDocument,
    PdfishPage,
    Span,
    decode_pdfish,
    encode_pdfish,
    encrypt_pdfish,
    extract_pdfish,
    get_pdfish_info,
)


def two_page_doc() -> PdfishDocument:
    p1 = PdfishPage(
        width=612.0,
        height=792.0,
        spans=[
            Span(72, 72, 200, 20, 20.0, "Lorem ipsum"),
            Span(72, 120, 400, 12, 10.0, "Vestibulum neque massa, scelerisque sit"),
            Span(72, 134, 400, 12, 10.0, "amet ligula eu, congue molestie mi."),
            Span(72, 170, 300, 12, 10.0, "• Nulla facilisi."),
            Span(72, 186, 300, 12, 10.0, "• Aenean congue fringilla."),
        ],
    )
    p2 = PdfishPage(
        width=612.0,
        height=792.0,
        spans=[
            Span(72, 72, 300, 16, 14.5, "Cras fringilla ipsum magna"),
            Span(72, 110, 400, 12, 10.0, "In non mauris justo, duis vehicula."),
        ],
    )
    return PdfishDocument(pages=[p1, p2], title="pdf_sample", author="tester")


def test_roundtrip():
    doc = two_page_doc()
    data = encode_pdfish(doc)
    back = decode_pdfish(data)
    assert back.title == "pdf_sample"
    assert back.author == "tester"
    assert len(back.pages) == 2
    assert back.pages[0].spans[0].text == "Lorem ipsum"
    assert back.pages[0].spans[0].font_size == 20.0


def test_extract_two_pages():
    data = encode_pdfish(two_page_doc())
    result = extract_pdfish(data)
    assert count_page_breaks(result.content) == 2
    assert result.content.startswith('<!-- docler:page_break {"next_page":1} -->')
    assert '<!-- docler:page_break {"next_page":2} -->' in result.content
    # heading by font ratio (20 / 10 >= 1.8 -> h1)
    assert "# Lorem ipsum" in result.content
    # 14.5/10 -> h3 band? 1.45 >= 1.45 -> h2
    assert "## Cras fringilla ipsum magna" in result.content
    # line merge within a block
    assert "Vestibulum neque massa, scelerisque sit amet ligula eu," in result.content
    # bullets
    assert "- Nulla facilisi." in result.content
    assert result.title == "pdf_sample"


def test_extract_deterministic():
    data = encode_pdfish(two_page_doc())
    assert extract_pdfish(data).content == extract_pdfish(data).content


def test_page_range_filter_renumbers():
    data = encode_pdfish(two_page_doc())
    result = extract_pdfish(data, page_range="2")
    assert count_page_breaks(result.content) == 1
    assert result.content.startswith('<!-- docler:page_break {"next_page":1} -->')
    assert "Cras fringilla" in result.content
    assert "Lorem ipsum" not in result.content


def test_encryption_empty_password():
    data = encode_pdfish(two_page_doc())
    enc = encrypt_pdfish(data, "")
    info = get_pdfish_info(enc)
    assert info["is_encrypted"] is False  # empty-password probe succeeds
    assert info["page_count"] == 2
    result = extract_pdfish(enc)
    assert "# Lorem ipsum" in result.content


def test_encryption_real_password():
    data = encode_pdfish(two_page_doc())
    enc = encrypt_pdfish(data, "s3cret")
    info = get_pdfish_info(enc)
    assert info["is_encrypted"] is True
    assert info["page_count"] == 0
    with pytest.raises(ValueError, match="requires a password"):
        extract_pdfish(enc)
    with pytest.raises(ValueError, match="Incorrect password"):
        extract_pdfish(enc, password="wrong")
    result = extract_pdfish(enc, password="s3cret")
    assert "# Lorem ipsum" in result.content


def test_info_dimensions():
    info = get_pdfish_info(encode_pdfish(two_page_doc()))
    assert info["page_dimensions"] == [
        {"width": 612.0, "height": 792.0},
        {"width": 612.0, "height": 792.0},
    ]
    assert info["title"] == "pdf_sample"


def test_truncated_payload_raises():
    data = encode_pdfish(two_page_doc())
    with pytest.raises(ValueError, match="Truncated or corrupt"):
        decode_pdfish(data[: len(data) // 2])
    with pytest.raises(ValueError, match="bad magic"):
        decode_pdfish(b"NOTPDFISH")
