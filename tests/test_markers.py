"""Marker grammar — the byte-identical contract (SURVEY.md §1.2)."""

from docler_ray import markers


def test_page_break_exact_bytes():
    assert (
        markers.create_page_break(next_page=1, newline_separators=1)
        == '\n<!-- docler:page_break {"next_page":1} -->\n'
    )
    assert (
        markers.create_page_break(next_page=12)
        == '\n\n<!-- docler:page_break {"next_page":12} -->\n\n'
    )


def test_image_reference():
    assert markers.create_image_reference("img-0", "img-0.png") == "![img-0](img-0.png)"


def test_count_page_breaks():
    content = markers.join_pages(["page one", "page two", "page three"])
    assert markers.count_page_breaks(content) == 3


def test_join_pages_mistral_convention():
    """First marker lstripped, pages lstripped, parts joined with \\n\\n
    (/root/reference/src/docler/converters/mistral_provider/provider.py:122-135)."""
    content = markers.join_pages(["  alpha", "beta"])
    expected = (
        '<!-- docler:page_break {"next_page":1} -->\n'
        "\n\n"
        "alpha"
        "\n\n"
        '\n<!-- docler:page_break {"next_page":2} -->\n'
        "\n\n"
        "beta"
    )
    assert content == expected


def test_join_pages_empty():
    assert markers.join_pages([]) == ""


def test_prepend_first_page_marker():
    out = markers.prepend_first_page_marker("# Title\n\nBody")
    assert out == '<!-- docler:page_break {"next_page":1} -->\n# Title\n\nBody'
    assert markers.count_page_breaks(out) == 1


def test_chunk_boundary():
    cb = markers.create_chunk_boundary(3, keywords=["a", "b"])
    assert cb == '<!-- docler:chunk_boundary {"chunk_id":3,"keywords":["a","b"]} -->'
