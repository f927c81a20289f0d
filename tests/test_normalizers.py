"""Normalizer tier (SURVEY.md §2.3), export sink, multimodal plumbing."""

import base64

import pytest

from docler_ray.functions.chunkers import chunk_by_tokens, chunk_markdown
from docler_ray.functions.export import export_document_markdown, export_to_directory
from docler_ray.functions.normalizers import (
    add_chunk_boundaries,
    extract_inline_base64_images,
    replace_figures_with_images,
    replace_numbered_page_breaks,
    replace_page_breaks,
    replace_slide_markers,
)
from docler_ray.markers import count_page_breaks
from docler_ray.stages.media import (
    ImageFeatureExtractor,
    decode_image_from_base64,
    encode_image_to_base64,
    png_to_webp,
    probe_image_dimensions,
    sniff_image_mime,
)

# 1x1 transparent PNG
PNG_1X1 = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8z8BQ"
    "DwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)


def test_replace_page_breaks_azure():
    content = "page one text\n<!-- PageBreak -->\npage two text"
    out = replace_page_breaks(content)
    assert out.startswith('<!-- docler:page_break {"next_page":1} -->')
    assert '<!-- docler:page_break {"next_page":2} -->' in out
    assert count_page_breaks(out) == 2
    assert "PageBreak" not in out


def test_replace_slide_markers():
    content = "intro\n<!-- Slide number: 2 -->\nslide two"
    out = replace_slide_markers(content)
    assert '<!-- docler:page_break {"next_page":2} -->' in out
    assert "Slide number" not in out


def test_replace_numbered_page_breaks_datalab():
    content = "first page\n{0}------------\nsecond page\n{1}------------\nthird"
    out = replace_numbered_page_breaks(content)
    assert count_page_breaks(out) == 3
    assert '{"next_page":2}' in out and '{"next_page":3}' in out


def test_replace_figures_with_images():
    content = "before <figure>fig one</figure> mid <figure>fig two</figure> after"
    images = [
        {"id": "img-0", "filename": "img-0.png"},
        {"id": "img-1", "filename": "img-1.png"},
    ]
    out = replace_figures_with_images(content, images)
    assert out == "before ![img-0](img-0.png) mid ![img-1](img-1.png) after"


def test_figures_more_than_images():
    out = replace_figures_with_images("<figure>a</figure><figure>b</figure>", [{"id": "x", "filename": "x.png"}])
    assert "![x](x.png)" in out
    assert "<figure>b</figure>" in out  # unmatched figure left alone


def test_extract_inline_base64_images():
    b64 = base64.b64encode(PNG_1X1).decode()
    content = f"text ![alt](data:image/png;base64,{b64}) more"
    new_content, images = extract_inline_base64_images(content)
    assert new_content == "text ![extracted-img-0](extracted-img-0.png) more"
    assert images[0]["content"] == PNG_1X1
    assert images[0]["mime_type"] == "image/png"


def test_extract_inline_base64_malformed_left_alone():
    content = "![x](data:image/png;base64,!!!notb64!!!)"
    new_content, images = extract_inline_base64_images(content)
    assert new_content == content
    assert images == []


def test_chunk_boundaries_markdown_single_top_boundary():
    content = "# A\n\ntext one\n\n# B\n\ntext two"
    chunks = chunk_markdown(content, [], "d")
    out = add_chunk_boundaries(content, chunks)
    # markdown chunks carry no start_line -> exactly one boundary, at the top
    assert out.count("docler:chunk_boundary") == 1
    assert out.startswith("<!-- docler:chunk_boundary")
    assert content in out


def test_chunk_boundaries_token_line_ranges():
    content = "\n".join(f"line {i}" for i in range(300))
    chunks = chunk_by_tokens(content, [], "d", max_tokens_per_chunk=400)
    assert len(chunks) > 1
    out = add_chunk_boundaries(content, chunks)
    assert out.count("docler:chunk_boundary") == len(chunks)
    # every original line survives
    for i in range(300):
        assert f"line {i}\n" in out or out.endswith(f"line {i}")


def test_get_metadata_projection():
    from docler_ray.functions.export import get_metadata

    row = {
        "metadata": '{"office_format": "docx", "n_paragraphs": 4, "note": null}',
        "title": "Doc T",
        "mime_type": "text/html",
        "page_count": 3,
        "extractor": "html_extract",
        "content": "ignored",
    }
    meta = get_metadata(row)
    assert meta == {
        "office_format": "docx",
        "n_paragraphs": "4",
        "note": "",
        "title": "Doc T",
        "mime_type": "text/html",
        "page_count": "3",
        "extractor": "html_extract",
    }
    assert get_metadata({"metadata": "not json"}) == {}
    assert get_metadata({}) == {}


def test_export_document_markdown_frontmatter():
    md = export_document_markdown("body text", "pdf_sample", "src/x.pdf", "application/pdf", 2)
    assert md == (
        "---\ntitle: pdf_sample\nsource_path: src/x.pdf\n"
        "mime_type: application/pdf\npage_count: 2\n---\n\nbody text\n"
    )


def test_export_to_directory(tmp_path):
    row = {
        "content": "# Doc", "title": "t", "url": "https://x", "mime_type": "text/html",
        "page_count": 1,
        "images": [{"id": "img-0", "filename": "img-0.png", "content": PNG_1X1}],
    }
    files = export_to_directory(row, str(tmp_path / "doc"))
    assert files == ["document.md", "img-0.png"]
    assert (tmp_path / "doc" / "img-0.png").read_bytes() == PNG_1X1


def test_sniff_and_probe_image():
    assert sniff_image_mime(PNG_1X1) == "image/png"
    assert probe_image_dimensions(PNG_1X1) == (1, 1)
    assert sniff_image_mime(b"GIF89a" + bytes(10)) == "image/gif"
    assert sniff_image_mime(b"\xff\xd8\xff\xe0") == "image/jpeg"
    assert sniff_image_mime(b"plain") is None


def test_base64_roundtrip():
    url = encode_image_to_base64(PNG_1X1)
    assert url.startswith("data:image/png;base64,")
    data, mime = decode_image_from_base64(url)
    assert data == PNG_1X1 and mime == "image/png"


def test_png_to_webp_is_stubbed():
    with pytest.raises(NotImplementedError, match="Pillow"):
        png_to_webp(PNG_1X1)


def test_image_feature_extractor_stage():
    import pyarrow as pa

    from docler_ray.models import DOCS_SCHEMA

    batch = pa.table(
        {
            "url": pa.array(["https://a", "https://b"]),
            "images": pa.array(
                [
                    [{"id": "img-0", "filename": "img-0.png", "mime_type": "image/png", "content": PNG_1X1}],
                    [],
                ],
                type=DOCS_SCHEMA.field("images").type,
            ),
        }
    )
    out = ImageFeatureExtractor()(batch)
    assert out.num_rows == 1
    row = out.to_pylist()[0]
    assert row["mime_sniffed"] == "image/png"
    assert (row["width"], row["height"]) == (1, 1)
    assert row["n_bytes"] == len(PNG_1X1)


def test_insert_page_breaks_by_anchor():
    """Upstage-parity anchor insertion (provider.py:156-193): markers land
    directly before each page's first element text, searched in order after
    the previous insertion; missing anchors are skipped."""
    from docler_ray.functions.normalizers import insert_page_breaks_by_anchor
    from docler_ray.markers import count_page_breaks

    content = "Alpha intro text.\nBravo second page starts.\nCharlie third page."
    out = insert_page_breaks_by_anchor(
        content,
        [(2, "Bravo second"), (3, "Charlie third"), (4, "not in the document")],
    )
    assert out.startswith('<!-- docler:page_break {"next_page":1} -->')
    assert count_page_breaks(out) == 3  # page 4 anchor skipped
    assert out.index('{"next_page":2}') < out.index("Bravo second")
    assert out.index("Alpha intro") < out.index('{"next_page":2}')
    assert out.index('{"next_page":3}') < out.index("Charlie third")
    # repeated anchors resolve forward: a page-3 anchor equal to earlier text
    out2 = insert_page_breaks_by_anchor(
        "same same same", [(2, "same"), (3, "same")]
    )
    assert count_page_breaks(out2) == 3
    assert out2.index('{"next_page":2}') < out2.index('{"next_page":3}')


def test_backend_language_tables():
    from docler_ray.common_types import to_backend_language

    assert to_backend_language("de", "iso639_2") == "deu"
    assert to_backend_language("zh", "ocr") == "chi_sim"
    assert to_backend_language("fr", "bcp47") == "fr-FR"
    assert to_backend_language("es", "name") == "spanish"
    assert to_backend_language("pt", "bcp47") == "pt"  # unmapped passthrough
    import pytest

    with pytest.raises(ValueError):
        to_backend_language("en", "nope")
