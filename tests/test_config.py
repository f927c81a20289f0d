"""Declarative job config: discriminated parse, strict fields, round-trip."""

from __future__ import annotations

import pytest

from docler_ray.config import (
    JobConfig,
    MarkdownChunkerConfig,
    TokenChunkerConfig,
    chunker_config_from_dict,
    get_chunker,
)


def test_chunker_discriminator():
    md = chunker_config_from_dict({"type": "markdown", "max_chunk_size": 900})
    assert isinstance(md, MarkdownChunkerConfig)
    assert md.max_chunk_size == 900
    tok = chunker_config_from_dict({"type": "token"})
    assert isinstance(tok, TokenChunkerConfig)
    assert tok.max_tokens_per_chunk == 4000


def test_unknown_chunker_type_rejected():
    with pytest.raises(ValueError, match="Unknown chunker type"):
        chunker_config_from_dict({"type": "sentence"})


def test_extra_fields_forbidden():
    with pytest.raises(ValueError, match="Unknown chunker"):
        chunker_config_from_dict({"type": "markdown", "max_size": 5})
    with pytest.raises(ValueError, match="Unknown pipeline"):
        JobConfig.from_dict({"pipeline": {"batch": 3}})
    with pytest.raises(ValueError, match="Unknown job config section"):
        JobConfig.from_dict({"chunkers": {}})


def test_unregistered_extractor_rejected():
    with pytest.raises(ValueError, match="not a registered extractor"):
        JobConfig.from_dict({"extractors": {"text/html": "nope"}})


def test_round_trip_and_pipeline_merge():
    doc = {
        "extractors": {"text/html|de": "html_extract"},
        "chunker": {"type": "token", "max_tokens_per_chunk": 2000,
                    "chunk_overlap_lines": 20},
        "pipeline": {"extract_batch_size": 128, "num_buckets": 32},
    }
    job = JobConfig.from_dict(doc)
    assert JobConfig.from_dict(job.to_dict()) == job  # lossless round-trip
    assert job.to_dict()["chunker"] == doc["chunker"]
    assert job.to_dict()["extractors"] == doc["extractors"]
    cfg = job.build_pipeline_config()
    assert cfg.extract_batch_size == 128
    assert cfg.num_buckets == 32
    assert cfg.preferences["text/html|de"] == "html_extract"


def test_get_chunker_returns_callable():
    fn = get_chunker(MarkdownChunkerConfig(max_chunk_size=500))
    import pyarrow as pa

    batch = pa.table(
        {
            "url": ["u"],
            "content": ["# H\n\n" + "word " * 300],
            "error": [None],
            "images": [[]],
        }
    )
    out = fn(batch)
    assert out.num_rows >= 2  # 1500+ chars at max 500 -> several chunks


def test_extractor_config_round_trip():
    """Reference-parity round trip for the extractor config union
    (converter_configs.py:461-475, provider.py:53-60): pdf_password,
    page_range and the html scoring/image knob survive dict round-trips
    and land in the right extractor's options."""
    from docler_ray.config import JobConfig

    doc = {
        "extractors": {"application/x-pdfish": "pdf_extract"},
        "extractor_options": [
            {"type": "pdf_extract", "pdf_password": "s3cret", "page_range": "1-2"},
            {"type": "html_extract", "extract_images": False},
        ],
        "chunker": {"type": "markdown", "max_chunk_size": 900, "chunk_overlap": 30},
    }
    cfg = JobConfig.from_dict(doc)
    assert cfg.to_dict()["extractor_options"] == [
        {"type": "pdf_extract", "pdf_password": "s3cret", "page_range": "1-2"},
        {"type": "html_extract", "page_range": None, "extract_images": False},
    ]
    pcfg = cfg.build_pipeline_config()
    assert pcfg.extract_options["pdf_extract"] == {
        "pdf_password": "s3cret",
        "page_range": "1-2",
    }
    assert pcfg.extract_options["html_extract"] == {"extract_images": False}


def test_extractor_config_rejects_unknown():
    import pytest

    from docler_ray.config import extractor_config_from_dict

    with pytest.raises(ValueError):
        extractor_config_from_dict({"type": "pdf_extract", "nope": 1})
    with pytest.raises(ValueError):
        extractor_config_from_dict({"type": "mystery"})


def test_extract_options_chain_applies_per_extractor():
    """An encrypted pdfish payload decrypts via the chain's pdf_password;
    the html extractor's extract_images=False drops image rows — each knob
    reaches only its own extractor."""
    import pyarrow as pa

    from docler_ray.config import JobConfig
    from docler_ray.pdfish.format import (
        PdfishDocument,
        PdfishPage,
        Span,
        encode_pdfish,
        encrypt_pdfish,
    )
    from docler_ray.stages.extract import ExtractDocs

    page = PdfishPage(
        width=612.0,
        height=792.0,
        spans=[Span(x=72, y=80, w=200, h=14, font_size=12.0, text="secret body")],
    )
    payload = encrypt_pdfish(
        encode_pdfish(PdfishDocument(pages=[page], title="T", author="A")), "pw"
    )
    html = (
        b"<html><head><title>H</title></head><body><article><p>"
        + b"words here " * 50
        + b'</p><img src="/x.png" alt="pic"></article></body></html>'
    )
    cfg = JobConfig.from_dict(
        {
            "extractor_options": [
                {"type": "pdf_extract", "pdf_password": "pw"},
                {"type": "html_extract", "extract_images": False},
            ]
        }
    ).build_pipeline_config()
    ex = ExtractDocs(options=cfg.extract_options)
    batch = pa.table(
        {
            "url": ["u1", "u2"],
            "html": [payload, html],
            "text": ["", ""],
            "lang": ["en", "en"],
            "mime_type": ["application/x-pdfish", "text/html"],
        }
    )
    out = ex(batch)
    rows = out.to_pylist()
    assert rows[0]["error"] is None and "secret body" in rows[0]["content"]
    assert rows[1]["error"] is None and rows[1]["images"] == []
