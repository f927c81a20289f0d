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
