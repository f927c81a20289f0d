"""(mime, lang) dispatch, groupby-lang extraction route, embedding near-dup."""

from __future__ import annotations

import numpy as np
import pytest

from docler_ray.html.extract import ExtractionResult
from docler_ray.stages.dispatch import EXTRACTORS, build_dispatch, lookup, register_extractor


def test_lookup_most_specific_first():
    def de_extractor(payload, text, options):
        return ExtractionResult(content="DE")

    register_extractor("de_special", de_extractor)
    try:
        table = build_dispatch({"text/html|de": "de_special"})
        name, _fn = lookup(table, "text/html", "de")
        assert name == "de_special"
        name, _fn = lookup(table, "text/html", "fr")
        assert name == "html_extract"
        assert lookup(table, "application/nope", "en") is None
    finally:
        EXTRACTORS.pop("de_special", None)


def test_unknown_extractor_rejected():
    with pytest.raises(ValueError, match="Unknown extractor"):
        build_dispatch({"text/html": "missing_name"})


def test_extract_row_lang_dispatch():
    from docler_ray.stages.extract import ExtractDocs

    def zh_extractor(payload, text, options):
        return ExtractionResult(content="ZH-CHAIN", title="zh")

    register_extractor("zh_chain", zh_extractor)
    try:
        ex = ExtractDocs(preferences={"text/html|zh": "zh_chain"})
        fields, err, name = ex.extract_row("text/html", b"<html><body>x</body></html>", "", "zh")
        assert err is None and name == "zh_chain"
        assert fields["content"] == "ZH-CHAIN"
        fields, err, name = ex.extract_row("text/html", b"<html><body><p>hi</p></body></html>", "", "en")
        assert name == "html_extract"
    finally:
        EXTRACTORS.pop("zh_chain", None)


def test_grouped_by_lang_matches_default(ray_session):
    import pyarrow.parquet as pq
    import ray.data

    from docler_ray.pipelines.extract_pipeline import (
        PipelineConfig,
        extract_dataset,
        extract_grouped_by_lang,
    )

    files = ["tests/goldens/pages/pages-00000.parquet"]
    cfg = PipelineConfig(extract_concurrency=(1, 2))
    pages = ray.data.read_parquet(files)
    default = (
        extract_dataset(pages, cfg)
        .select_columns(["url", "content", "title"])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    grouped = (
        extract_grouped_by_lang(ray.data.read_parquet(files), cfg)
        .select_columns(["url", "content", "title"])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert default.equals(grouped)

    # forced LARGE bucket count (measured-rows sizing at a huge n_rows):
    # the grouped route's output must be invariant to the keyspace
    grouped_wide = (
        extract_grouped_by_lang(
            ray.data.read_parquet(files), cfg, n_rows=50_000_000
        )
        .select_columns(["url", "content", "title"])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert default.equals(grouped_wide)


def test_embedding_neardup(ray_session):
    import ray.data

    from docler_ray.stages.dedup import drop_id_set, embedding_neardup

    rng = np.random.RandomState(0)
    base = rng.standard_normal(64)
    near = base + rng.standard_normal(64) * 0.01  # cosine ~0.9999
    far = rng.standard_normal(64)
    rows = [
        {"vec_id": 1, "embedding": base.tolist()},
        {"vec_id": 2, "embedding": near.tolist()},
        {"vec_id": 3, "embedding": far.tolist()},
        {"vec_id": 4, "embedding": base.tolist()},  # exact dup
    ]
    ds = ray.data.from_items(rows)
    drop = drop_id_set(embedding_neardup(ds, threshold=0.99))
    assert 1 not in drop
    assert {2, 4} <= drop
    assert 3 not in drop
