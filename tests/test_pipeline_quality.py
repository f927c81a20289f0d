"""Flagship-pipeline quality gates: gopher/c4 filters integrated into
extract_dataset, equivalence with the standalone kernels, error-row
preservation, and the off-by-default contract."""

from __future__ import annotations

import pandas as pd
import pytest

from docler_ray.functions.gopher import GopherConfig, gopher_signals
from docler_ray.functions.textclean import LineFilterConfig, clean_document
from docler_ray.pipelines.extract_pipeline import (
    PipelineConfig,
    extract_dataset,
)
from docler_ray.sources.synth import generate_pages_table


def _pages_ds(n=120):
    import ray.data

    return ray.data.from_arrow(generate_pages_table(n, seed=42, start=0))


def _run(cfg: PipelineConfig, n=120) -> pd.DataFrame:
    return extract_dataset(_pages_ds(n), cfg).to_pandas()


GOPHER_CFG = GopherConfig(min_words=20, min_stopword_hits=0)


def test_quality_off_by_default_unchanged(ray_session):
    base = _run(PipelineConfig())
    again = _run(PipelineConfig(quality_filters=()))
    assert base["content"].tolist() == again["content"].tolist()


def test_gopher_gate_filters_and_keeps_error_rows(ray_session):
    base = _run(PipelineConfig())
    gated = _run(
        PipelineConfig(quality_filters=("gopher",), gopher_cfg=GOPHER_CFG)
    )
    # every surviving non-error row passes the gopher rules on its content
    ok = gated[gated["error"].isna() | (gated["error"] == "")]
    assert all(
        gopher_signals(c, GOPHER_CFG)["keep"] for c in ok["content"]
    )
    # the gate is equivalent to filtering the ungated run row-by-row
    base_err = base["error"].fillna("") != ""
    expect_keep = base.apply(
        lambda r: (r["error"] or "") != ""
        or gopher_signals(r["content"], GOPHER_CFG)["keep"],
        axis=1,
    )
    assert sorted(gated["url"]) == sorted(base.loc[expect_keep, "url"])
    # error rows pass through untouched
    assert base_err.sum() == (gated["error"].fillna("") != "").sum()
    assert len(gated) < len(base)  # the gate actually fires on this corpus


def test_c4_gate_rewrites_content(ray_session):
    cfg_c4 = LineFilterConfig(
        min_words=3,
        require_terminal_punct=False,
        banned_line_substrings=(),
        banned_doc_substrings=(),
    )
    base = _run(PipelineConfig())
    cleaned = _run(PipelineConfig(quality_filters=("c4",), c4_cfg=cfg_c4))
    got = dict(zip(cleaned["url"], cleaned["content"]))
    for _, r in base.iterrows():
        want, _, _, banned = clean_document(r["content"], cfg_c4)
        assert not banned
        assert got[r["url"]] == want
    assert {"n_lines_kept", "n_lines_total"} <= set(cleaned.columns)


def test_unknown_quality_filter_raises(ray_session):
    with pytest.raises(ValueError, match="unknown quality filter"):
        _run(PipelineConfig(quality_filters=("nope",)))
