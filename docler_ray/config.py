"""Declarative, discriminated job configuration (SURVEY.md §2.8).

The reference constructs every provider from a Pydantic config with a
``type`` discriminator and a ``get_provider()`` factory
(/root/reference/src/docler_config/converter_configs.py:461-475,
chunker_configs.py:143-146), rejecting unknown fields (``extra="forbid"``,
/root/reference/src/docler_config/provider.py:17-22). This module keeps that
contract in spirit — dataclasses + strict dict round-trip, no Pydantic
dependency — while the thing being configured is a Ray Data pipeline rather
than a per-document converter instance.

A job config document looks like:

    {
      "extractors": {"text/html": "html_extract",
                     "text/html|de": "html_extract"},
      "chunker": {"type": "markdown", "max_chunk_size": 1500,
                  "chunk_overlap": 50},
      "pipeline": {"extract_batch_size": 64, "num_buckets": 64,
                   "shards_per_round": null}
    }

``extractors`` keys are dispatch keys ("MIME" or "MIME|lang"); values are
names in the extractor registry (docler_ray.stages.dispatch.EXTRACTORS) —
user extractors registered via ``register_extractor`` become configurable
here with no further wiring.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, fields
from typing import Any

from docler_ray.pipelines.extract_pipeline import PipelineConfig
from docler_ray.stages.dispatch import EXTRACTORS


def _strict_kwargs(cls, data: dict, where: str) -> dict:
    allowed = {f.name for f in fields(cls)}
    unknown = set(data) - allowed
    if unknown:
        msg = f"Unknown {where} field(s): {sorted(unknown)}; allowed: {sorted(allowed)}"
        raise ValueError(msg)
    return data


@dataclass
class MarkdownChunkerConfig:
    """Header-split chunker (reference defaults: 1500-char fallback windows,
    50 overlap — chunkers/markdown_chunker/chunker.py:44-53)."""

    type: str = "markdown"
    max_chunk_size: int = 1500
    chunk_overlap: int = 50


@dataclass
class TokenChunkerConfig:
    """Line-window token-budget chunker (reference defaults:
    max_tokens_per_chunk=4000, 20-line overlap — token_chunker/chunker.py:39-136)."""

    type: str = "token"
    max_tokens_per_chunk: int = 4000
    chunk_overlap_lines: int = 20


_CHUNKER_TYPES = {
    "markdown": MarkdownChunkerConfig,
    "token": TokenChunkerConfig,
}


# --- extractor configs (discriminated union, reference parity) ---------------
#
# Mirrors the reference's per-provider config surface: a ``type``
# discriminator selecting the provider, a shared ``page_range`` base field
# (converter_configs.py:96-99), provider-specific knobs (pdf_password), and
# strict unknown-field rejection (provider.py:17-22) with
# from_dict/to_dict round-trip (provider.py:53-60).


@dataclass
class HtmlExtractorConfig:
    """html_extract knobs. ``page_range`` is accepted for interface parity
    (HTML pages are single-page; it is ignored); ``extract_images`` drops
    the images column payload when False."""

    type: str = "html_extract"
    page_range: str | None = None
    extract_images: bool = True


@dataclass
class PdfishExtractorConfig:
    """pdf_extract knobs: decryption password + 1-based page-range string
    ("1-5,7"), the reference's convert_content surface
    (base.py:118-225, pdf_utils.py:22-87)."""

    type: str = "pdf_extract"
    pdf_password: str | None = None
    page_range: str | None = None


@dataclass
class TextPassthroughConfig:
    type: str = "text_passthrough"


ExtractorConfig = HtmlExtractorConfig | PdfishExtractorConfig | TextPassthroughConfig

_EXTRACTOR_CONFIG_TYPES: dict[str, type] = {
    "html_extract": HtmlExtractorConfig,
    "pdf_extract": PdfishExtractorConfig,
    "text_passthrough": TextPassthroughConfig,
}


def extractor_config_from_dict(data: dict) -> ExtractorConfig:
    kind = data.get("type")
    cls = _EXTRACTOR_CONFIG_TYPES.get(kind)
    if cls is None:
        msg = (
            f"Unknown extractor type {kind!r}; one of "
            f"{sorted(_EXTRACTOR_CONFIG_TYPES)}"
        )
        raise ValueError(msg)
    return cls(**_strict_kwargs(cls, data, f"extractor[{kind}]"))


def extractor_options_dict(configs: list[ExtractorConfig]) -> dict[str, dict]:
    """Config chain -> the per-extractor options mapping ExtractDocs
    consumes: {extractor_name: {knob: value}} (the get_provider() analog —
    options land in the right extractor's fn, nothing else's)."""
    out: dict[str, dict] = {}
    for cfg in configs:
        d = asdict(cfg)
        name = d.pop("type")
        out[name] = {k: v for k, v in d.items() if v is not None}
    return out


def chunker_config_from_dict(data: dict) -> MarkdownChunkerConfig | TokenChunkerConfig:
    kind = data.get("type")
    cls = _CHUNKER_TYPES.get(kind)
    if cls is None:
        msg = f"Unknown chunker type {kind!r}; one of {sorted(_CHUNKER_TYPES)}"
        raise ValueError(msg)
    return cls(**_strict_kwargs(cls, data, f"chunker[{kind}]"))


def get_chunker(cfg: MarkdownChunkerConfig | TokenChunkerConfig):
    """Config -> map_batches callable (the get_provider() analog)."""
    from docler_ray.stages.chunk import make_chunker

    if isinstance(cfg, MarkdownChunkerConfig):
        return make_chunker(
            "markdown",
            max_chunk_size=cfg.max_chunk_size,
            chunk_overlap=cfg.chunk_overlap,
        )
    return make_chunker(
        "token",
        max_tokens_per_chunk=cfg.max_tokens_per_chunk,
        chunk_overlap_lines=cfg.chunk_overlap_lines,
    )


@dataclass
class JobConfig:
    """Whole-job declarative config: dispatch preferences + chunker +
    pipeline knobs. Round-trips through ``to_dict``/``from_dict``."""

    extractors: dict[str, str] | None = None
    extractor_options: list[ExtractorConfig] | None = None
    chunker: MarkdownChunkerConfig | TokenChunkerConfig | None = None
    pipeline: PipelineConfig | None = None

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> "JobConfig":
        data = dict(data)
        unknown = set(data) - {"extractors", "extractor_options", "chunker", "pipeline"}
        if unknown:
            msg = f"Unknown job config section(s): {sorted(unknown)}"
            raise ValueError(msg)
        extractors = data.get("extractors")
        if extractors is not None:
            for key, name in extractors.items():
                if name not in EXTRACTORS:
                    msg = (
                        f"extractors[{key!r}] = {name!r} is not a registered "
                        f"extractor; known: {sorted(EXTRACTORS)}"
                    )
                    raise ValueError(msg)
        extractor_options = data.get("extractor_options")
        if extractor_options is not None:
            extractor_options = [
                extractor_config_from_dict(dict(d)) for d in extractor_options
            ]
        chunker = data.get("chunker")
        if chunker is not None:
            chunker = chunker_config_from_dict(chunker)
        pipeline = data.get("pipeline")
        if pipeline is not None:
            pipeline = PipelineConfig(
                **_strict_kwargs(PipelineConfig, dict(pipeline), "pipeline")
            )
        return cls(
            extractors=extractors,
            extractor_options=extractor_options,
            chunker=chunker,
            pipeline=pipeline,
        )

    @classmethod
    def from_json(cls, path: str) -> "JobConfig":
        with open(path, encoding="utf-8") as f:
            return cls.from_dict(json.load(f))

    def to_dict(self) -> dict[str, Any]:
        out: dict[str, Any] = {}
        if self.extractors is not None:
            out["extractors"] = dict(self.extractors)
        if self.extractor_options is not None:
            out["extractor_options"] = [asdict(c) for c in self.extractor_options]
        if self.chunker is not None:
            out["chunker"] = asdict(self.chunker)
        if self.pipeline is not None:
            out["pipeline"] = asdict(self.pipeline)
        return out

    def build_pipeline_config(self) -> PipelineConfig:
        """Merge the dispatch preferences + extractor option chain into the
        pipeline knobs."""
        cfg = self.pipeline or PipelineConfig()
        if self.extractors:
            merged = dict(cfg.preferences or {})
            merged.update(self.extractors)
            cfg.preferences = merged
        if self.extractor_options:
            merged_opts = dict(cfg.extract_options or {})
            merged_opts.update(extractor_options_dict(self.extractor_options))
            cfg.extract_options = merged_opts
        return cfg
