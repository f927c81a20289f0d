"""The extraction stage: an actor-pool ``map_batches`` callable.

Ray restatement of the reference's ``convert_content`` path
(/root/reference/src/docler/converters/base.py:118-225): MIME dispatch,
PDF-decryption probing, extraction, Document assembly with the
title-fallback convention (``result.title or "Untitled"``, base.py:205-212)
— all per ROW inside an Arrow batch, with per-row error capture instead of
the reference's chunk-wide failure blast radius
(dir_converter.py:154-157; design note SURVEY.md §7.4).

Stateful setup (dispatch table, parser tables) happens once per actor in
``__init__`` — the columnar analog of the reference's model-loading
constructors (SURVEY.md §2.4).
"""

from __future__ import annotations

import json

import pyarrow as pa

from docler_ray.markers import count_page_breaks
from docler_ray.models import DOCS_SCHEMA, EXTRACTOR_VERSION
from docler_ray.stages.dispatch import build_dispatch, lookup


class ExtractDocs:
    """Callable class for ``ds.map_batches(ExtractDocs, concurrency=N, ...)``.

    One instance per actor; ``__call__`` maps a pages batch (url, warc_ts,
    html, text, lang, mime_type[, url_hash, shard_id]) to a docs batch
    (docler_ray.models.DOCS_SCHEMA plus any passthrough partition columns).
    """

    PASSTHROUGH = ("url_hash", "shard_id")

    def __init__(
        self,
        preferences: dict[str, str] | None = None,
        options: dict | None = None,
    ) -> None:
        self.dispatch = build_dispatch(preferences)
        self.options = options or {}
        # options may be flat ({"pdf_password": ...}, applies to every
        # extractor) or keyed per extractor name ({"pdf_extract": {...}},
        # the ExtractorConfig-chain form) — resolve once per actor.
        from docler_ray.stages.dispatch import EXTRACTORS

        flat = {
            k: v
            for k, v in self.options.items()
            if not (k in EXTRACTORS and isinstance(v, dict))
        }
        self._options_by_name = {
            name: {**flat, **self.options.get(name, {})} for name in EXTRACTORS
        }

    def options_for(self, name: str) -> dict:
        return self._options_by_name.get(name, self.options)

    def extract_row(
        self, mime: str, payload: bytes, text: str, lang: str = ""
    ) -> tuple[dict | None, str | None, str]:
        """Returns (result_fields, error, extractor_name) for one document.

        Dispatch is (mime, lang) -> extractor, most-specific first
        (docler_ray.stages.dispatch.lookup).
        """
        entry = lookup(self.dispatch, mime, lang)
        if entry is None:
            if text:
                # unsupported payload but usable pre-extracted text fallback
                entry = lookup(self.dispatch, "text/plain", lang)
            if entry is None or not text:
                supported = sorted(self.dispatch)
                return None, f"Unsupported MIME type {mime}. Must be one of: {supported}", ""
            name, fn = entry
            try:
                result = fn(b"", text, self.options_for(name))
            except Exception as e:  # noqa: BLE001 - per-row capture by design
                return None, f"{type(e).__name__}: {e}", name
            return result.__dict__, None, name
        name, fn = entry
        try:
            result = fn(payload or b"", text or "", self.options_for(name))
        except Exception as e:  # noqa: BLE001 - per-row capture by design
            return None, f"{type(e).__name__}: {e}", name
        return result.__dict__, None, name

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("html").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        mimes = batch.column("mime_type").to_pylist()

        contents: list[str] = []
        titles: list[str] = []
        page_counts: list[int] = []
        metadatas: list[str] = []
        images_col: list[list[dict]] = []
        errors: list[str | None] = []
        extractors: list[str] = []

        for url, payload, text, mime, lang in zip(urls, payloads, texts, mimes, langs):
            fields, error, name = self.extract_row(mime, payload, text or "", lang or "")
            if fields is None:
                contents.append("")
                titles.append("Untitled")
                page_counts.append(0)
                metadatas.append("{}")
                images_col.append([])
                errors.append(error)
                extractors.append(name)
                continue
            content = fields["content"]
            contents.append(content)
            # title fallback chain (base.py:208): result title, else "Untitled"
            titles.append(fields.get("title") or "Untitled")
            page_counts.append(count_page_breaks(content))
            metadatas.append(json.dumps(fields.get("metadata") or {}, sort_keys=True))
            images_col.append(
                [
                    {
                        "id": img["id"],
                        "filename": img.get("filename", ""),
                        "mime_type": img.get("mime_type", ""),
                        "content": img.get("content", b"") or b"",
                    }
                    for img in fields.get("images") or []
                ]
            )
            errors.append(None)
            extractors.append(name)

        columns: dict[str, pa.Array] = {
            "url": pa.array(urls, type=pa.string()),
            "content": pa.array(contents, type=pa.string()),
            "title": pa.array(titles, type=pa.string()),
            "mime_type": pa.array(mimes, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "page_count": pa.array(page_counts, type=pa.int32()),
            "metadata": pa.array(metadatas, type=pa.string()),
            "images": pa.array(images_col, type=DOCS_SCHEMA.field("images").type),
            "error": pa.array(errors, type=pa.string()),
            "extractor": pa.array(extractors, type=pa.string()),
            "extractor_version": pa.array(
                [EXTRACTOR_VERSION] * len(urls), type=pa.string()
            ),
        }
        for col in self.PASSTHROUGH:
            if col in batch.column_names:
                columns[col] = batch.column(col)
        return pa.table(columns)
