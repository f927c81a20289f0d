"""Chunking stage: docs batch -> exploded chunks batch (flat-map tier).

Stateless ``map_batches`` transform wrapping the pure chunkers in
docler_ray.functions.chunkers (reference semantics per SURVEY.md §2.5). One
docs row yields N chunks rows; error rows yield nothing.
"""

from __future__ import annotations

import json

import pyarrow as pa

from docler_ray.functions.chunkers import (
    chunk_by_bpe_tokens,
    chunk_by_tokens,
    chunk_markdown,
)
from docler_ray.models import CHUNKS_SCHEMA


def make_chunker(
    kind: str = "markdown",
    *,
    max_chunk_size: int = 1500,
    chunk_overlap: int = 50,
    max_tokens_per_chunk: int = 4000,
    chunk_overlap_lines: int = 20,
    ranks: dict | None = None,
):
    """Build a picklable chunk-explode fn for ``map_batches``.

    kind: "markdown" (header split, reference defaults), "token"
    (line-window regex-token budget), or "bpe" (line-window budget under
    a TRAINED BPE merge table — pass ``ranks`` from
    ``stages.vocab.train_bpe``; the pipeline CLI trains it on the
    extracted corpus, the real-tokenizer analog of the reference's
    tokonomics budget)."""
    if kind not in ("markdown", "token", "bpe"):
        msg = f"Unknown chunker kind: {kind!r}"
        raise ValueError(msg)
    if kind == "bpe" and ranks is None:
        msg = "bpe chunker needs a trained merge table (ranks=)"
        raise ValueError(msg)

    def chunk_batch(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        contents = batch.column("content").to_pylist()
        errors = (
            batch.column("error").to_pylist()
            if "error" in batch.column_names
            else [None] * len(urls)
        )
        images_col = (
            batch.column("images").to_pylist()
            if "images" in batch.column_names
            else [[] for _ in urls]
        )

        out_url: list[str] = []
        out_idx: list[int] = []
        out_content: list[str] = []
        out_header: list[str] = []
        out_level: list[int] = []
        out_meta: list[str] = []
        out_image_ids: list[list[str]] = []

        for url, content, error, images in zip(urls, contents, errors, images_col):
            if error or not content:
                continue
            images = images or []
            if kind == "markdown":
                chunks = chunk_markdown(
                    content,
                    images,
                    url,
                    max_chunk_size=max_chunk_size,
                    chunk_overlap=chunk_overlap,
                )
            elif kind == "token":
                chunks = chunk_by_tokens(
                    content,
                    images,
                    url,
                    max_tokens_per_chunk=max_tokens_per_chunk,
                    chunk_overlap_lines=chunk_overlap_lines,
                )
            else:  # bpe: adapt to the explode schema (same image rule
                # as the token chunker: filename substring match)
                chunks = [
                    {
                        "chunk_index": c["chunk_index"],
                        "content": c["content"],
                        "images": [
                            img
                            for img in images
                            if img.get("filename")
                            and img["filename"] in c["content"]
                        ],
                        "metadata": {
                            "token_count": c["token_count"],
                            "start_line": c["start_line"],
                            "end_line": c["end_line"],
                        },
                    }
                    for c in chunk_by_bpe_tokens(
                        content,
                        ranks,
                        max_tokens_per_chunk=max_tokens_per_chunk,
                        overlap_lines=chunk_overlap_lines,
                    )
                ]
            for c in chunks:
                out_url.append(url)
                out_idx.append(c["chunk_index"])
                out_content.append(c["content"])
                meta = c["metadata"]
                out_header.append(str(meta.get("header", "")))
                lvl = meta.get("level", 0)
                out_level.append(int(lvl) if lvl is not None else 0)
                out_meta.append(json.dumps(meta, sort_keys=True, default=str))
                out_image_ids.append([img["id"] for img in c["images"]])

        return pa.table(
            {
                "url": pa.array(out_url, type=pa.string()),
                "chunk_index": pa.array(out_idx, type=pa.int32()),
                "content": pa.array(out_content, type=pa.string()),
                "header": pa.array(out_header, type=pa.string()),
                "level": pa.array(out_level, type=pa.int32()),
                "metadata": pa.array(out_meta, type=pa.string()),
                "image_ids": pa.array(out_image_ids, type=pa.list_(pa.string())),
            },
            schema=CHUNKS_SCHEMA,
        )

    return chunk_batch
