"""Chunkers: document content -> list of chunk dicts (flat-map tier).

Exact functional re-implementation of the reference chunker semantics:

- markdown header chunker —
  /root/reference/src/docler/chunkers/markdown_chunker/chunker.py:20-106 and
  utils.py:15-58 (header split on ``^#{1,6}\\s``, 1500-char fallback windows
  with 50-char overlap, image assignment by ``![..](filename)`` reference);
- token-aware chunker —
  /root/reference/src/docler/chunkers/token_chunker/chunker.py:39-136
  (line-window growth to a token budget, 20-line overlap, +50 stuck guard),
  with the unavailable ``tokonomics`` tokenizer replaced by a deterministic
  BPE-ish regex tokenizer (docler_ray.functions.tokens).

Chunk rows follow docler_ray.models.CHUNKS_SCHEMA; ``images`` entries are the
image dicts of the parent doc that the chunk references.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import Any

from docler_ray.functions.tokens import count_tokens

_HEADER_RE = re.compile(r"^(#{1,6})\s+(.+)$")
_IMAGE_REF_RE = re.compile(r"!\[([^\]]*)\]\(([^)]+)\)")


def split_by_headers(text: str) -> Iterator[tuple[str, str, int]]:
    """Yield (header, content, level) sections.

    Matches the reference exactly (markdown_chunker/utils.py:34-58), including
    its quirk that a header immediately followed by another header yields no
    section (content accumulates only on non-header lines).
    """
    current_header = ""
    current_level = 0
    current_content: list[str] = []
    for line in text.splitlines():
        if match := _HEADER_RE.match(line):
            if current_content:
                yield current_header, "\n".join(current_content), current_level
                current_content = []
            current_level = len(match.group(1))
            current_header = match.group(2)
        else:
            current_content.append(line)
    if current_content:
        yield current_header, "\n".join(current_content), current_level


def assign_images(content: str, all_images: list[dict]) -> tuple[str, list[dict]]:
    """Assign to a chunk every image whose filename is referenced in its text
    (markdown_chunker/utils.py:15-31: first filename match wins per reference)."""
    chunk_images: list[dict] = []
    for match in _IMAGE_REF_RE.finditer(content):
        image_path = match.group(2)
        for image in all_images:
            if image.get("filename") == image_path:
                chunk_images.append(image)
                break
    return content, chunk_images


def _fallback_split(
    content: str,
    images: list[dict],
    max_chunk_size: int,
    chunk_overlap: int,
) -> Iterator[tuple[str, list[dict]]]:
    """Size-window split (markdown_chunker/chunker.py:44-53)."""
    start = 0
    while start < len(content):
        chunk_content = content[start : start + max_chunk_size]
        chunk_content, chunk_images = assign_images(chunk_content, images)
        yield chunk_content, chunk_images
        start += max_chunk_size - chunk_overlap


def chunk_markdown(
    content: str,
    images: list[dict] | None = None,
    source_doc_id: str = "",
    *,
    min_chunk_size: int = 200,
    max_chunk_size: int = 1500,
    chunk_overlap: int = 50,
    extra_metadata: dict[str, Any] | None = None,
) -> list[dict]:
    """Header-based chunking with size fallback — reference defaults
    (min 200 / max 1500 / overlap 50, markdown_chunker/chunker.py:26-42)."""
    images = images or []
    chunks: list[dict] = []
    chunk_idx = 0

    def emit(chunk_content: str, chunk_images: list[dict], meta: dict) -> None:
        nonlocal chunk_idx
        chunks.append(
            {
                "content": chunk_content,
                "source_doc_id": source_doc_id,
                "chunk_index": chunk_idx,
                "images": chunk_images,
                "metadata": meta,
            }
        )
        chunk_idx += 1

    header_sections = list(split_by_headers(content))
    if not header_sections:
        for sub_content, chunk_images in _fallback_split(
            content, images, max_chunk_size, chunk_overlap
        ):
            emit(sub_content, chunk_images, dict(extra_metadata or {}))
        return chunks

    for header, section, level in header_sections:
        meta = {**(extra_metadata or {}), "header": header, "level": level}
        if len(section) > max_chunk_size:
            for sub_content, chunk_images in _fallback_split(
                section, images, max_chunk_size, chunk_overlap
            ):
                emit(f"{header}\n\n{sub_content}", chunk_images, meta)
        else:
            section, chunk_images = assign_images(section, images)
            emit(f"{header}\n\n{section}", chunk_images, meta)
    return chunks


def _trailing_ws(s: str) -> str:
    """The trailing whitespace run of ``s`` (possibly empty or all of it)."""
    i = len(s)
    while i > 0 and s[i - 1].isspace():
        i -= 1
    return s[i:]


def chunk_by_tokens(
    content: str,
    images: list[dict] | None = None,
    source_doc_id: str = "",
    *,
    max_tokens_per_chunk: int = 4000,
    chunk_overlap_lines: int = 20,
    extra_metadata: dict[str, Any] | None = None,
) -> list[dict]:
    """Token-budget line-window chunking (token_chunker/chunker.py:65-136):
    start at 100 lines, grow while the next line still fits the budget,
    overlap 20 lines, jump +50 past the previous start when stuck."""
    images = images or []
    lines = content.splitlines()
    chunks: list[dict] = []
    chunk_index = 0
    start_idx = 0
    meta = extra_metadata or {}

    while start_idx < len(lines):
        end_idx = min(start_idx + 100, len(lines))
        current_chunk = "\n".join(lines[start_idx:end_idx])
        token_count = count_tokens(current_chunk)
        # Incremental growth: appending "\n"+line changes the count only at
        # the join boundary, and regex matches can span that boundary only
        # through the trailing WHITESPACE RUN of the chunk (the BPE-ish
        # pattern's ` ?X` forms consume a literal space, never "\n", and
        # letter/digit/punct runs stop at whitespace) — so
        # delta = count(tail_ws + "\n" + line) - count(tail_ws) is exact.
        # This makes the grow loop linear instead of re-tokenizing the whole
        # chunk per appended line (O(n^2) on long documents —
        # round-1 VERDICT finding 6); an A/B test pins equality with the
        # naive recompute.
        tail_ws = _trailing_ws(current_chunk)
        while end_idx < len(lines) and token_count < max_tokens_per_chunk - count_tokens(
            lines[end_idx]
        ):
            line = lines[end_idx]
            joined = tail_ws + "\n" + line
            token_count += count_tokens(joined) - count_tokens(tail_ws)
            line_tail = _trailing_ws(line)
            tail_ws = joined if line_tail == line else line_tail
            end_idx += 1
        current_chunk = "\n".join(lines[start_idx:end_idx])

        chunk_images = [
            img for img in images if img.get("filename") and img["filename"] in current_chunk
        ]
        chunk_metadata = {
            **meta,
            "token_count": token_count,
            "line_range": (start_idx + 1, end_idx),
            "start_line": start_idx + 1,
            "end_line": end_idx,
        }
        chunks.append(
            {
                "content": current_chunk,
                "source_doc_id": source_doc_id,
                "chunk_index": chunk_index,
                "images": chunk_images,
                "metadata": chunk_metadata,
            }
        )
        chunk_index += 1
        start_idx = end_idx - chunk_overlap_lines
        if start_idx <= chunks[-1]["metadata"]["start_line"] - 1:
            start_idx = chunks[-1]["metadata"]["start_line"] + 50
        if start_idx >= len(lines):
            break
    return chunks


def chunk_by_bpe_tokens(
    content: str,
    ranks: dict,
    *,
    max_tokens_per_chunk: int = 4000,
    base_lines: int = 100,
    overlap_lines: int = 20,
    jump_lines: int = 50,
) -> list[dict]:
    """Token-budget line-window chunking under a TRAINED BPE tokenizer —
    reference parity for the token chunker's REAL-tokenizer budget
    (token_chunker/chunker.py:21-36 counts with tokonomics; here the
    budget is trained-BPE pieces of the lowercase [a-z]+ word stream,
    the exact counting contract of stages/vocab.bpe_encode_stats, so the
    whole chunker is SQL-replayable through the BPE encode recursion).

    Same loop shape as :func:`chunk_by_tokens` (grow-from-base window,
    line overlap, stuck-jump) — but BPE word pieces can never span a
    line boundary, so per-line costs + prefix sums make the grow loop
    exact and linear with no boundary-delta machinery."""
    from docler_ray.stages.vocab import _BPE_WORD_RE, _encode_word

    lines = content.splitlines()
    cache: dict[str, int] = {}

    def line_cost(line: str) -> int:
        total = 0
        for w in _BPE_WORD_RE.findall(line.lower()):
            p = cache.get(w)
            if p is None:
                p = cache[w] = _encode_word(w, ranks)
            total += p
        return total

    costs = [line_cost(ln) for ln in lines]
    pre = [0]
    for c in costs:
        pre.append(pre[-1] + c)
    chunks: list[dict] = []
    start = 0
    ci = 0
    while start < len(lines):
        end = min(start + base_lines, len(lines))
        tc = pre[end] - pre[start]
        while end < len(lines) and tc < max_tokens_per_chunk - costs[end]:
            tc += costs[end]
            end += 1
        chunks.append(
            {
                "chunk_index": ci,
                "start_line": start + 1,
                "end_line": end,
                "token_count": tc,
                "content": "\n".join(lines[start:end]),
            }
        )
        ci += 1
        prev_start = start
        start = end - overlap_lines
        if start <= prev_start:
            # chunk_by_tokens' stuck-jump quirk: 1-based prev start + jump
            start = prev_start + 1 + jump_lines
        if start >= len(lines):
            break
    return chunks
