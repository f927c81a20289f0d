"""Per-record markdown normalizers — the reference's scalar-function tier
(SURVEY.md §2.3), re-implemented as pure string functions usable inside any
``map_batches`` UDF.

Each function cites the behavior it restates:
- ``replace_page_breaks`` — azure ``<!-- PageBreak -->`` markers renumbered
  into docler markers with a prepended page-1 marker
  (/root/reference/src/docler/converters/azure_provider/utils.py:45-56).
- ``replace_figures_with_images`` — ``<figure>...</figure>`` blocks replaced
  by ordinal image references (azure_provider/utils.py:22-30).
- ``replace_numbered_page_breaks`` — datalab ``{N}----------------`` page
  separators (datalab_provider/utils.py:88-113 pattern).
- ``replace_slide_markers`` — markitdown ``<!-- Slide number: N -->``
  (markitdown_provider/provider.py:103-113).
- ``extract_inline_base64_images`` — ``![alt](data:image/..;base64,..)``
  pulled out as image records with rewritten references
  (docling_remote_provider/utils.py:12-36, mistral_provider/utils.py:13-42).
- ``add_chunk_boundaries`` — boundary comments inserted per chunk
  (chunkers/base.py:98-223).
"""

from __future__ import annotations

import base64
import re

from docler_ray.markers import (
    create_chunk_boundary,
    create_image_reference,
    create_page_break,
)

_AZURE_PAGEBREAK_RE = re.compile(r"<!--\s*PageBreak\s*-->")
_SLIDE_RE = re.compile(r"<!-- Slide number:\s*(\d+)\s*-->")
_DATALAB_PAGE_RE = re.compile(r"\{(\d+)\}-{3,}")
_FIGURE_RE = re.compile(r"<figure>(.*?)</figure>", re.DOTALL)
_DATA_URL_IMG_RE = re.compile(
    r"!\[([^\]]*)\]\(data:image/([a-zA-Z0-9.+-]+);base64,([A-Za-z0-9+/=\s]+)\)"
)


def replace_page_breaks(content: str) -> str:
    """Azure-style anonymous page breaks -> numbered docler markers, with the
    page-1 marker prepended (exact azure_provider/utils.py:45-56 semantics)."""
    page_num = 1

    def _sub(match: re.Match[str]) -> str:
        nonlocal page_num
        page_num += 1
        return create_page_break(next_page=page_num, newline_separators=1)

    processed = _AZURE_PAGEBREAK_RE.sub(_sub, content)
    first = create_page_break(next_page=1, newline_separators=1).lstrip()
    return first + processed


def replace_slide_markers(content: str) -> str:
    """MarkItDown slide markers -> numbered page breaks
    (markitdown_provider/provider.py:103-113: non-numeric slide -> page 1)."""

    def _sub(match: re.Match[str]) -> str:
        try:
            page = int(match.group(1))
        except (TypeError, ValueError):
            page = 1
        return create_page_break(next_page=page)

    return _SLIDE_RE.sub(_sub, content)


def replace_numbered_page_breaks(content: str) -> str:
    """DataLab ``{N}----`` separators -> docler markers; N is 0-based in the
    source, next_page is N+2 (the separator sits after page N+1)."""

    def _sub(match: re.Match[str]) -> str:
        page = int(match.group(1))
        return create_page_break(next_page=page + 2, newline_separators=1)

    processed = _DATALAB_PAGE_RE.sub(_sub, content)
    first = create_page_break(next_page=1, newline_separators=1).lstrip()
    return first + processed


def replace_figures_with_images(content: str, images: list[dict]) -> str:
    """Ordinal ``<figure>`` -> ``![id](filename)`` pairing
    (azure_provider/utils.py:22-30: first N figures get the N images)."""
    blocks = _FIGURE_RE.findall(content)
    for i, block in enumerate(blocks):
        if i < len(images):
            img = images[i]
            ref = create_image_reference(img["id"], img.get("filename") or "")
            content = content.replace(f"<figure>{block}</figure>", ref, 1)
    return content


def extract_inline_base64_images(
    content: str, id_prefix: str = "extracted-img"
) -> tuple[str, list[dict]]:
    """Pull inline data-URL images out into image records; rewrite each
    reference to point at the extracted filename. Returns (content, images)."""
    images: list[dict] = []

    def _sub(match: re.Match[str]) -> str:
        idx = len(images)
        ext = match.group(2).lower().replace("jpg", "jpeg")
        image_id = f"{id_prefix}-{idx}"
        filename = f"{image_id}.{ext.split('+')[0]}"
        try:
            payload = base64.b64decode("".join(match.group(3).split()))
        except Exception:
            return match.group(0)  # leave malformed data-URLs untouched
        images.append(
            {
                "id": image_id,
                "filename": filename,
                "mime_type": f"image/{ext}",
                "content": payload,
            }
        )
        return create_image_reference(image_id, filename)

    new_content = _DATA_URL_IMG_RE.sub(_sub, content)
    return new_content, images


def add_chunk_boundaries(content: str, chunks: list[dict]) -> str:
    """Insert chunk-boundary comments into content
    (chunkers/base.py:98-223): line-range-aware when chunks carry
    start_line/end_line metadata (token chunker), otherwise a single boundary
    for chunk 0 at the top (markdown chunker path — the reference breaks out
    of its loop after the first chunk in that case).

    Intentional deviation: the reference drops the FIRST chunk's lines when
    more than one line-ranged chunk exists (base.py:160-169 only re-emits
    chunk 0's content when it is also the last chunk) — a data-loss bug this
    implementation fixes by emitting chunk 0's lines up to the next chunk's
    start, so every input line survives boundary insertion."""
    if not chunks:
        return content
    lines = content.splitlines()
    out: list[str] = []
    ordered = sorted(
        chunks, key=lambda c: c["metadata"].get("start_line", c["chunk_index"])
    )
    for i, chunk in enumerate(ordered):
        meta = chunk.get("metadata") or {}
        start_line = meta.get("start_line")
        end_line = meta.get("end_line")
        if i == 0 and start_line is None:
            boundary = create_chunk_boundary(
                chunk_id=chunk["chunk_index"],
                keywords=meta.get("keywords"),
                extra_data=meta,
            )
            out.append(boundary)
            out.append(content)
            break
        if start_line is not None and end_line is not None:
            start_idx = max(0, start_line - 1)
            extra = {
                k: v
                for k, v in meta.items()
                if k not in {"start_line", "end_line", "keywords", "token_count"}
            }
            boundary = create_chunk_boundary(
                chunk_id=chunk["chunk_index"],
                keywords=meta.get("keywords"),
                extra_data=extra,
            )
            if i == 0:
                out.extend(lines[:start_idx])
            out.append(boundary)
            if i == len(ordered) - 1:
                out.extend(lines[start_idx:])
            else:
                next_start = ordered[i + 1]["metadata"].get(
                    "start_line", len(lines) + 1
                )
                out.extend(lines[start_idx : max(0, next_start - 1)])
    return "\n".join(out) if out else content


def insert_page_breaks_by_anchor(
    content: str, anchors: list[tuple[int, str]]
) -> str:
    """Upstage-style anchor-search page-break insertion
    (/root/reference/src/docler/converters/upstage_provider/provider.py:156-193):
    prepend the lstripped page-1 marker, then for each (page_num, anchor)
    with page_num >= 2 in ascending page order, find the anchor text AFTER
    the previous insertion point and insert a numbered marker (single
    newline separators) directly before it. Anchors that cannot be found
    (or are empty) are skipped, matching the reference's warn-and-continue.
    """
    from docler_ray.markers import create_page_break

    first_marker = create_page_break(next_page=1, newline_separators=1).lstrip()
    out = first_marker + content.lstrip()
    offset = len(first_marker)
    for page_num, anchor in sorted(anchors, key=lambda a: a[0]):
        if page_num < 2 or not anchor:
            continue
        found = out.find(anchor, offset)
        if found == -1:
            continue
        marker = create_page_break(next_page=page_num, newline_separators=1)
        out = out[:found] + marker + out[found:]
        offset = found + len(marker) + len(anchor)
    return out
