"""In-band marker grammar — the docler-compatible span structure.

The reference encodes document structure inside the markdown text itself via
HTML comments produced by its external ``mkdown`` helper package (not
vendored; grammar characterized from usage sites and golden snapshots):

- page break: ``<!-- docler:page_break {"next_page":N} -->`` —
  /root/reference/README.md:253-263, golden examples at
  tests/__snapshots__/test_output.ambr:17,53; emission conventions at
  src/docler/converters/azure_provider/utils.py:45-56 and
  src/docler/converters/mistral_provider/provider.py:122-135.
- image reference: ``![id](filename)`` — usage at
  src/docler/converters/azure_provider/utils.py:28.
- chunk boundary comment — src/docler/chunkers/base.py:131-136.

"Byte-identical extracted text per url" (BASELINE.json north rule) hinges on
these exact strings, so every serializer in this engine goes through this
module and nothing else emits markers.
"""

from __future__ import annotations

import re

PAGE_BREAK_PREFIX = "<!-- docler:page_break "
_PAGE_BREAK_RE = re.compile(r"<!--\s*docler:page_break\s*\{\"next_page\":(\d+)\}\s*-->")


def create_page_break(next_page: int, newline_separators: int = 2) -> str:
    """Return a docler page-break marker surrounded by newline separators.

    ``create_page_break(next_page=1, newline_separators=1).lstrip()`` prepended
    to content puts the marker on its own line directly above the first content
    line, matching the azure golden snapshot
    (/root/reference/tests/__snapshots__/test_output.ambr:17-18).
    """
    sep = "\n" * newline_separators
    return f'{sep}<!-- docler:page_break {{"next_page":{next_page}}} -->{sep}'


def create_image_reference(image_id: str, filename: str) -> str:
    """``![id](filename)`` — the markdown image reference form."""
    return f"![{image_id}]({filename})"


def create_chunk_boundary(
    chunk_id: int | str,
    keywords: list[str] | None = None,
    extra_data: dict | None = None,
) -> str:
    """Chunk-boundary comment inserted before each chunk when requested.

    Analog of mkdown's ``create_chunk_boundary`` used at
    /root/reference/src/docler/chunkers/base.py:131-136.
    """
    import json

    payload: dict = {"chunk_id": chunk_id}
    if keywords:
        payload["keywords"] = keywords
    if extra_data:
        payload.update(extra_data)
    body = json.dumps(payload, separators=(",", ":"))
    return f"<!-- docler:chunk_boundary {body} -->"


def count_page_breaks(content: str) -> int:
    """``Document.page_count`` = number of page-break markers in the content
    (derived field, /root/reference/README.md:250)."""
    return len(_PAGE_BREAK_RE.findall(content))


def join_pages(page_markdowns: list[str]) -> str:
    """Join per-page markdown with numbered page-break markers.

    Exact restatement of the per-page assembly loop at
    /root/reference/src/docler/converters/mistral_provider/provider.py:122-135:
    first marker lstripped, every page's markdown lstripped, all parts joined
    with a double newline.
    """
    if not page_markdowns:
        return ""
    parts: list[str] = [create_page_break(next_page=1, newline_separators=1).lstrip()]
    parts.append(page_markdowns[0].lstrip())
    page_num = 1
    for page_md in page_markdowns[1:]:
        page_num += 1
        parts.append(create_page_break(next_page=page_num, newline_separators=1))
        parts.append(page_md.lstrip())
    return "\n\n".join(parts)


def prepend_first_page_marker(content: str) -> str:
    """Prepend the page-1 marker to single-blob content.

    Restates /root/reference/src/docler/converters/azure_provider/utils.py:55-56.
    """
    first = create_page_break(next_page=1, newline_separators=1).lstrip()
    return first + content
