"""Layout parse of pdfish payloads: span -> line -> block accumulation.

The engine's analog of the reference's local PDF/layout converters
(docling/marker, /root/reference/src/docler/converters/docling_provider/provider.py:30-168):
per page, spans are sorted into reading order, clustered into lines by
y-proximity and into blocks by inter-line gaps, headings are detected by
font-size ratio against the page's body size, and pages are joined with the
docler page-break grammar (per-page assembly convention of
mistral_provider/provider.py:122-135 via docler_ray.markers.join_pages).
"""

from __future__ import annotations

from collections import Counter

from docler_ray.html.extract import ExtractionResult
from docler_ray.markers import join_pages
from docler_ray.page_ranges import parse_page_range
from docler_ray.pdfish.format import PdfishPage, Span, decode_pdfish

# font-size ratio (vs page body size) -> heading level
_HEADING_LEVELS = ((1.8, 1), (1.45, 2), (1.2, 3))

_BULLETS = ("• ", "· ", "- ", "* ")


def _body_font_size(page: PdfishPage) -> float:
    if not page.spans:
        return 10.0
    counts: Counter[float] = Counter(round(s.font_size, 2) for s in page.spans)
    # most common size; ties broken toward the smaller size (body < headings)
    best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
    return best[0]


def _group_lines(spans: list[Span]) -> list[list[Span]]:
    """Cluster spans into lines: same baseline within half the font size."""
    ordered = sorted(spans, key=lambda s: (s.y, s.x))
    lines: list[list[Span]] = []
    for span in ordered:
        if lines:
            last = lines[-1]
            tol = max(last[0].font_size, span.font_size) * 0.5
            if abs(span.y - last[0].y) <= tol:
                last.append(span)
                continue
        lines.append([span])
    for line in lines:
        line.sort(key=lambda s: s.x)
    return lines


def _line_text(line: list[Span]) -> str:
    parts: list[str] = []
    prev: Span | None = None
    for span in line:
        if prev is not None:
            gap = span.x - (prev.x + prev.w)
            parts.append(" " if gap > prev.font_size * 0.15 else "")
        parts.append(span.text)
        prev = span
    return "".join(parts)


def _group_blocks(lines: list[list[Span]]) -> list[list[list[Span]]]:
    """Cluster consecutive lines into blocks by vertical gap and font size."""
    blocks: list[list[list[Span]]] = []
    for line in lines:
        if blocks:
            prev_line = blocks[-1][-1]
            gap = line[0].y - prev_line[0].y
            size = max(prev_line[0].font_size, line[0].font_size)
            same_style = abs(prev_line[0].font_size - line[0].font_size) < 0.01
            if gap <= size * 1.6 and same_style:
                blocks[-1].append(line)
                continue
        blocks.append([line])
    return blocks


def _render_block(block: list[list[Span]], body_size: float) -> str:
    size = block[0][0].font_size
    texts = [_line_text(line) for line in block]
    texts = [t for t in (t.strip() for t in texts) if t]
    if not texts:
        return ""
    ratio = size / body_size if body_size else 1.0
    for threshold, level in _HEADING_LEVELS:
        if ratio >= threshold:
            return f"{'#' * level} {' '.join(texts)}"
    if all(t.startswith(_BULLETS) for t in texts):
        items = []
        for t in texts:
            for b in _BULLETS:
                if t.startswith(b):
                    items.append(f"- {t[len(b):]}")
                    break
        return "\n".join(items)
    return " ".join(texts)


def render_page(page: PdfishPage) -> str:
    """One page of spans -> markdown blocks joined with double newlines."""
    if not page.spans:
        return ""
    body_size = _body_font_size(page)
    lines = _group_lines(page.spans)
    blocks = _group_blocks(lines)
    rendered = [_render_block(b, body_size) for b in blocks]
    return "\n\n".join(r for r in rendered if r)


def extract_pdfish(
    payload: bytes,
    password: str | None = None,
    page_range: str | None = None,
) -> ExtractionResult:
    """pdfish payload -> markdown with page-break markers.

    ``page_range`` is the reference's 1-based "1-5,7" selection
    (/root/reference/src/docler/pdf_utils.py:138-179): selected pages are
    extracted and renumbered 1..k, exactly as a rewritten sub-PDF would be.
    """
    doc = decode_pdfish(payload, password=password)
    pages = doc.pages
    if page_range:
        wanted = parse_page_range(page_range)
        pages = [p for i, p in enumerate(pages, start=1) if i in wanted]
    page_markdowns = [render_page(p) for p in pages]
    content = join_pages(page_markdowns)
    metadata = {
        "page_dimensions": [{"width": p.width, "height": p.height} for p in pages],
    }
    if doc.author:
        metadata["author"] = doc.author
    return ExtractionResult(
        content=content,
        title=doc.title or None,
        images=[],
        metadata=metadata,
    )
