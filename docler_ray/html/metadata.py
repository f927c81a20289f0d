"""HTML head-metadata extraction: title, meta description, Open Graph
properties, canonical link, robots directives, and the document language.

The reference extracts the title only (its converters' `title` field,
e.g. /root/reference/src/docler/converters/markitdown_provider); a
Common-Crawl pipeline also needs the head metadata tier — canonical URLs
feed URL dedup, robots noindex gates indexing, og:* carries editorial
titles, and the html lang attribute seeds language ID. Pure DOM walk over
the shared parser (zero shuffle as a stage; one output row per page).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from docler_ray.html.dom import Node, parse_html

_WS_RE = re.compile(r"\s+")


@dataclass
class PageMetadata:
    title: str | None = None
    description: str | None = None
    og_title: str | None = None
    canonical: str | None = None
    noindex: bool = False
    nofollow: bool = False
    lang: str | None = None


def _clean(text: str) -> str:
    return _WS_RE.sub(" ", text).strip()


def extract_metadata(html: str, base_url: str | None = None) -> PageMetadata:
    """Parse the page and collect head metadata. First occurrence wins for
    every field (the WHATWG processing order); the canonical href resolves
    against ``base_url`` when given."""
    root = parse_html(html)
    return extract_metadata_from_dom(root, base_url=base_url)


def extract_metadata_from_dom(root: Node, base_url: str | None = None) -> PageMetadata:
    from docler_ray.stages.linkgraph import resolve_href

    md = PageMetadata()
    for node in root.iter():
        tag = node.tag
        if tag == "html" and md.lang is None:
            lang = node.attr("lang").strip().lower()
            if lang:
                md.lang = lang
        elif tag == "title" and md.title is None:
            t = _clean(node.get_text())
            if t:
                md.title = t
        elif tag == "meta":
            name = node.attr("name").lower()
            prop = node.attr("property").lower()
            content = node.attr("content")
            if name == "description" and md.description is None:
                md.description = _clean(content)
            elif prop == "og:title" and md.og_title is None:
                md.og_title = _clean(content)
            elif name == "robots":
                directives = {
                    d.strip().lower() for d in content.split(",") if d.strip()
                }
                md.noindex = md.noindex or "noindex" in directives
                md.nofollow = md.nofollow or "nofollow" in directives
        elif tag == "link" and md.canonical is None:
            rels = node.attr("rel").lower().split()
            if "canonical" in rels:
                href = node.attr("href")
                if base_url is not None:
                    md.canonical = resolve_href(base_url, href)
                else:
                    md.canonical = href or None
    return md
