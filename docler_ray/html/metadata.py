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


def extract_nav(html: str, base_url: str | None = None) -> dict:
    """Navigation signals beyond the head-metadata tier: the meta-refresh
    redirect target (``<meta http-equiv="refresh"
    content="N;url=...">`` — the HTML-level redirect that never sends an
    HTTP 3xx, feeding linkgraph.resolve_redirects) and rel=next/prev
    pagination hrefs, each first-occurrence-wins and resolved against
    ``base_url``. Returns {refresh_url, refresh_delay, next_url,
    prev_url} with None for absent signals."""
    from docler_ray.stages.linkgraph import resolve_href

    root = parse_html(html)
    refresh_url = None
    refresh_delay = None
    next_url = None
    prev_url = None
    for node in root.iter():
        tag = node.tag
        if tag == "meta" and refresh_url is None:
            if node.attr("http-equiv").strip().lower() != "refresh":
                continue
            content = node.attr("content")
            # "N; url=TARGET" — the separator may be ';' or ',', the url=
            # key is case-insensitive and optional whitespace abounds
            head, sep, rest = content.partition(";")
            if not sep:
                head, sep, rest = content.partition(",")
            try:
                delay = int(head.strip())
            except ValueError:
                continue
            target = rest.strip()
            if target[:4].lower() == "url=":
                target = target[4:].strip().strip("'\"")
            if target and base_url is not None:
                target = resolve_href(base_url, target)
            if target:
                refresh_url = target
                refresh_delay = delay
        elif tag == "link":
            rels = node.attr("rel").lower().split()
            href = node.attr("href")
            if not href:
                continue
            resolved = (
                resolve_href(base_url, href) if base_url is not None else href
            )
            if resolved is None:
                continue
            if "next" in rels and next_url is None:
                next_url = resolved
            elif "prev" in rels and prev_url is None:
                prev_url = resolved
    return {
        "refresh_url": refresh_url,
        "refresh_delay": refresh_delay,
        "next_url": next_url,
        "prev_url": prev_url,
    }


def extract_hreflang(html: str, base_url: str | None = None) -> list[tuple[str, str]]:
    """(hreflang, resolved href) pairs from ``<link rel="alternate"
    hreflang=...>`` — the multilingual-cluster declaration search engines
    consolidate on. Document order, every occurrence (a page legitimately
    declares many); hreflang lowercased; nav-scheme/unresolvable hrefs
    dropped."""
    from docler_ray.stages.linkgraph import resolve_href

    root = parse_html(html)
    out: list[tuple[str, str]] = []
    for node in root.iter():
        if node.tag != "link":
            continue
        rels = node.attr("rel").lower().split()
        if "alternate" not in rels:
            continue
        hl = node.attr("hreflang").strip().lower()
        href = node.attr("href")
        if not hl or not href:
            continue
        resolved = resolve_href(base_url, href) if base_url is not None else href
        if resolved:
            out.append((hl, resolved))
    return out
