"""Sitemap-protocol parser (sitemaps.org XML format, the crawl-discovery
complement to robots.txt).

Handles both document kinds: ``<urlset>`` page lists (per-entry ``loc`` /
``lastmod`` / ``changefreq`` / ``priority``) and ``<sitemapindex>`` files
whose ``<sitemap><loc>`` children point at further sitemaps (emitted as
kind='sitemap' rows so the frontier can schedule a re-fetch). Entry text
handles CDATA sections and XML entity references (via html.unescape, a
superset of XML's five). Namespace-prefixed element names (``<sm:loc>``)
are out of scope — real-world sitemaps overwhelmingly use the default
namespace — and parse to zero entries rather than erroring.

A linear scanning parser (find-based, no regex backtracking, no DOM): the
files are machine-generated and flat, so one forward pass suffices. The
50k-entry protocol cap is the CALLER's concern (a fetcher enforces it);
the parser is total on arbitrary bytes and never raises.
"""

from __future__ import annotations

from html import unescape

_FIELDS = ("loc", "lastmod", "changefreq", "priority")


def _text_of(block: str, tag: str) -> str:
    """Text content of the first <tag>...</tag> child: CDATA-aware,
    entity-unescaped, whitespace-stripped; '' when absent/empty."""
    open_pat = "<" + tag
    i = 0
    n = len(block)
    while True:
        i = block.find(open_pat, i)
        if i < 0:
            return ""
        j = i + len(open_pat)
        # must be a real element boundary: '>' or whitespace then '>'
        if j < n and block[j] not in ">\t\n\r />":
            i = j
            continue
        gt = block.find(">", j)
        if gt < 0:
            return ""
        if block[gt - 1] == "/":  # self-closing: empty content
            return ""
        close = block.find("</" + tag, gt + 1)
        if close < 0:
            return ""
        text = block[gt + 1 : close]
        if "<![CDATA[" in text:
            out, k = [], 0
            while True:
                c0 = text.find("<![CDATA[", k)
                if c0 < 0:
                    out.append(text[k:])
                    break
                out.append(text[k:c0])
                c1 = text.find("]]>", c0 + 9)
                if c1 < 0:
                    out.append(text[c0 + 9 :])
                    break
                out.append(text[c0 + 9 : c1])
                k = c1 + 3
            return "".join(out).strip()
        return unescape(text).strip() if "&" in text else text.strip()


def _blocks(xml: str, tag: str):
    """Yield the inner text of each <tag ...>...</tag> element."""
    open_pat = "<" + tag
    i = 0
    n = len(xml)
    while True:
        i = xml.find(open_pat, i)
        if i < 0:
            return
        j = i + len(open_pat)
        if j < n and xml[j] not in ">\t\n\r /":
            i = j
            continue
        gt = xml.find(">", j)
        if gt < 0:
            return
        close = xml.find("</" + tag, gt + 1)
        if close < 0:
            return
        yield xml[gt + 1 : close]
        i = close + 2 + len(tag)


def parse_sitemap(xml: str) -> list[dict]:
    """All entries of one sitemap document, in file order.

    Each entry: {kind: 'url'|'sitemap', loc, lastmod, changefreq,
    priority} — priority is a float or None (absent/unparseable), the
    string fields are '' when absent. Entries with an empty loc are
    dropped (a loc-less entry is meaningless to a frontier). Non-sitemap
    input parses to []."""
    out: list[dict] = []
    if "<urlset" in xml:
        kind, entry_tag = "url", "url"
    elif "<sitemapindex" in xml:
        kind, entry_tag = "sitemap", "sitemap"
    else:
        return out
    for block in _blocks(xml, entry_tag):
        loc = _text_of(block, "loc")
        if not loc:
            continue
        prio_s = _text_of(block, "priority")
        try:
            prio = float(prio_s) if prio_s else None
        except ValueError:
            prio = None
        out.append(
            {
                "kind": kind,
                "loc": loc,
                "lastmod": _text_of(block, "lastmod"),
                "changefreq": _text_of(block, "changefreq"),
                "priority": prio,
            }
        )
    return out


def _attr_of(block: str, tag: str, attr: str) -> str:
    """Value of ``attr`` on the first <tag ...> element (Atom's
    <link href="..."/> carries its URL as an attribute, not text)."""
    open_pat = "<" + tag
    i = 0
    n = len(block)
    while True:
        i = block.find(open_pat, i)
        if i < 0:
            return ""
        j = i + len(open_pat)
        if j < n and block[j] not in ">\t\n\r /":
            i = j
            continue
        gt = block.find(">", j)
        if gt < 0:
            return ""
        head = block[i:gt]
        for quote in ('"', "'"):
            pat = attr + "=" + quote
            k = head.find(pat)
            if k >= 0:
                end = head.find(quote, k + len(pat))
                if end >= 0:
                    return unescape(head[k + len(pat) : end]).strip()
        return ""


def parse_feed(xml: str) -> list[dict]:
    """RSS 2.0 / Atom 1.0 entries in file order — the crawl-discovery
    sibling of :func:`parse_sitemap` (news/blog frontiers poll feeds).

    Each entry: {kind: 'rss'|'atom', title, link, updated, guid} — RSS
    maps pubDate->updated and guid->guid; Atom maps <link href>->link and
    <id>->guid. Entries with neither link nor title are dropped;
    non-feed input parses to []."""
    out: list[dict] = []
    if "<rss" in xml or "<channel" in xml:
        kind, entry_tag = "rss", "item"
    elif "<feed" in xml:
        kind, entry_tag = "atom", "entry"
    else:
        return out
    for block in _blocks(xml, entry_tag):
        title = _text_of(block, "title")
        if kind == "rss":
            link = _text_of(block, "link")
            updated = _text_of(block, "pubDate")
            guid = _text_of(block, "guid")
        else:
            link = _attr_of(block, "link", "href") or _text_of(block, "link")
            updated = _text_of(block, "updated")
            guid = _text_of(block, "id")
        if not link and not title:
            continue
        out.append(
            {
                "kind": kind,
                "title": title,
                "link": link,
                "updated": updated,
                "guid": guid,
            }
        )
    return out
