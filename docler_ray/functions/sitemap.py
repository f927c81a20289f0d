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
