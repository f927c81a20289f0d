"""Regex-scanning HTML tokenizer — the hot-path replacement for stdlib
``html.parser`` (which profiled at ~half the per-document extraction cost).

Drives the same event interface as the stdlib parser (start/end/data) so the
tree-building semantics in docler_ray.html.dom are shared; the committed
golden corpus pins byte-identical output between the two. The stdlib path
remains as a fallback for inputs this scanner rejects.
"""

from __future__ import annotations

import re
from html import unescape

# One master scan: comments, CDATA, declarations, processing instructions,
# end tags, start tags (with quoted-attr-aware body).
_TOKEN_RE = re.compile(
    r"<(?:"
    r"!--(?P<comment>.*?)(?:--!?>|$)"
    r"|!\[CDATA\[(?P<cdata>.*?)(?:\]\]>|$)"
    r"|(?P<decl>![^>]*)>"
    r"|(?P<pi>\?[^>]*)>"
    r"|/(?P<endtag>[a-zA-Z][a-zA-Z0-9:._-]*)\s*>"
    r"|(?P<starttag>[a-zA-Z][a-zA-Z0-9:._-]*)"
    r"(?P<attrs>(?:\"[^\"]*\"|'[^']*'|[^>])*?)"
    r"(?P<selfclose>/?)>"
    r")",
    re.DOTALL,
)

_ATTR_RE = re.compile(
    r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)"
    r"(?:\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]*)))?"
)

# Content of these elements is raw text (no tag parsing inside).
_RAWTEXT_DROP = frozenset({"script", "style", "noscript", "template"})
_RAWTEXT_KEEP = frozenset({"textarea", "title"})

_VOID = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)


def _parse_attrs(blob: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    for m in _ATTR_RE.finditer(blob):
        name = m.group(1).lower()
        val = m.group(2) or m.group(3) or m.group(4) or ""
        if "&" in val:
            val = unescape(val)
        out.append((name, val))
    return out


def fast_feed(handler, html: str) -> None:
    """Scan ``html`` and drive handler.handle_starttag/endtag/data.

    ``handler`` is any object with the stdlib-HTMLParser event methods
    (docler_ray.html.dom._TreeBuilder). Raises nothing on malformed input —
    unparseable trailing garbage becomes text.
    """
    pos = 0
    n = len(html)
    find = html.find
    token_match = _TOKEN_RE.match
    handle_data = handler.handle_data
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            _emit_text(handler, html[pos:])
            break
        if lt > pos:
            text = html[pos:lt]
            handle_data(unescape(text) if "&" in text else text)
        m = token_match(html, lt)
        if m is None:
            # a bare '<' that opens nothing parseable: treat as text
            handle_data("<")
            pos = lt + 1
            continue
        pos = m.end()
        start, attrs_blob, selfclose_g = m.group("starttag", "attrs", "selfclose")
        if start is not None:
            tag = start.lower()
            attrs = _parse_attrs(attrs_blob) if attrs_blob.strip() else []
            selfclose = bool(selfclose_g) or tag in _VOID
            if selfclose:
                handler.handle_startendtag(tag, attrs)
                continue
            if tag in _RAWTEXT_DROP or tag in _RAWTEXT_KEEP:
                close = html.find(f"</{tag}", pos)
                # also try uppercase close tag before giving up
                if close < 0:
                    lowered = html.lower()
                    close = lowered.find(f"</{tag}", pos)
                if tag in _RAWTEXT_KEEP:
                    handler.handle_starttag(tag, attrs)
                    raw = html[pos:] if close < 0 else html[pos:close]
                    _emit_text(handler, raw)
                    handler.handle_endtag(tag)
                if close < 0:
                    break
                gt = html.find(">", close)
                pos = n if gt < 0 else gt + 1
                continue
            handler.handle_starttag(tag, attrs)
            continue
        end = m.group("endtag")
        if end is not None:
            handler.handle_endtag(end.lower())
            continue
        # comments / CDATA / declarations / PIs: dropped


def _emit_text(handler, text: str) -> None:
    if not text:
        return
    if "&" in text:
        text = unescape(text)
    handler.handle_data(text)
