"""JSON-LD structured-data extraction (schema.org metadata embedded in
``<script type="application/ld+json">`` blocks — the machine-readable
article/product metadata most modern pages carry, and the third metadata
surface next to <head> tags (html/metadata.py) and sitemaps).

A linear scan finds the script blocks (attribute-order- and
case-insensitive type match), stdlib ``json`` parses each (malformed
blocks are skipped — crawl HTML lies), a top-level array flattens to its
objects, and each object yields the portable core: @type, name (falling
back to headline — news articles use it), datePublished, author name
(object, list-of-objects, or bare string forms). Unknown shapes produce
'' fields rather than errors.
"""

from __future__ import annotations

import json
import re

_SCRIPT_OPEN_RE = re.compile(r"<script\b([^>]*)>", re.IGNORECASE | re.DOTALL)
_TYPE_ATTR_RE = re.compile(
    r"""type\s*=\s*["']?\s*application/ld\+json\s*["']?""", re.IGNORECASE
)


def _author_name(a) -> str:
    if isinstance(a, str):
        return a
    if isinstance(a, dict):
        n = a.get("name")
        return n if isinstance(n, str) else ""
    if isinstance(a, list) and a:
        return _author_name(a[0])
    return ""


def extract_jsonld(html: str) -> list[dict]:
    """All JSON-LD objects in document order, one dict per object:
    {jtype, name, date_published, author}. Blocks that fail to parse and
    non-object items contribute nothing."""
    out: list[dict] = []
    for m in _SCRIPT_OPEN_RE.finditer(html):
        if not _TYPE_ATTR_RE.search(m.group(1)):
            continue
        end = html.find("</script", m.end())
        if end < 0:
            continue
        raw = html[m.end() : end].strip()
        try:
            data = json.loads(raw)
        except (ValueError, RecursionError):
            continue
        items = data if isinstance(data, list) else [data]
        for obj in items:
            if not isinstance(obj, dict):
                continue
            jtype = obj.get("@type")
            name = obj.get("name")
            if not isinstance(name, str):
                name = obj.get("headline")
            date = obj.get("datePublished")
            out.append(
                {
                    "jtype": jtype if isinstance(jtype, str) else "",
                    "name": name if isinstance(name, str) else "",
                    "date_published": date if isinstance(date, str) else "",
                    "author": _author_name(obj.get("author")),
                }
            )
    return out


def extract_jsonld_batch(batch, *, html_col: str = "html", id_col: str = "doc_id"):
    """Arrow batch -> (id, pos, jtype, name, date_published, author)."""
    import pyarrow as pa

    ids = batch.column(id_col).to_pylist()
    htmls = batch.column(html_col).to_pylist()
    out_id, pos, jt, nm, dp, au = [], [], [], [], [], []
    for i, h in zip(ids, htmls):
        if not h:
            continue
        if isinstance(h, bytes):
            from docler_ray.html.charset import decode_html

            try:
                h, _codec = decode_html(h)
            except Exception:
                continue
        for p, obj in enumerate(extract_jsonld(h)):
            out_id.append(i)
            pos.append(p)
            jt.append(obj["jtype"])
            nm.append(obj["name"])
            dp.append(obj["date_published"])
            au.append(obj["author"])
    return pa.table(
        {
            id_col: pa.array(out_id, pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "jtype": pa.array(jt, pa.string()),
            "name": pa.array(nm, pa.string()),
            "date_published": pa.array(dp, pa.string()),
            "author": pa.array(au, pa.string()),
        }
    )
