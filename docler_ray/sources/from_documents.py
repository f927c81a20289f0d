"""Adapter: the driver's ``documents`` table -> pages-table rows.

/root/testdata has no raw ``pages`` table, so benchmark and driver-contract
runs derive one deterministically: each documents row (doc_id, text, lang,
source, n_chars) is wrapped into a boilerplate-laden HTML page whose main
content is the document text. Pure function of the row -> reproducible at
any scale factor, no external data.
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa

from docler_ray.sources.synth import PAGES_SCHEMA

_BASE_TS = _dt.datetime(2025, 1, 1)

_BOILER_HEAD = (
    "<!DOCTYPE html><html><head><title>{title}</title>"
    "<script>window.t=1;</script><style>.ad{{color:red}}</style></head><body>"
    '<header><p>site corpus — {title}</p></header>'
    '<nav><a href="/a">A</a> <a href="/b">B</a> <a href="/c">C</a></nav>'
    '<aside class="sidebar"><p>Subscribe for updates, offers, deals, promotions.</p></aside>'
)
_BOILER_TAIL = (
    "<footer><p>Copyright 2025 corpus. All rights reserved. "
    '<a href="/p">Privacy</a></p></footer></body></html>'
)


def document_to_page(doc_id: int, text: str, lang: str, source: str) -> dict:
    """One documents row -> one pages row (deterministic)."""
    title = f"Document {doc_id}"
    words = text.split()
    # split the text into paragraphs of ~40 words for realistic block structure
    paras = [" ".join(words[i : i + 40]) for i in range(0, len(words), 40)] or [""]
    body = f"<h1>{title}</h1>" + "".join(f"<p>{p}</p>" for p in paras)
    if doc_id % 5 == 0:
        # every 5th document carries an image reference so the multimodal
        # plumbing (images column -> ImageFeatureExtractor) has rows to chew
        body += f'<img src="/media/doc-{doc_id}.png" alt="figure {doc_id}">'
    html = (
        _BOILER_HEAD.format(title=title)
        + f'<div id="content">{body}</div>'
        + _BOILER_TAIL
    )
    return {
        "url": f"https://{source}.example/{lang}/doc-{doc_id}",
        "warc_ts": _BASE_TS + _dt.timedelta(seconds=int(doc_id)),
        "html": html.encode("utf-8"),
        "text": text,
        "lang": lang,
    }


def documents_to_pages_batch(batch: pa.Table) -> pa.Table:
    """Vector-ish map_batches adapter (documents schema -> pages schema)."""
    rows = [
        document_to_page(d, t or "", lg or "en", s or "src")
        for d, t, lg, s in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
            batch.column("lang").to_pylist(),
            batch.column("source").to_pylist(),
        )
    ]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
