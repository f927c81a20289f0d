"""Deterministic synthetic Common-Crawl-style page corpus (FIXTURES.md §1).

Schema is the authoritative BASELINE.json ``input_hint``:
``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``.

Every row is a pure function of ``(seed, row_index)`` so any shard of the
corpus can be regenerated independently and goldens stay stable. The host
distribution is deliberately skewed (three hosts own ~50% of rows) to
exercise url-hash repartitioning, and ~10% of rows are non-HTML payloads:
pdfish layout documents (incl. encrypted variants) and the error-row classes
of FIXTURES.md §6 (truncated HTML, binary garbage, empty html with text
fallback).
"""

from __future__ import annotations

import datetime as _dt
import random

import pyarrow as pa

from docler_ray.pdfish.format import (
    PdfishDocument,
    PdfishPage,
    Span,
    encode_pdfish,
    encrypt_pdfish,
)

_BASE_TS = _dt.datetime(2025, 1, 1, 0, 0, 0)

_VOCAB: dict[str, list[str]] = {
    "en": (
        "the data stream pipeline engine block batch arrow shuffle spill worker "
        "cluster node memory disk page table row column schema query filter scan "
        "merge sort hash join group index vector model token text document corpus"
    ).split(),
    "de": (
        "die daten strom rohr werk block stapel pfeil mischen speicher arbeiter "
        "gruppe knoten platte seite tabelle zeile spalte schema anfrage filter "
        "mischung sortierung verbund index vektor modell zeichen text dokument"
    ).split(),
    "fr": (
        "les données flux tuyau moteur bloc lot flèche mélange disque ouvrier "
        "grappe nœud mémoire page table ligne colonne schéma requête filtre "
        "fusion tri jointure groupe index vecteur modèle jeton texte document"
    ).split(),
    "es": (
        "los datos flujo tubo motor bloque lote flecha mezcla disco obrero "
        "grupo nodo memoria página tabla fila columna esquema consulta filtro "
        "fusión orden unión índice vector modelo ficha texto documento corpus"
    ).split(),
    "zh": list("数据流管道引擎块批箭头洗牌溢出工作者集群节点内存磁盘页表行列模式查询过滤扫描合并排序哈希连接分组索引向量模型标记文本文档语料"),
}

_LANG_WEIGHTS = (("en", 0.50), ("de", 0.13), ("fr", 0.13), ("es", 0.13), ("zh", 0.11))

N_TAIL_HOSTS = 97


def _pick_lang(rng: random.Random) -> str:
    r = rng.random()
    acc = 0.0
    for lang, w in _LANG_WEIGHTS:
        acc += w
        if r < acc:
            return lang
    return "en"


def _pick_host(rng: random.Random) -> int:
    """Skewed host distribution: hosts 0-2 own ~50% of rows."""
    r = rng.random()
    if r < 0.25:
        return 0
    if r < 0.40:
        return 1
    if r < 0.50:
        return 2
    return 3 + rng.randrange(N_TAIL_HOSTS)


def _words(rng: random.Random, lang: str, n: int) -> list[str]:
    vocab = _VOCAB[lang]
    return [vocab[rng.randrange(len(vocab))] for _ in range(n)]


def _sentence(rng: random.Random, lang: str) -> str:
    n = rng.randrange(6, 16)
    ws = _words(rng, lang, n)
    if lang == "zh":
        body = "".join(ws)
        if n > 9:
            cut = rng.randrange(3, n - 3)
            body = "".join(ws[:cut]) + "，" + "".join(ws[cut:])
        return body + "。"
    ws[0] = ws[0].capitalize()
    if n > 9:
        cut = rng.randrange(3, n - 3)
        ws[cut] = ws[cut] + ","
    return " ".join(ws) + "."


def _paragraph(rng: random.Random, lang: str) -> str:
    return " ".join(_sentence(rng, lang) for _ in range(rng.randrange(2, 6)))


def _title(rng: random.Random, lang: str) -> str:
    ws = _words(rng, lang, rng.randrange(3, 7))
    if lang == "zh":
        return "".join(ws)
    return " ".join(w.capitalize() for w in ws)


# --- HTML page assembly ------------------------------------------------------

def _boilerplate_nav(rng: random.Random) -> str:
    links = "".join(
        f'<a href="/section-{k}">Section {k}</a> ' for k in range(rng.randrange(4, 8))
    )
    return f"<nav>{links}</nav>"


def _boilerplate_blocks(rng: random.Random) -> tuple[str, str]:
    aside = (
        '<aside class="sidebar"><p>Subscribe to the newsletter for deals, offers, '
        "updates, promotions, and more deals.</p>"
        '<div class="ad-banner"><p>Buy now! Limited offer, big savings, act fast.</p></div></aside>'
    )
    footer = (
        "<footer><p>Copyright 2025 example. All rights reserved. "
        '<a href="/privacy">Privacy</a> <a href="/terms">Terms</a></p></footer>'
    )
    return aside, footer


def _article_html(
    rng: random.Random, lang: str, title: str, boost: int = 1
) -> tuple[str, str]:
    """Returns (article_html, plain_text_fallback). ``boost`` scales the page
    size (sections/paragraphs) for benchmark corpora; boost=1 reproduces the
    committed golden corpus bit-for-bit (identical rng draw sequence)."""
    parts: list[str] = [f"<h1>{title}</h1>"]
    text_parts: list[str] = [title]
    n_sections = rng.randrange(1, 1 + 4 * boost)
    for s in range(n_sections):
        sec_title = _title(rng, lang)
        parts.append(f"<h2>{sec_title}</h2>")
        text_parts.append(sec_title)
        for _ in range(rng.randrange(1, 1 + 3 * boost)):
            para = _paragraph(rng, lang)
            if rng.random() < 0.3:
                # embed a link mid-paragraph
                anchor = " ".join(_words(rng, lang, 2))
                para += f' <a href="https://ref.example/doc-{rng.randrange(999)}">{anchor}</a>.'
            parts.append(f"<p>{para}</p>")
            text_parts.append(para)
        if rng.random() < 0.30:
            items = [" ".join(_words(rng, lang, rng.randrange(2, 5))) for _ in range(rng.randrange(2, 6))]
            parts.append("<ul>" + "".join(f"<li>{it}</li>" for it in items) + "</ul>")
            text_parts.extend(items)
        if rng.random() < 0.25:
            parts.append(f'<img src="/media/fig-{s}.png" alt="figure {s}">')
        if rng.random() < 0.15:
            rows = "".join(
                f"<tr><td>{r}</td><td>{' '.join(_words(rng, lang, 2))}</td></tr>"
                for r in range(rng.randrange(2, 5))
            )
            parts.append(f"<table><tr><th>id</th><th>value</th></tr>{rows}</table>")
    return "".join(parts), " ".join(text_parts)


def _html_page(rng: random.Random, lang: str, boost: int = 1) -> tuple[bytes, str]:
    title = _title(rng, lang)
    article, fallback = _article_html(rng, lang, title, boost)
    aside, footer = _boilerplate_blocks(rng)
    nav = _boilerplate_nav(rng)
    use_semantic = rng.random() < 0.5
    open_tag, close_tag = ("<article>", "</article>") if use_semantic else (
        '<div id="content">',
        "</div>",
    )
    html = (
        f"<!DOCTYPE html><html><head><title>{title}</title>"
        '<script>window.track=function(){return 1};</script>'
        "<style>.ad-banner{color:red}</style></head><body>"
        f"<header><p>site example — {title}</p></header>"
        f"{nav}{aside}{open_tag}{article}{close_tag}{footer}"
        "</body></html>"
    )
    return html.encode("utf-8"), fallback


# --- pdfish assembly ---------------------------------------------------------

def _pdfish_doc(
    rng: random.Random, lang: str, allow_encrypt: bool = True, boost: int = 1
) -> tuple[bytes, str, int]:
    """Returns (payload, plain_text_fallback, kind) where kind
    0=plain, 1=encrypted-empty-pw."""
    n_pages = rng.randrange(1, 1 + 4 * boost)
    title = _title(rng, lang)
    doc = PdfishDocument(title=title, author="synth")
    text_parts: list[str] = [title]
    for _p in range(n_pages):
        page = PdfishPage(width=612.0, height=792.0)
        y = 72.0
        heading = _title(rng, lang)
        page.spans.append(Span(72.0, y, 400.0, 22.0, 20.0, heading))
        text_parts.append(heading)
        y += 40.0
        for _b in range(rng.randrange(2, 2 + 3 * boost)):
            if rng.random() < 0.25:
                for _i in range(rng.randrange(2, 5)):
                    item = "• " + " ".join(_words(rng, lang, rng.randrange(2, 5)))
                    page.spans.append(Span(72.0, y, 380.0, 11.0, 10.0, item))
                    text_parts.append(item[2:])
                    y += 14.0
            else:
                for _l in range(rng.randrange(1, 4)):
                    line = _sentence(rng, lang)
                    page.spans.append(Span(72.0, y, 440.0, 11.0, 10.0, line))
                    text_parts.append(line)
                    y += 14.0
            y += 28.0
        doc.pages.append(page)
    payload = encode_pdfish(doc)
    r = rng.random()
    kind = 0
    if allow_encrypt and r < 0.15:
        payload = encrypt_pdfish(payload, "")
        kind = 1
    return payload, " ".join(text_parts), kind


# --- row assembly ------------------------------------------------------------

def page_record(i: int, seed: int = 42, boost: int = 1) -> dict:
    """The i-th corpus row — pure function of (seed, i, boost)."""
    rng = random.Random((seed << 32) ^ i)
    lang = _pick_lang(rng)
    host = _pick_host(rng)
    ts = _BASE_TS + _dt.timedelta(seconds=i)
    kind_r = rng.random()
    url = f"https://host{host}.example/{lang}/article-{i}"
    if kind_r < 0.90:
        html, fallback = _html_page(rng, lang, boost)
    elif kind_r < 0.97:
        payload, fallback, _k = _pdfish_doc(rng, lang, boost=boost)
        html = payload
        url = f"https://host{host}.example/{lang}/doc-{i}.pdfish"
    elif kind_r < 0.98:
        # truncated html (decode error / partial capture)
        full, fallback = _html_page(rng, lang, boost)
        html = full[: max(10, len(full) // 3)]
    elif kind_r < 0.99:
        # unsupported binary payload; text fallback still present
        fallback = _paragraph(rng, lang)
        html = bytes([0xFF, 0xFE]) + bytes(rng.randrange(256) for _ in range(64))
    else:
        # encrypted pdfish that genuinely needs a password -> per-row error
        payload, fallback, _k = _pdfish_doc(rng, lang, allow_encrypt=False, boost=boost)
        html = encrypt_pdfish(payload, f"pw-{i}")
        url = f"https://host{host}.example/{lang}/locked-{i}.pdfish"
    return {
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": fallback,
        "lang": lang,
    }


PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)


def generate_pages_table(
    n_rows: int, seed: int = 42, start: int = 0, boost: int = 1
) -> pa.Table:
    records = [page_record(i, seed, boost) for i in range(start, start + n_rows)]
    return pa.Table.from_pylist(records, schema=PAGES_SCHEMA)


def write_pages_corpus(
    out_dir: str, n_rows: int, seed: int = 42, rows_per_shard: int = 10_000
) -> list[str]:
    """Write the corpus as one parquet file per shard (deterministic shard
    boundaries -> deterministic partition ids for checkpoint manifests)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths: list[str] = []
    shard = 0
    for start in range(0, n_rows, rows_per_shard):
        n = min(rows_per_shard, n_rows - start)
        path = os.path.join(out_dir, f"pages-{shard:05d}.parquet")
        if not os.path.exists(path):
            table = generate_pages_table(n, seed=seed, start=start)
            tmp = path + ".tmp"
            pq.write_table(table, tmp)
            os.replace(tmp, path)
        paths.append(path)
        shard += 1
    return paths
