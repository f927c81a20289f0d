"""Content-defined chunking for storage-level dedup estimation (the
rolling-boundary idea of LBFS (Muthitacharoen et al., SOSP'01) / FastCDC
(Xia et al., ATC'16), at WORD granularity): a chunk boundary falls after
token i whenever h(token_i) % modulus == 0 — boundaries depend only on
LOCAL content, so an insertion early in a document shifts byte offsets but
not downstream chunk identities. That shift-resistance is exactly what
fixed-size blocking lacks and why CDC is the standard dedup-storage layout.

Chunk identity is the repo's 52-bit md5 of the space-joined chunk tokens;
the per-language profile (chunks, distinct chunks, token mass, distinct
token mass) quantifies how much of the corpus a content-addressed store
would actually hold. One (lang, chunk_hash) exchange; everything else is
map-side. The DuckDB twin replays boundaries with a window cumsum and
chunk hashes with string_agg — bit-for-bit.

docler has no storage tier (reference stops at per-document markdown);
algorithm from the published papers only.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from docler_ray.functions.tokens import ws_tokens

DEFAULT_MODULUS = 64  # expected chunk length in tokens


from functools import lru_cache


def _h52(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8", "replace")).hexdigest()[:13], 16)


# token-level hashes repeat heavily (Zipf): a bounded per-process memo
# turns the boundary scan from one md5 per TOKEN into one per DISTINCT
# token. Chunk-identity hashes stay uncached (chunks rarely repeat within
# a process, and the cache would hold long strings).
_h52_token = lru_cache(maxsize=65536)(_h52)


def doc_chunks(text: str, modulus: int = DEFAULT_MODULUS) -> list[tuple[int, int]]:
    """(chunk_hash, n_tokens) per chunk, in document order. The final
    chunk closes at end-of-document whether or not a boundary fired."""
    toks = ws_tokens(text)
    if not toks:
        return []
    out: list[tuple[int, int]] = []
    start = 0
    for i, t in enumerate(toks):
        if _h52_token(t) % modulus == 0:
            chunk = toks[start : i + 1]
            out.append((_h52(" ".join(chunk)), len(chunk)))
            start = i + 1
    if start < len(toks):
        chunk = toks[start:]
        out.append((_h52(" ".join(chunk)), len(chunk)))
    return out


def cdc_dedup_profile(
    ds,
    *,
    text_col: str = "text",
    lang_col: str = "lang",
    modulus: int = DEFAULT_MODULUS,
):
    """Per-language storage-dedup profile: (lang, n_chunks,
    n_distinct_chunks, token_mass, distinct_token_mass). A content-
    addressed store keeps distinct_token_mass of token_mass.

    Plan: the map pass chunks each doc and pre-aggregates to DISTINCT
    (lang, chunk_hash) rows per batch carrying (count, n_tokens); ONE
    (lang, chunk_hash)-keyed exchange merges ownership; the lang-sized
    fold computes both totals (identical hash => identical content =>
    identical n_tokens, so MIN(n_tokens) == the chunk's size).
    """
    from ray.data.aggregate import Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch.column(lang_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        ln, ch, cn, tk = [], [], [], []
        agg: dict = {}
        for lang, text in zip(langs, texts):
            for h, n in doc_chunks(text or "", modulus):
                key = (lang, h)
                if key in agg:
                    agg[key][0] += 1
                else:
                    agg[key] = [1, n]
        for (lang, h), (c, n) in agg.items():
            ln.append(lang)
            ch.append(h)
            cn.append(c)
            tk.append(n)
        return pa.table(
            {
                "lang": pa.array(ln, pa.string()),
                "chunk_hash": pa.array(ch, pa.int64()),
                "pn": pa.array(cn, pa.int64()),
                "ntok": pa.array(tk, pa.int64()),
            }
        )

    per_chunk = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "chunk_hash"])
        .aggregate(Sum("pn", alias_name="n"), Min("ntok", alias_name="ntok"))
    )

    def fold(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = batch.group_by("lang").aggregate(
            [("n", "sum"), ([], "count_all"), ("ntok", "sum")]
        )
        g = g.rename_columns(["lang", "pc_n", "pc_d", "pc_dm"])
        mass = pc.multiply(batch.column("n"), batch.column("ntok"))
        m = (
            pa.table({"lang": batch.column("lang"), "m": mass})
            .group_by("lang")
            .aggregate([("m", "sum")])
            .rename_columns(["lang", "pc_m"])
        )
        return g.join(m, "lang")

    from ray.data.aggregate import Sum as _Sum

    return (
        per_chunk.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(
            _Sum("pc_n", alias_name="n_chunks"),
            _Sum("pc_d", alias_name="n_distinct_chunks"),
            _Sum("pc_m", alias_name="token_mass"),
            _Sum("pc_dm", alias_name="distinct_token_mass"),
        )
    )
