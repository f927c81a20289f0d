"""Span-level exact deduplication: remove corpus-wide duplicated
fixed-length token spans, keeping the first occurrence.

The operator from "Deduplicating Training Data Makes Language Models
Better" (Lee et al., arXiv:2107.06499): dedup below document granularity —
the unit is a fixed-length token span, and every later occurrence of a span
already seen anywhere in the corpus is cut out of its document. Lee et al.
find spans with suffix arrays; here the spans are the NON-OVERLAPPING
``span_tokens``-token windows of each document (the last window may be
short), which keeps the operator exactly SQL-mirrorable (the driver oracle
reproduces the whole thing — split, window, keep-first, reassembly — in
DuckDB) while preserving the scale shape of the real thing.

No reference precedent (docler, SURVEY.md §2.7, has no corpus-level
operators); this belongs to the training-data tier next to the document
dedup family in ``stages/dedup.py``.

Keep-first semantics: a span instance is identified by ``(doc_id, idx)``
(idx = 0-based window index); the kept instance of each distinct span
string is the one with the smallest ``(doc_id, idx)``. Duplicates WITHIN a
document collapse too (only the first window survives).

Scale shape (no corpus-proportional driver or per-task state):

1. map-side flat map: docs -> (doc_id, idx, span, pos) rows, where
   ``pos = doc_id * 2**20 + idx`` encodes the lexicographic (doc_id, idx)
   order in one int64 (hard error above 2**20 spans/doc = ~12M tokens).
2. ``groupby(span).min(pos)`` — one all-to-all exchange of the span text
   (inherent to EXACT span dedup; the hash-prefilter variants live in
   ``stages/dedup.py``). The winner rows ARE the kept instances: doc_id
   and idx decode back out of ``min_pos``, so no join back is needed.
3. the winner rows are UNIONED with one map-side (doc_id, n_spans) count
   row per document (same schema, null-padded), and a single
   ``groupby(doc_id).map_groups`` reassembles each document from both row
   kinds — sort kept spans by idx, join with a single space, read the
   count off the count row. Per-task state is one document's kept spans,
   and fully-deduplicated / token-less documents still appear with
   ``n_kept = 0`` + empty text because their count row always arrives.
   (A left_outer join did this job first; the union+groupby plan removes
   the join's aggregator pool and both ``_compact_nonempty``
   materializations — measured ~1 s faster at sf0.01, where the remaining
   wall time is the FIXED setup of the two inherent all-to-alls
   (span-keyed aggregate + doc-keyed regroup), which amortizes away at
   real scale.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from docler_ray.functions.tokens import ws_tokens

_POS_BASE = 1 << 20  # max spans per document (~12M tokens at span_tokens=12)


def _spans_of(text: str, span_tokens: int) -> list[str]:
    toks = ws_tokens(text)
    if not toks:
        return []
    return [
        " ".join(toks[i : i + span_tokens])
        for i in range(0, len(toks), span_tokens)
    ]


def _lines_of(text: str) -> list[str]:
    """Non-empty lines — the CCNet paragraph-dedup unit (newline split,
    empties dropped; replayed by list_filter(string_split(., chr(10)))."""
    return [ln for ln in (text or "").split("\n") if ln]


def span_dedup(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 12,
    n_rows: int | None = None,
):
    """Corpus-wide keep-first dedup of non-overlapping token spans.

    Returns a Dataset with one row per input document:
    ``(doc_id, n_spans, n_kept, text_dedup)`` — ``text_dedup`` is the
    document with every already-seen span removed (kept spans joined by a
    single space; empty string when nothing survives).
    """
    return _keep_first_unit_dedup(
        ds,
        text_col=text_col,
        id_col=id_col,
        units_of=lambda t: _spans_of(t, span_tokens),
        joiner=" ",
        n_col="n_spans",
        n_rows=n_rows,
    )


def paragraph_dedup(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
    n_rows: int | None = None,
):
    """Corpus-wide keep-first PARAGRAPH dedup (CCNet, arXiv:1911.00359
    §3.2: drop every later occurrence of a paragraph already seen anywhere
    in the corpus; the paragraph unit here is the non-empty line).

    Returns one row per input document:
    ``(doc_id, n_lines, n_kept, text_dedup)`` — surviving lines rejoined
    with a newline. Same scale shape as :func:`span_dedup` (one line-keyed
    exchange, min-pos winners, union + doc-keyed regroup)."""
    return _keep_first_unit_dedup(
        ds,
        text_col=text_col,
        id_col=id_col,
        units_of=_lines_of,
        joiner="\n",
        n_col="n_lines",
        keep_cols=keep_cols,
        n_rows=n_rows,
    )


def _keep_first_unit_dedup(
    ds, *, text_col, id_col, units_of, joiner, n_col, keep_cols=(), n_rows=None
):
    import zlib

    # pass n_rows when ds is a lazy transform chain — count() would
    # execute the chain once more (free only on raw reads); an upper
    # bound (e.g. the pre-filter corpus count) is fine, buckets just
    # come out slightly finer
    n_corpus = n_rows
    if n_corpus is None:
        try:
            n_corpus = ds.count()
        except Exception:  # pragma: no cover - count unavailable pre-exec
            n_corpus = None
    # Both exchanges run on ONE int64 coarse key (round-5 sf1 audit):
    # - the winners exchange hashed the span STRING before, paying Ray's
    #   per-boundary string-column rematerialization (find_partition_index)
    #   on the corpus-span-sized sort; coarse = crc32(span) % P co-locates
    #   every occurrence of a span, so the in-bucket Arrow min is global.
    # - the reassembly grouped per doc_id before — 1 Python kernel call +
    #   1 one-row Table per DOCUMENT; bucketing ~64 docs per group keeps
    #   the same co-location guarantee (bucket is a function of doc_id
    #   alone) with 64x fewer group dispatches and a vectorized pandas
    #   assemble inside.
    n_buckets = max(64, (n_corpus or 0) // 64)

    def emit_spans(batch: pa.Table) -> pa.Table:
        spans: list[str] = []
        poss: list[int] = []
        coarse: list[int] = []
        for doc_id, text in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            s = units_of(text)
            if len(s) >= _POS_BASE:
                raise ValueError(
                    f"doc {doc_id}: {len(s)} {n_col[2:]} exceeds the "
                    f"{_POS_BASE} per-doc cap (raise _POS_BASE for longer docs)"
                )
            base = int(doc_id) * _POS_BASE
            for i, sp in enumerate(s):
                spans.append(sp)
                poss.append(base + i)
                coarse.append(zlib.crc32(sp.encode("utf-8")) % n_buckets)
        return pa.table(
            {
                "span": pa.array(spans, pa.string()),
                "pos": pa.array(poss, pa.int64()),
                "coarse": pa.array(coarse, pa.int64()),
            }
        )

    def _doc_coarse(ids: np.ndarray) -> np.ndarray:
        return (
            (ids.astype(np.uint64) * np.uint64(1000003)) % np.uint64(n_buckets)
        ).astype(np.int64)

    def doc_counts(batch: pa.Table) -> pa.Table:
        ns = [
            len(units_of(t)) for t in batch.column(text_col).to_pylist()
        ]
        n = len(ns)
        ids = batch.column(id_col).cast(pa.int64())
        cols = {
            id_col: ids,
            "idx": pa.nulls(n, pa.int64()),
            "span": pa.nulls(n, pa.string()),
            n_col: pa.array(ns, pa.int64()),
            "dcoarse": pa.array(
                _doc_coarse(ids.to_numpy(zero_copy_only=False)), pa.int64()
            ),
        }
        for c in keep_cols:  # ride the per-doc count row
            cols[c] = batch.column(c)
        return pa.table(cols)

    spans = ds.map_batches(
        emit_spans, batch_format="pyarrow", zero_copy_batch=True
    )

    def bucket_winners(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["span", "pos"])
            .group_by("span")
            .aggregate([("pos", "min")])
        )
        return pa.table(
            {"span": g.column("span"), "pos": g.column("pos_min")}
        )

    winners = spans.groupby("coarse").map_groups(
        bucket_winners, batch_format="pyarrow"
    )

    def decode_winners(batch: pa.Table) -> pa.Table:
        pos = batch.column("pos").to_numpy(zero_copy_only=False)
        ids = (pos // _POS_BASE).astype(np.int64)
        cols = {
            id_col: pa.array(ids, pa.int64()),
            "idx": pa.array(pos % _POS_BASE, pa.int64()),
            "span": batch.column("span").cast(pa.string()),
            n_col: pa.nulls(len(pos), pa.int64()),
            "dcoarse": pa.array(_doc_coarse(ids), pa.int64()),
        }
        for c in keep_cols:  # null-padded on winner rows
            cols[c] = pa.nulls(len(pos), pa.string())
        return pa.table(cols)

    kept = winners.map_batches(
        decode_winners, batch_format="pyarrow", zero_copy_batch=True
    )
    counts = ds.map_batches(
        doc_counts, batch_format="pyarrow", zero_copy_batch=True
    )

    def assemble_bucket(df: pd.DataFrame) -> pa.Table:
        count_rows = df[df[n_col].notna()]
        kept_rows = df[df["span"].notna()].sort_values([id_col, "idx"])
        agg = (
            kept_rows.groupby(id_col, sort=False)["span"]
            .agg(n_kept="size", text_dedup=joiner.join)
            .reset_index()
        )
        out = count_rows[[id_col, n_col, *keep_cols]].merge(
            agg, on=id_col, how="left"
        )
        cols = {
            id_col: pa.array(out[id_col].astype("int64"), pa.int64()),
            n_col: pa.array(out[n_col].astype("int64"), pa.int64()),
            "n_kept": pa.array(
                out["n_kept"].fillna(0).astype("int64"), pa.int64()
            ),
            "text_dedup": pa.array(
                out["text_dedup"].fillna("").tolist(), pa.string()
            ),
        }
        for c in keep_cols:
            cols[c] = pa.array(
                [None if pd.isna(v) else str(v) for v in out[c]], pa.string()
            )
        return pa.table(cols)

    return (
        counts.union(kept)
        .groupby("dcoarse")
        .map_groups(assemble_bucket, batch_format="pandas")
    )


def span_dedup_brute(
    rows: list[tuple[int, str]], *, span_tokens: int = 12
) -> list[tuple[int, int, int, str]]:
    """Single-process reference implementation for property tests."""
    seen: set[str] = set()
    out = []
    for doc_id, text in sorted(rows):
        spans = _spans_of(text, span_tokens)
        kept = []
        for sp in spans:
            if sp not in seen:
                seen.add(sp)
                kept.append(sp)
        out.append((doc_id, len(spans), len(kept), " ".join(kept)))
    return out
