"""Distributed TF-IDF-style document ranking for a literal query.

The retrieval operator of the training-data tier ("which documents in this
crawl best match these query terms"), composed the scale-correct way:

1. **DF pass** — one stateless ``map_batches`` over the corpus emits
   per-batch (term, partial_df) rows for the QUERY TERMS ONLY (never the
   vocabulary); a groupby reduces them. Driver state = len(terms) rows.
2. **Integer idf weights** — ``w(term) = (1_000_000 * N) // df(term)``
   (N = corpus doc count). Integer floor division instead of a float log
   keeps every score an exact int64, so the DuckDB oracle hash-matches
   bit-for-bit on any corpus (a deliberate deviation from the classic
   ``log(N/df)``: monotone in 1/df, which preserves ranking behavior,
   while float ``ln`` differs across libm implementations and would break
   the exactness contract).
3. **Score pass** — second stateless map pass: per-doc term frequencies
   (whitespace-token equality) dot the broadcast weight dict; docs with
   score > 0 emit (doc_id, score).
4. **Top-k** — :func:`docler_ray.stages.topk.topk` partial-per-batch merge
   (k x num_blocks driver rows), ties broken by doc_id ascending.

No reference precedent (docler's vector-store tier is API wrappers,
SURVEY.md §2.7); sibling of the kNN operators in ``stages/similarity.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_IDF_SCALE = 1_000_000

# the ws_tokens ASCII whitespace contract (functions/tokens._ASCII_WS_RE)
# as an RE2 class for the vectorized Arrow split
_WS_SPLIT_PATTERN = "[ \t\n\r\f\v]+"


def _flat_ws_token_ids(batch: pa.Table, text_col: str, terms_arr: pa.Array):
    """Vectorized ws_tokens + query-term matching over a whole batch:
    split on the ASCII-ws contract, keep (parent_row, term_index) for
    every token equal to a query term. Zero Python per token (round-3
    verdict finding 3: the per-row scoring loop; same kernels as
    frequent.top_tokens)."""
    s = pc.fill_null(batch.column(text_col), "")
    toks = pc.split_pattern_regex(s, _WS_SPLIT_PATTERN)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    parent = toks.value_parent_indices().to_numpy(zero_copy_only=False)
    tidx = (
        pc.fill_null(pc.index_in(flat, value_set=terms_arr), -1)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    # empties from edge separators can never equal a (non-empty) term
    mask = tidx >= 0
    return parent[mask].astype(np.int64), tidx[mask]


def tfidf_topk(
    ds,
    query_terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    n_docs: int | None = None,
) -> pa.Table:
    """Top-k documents by integer-weighted TF-IDF score for ``query_terms``.

    Returns an Arrow table (doc_id, score, rank) of at most k rows; only
    documents with score > 0 are candidates. ``n_docs`` skips the count
    when the caller already knows it (parquet row-count metadata).
    """
    from ray.data.aggregate import Sum

    from docler_ray.stages.topk import topk

    terms = list(dict.fromkeys(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    if n_docs is None:
        n_docs = ds.count()
    terms_arr = pa.array(terms, pa.string())
    n_terms = len(terms)

    def partial_df(batch: pa.Table) -> pa.Table:
        parent, tidx = _flat_ws_token_ids(batch, text_col, terms_arr)
        # presence per (doc, term): distinct pairs, then a term histogram
        uniq = np.unique(parent * n_terms + tidx)
        pdf = np.bincount(uniq % n_terms, minlength=n_terms).astype(np.int64)
        return pa.table(
            {
                "term": terms_arr,
                "pdf": pa.array(pdf, pa.int64()),
            }
        )

    df_rows = (
        ds.map_batches(partial_df, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("pdf", alias_name="df"))
        .take_all()
    )  # len(terms) rows
    weights = {
        r["term"]: (_IDF_SCALE * n_docs) // r["df"]
        for r in df_rows
        if r["df"]
    }
    if not weights:  # no query term occurs anywhere
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "score": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
            }
        )

    # per-term int64 weight vector indexed by term position (0 = the term
    # never occurs, contributing nothing — matches the old dict .get)
    w_arr = np.array([weights.get(t, 0) for t in terms], dtype=np.int64)

    def score(batch: pa.Table) -> pa.Table:
        parent, tidx = _flat_ws_token_ids(batch, text_col, terms_arr)
        scores = np.zeros(batch.num_rows, dtype=np.int64)
        # int64 accumulate (np.bincount's float weights would round past
        # 2**53 — idf weights reach 1e6 * n_docs)
        np.add.at(scores, parent, w_arr[tidx])
        keep = scores > 0
        ids = (
            pc.cast(batch.column(id_col), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "score": pa.array(scores[keep], pa.int64()),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    top = topk(
        scored, sort_col="score", k=k, keep_cols=[id_col], tie_col=id_col
    )
    rank = pa.array(range(1, top.num_rows + 1), pa.int64())
    return pa.table(
        {
            id_col: top.column(id_col),
            "score": top.column("score"),
            "rank": rank,
        }
    )


_BM25_TFC_SCALE = 1_000_000


def bm25_topk(
    ds,
    query_terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    n_docs: int | None = None,
) -> pa.Table:
    """Top-k documents by integer-exact Okapi BM25 (Robertson et al.,
    TREC-3) for ``query_terms``, with k1 = 1.2 and b = 0.75 carried as the
    exact rationals 6/5 and 3/4 so every score is a deterministic int64
    (the oracle-hash discipline of :func:`tfidf_topk`; BM25's float log
    idf likewise becomes the monotone integer weight (1000 * N) // df).

    With avgdl = L/N (L = corpus ws-token count), the per-term saturation
    tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) multiplied through by 20*L*N
    is the exact rational (tf*44*L) / (20*tf*L + 6*L + 18*dl*N); scores are
    sum_t w_t * ((tf*44*L*SCALE) // den_t). Magnitude bound: numerators
    stay under 2^63 while tf*L*SCALE < 9e18 — at 5e5 docs x 50 tokens
    (sf1) the headroom is ~40x; for larger corpora shrink SCALE.

    Distributed plan: ONE stats pass (stateless map) emits per-batch
    (term, df-partial) rows for the query terms plus a sentinel ''-row
    carrying the token-count partial — a single (len(terms)+1)-row
    exchange covers df AND L; the scoring pass is stateless map-side with
    the weight vector closed over (ints, not an object-store round trip),
    and top-k folds through k x num_blocks partials.
    """
    from ray.data.aggregate import Sum

    from docler_ray.stages.topk import topk

    terms = list(dict.fromkeys(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    if n_docs is None:
        n_docs = ds.count()
    terms_arr = pa.array(terms, pa.string())
    n_terms = len(terms)

    def _toks(batch: pa.Table):
        s = pc.fill_null(batch.column(text_col), "")
        toks = pc.split_pattern_regex(s, _WS_SPLIT_PATTERN)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        parent = toks.value_parent_indices().to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        return flat, parent.astype(np.int64), nonempty

    def stats_partial(batch: pa.Table) -> pa.Table:
        flat, parent, nonempty = _toks(batch)
        tidx = (
            pc.fill_null(pc.index_in(flat, value_set=terms_arr), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        m = tidx >= 0
        uniq = np.unique(parent[m] * n_terms + tidx[m])
        pdf = np.bincount(uniq % n_terms, minlength=n_terms).astype(np.int64)
        return pa.table(
            {
                "term": pa.concat_arrays([terms_arr, pa.array([""], pa.string())]),
                "pv": pa.array(
                    np.concatenate([pdf, [int(nonempty.sum())]]), pa.int64()
                ),
            }
        )

    rows = (
        ds.map_batches(stats_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("pv", alias_name="v"))
        .take_all()
    )  # len(terms) + 1 rows
    total_l = 0
    df = {}
    for r in rows:
        if r["term"] == "":
            total_l = int(r["v"])
        elif r["v"]:
            df[r["term"]] = int(r["v"])
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "score": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
        }
    )
    if not df or total_l == 0:
        return empty
    w_arr = np.array(
        [(1000 * n_docs) // df[t] if t in df else 0 for t in terms],
        dtype=np.int64,
    )

    def score(batch: pa.Table) -> pa.Table:
        flat, parent, nonempty = _toks(batch)
        dl = np.bincount(parent[nonempty], minlength=batch.num_rows).astype(
            np.int64
        )
        tidx = (
            pc.fill_null(pc.index_in(flat, value_set=terms_arr), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        m = tidx >= 0
        uniq, tf = np.unique(parent[m] * n_terms + tidx[m], return_counts=True)
        tf = tf.astype(np.int64)
        d = uniq // n_terms
        t = uniq % n_terms
        num = tf * (44 * total_l * _BM25_TFC_SCALE)
        den = 20 * tf * total_l + 6 * total_l + 18 * dl[d] * n_docs
        scores = np.zeros(batch.num_rows, dtype=np.int64)
        np.add.at(scores, d, w_arr[t] * (num // den))
        keep = scores > 0
        ids = (
            pc.cast(batch.column(id_col), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "score": pa.array(scores[keep], pa.int64()),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    top = topk(
        scored, sort_col="score", k=k, keep_cols=[id_col], tie_col=id_col
    )
    return pa.table(
        {
            id_col: top.column(id_col),
            "score": top.column("score"),
            "rank": pa.array(range(1, top.num_rows + 1), pa.int64()),
        }
    )
