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

import pyarrow as pa

from docler_ray.functions.tokens import ws_tokens

_IDF_SCALE = 1_000_000


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
    term_set = set(terms)
    if n_docs is None:
        n_docs = ds.count()

    def partial_df(batch: pa.Table) -> pa.Table:
        counts = dict.fromkeys(terms, 0)
        for t in batch.column(text_col).to_pylist():
            present = term_set.intersection(ws_tokens(t))
            for term in present:
                counts[term] += 1
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "pdf": pa.array([counts[t] for t in terms], pa.int64()),
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

    def score(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        out_ids: list[int] = []
        out_scores: list[int] = []
        for doc_id, t in zip(ids, batch.column(text_col).to_pylist()):
            s = 0
            for tok in ws_tokens(t):
                w = weights.get(tok)
                if w:
                    s += w
            if s:
                out_ids.append(int(doc_id))
                out_scores.append(s)
        return pa.table(
            {
                id_col: pa.array(out_ids, pa.int64()),
                "score": pa.array(out_scores, pa.int64()),
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
