"""Inverted-index construction: token -> (document frequency, posting-list
head).

The retrieval-side artifact a training-data pipeline emits next to the
corpus (search over the crawl, df statistics for tokenizer/quality work —
the precursor of stages/ranking.py's TF-IDF, which recomputes df per
query-term; this materializes it for ALL tokens).

Scale shape (the grouped-top-k pattern applied to postings): documents
flat-map once into distinct (token, doc_id) pairs, each batch reduces a
token's pairs to (partial_df, k-smallest doc_ids) — so the token-keyed
exchange ships O(k x blocks) rows per token, never a hot token's full
posting list — and the per-token merge sums the partial dfs (exact: a
document's pairs live in exactly one input batch, so batch-distinct pairs
are globally distinct) and re-selects the k smallest ids. Emitting FULL
posting lists would put O(corpus) rows in one group for a stopword token;
the head+df contract keeps per-token state k-bounded by construction.

Tokenization matches stages/frequent.py (lowercase ``[a-z0-9]+`` runs),
so the oracle reuses that spelling; postings serialize as a comma-joined
ascending id string (SQL ``string_agg ORDER BY``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from docler_ray.stages.frequent import _TOKEN_RE


def posting_heads(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    head_k: int = 8,
):
    """documents -> (token, df, postings_head) with df exact and
    postings_head = the ``head_k`` smallest doc_ids, comma-joined."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        per_tok: dict[str, list[int]] = {}
        for i, t in zip(ids, texts):
            for tok in set(_TOKEN_RE.findall((t or "").lower())):
                per_tok.setdefault(tok, []).append(int(i))
        toks, dfs, heads = [], [], []
        for tok, docs in per_tok.items():
            docs.sort()
            toks.append(tok)
            dfs.append(len(docs))
            heads.append(docs[:head_k])
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "partial_df": pa.array(dfs, pa.int64()),
                "head": pa.array(heads, pa.list_(pa.int64())),
            }
        )

    def merge(df: pd.DataFrame) -> pa.Table:
        token = df["token"].iloc[0]
        total = int(df["partial_df"].sum())
        ids = np.sort(np.concatenate([np.asarray(h) for h in df["head"]]))[
            :head_k
        ]
        head = ",".join(str(int(v)) for v in ids)
        return pa.table(
            {
                "token": pa.array([token], pa.string()),
                "df": pa.array([total], pa.int64()),
                "postings_head": pa.array([head], pa.string()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .map_groups(merge, batch_format="pandas")
    )
