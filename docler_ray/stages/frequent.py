"""Frequent-items (heavy hitters): Misra-Gries map-side summaries with an
exact recount pass.

No reference precedent (SURVEY.md §2.7 — docler has no corpus-level
aggregates); this is the vocabulary/DF-statistics operator a training-data
pipeline runs over web-scale text ("what are the dominant tokens/boilerplate
strings in this crawl"). Two-pass scale pattern:

1. **Sketch pass** — each batch folds its tokens into a Misra-Gries summary
   of capacity C (at most C (token, weight) rows leave the batch, whatever
   the batch's vocabulary size). The MG guarantee: any token with frequency
   > batch_tokens/C survives its batch summary, so a union bound gives: any
   token with GLOBAL frequency > total_tokens/C appears in at least one
   partial. The shuffle ships O(C x num_batches) partial rows, never the
   token stream.
2. **Exact recount pass** — the candidate set (top ``candidate_factor x k``
   partial tokens by summed weight) is broadcast (bounded, ray.put once)
   and re-counted EXACTLY map-side; a groupby over (candidate, partial_n)
   yields exact counts, so the final top-k is exact whenever the true top-k
   is inside the candidate set (guaranteed for tokens above the MG
   threshold; the SQL oracle pins it end-to-end on the test corpus).

Tokenization matches the keyword annotator (lowercase ``[a-z0-9]+``), so
the DuckDB oracle mirrors it with ``regexp_extract_all(lower(text), ...)``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def misra_gries(tokens: list[str], capacity: int) -> dict[str, int]:
    """Classic Misra-Gries summary: at most ``capacity`` counters; every
    token with frequency > len(tokens)/capacity is guaranteed a counter,
    and each counter under-estimates by at most len(tokens)/capacity."""
    counters: dict[str, int] = {}
    for tok in tokens:
        if tok in counters:
            counters[tok] += 1
        elif len(counters) < capacity:
            counters[tok] = 1
        else:
            dead = [t for t, c in counters.items() if c == 1]
            for t in counters:
                counters[t] -= 1
            for t in dead:
                del counters[t]
    return counters


def top_tokens(
    ds,
    text_col: str,
    *,
    k: int = 20,
    capacity: int = 1024,
    candidate_factor: int = 8,
) -> pa.Table:
    """Exact corpus top-k tokens via MG candidates + exact recount.

    Returns (token, n, rank) with ties broken by token ascending — the
    result is EXACT (and SQL-oracle-checkable) as long as the true top-k
    tokens all clear the MG survival threshold, which ``capacity`` >> k
    ensures on non-adversarial corpora; a flat distribution degrades to
    approximate candidates, never to silent wrong counts (counts in the
    output are always exact recounts).
    """
    import ray
    from ray.data.aggregate import Sum

    from docler_ray.stages.joins import _get_broadcast

    def sketch(batch: pa.Table) -> pa.Table:
        tokens: list[str] = []
        for t in batch.column(text_col).to_pylist():
            tokens.extend(_TOKEN_RE.findall((t or "").lower()))
        summary = misra_gries(tokens, capacity)
        return pa.table(
            {
                "token": pa.array(list(summary.keys()), pa.string()),
                "w": pa.array(list(summary.values()), pa.int64()),
            }
        )

    partial_sums = (
        ds.map_batches(sketch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("w", alias_name="w"))
    )
    # candidate cut: bounded driver state (candidate_factor x k rows)
    from docler_ray.stages.topk import topk

    cand_tbl = topk(
        partial_sums, sort_col="w", k=candidate_factor * k,
        keep_cols=["token"], tie_col="token",
    )
    candidates = cand_tbl.column("token")
    cand_ref = ray.put(candidates.combine_chunks())

    def recount(batch: pa.Table) -> pa.Table:
        cand = _get_broadcast(cand_ref)
        wanted = set(cand.to_pylist())
        counts: dict[str, int] = {}
        for t in batch.column(text_col).to_pylist():
            for tok in _TOKEN_RE.findall((t or "").lower()):
                if tok in wanted:
                    counts[tok] = counts.get(tok, 0) + 1
        return pa.table(
            {
                "token": pa.array(list(counts.keys()), pa.string()),
                "partial_n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    exact = (
        ds.map_batches(recount, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("partial_n", alias_name="n"))
        .to_pandas()  # candidate_factor x k rows at most
    )
    exact = exact.sort_values(["n", "token"], ascending=[False, True]).head(k)
    exact = exact.reset_index(drop=True)
    exact["rank"] = np.arange(1, len(exact) + 1, dtype=np.int64)
    return pa.Table.from_pandas(
        exact[["token", "n", "rank"]].astype({"n": "int64"}), preserve_index=False
    )
