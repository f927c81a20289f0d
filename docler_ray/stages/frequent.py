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
    """Exact corpus top-k tokens via truncated-count candidates + exact
    recount.

    Returns (token, n, rank) with ties broken by token ascending — the
    result is EXACT (and SQL-oracle-checkable) as long as the true top-k
    tokens all clear the survival threshold (any token with > 1/capacity
    of a batch's tokens is in that batch's top-``capacity`` exact counts
    — the same bound Misra-Gries gives, see :func:`misra_gries`), which
    ``capacity`` >> k ensures on non-adversarial corpora; a flat
    distribution degrades to approximate candidates, never to silent
    wrong counts (counts in the output are always exact recounts). Both
    corpus passes are vectorized (split + value_counts / is_in kernels;
    the round-1..2 per-token Python loops measured as the operator's
    dominant cost).
    """
    import ray
    from ray.data.aggregate import Sum

    from docler_ray.stages.joins import _get_broadcast

    def _flat_tokens(batch: pa.Table):
        """Vectorized tokenization: lower + split on non-token runs ==
        the maximal [a-z0-9]+ runs ``_TOKEN_RE.findall`` yields (empties
        from edge separators filtered). Zero Python per token."""
        import pyarrow.compute as pc

        low = pc.utf8_lower(pc.fill_null(batch.column(text_col), ""))
        toks = pc.split_pattern_regex(low, "[^a-z0-9]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        return flat.filter(pc.not_equal(flat, ""))

    def sketch(batch: pa.Table) -> pa.Table:
        # per-batch EXACT counts truncated to the top ``capacity`` rows
        # (count desc, token asc) — vectorized value_counts instead of the
        # per-token Misra-Gries loop (round-3 rewrite; the MG survival
        # bound carries over: at most ``capacity`` tokens can exceed a
        # 1/capacity frequency share within a batch, so any such token is
        # inside the batch's top-``capacity`` by exact count)
        import pyarrow.compute as pc

        vc = pc.value_counts(_flat_tokens(batch))
        toks = vc.field("values").to_numpy(zero_copy_only=False)
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        if len(toks) > capacity:
            order = np.lexsort((toks, -counts))[:capacity]
            toks, counts = toks[order], counts[order]
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "w": pa.array(counts, pa.int64()),
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
        import pyarrow.compute as pc

        cand = _get_broadcast(cand_ref)
        flat = _flat_tokens(batch)
        vc = pc.value_counts(flat.filter(pc.is_in(flat, value_set=cand)))
        return pa.table(
            {
                "token": pc.cast(vc.field("values"), pa.string()),
                "partial_n": pc.cast(vc.field("counts"), pa.int64()),
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
