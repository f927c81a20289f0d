"""Per-document repetition signals — the Gopher-style repetition quality
filters (Rae et al., arXiv:2112.11446 §A1.1: fraction of characters in the
most frequent n-gram, fraction of duplicated n-grams) plus a distinct-token
ratio, as one embarrassingly-parallel map-side pass.

No reference precedent (docler has no corpus/quality tier, SURVEY.md §2.7);
this sits next to ``stages/quality.py`` in the training-data tier. Unlike
the dedup family there is NO shuffle: every signal is a pure function of one
document, so the operator is a task-pool ``map_batches`` that appends
columns — the 100-TB shape is trivially right (zero exchanges, zero state).

Definitions (exactly mirrored by the driver's DuckDB oracle, including tie
breaks and zero-denominator cases):

- tokens = whitespace split of ``trim(text)``; 2-grams are the overlapping
  word bigrams joined with a single space.
- ``top_2gram`` = the most frequent 2-gram, ties broken lexicographically
  ascending ('' when the doc has < 2 tokens).
- ``top_2gram_frac`` = top-2-gram count x its character length / character
  length of the trimmed text (0.0 when no 2-grams). Both operands are
  integers computed identically on both sides, so the float64 quotient is
  IEEE-identical and hash-safe.
- ``dup_2gram_frac`` = instances of 2-grams occurring more than once /
  total 2-gram instances (0.0 when no 2-grams).
- ``distinct_token_ratio`` = distinct tokens / tokens (0.0 for empty docs).

Per-row Counter loops are bounded by document length (the same inherent
per-doc cost class as ``TextAnalyzer``), never corpus-proportional.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from docler_ray.functions.tokens import ws_tokens


def repetition_signals_row(text: str) -> dict:
    toks = ws_tokens(text)
    n_tok = len(toks)
    n_chars = len((text or "").strip(" \t\n\r\f\v"))  # ASCII strip, SQL trim-replayable
    distinct_ratio = (len(set(toks)) / n_tok) if n_tok else 0.0
    if n_tok < 2:
        return {
            "top_2gram": "",
            "top_2gram_n": 0,
            "top_2gram_frac": 0.0,
            "dup_2gram_frac": 0.0,
            "distinct_token_ratio": distinct_ratio,
        }
    grams = Counter(
        toks[i] + " " + toks[i + 1] for i in range(n_tok - 1)
    )
    top_g, top_n = min(grams.items(), key=lambda kv: (-kv[1], kv[0]))
    n_grams = n_tok - 1
    dup_instances = sum(c for c in grams.values() if c > 1)
    return {
        "top_2gram": top_g,
        "top_2gram_n": top_n,
        "top_2gram_frac": (top_n * len(top_g)) / n_chars if n_chars else 0.0,
        "dup_2gram_frac": dup_instances / n_grams,
        "distinct_token_ratio": distinct_ratio,
    }


class RepetitionSignals:
    """documents batch -> (id, signals...) batch; stateless map-side pass."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id") -> None:
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [
            repetition_signals_row(t)
            for t in batch.column(self.text_col).to_pylist()
        ]
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "top_2gram": pa.array([r["top_2gram"] for r in rows], pa.string()),
                "top_2gram_n": pa.array(
                    [r["top_2gram_n"] for r in rows], pa.int64()
                ),
                "top_2gram_frac": pa.array(
                    [r["top_2gram_frac"] for r in rows], pa.float64()
                ),
                "dup_2gram_frac": pa.array(
                    [r["dup_2gram_frac"] for r in rows], pa.float64()
                ),
                "distinct_token_ratio": pa.array(
                    [r["distinct_token_ratio"] for r in rows], pa.float64()
                ),
            }
        )


def repetition_signals(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        RepetitionSignals(text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
