"""Benchmark decontamination: flag corpus documents that share word
n-grams with a benchmark/eval set.

The standard training-data hygiene operator (GPT-3 appendix C /
"Documenting the English Colossal Clean Crawled Corpus" style: drop or flag
training documents overlapping eval data by exact n-gram match). Scale
shape: the benchmark side is SMALL BY DEFINITION (eval suites are MBs; the
corpus is the 100-TB side), so its distinct n-gram set is reduced
distributedly, collected once, and broadcast via ``ray.put`` — the corpus
side is a single stateless ``map_batches`` pass with a per-worker memoized
set lookup (the broadcast-small-side join pattern, never a shuffle of the
corpus). No reference precedent (SURVEY.md §2.7 — docler has no
corpus-level operators).

Definitions (mirrored exactly by the driver's DuckDB oracle):

- tokens = whitespace split of ``trim(text)``; n-grams are the OVERLAPPING
  word ``ngram``-grams joined with single spaces.
- ``n_grams`` = the document's n-gram instance count
  (``max(0, n_tokens - ngram + 1)``).
- ``n_hits`` = how many of those instances (counted per position) occur in
  the benchmark's distinct n-gram set.
- ``contaminated`` = ``n_hits > 0``.
"""

from __future__ import annotations

import pyarrow as pa

from docler_ray.functions.tokens import ws_tokens


def _ngrams(text: str, n: int) -> list[str]:
    toks = ws_tokens(text)
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def benchmark_ngram_ref(bench_ds, *, text_col: str = "text", ngram: int = 5):
    """Distinct n-gram set of the benchmark side -> ``ray.put`` object ref.

    Map-side distinct per batch, then a streaming driver union of the
    partials — driver state is the distinct-gram set (benchmark-sized by
    the operator's core assumption: eval suites are MBs) and each shipped
    partial is a batch's distinct grams, also benchmark-bounded. No
    shuffle: a distributed groupby-distinct here would pay a full
    aggregator-pool spinup to dedup a set the driver must hold anyway.
    """
    import ray

    def emit(batch: pa.Table) -> pa.Table:
        grams: set[str] = set()
        for t in batch.column(text_col).to_pylist():
            grams.update(_ngrams(t, ngram))
        return pa.table({"g": pa.array(sorted(grams), pa.string())})

    partials = bench_ds.map_batches(
        emit, batch_format="pyarrow", zero_copy_batch=True
    )
    gram_set: set[str] = set()
    for b in partials.iter_batches(batch_size=65536, batch_format="pyarrow"):
        gram_set.update(b.column("g").to_pylist())
    return ray.put(gram_set)


def decontaminate(
    ds,
    bench_ref,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 5,
):
    """Corpus pass: append (n_grams, n_hits, contaminated) per document."""
    from docler_ray.stages.joins import _get_broadcast

    def flag(batch: pa.Table) -> pa.Table:
        bench: set[str] = _get_broadcast(bench_ref)
        ids = batch.column(id_col)
        n_grams: list[int] = []
        n_hits: list[int] = []
        for t in batch.column(text_col).to_pylist():
            grams = _ngrams(t, ngram)
            n_grams.append(len(grams))
            n_hits.append(sum(1 for g in grams if g in bench))
        return pa.table(
            {
                id_col: ids,
                "n_grams": pa.array(n_grams, pa.int64()),
                "n_hits": pa.array(n_hits, pa.int64()),
                "contaminated": pa.array([h > 0 for h in n_hits], pa.bool_()),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)
