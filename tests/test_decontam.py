"""Decontamination: benchmark gram set + per-instance hit counting."""

from __future__ import annotations

import pyarrow as pa

from docler_ray.stages.decontam import (
    _ngrams,
    benchmark_ngram_ref,
    decontaminate,
)


def test_ngrams_windows():
    assert _ngrams("a b c d", 3) == ["a b c", "b c d"]
    assert _ngrams("a b", 3) == []
    assert _ngrams("", 3) == []


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_decontaminate_counts(ray_session):
    bench = _ds([(100, "the quick brown fox jumps")])  # grams: 1 (5 tokens)
    corpus = _ds(
        [
            (1, "the quick brown fox jumps over"),  # 2 grams, 1 hit
            (2, "totally clean text with nothing shared here"),
            (3, "x the quick brown fox jumps y the quick brown fox jumps"),
            (4, "tiny"),
        ]
    )
    ref = benchmark_ngram_ref(bench, ngram=5)
    out = (
        decontaminate(corpus, ref, ngram=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.n_grams.tolist() == [2, 3, 8, 0]
    assert out.n_hits.tolist() == [1, 0, 2, 0]
    assert out.contaminated.tolist() == [True, False, True, False]
