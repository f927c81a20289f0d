"""Repetition-signal edge cases (pure function) + batch pass-through."""

from __future__ import annotations

import pyarrow as pa

from docler_ray.stages.repetition import (
    RepetitionSignals,
    repetition_signals_row,
)


def test_empty_and_single_token():
    r = repetition_signals_row("")
    assert r == {
        "top_2gram": "",
        "top_2gram_n": 0,
        "top_2gram_frac": 0.0,
        "dup_2gram_frac": 0.0,
        "distinct_token_ratio": 0.0,
    }
    r1 = repetition_signals_row("  hello  ")
    assert r1["top_2gram"] == "" and r1["distinct_token_ratio"] == 1.0


def test_repeated_bigram_and_tie_break():
    # "a b a b a" -> bigrams: "a b" x2, "b a" x2 -> tie broken to "a b"
    r = repetition_signals_row("a b a b a")
    assert r["top_2gram"] == "a b" and r["top_2gram_n"] == 2
    assert r["dup_2gram_frac"] == 1.0  # all 4 instances duplicated
    assert r["distinct_token_ratio"] == 2 / 5
    assert r["top_2gram_frac"] == (2 * 3) / 9  # len("a b")=3, len text=9


def test_all_unique():
    r = repetition_signals_row("one two three")
    assert r["top_2gram_n"] == 1 and r["dup_2gram_frac"] == 0.0
    assert r["distinct_token_ratio"] == 1.0


def test_batch_shape():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a b a b", ""], pa.string()),
        }
    )
    out = RepetitionSignals()(batch)
    assert out.num_rows == 2
    assert out.column_names == [
        "doc_id",
        "top_2gram",
        "top_2gram_n",
        "top_2gram_frac",
        "dup_2gram_frac",
        "distinct_token_ratio",
    ]
