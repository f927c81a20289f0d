"""Span-level exact dedup: distributed operator vs the single-process
brute-force reference, plus edge cases (token-less docs, full wipeout,
within-doc repeats)."""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from docler_ray.stages.spandedup import _spans_of, span_dedup, span_dedup_brute


def _docs_ds(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def _run(rows, span_tokens=12):
    got = (
        span_dedup(_docs_ds(rows), span_tokens=span_tokens)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return [
        (int(r.doc_id), int(r.n_spans), int(r.n_kept), r.text_dedup)
        for r in got.itertuples()
    ]


def test_spans_of_windows():
    assert _spans_of("a b c d e", 2) == ["a b", "c d", "e"]
    assert _spans_of("  ", 2) == []
    assert _spans_of("x", 2) == ["x"]


def test_keep_first_across_and_within_docs(ray_session):
    rows = [
        (1, "a b c d"),  # spans (k=2): "a b", "c d"
        (2, "a b x y"),  # "a b" dup -> drops
        (3, "c d c d"),  # both windows dup of doc1's "c d"
        (4, ""),
        (5, "p q p q"),  # within-doc repeat: second "p q" drops
    ]
    assert _run(rows, span_tokens=2) == [
        (1, 2, 2, "a b c d"),
        (2, 2, 1, "x y"),
        (3, 2, 0, ""),
        (4, 0, 0, ""),
        (5, 2, 1, "p q"),
    ]


def test_all_docs_tokenless(ray_session):
    assert _run([(1, ""), (2, "   ")], span_tokens=3) == [
        (1, 0, 0, ""),
        (2, 0, 0, ""),
    ]


def test_randomized_matches_brute(ray_session):
    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30))))
        for i in range(60)
    ]
    assert _run(rows, span_tokens=4) == span_dedup_brute(rows, span_tokens=4)


def test_span_cap_raises(ray_session):
    from docler_ray.stages import spandedup

    rows = [(1, "a " * 12)]  # 12 tokens -> 12 spans at span_tokens=1
    old = spandedup._POS_BASE
    spandedup._POS_BASE = 8
    try:
        with pytest.raises(Exception, match="per-doc cap"):
            _run(rows, span_tokens=1)
    finally:
        spandedup._POS_BASE = old


def test_paragraph_dedup_matches_sql(ray_session):
    """CCNet paragraph dedup == its DuckDB replay on a corpus with
    cross-doc and within-doc duplicate lines, empty lines, and None."""
    import duckdb
    import pandas as pd
    import ray.data

    import __ray_entry__ as e
    from docler_ray.stages.spandedup import paragraph_dedup

    texts = [
        "alpha beta\ncommon footer\ngamma",
        "delta\ncommon footer\nalpha beta",
        "\n\ncommon footer\n\n",
        "",
        None,
        "repeat me\nrepeat me\nunique tail",
        "solo line",
    ]
    df = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": pd.array(texts, dtype="string")}
    )
    got = (
        paragraph_dedup(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(
        e.oracle_sql()["paragraph_dedup_docs"] + " ORDER BY doc_id"
    ).df()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
    # the within-doc duplicate collapses; the first occurrence survives
    row5 = got.loc[got["doc_id"] == 5].iloc[0]
    assert row5["text_dedup"] == "repeat me\nunique tail"
