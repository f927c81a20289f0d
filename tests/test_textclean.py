"""C4-style line filter: adversarial Python-vs-DuckDB equivalence (the
redact_pii strategy) plus the Dataset stage contract. The corpus queries
exercise only rules that bite on the synthetic data; these tests pin EVERY
rule — terminal punctuation, banned substrings, word-count edges with
repeated spaces, document-level bans — against the SQL replay."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from docler_ray.functions.textclean import (
    LineFilterConfig,
    clean_document,
    keep_line,
    line_filter_sql,
)

ADVERSARIAL_DOCS = [
    "Short line.\nThis line has exactly five words.\nthis one has no final punctuation",
    'He said "stop".\nQuote-terminated line counts as a sentence."\nJAVASCRIPT required here today ok.',
    "  leading spaces make   extra empty words here.\n\n\nonly.   ",
    "One two three four five.\nOne two three four.\nends with bang four five!",
    "A cookie policy banner line here.\nA Cookie POLICY mixed case too here.",
    "normal text but the doc has lorem ipsum inside.\nGood line with five words.",
    "code marker { in doc.\nOtherwise a fine long sentence here.",
    "",
    "no newlines at all just one short line",
    "Tab\tseparated words do not split on tab so one word?",
]


def _cfgs():
    return [
        LineFilterConfig(),  # C4 defaults: punct on, javascript/cookie bans
        LineFilterConfig(min_words=3, require_terminal_punct=False),
        LineFilterConfig(
            min_words=1,
            require_terminal_punct=True,
            banned_line_substrings=(),
            banned_doc_substrings=(),
        ),
    ]


def test_python_vs_duckdb_equivalence():
    import duckdb

    for cfg in _cfgs():
        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame(
                {"doc_id": range(len(ADVERSARIAL_DOCS)), "text": ADVERSARIAL_DOCS}
            ),
        )
        sql = line_filter_sql("text", cfg)
        got = con.sql(sql).df().set_index("doc_id")
        for i, doc in enumerate(ADVERSARIAL_DOCS):
            cleaned, k, n, banned = clean_document(doc, cfg)
            if banned:
                assert i not in got.index, (cfg, i)
                continue
            row = got.loc[i]
            assert row["text"] == cleaned, (cfg, i, row["text"], cleaned)
            assert row["n_lines_kept"] == k and row["n_lines_total"] == n


def test_keep_line_rules():
    cfg = LineFilterConfig()
    assert keep_line("One two three four five.", cfg)
    assert not keep_line("Too short.", cfg)
    assert not keep_line("five whole words but no punct", cfg)
    assert keep_line('quote ending line with five words."', cfg)
    assert not keep_line("JavaScript needed for this site today.", cfg)
    # split(' ') semantics: repeated spaces create empty words that COUNT
    cfg2 = LineFilterConfig(min_words=5, require_terminal_punct=False)
    assert keep_line("a  b  c", cfg2)  # ['a','','b','','c'] -> 5


def test_banned_substrings_must_be_lowercase():
    import pytest

    with pytest.raises(ValueError):
        LineFilterConfig(banned_line_substrings=("JavaScript",))


def test_line_filter_stage(ray_session):
    import ray.data

    from docler_ray.functions.textclean import line_filter

    cfg = LineFilterConfig(
        min_words=2,
        require_terminal_punct=False,
        banned_line_substrings=("spam",),
        banned_doc_substrings=("dropme",),
    )
    docs = [
        "keep this\nno\nspam spam spam",
        "dropme entirely now",
        "one two\nthree four",
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0, 1, 2]), "text": pa.array(docs)})
    )
    out = (
        line_filter(ds, cfg=cfg).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out.doc_id.tolist() == [0, 2]  # doc 1 banned
    assert out.text.tolist() == ["keep this", "one two\nthree four"]
    assert out.n_lines_kept.tolist() == [1, 2]
    assert out.n_lines_total.tolist() == [3, 2]
