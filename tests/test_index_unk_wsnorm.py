"""Posting-list heads, UNK-rate stats, whitespace normalization — each
pinned against a DuckDB replay."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from docler_ray.functions.textclean import normalize_ws, normalize_ws_sql
from docler_ray.stages.index import posting_heads
from docler_ray.stages.vocab import unk_stats

DOCS = [
    "alpha beta gamma alpha",
    "beta delta",
    "ALPHA punct! beta2",  # lowercased; 'beta2' is one [a-z0-9]+ token
    "",
    "gamma gamma gamma",
    "zeta alpha",
]


def _docs_df() -> pd.DataFrame:
    return pd.DataFrame({"doc_id": np.arange(len(DOCS)), "text": DOCS})


_POSTINGS_SQL = (
    "WITH t AS (SELECT DISTINCT doc_id, "
    "unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+')) "
    "AS token FROM documents), "
    "r AS (SELECT token, doc_id, "
    "ROW_NUMBER() OVER (PARTITION BY token ORDER BY doc_id) AS rn, "
    "COUNT(*) OVER (PARTITION BY token) AS df FROM t) "
    "SELECT token, CAST(df AS BIGINT) AS df, "
    "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) "
    "AS postings_head FROM r WHERE rn <= 3 GROUP BY token, df"
)


def test_posting_heads_vs_duckdb(ray_session):
    import ray.data

    df = _docs_df()
    got = (
        posting_heads(ray.data.from_pandas(df).repartition(3), head_k=3)
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(_POSTINGS_SQL).df().sort_values("token").reset_index(drop=True)
    assert got["token"].tolist() == want["token"].tolist()
    assert got["df"].tolist() == want["df"].tolist()
    assert got["postings_head"].tolist() == want["postings_head"].tolist()
    # df is exact even where the head is truncated
    by_tok = got.set_index("token")
    assert by_tok.loc["alpha", "df"] == 3
    assert by_tok.loc["alpha", "postings_head"] == "0,2,5"


def test_unk_stats_vs_duckdb(ray_session):
    import ray.data

    df = _docs_df()
    got = unk_stats(
        ray.data.from_pandas(df).repartition(3), vocab_k=2
    ).to_pandas()
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(
        "WITH toks AS (SELECT unnest(regexp_extract_all(lower("
        "coalesce(text, '')), '[a-z0-9]+')) AS tok FROM documents), "
        "c AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok), "
        "r AS (SELECT tok, ROW_NUMBER() OVER (ORDER BY n DESC, tok) "
        "AS rank FROM c), v AS (SELECT tok FROM r WHERE rank <= 2) "
        "SELECT CAST(2 AS BIGINT) AS vocab_size, "
        "(SELECT COUNT(*) FROM toks) AS total_tokens, "
        "(SELECT COUNT(*) FROM toks WHERE tok NOT IN "
        "(SELECT tok FROM v)) AS unk_tokens"
    ).df()
    assert got["vocab_size"].tolist() == want["vocab_size"].tolist()
    assert got["total_tokens"].tolist() == want["total_tokens"].tolist()
    assert got["unk_tokens"].tolist() == want["unk_tokens"].tolist()


WS_EDGE = [
    "",
    "   ",
    "a  b\tc",
    "\r\nwindows\r\nlines\r\n",
    "bare\rcr",
    "ctrl\x00\x01chars\x1f\x7fgone",
    "  leading and trailing  ",
    "line \n next",
    "a\n\n\n\n\nb",
    "tab\t\t\ttab",
    "\n\n\n",
    "mixed \r\n \t \r stuff",
]


def test_normalize_ws_vs_duckdb(ray_session):
    import ray.data

    df = pd.DataFrame({"doc_id": np.arange(len(WS_EDGE)), "text": WS_EDGE})
    got = (
        normalize_ws(ray.data.from_pandas(df).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    want = (
        con.execute(normalize_ws_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["text_norm"].tolist() == want["text_norm"].tolist()
    assert got["n_chars_before"].tolist() == want["n_chars_before"].tolist()
    assert got["n_chars_after"].tolist() == want["n_chars_after"].tolist()
    # spot semantics
    by_id = got.set_index("doc_id")["text_norm"]
    assert by_id[2] == "a b c"
    assert by_id[3] == "windows\nlines"
    assert by_id[5] == "ctrlcharsgone"
    assert by_id[8] == "a\n\nb"
