"""The canonical whitespace-token contract (tokens.ws_tokens) and its two
replicas: the pure-regex spec (the fast path must be invisible) and the
DuckDB SQL twin (ws_tokens_sql). Analog of the reference's tokenizer unit
coverage (/root/reference/tests/test_token_chunker.py) but pinned to the
cross-engine contract this repo's oracles depend on.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docler_ray.functions.tokens import _ASCII_WS_RE, ws_tokens, ws_tokens_sql


def _spec(text: str) -> list[str]:
    return [t for t in _ASCII_WS_RE.split(text or "") if t]


EDGE_TEXTS = [
    "",
    " ",
    "\t\n\r\f\v",
    "a",
    " a ",
    "\ta b\nc\r",
    "a\x1cb",  # 0x1c is str.split whitespace but NOT in the contract
    "x\x1d\x1e\x1fy",
    "h\xa0i",  # unicode NBSP: one token under the ASCII contract
    "a b",  # unicode line separator: same
    "é fin\v",
    "w1  w2\n\nw3",
]


def test_ws_tokens_matches_regex_spec_on_edges():
    for t in EDGE_TEXTS:
        assert ws_tokens(t) == _spec(t), repr(t)
    assert ws_tokens(None) == []  # type: ignore[arg-type]


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            codec="utf-8", categories=("L", "N", "P", "Z", "C")
        ),
        max_size=60,
    )
)
def test_ws_tokens_fast_path_invisible(text):
    assert ws_tokens(text) == _spec(text)


def test_ws_tokens_sql_twin_agrees():
    df = pd.DataFrame(
        {
            "doc_id": range(len(EDGE_TEXTS) + 1),
            "text": pd.array(EDGE_TEXTS + [None], dtype="string"),
        }
    )
    con = duckdb.connect()
    con.register("t", df)
    got = con.execute(
        f"SELECT {ws_tokens_sql('text')} AS ws FROM t ORDER BY doc_id"
    ).fetchall()
    want = [ws_tokens(t) for t in EDGE_TEXTS] + [[]]
    assert [list(r[0]) for r in got] == want
