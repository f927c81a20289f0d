"""Adversarial equivalence: detect_language (Python) vs the lang_confusion
oracle's SQL CASE replay, on inputs chosen to stress every branch."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docler_ray.functions.analysis import detect_language

EDGE = [
    "",
    " ",
    "the of and to in is was for that with",  # en
    "der die und das den von zu mit sich des",  # de
    "le de la et les des en un du que",  # fr -- overlaps es heavily
    "de la que el en los se del las un",  # es
    "快速的棕色狐狸跳过了懒狗然后又跑了很远的路",  # zh
    "mixed 快 text with the of and one cjk char",  # below 5% cjk -> not zh
    "快快快 the of",  # cjk-heavy short -> zh
    "12345 !!! ???",  # no words -> en
    "naïve café déjà vu être sûr",  # accented words, fr stopword 'être'
    "x" * 3000 + " the of der die",  # sample cutoff at 2000 chars
    "THE OF AND",  # case folding
    "thequickbrown",  # no stopword as substring match
]


def _sql_detect(texts: list[str]) -> list[str]:
    import __ray_entry__ as entry_mod

    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts)), "lang": "xx", "text": texts}
    )
    con = duckdb.connect()
    con.register("documents", df)
    out = con.execute(
        entry_mod._lang_detect_sql("doc_id") + " ORDER BY doc_id"
    ).df()
    return out["lang_detected"].tolist()


def test_lang_detect_matches_sql_on_edges():
    got = [detect_language(t) for t in EDGE]
    want = _sql_detect(EDGE)
    assert got == want


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet="the of der die le la el los 快跑 naïve é . ! \n aZ9",
            max_size=120,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_lang_detect_matches_sql_random(texts):
    got = [detect_language(t) for t in texts]
    want = _sql_detect(texts)
    assert got == want
