"""Gopher quality rules: Python vs DuckDB replay equivalence."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from docler_ray.functions.gopher import (
    GopherConfig,
    gopher_signals,
    gopher_sql,
)

EDGE_TEXTS = [
    "",
    " ",
    "\n\n\n",
    "word",
    "- bullet one\n- bullet two\n- bullet three",
    "* star\n* star two\nplain line with the and of that",
    "trailing dots...\nmore dots...\nclean line here.",
    "### heading ### with # symbols # everywhere #",
    "the be to of and that have with",  # all 8 stopwords
    "THE BE TO OF AND THAT HAVE WITH",  # case folding probe
    "then bethel toffee",  # \b probe: substrings must NOT count
    "a b c d e f g h i j",  # short words -> mean length below 3
    "internationalization extraordinarily incomprehensibilities",
    "12345 67890 !!! ???",  # no alphabetic tokens
    "... ... ... ...",
    "#",
    "x " * 200 + "the of.",  # long enough, mostly 1-char words
]


def _rand_corpus(n: int, seed: int = 5) -> list[str]:
    rng = np.random.default_rng(seed)
    vocab = [
        "the", "of", "and", "quantum", "pipeline", "data", "#", "...",
        "- item", "a", "extraordinarily", "12", "!!",
    ]
    out = []
    for _ in range(n):
        k = int(rng.integers(0, 120))
        words = rng.choice(vocab, size=k).tolist()
        text = " ".join(words)
        # sprinkle newlines so line rules get exercised
        if k > 10:
            parts = text.split(" ")
            cut = int(rng.integers(1, k))
            text = " ".join(parts[:cut]) + "\n" + " ".join(parts[cut:])
        out.append(text)
    return out


def test_gopher_python_sql_equivalence():
    cfg = GopherConfig()
    texts = EDGE_TEXTS + _rand_corpus(300)
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    con = duckdb.connect()
    con.register("documents", df)
    want = (
        con.execute(gopher_sql(cfg))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = pd.DataFrame(
        [{"doc_id": i, **gopher_signals(t, cfg)} for i, t in enumerate(texts)]
    )
    for c in want.columns:
        if want[c].dtype == object or str(want[c].dtype) == "bool":
            assert got[c].astype(bool).tolist() == want[c].astype(bool).tolist(), c
        else:
            assert got[c].tolist() == want[c].tolist(), c


def test_gopher_published_constants_behave():
    cfg = GopherConfig()
    good = (
        "The quick brown fox jumps over the lazy dog and keeps running "
        "through the field with great joy because that is what foxes have "
        "always done in stories that people tell to children of all ages. "
        "It was a bright morning and the air was clear and fresh with dew."
    )
    assert gopher_signals(good, cfg)["keep"]
    assert not gopher_signals("too short", cfg)["keep"]
    bullets = "\n".join("- item number " + str(i) for i in range(100))
    assert not gopher_signals(bullets, cfg)["ok_bullet_lines"]


def test_gopher_flags_dataset(ray_session):
    import ray.data

    from docler_ray.functions.gopher import gopher_flags

    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(EDGE_TEXTS), dtype=np.int64),
            "text": EDGE_TEXTS,
        }
    )
    out = (
        gopher_flags(ray.data.from_pandas(df).repartition(3), concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == len(EDGE_TEXTS)
    # EVERY column of the vectorized batch path must match the scalar
    # spec function — not just keep (a drift in one rule column could
    # hide behind an unchanged conjunction on this corpus)
    cfg = GopherConfig()
    ref_rows = [gopher_signals(t, cfg) for t in EDGE_TEXTS]
    for col in out.columns:
        if col == "doc_id":
            continue
        got = out[col].tolist()
        want = [r[col] for r in ref_rows]
        assert got == want, col


def test_gopher_flags_null_text_matches_sql(ray_session):
    """NULL text rows: batch path and SQL replay must agree (both read
    NULL as '' -> n_words 0, every rule False)."""
    import ray.data

    from docler_ray.functions.gopher import gopher_flags

    df = pd.DataFrame(
        {"doc_id": np.arange(3, dtype=np.int64),
         "text": pd.array([None, "", "word"], dtype="string")}
    )
    out = (
        gopher_flags(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    want = (
        con.execute(gopher_sql(GopherConfig()))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for col in want.columns:
        assert out[col].tolist() == want[col].tolist(), col
