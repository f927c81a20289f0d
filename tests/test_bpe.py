"""BPE vocabulary training (stages/vocab.py::train_bpe): distributed
word-count + driver merge loop vs a from-first-principles brute force
over the raw corpus, plus determinism and truncation-bound checks.
Iterative and data-dependent, so oracle-exempt by the sanctioned rule —
these tests are its correctness gate."""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
import pytest

from docler_ray.stages.vocab import _bpe_merges_from_word_counts, train_bpe

TEXTS = [
    "the cat sat on the mat",
    "the thin theme then",
    "low lower lowest slow slowly",
    "new newer newest news",
    "",
    None,
    "THE CAT",  # lowercased -> merges with doc 0's words
    "xyzzy xyzzy xyzzy",
]


def _brute_merges(texts, n_merges, min_pair_count=2):
    """Independent implementation: count words straight off the corpus,
    then the textbook merge loop."""
    wr = re.compile(r"[a-z]+")
    wc = Counter()
    for t in texts:
        wc.update(wr.findall((t or "").lower()))
    return _bpe_merges_from_word_counts(
        sorted(wc.items()), n_merges, min_pair_count
    )


def test_train_bpe_matches_brute_force(ray_session):
    import ray.data

    df = pd.DataFrame(
        {"doc_id": range(len(TEXTS)), "text": pd.array(TEXTS, dtype="string")}
    )
    got = (
        train_bpe(ray.data.from_pandas(df), n_merges=15)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    want = _brute_merges(TEXTS, 15)
    assert list(zip(got["rank"], got["left"], got["right"], got["pair_count"])) == want
    # the most frequent pair on this corpus must involve 'th' or 'he'
    assert got.loc[0, "left"] + got.loc[0, "right"] in {"th", "he"}


def test_train_bpe_deterministic(ray_session):
    import ray.data

    df = pd.DataFrame({"text": pd.array(TEXTS, dtype="string")})
    a = train_bpe(ray.data.from_pandas(df), n_merges=10).to_pandas()
    b = train_bpe(ray.data.from_pandas(df), n_merges=10).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_bpe_merge_loop_tie_break_and_floor():
    # 'ab' and 'cd' both appear twice: lexicographically smaller pair wins
    merges = _bpe_merges_from_word_counts([("ab", 2), ("cd", 2)], 5, 2)
    assert merges[0][1:3] == ("a", "b")
    # min_pair_count floor stops the loop
    assert all(m[3] >= 2 for m in merges)
    # singleton pairs below the floor produce no merges
    assert _bpe_merges_from_word_counts([("xy", 1)], 5, 2) == []


def test_bpe_merges_compose_multichar_symbols():
    # 'aaaa' x4: first merge (a,a)->'aa', second ('aa','aa') or ('aa','a')
    merges = _bpe_merges_from_word_counts([("aaaa", 4)], 3, 2)
    assert merges[0][1:3] == ("a", "a")
    assert merges[1][1] == "aa"  # second merge consumes the new symbol


def test_train_bpe_truncation_bound(ray_session):
    """max_words truncation keeps the driver table bounded: training on
    the top-1 word only must ignore rarer words entirely."""
    import ray.data

    texts = ["zz zz zz zz", "qq"]  # zz dominates
    df = pd.DataFrame({"text": pd.array(texts, dtype="string")})
    got = train_bpe(
        ray.data.from_pandas(df), n_merges=5, max_words=1
    ).to_pandas()
    assert set(got["left"] + got["right"]) == {"zz"}


def test_encode_word_follows_merge_ranks():
    from docler_ray.stages.vocab import _encode_word

    # merges: (l,o)->lo rank0, (lo,w)->low rank1, (e,r) rank2
    ranks = {("l", "o"): 0, ("lo", "w"): 1, ("e", "r"): 2}
    assert _encode_word("lower", ranks) == 2  # low + er
    assert _encode_word("low", ranks) == 1
    assert _encode_word("xyz", ranks) == 3  # no merges apply
    assert _encode_word("o", ranks) == 1
    # rank order matters: (o,w) never merges because (l,o) fires first
    assert _encode_word("low", {("o", "w"): 0, ("l", "o"): 1}) == 2  # l + ow


def test_bpe_encode_stats_matches_brute_force(ray_session):
    import ray.data

    from docler_ray.stages.vocab import (
        _encode_word,
        bpe_encode_stats,
        train_bpe,
    )

    df = pd.DataFrame(
        {"doc_id": range(len(TEXTS)), "text": pd.array(TEXTS, dtype="string")}
    )
    ds = ray.data.from_pandas(df)
    got = (
        bpe_encode_stats(ds, n_merges=12)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    merges = train_bpe(ds, n_merges=12).to_pandas()
    ranks = {
        (l, r): int(k)
        for k, l, r in zip(merges["rank"], merges["left"], merges["right"])
    }
    wr = re.compile(r"[a-z]+")
    for i, t in enumerate(TEXTS):
        words = wr.findall((t or "").lower())
        assert got.loc[i, "n_words"] == len(words)
        assert got.loc[i, "n_pieces"] == sum(_encode_word(w, ranks) for w in words)
    # merges compress: pieces strictly below character count on real docs
    chars = sum(len(w) for w in wr.findall((TEXTS[0] or "").lower()))
    assert 0 < got.loc[0, "n_pieces"] < chars


def test_bpe_sql_oracles_match_on_adversarial_corpus(ray_session):
    """Round-4: the recursive-CTE DuckDB oracles replay training AND
    encoding exactly on a corpus with ties, overlapping-merge words
    ('aaaa'), case folding, empty/None docs and single-char words."""
    import duckdb
    import ray.data

    import __ray_entry__ as e
    from docler_ray.stages.vocab import bpe_encode_stats

    texts = TEXTS + ["aaaa aaa banana a", "zz zz qq"]
    df = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": pd.array(texts, dtype="string")}
    )
    con = duckdb.connect()
    con.register("documents", df)

    got_m = (
        train_bpe(ray.data.from_pandas(df), n_merges=30)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    want_m = con.execute(e.oracle_sql()["bpe_merges"] + " ORDER BY rank").df()
    pd.testing.assert_frame_equal(got_m, want_m)

    got_e = (
        bpe_encode_stats(ray.data.from_pandas(df), n_merges=30)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want_e = con.execute(
        e.oracle_sql()["bpe_encode_stats"] + " ORDER BY doc_id"
    ).df()
    pd.testing.assert_frame_equal(got_e, want_e)
