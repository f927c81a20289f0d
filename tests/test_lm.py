"""Bigram-LM quality scoring (stages/lm.py) vs its DuckDB replay on
adversarial corpora — repetition, empty/None text, single-token docs —
plus the all-short-docs edge where no bigram exists anywhere."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from docler_ray.functions.tokens import ws_tokens_sql

_WS = ws_tokens_sql("text")

_SQL = (
    "WITH toks AS (SELECT doc_id, " + _WS + " AS ws FROM documents), "
    "big AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2 "
    "FROM toks, UNNEST(range(1, array_length(ws))) AS t(i)), "
    "c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY w1, w2), "
    "c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY w1), "
    "vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM "
    "(SELECT unnest(ws) AS tok FROM toks)), "
    "cost AS (SELECT c2.w1, c2.w2, "
    "CAST(floor(-1000.0 * ln((c2.c2 + 1)::DOUBLE / "
    "(c1.c1 + (SELECT v FROM vocab))::DOUBLE)) AS BIGINT) AS cost "
    "FROM c2 JOIN c1 USING (w1)), "
    "scored AS (SELECT b.doc_id, COUNT(*) AS n_bigrams, "
    "SUM(cost) AS nll_milli "
    "FROM big b JOIN cost c ON b.w1 = c.w1 AND b.w2 = c.w2 "
    "GROUP BY b.doc_id) "
    "SELECT d.doc_id, CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams, "
    "CAST(coalesce(s.nll_milli, 0) AS BIGINT) AS nll_milli "
    "FROM documents d LEFT JOIN scored s USING (doc_id) ORDER BY doc_id"
)


def _run(texts, ray_session):
    import ray.data

    from docler_ray.stages.lm import bigram_lm_scores

    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": pd.array(texts, dtype="string"),
        }
    )
    got = (
        bigram_lm_scores(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(_SQL).df()
    return got, want


def test_lm_scores_match_sql_on_adversarial_corpus(ray_session):
    texts = [
        "the cat sat on the mat",
        "the cat ran",
        "a dog",
        "",
        "one",
        None,
        "the the the the",
        "cat sat cat sat cat sat",
        "sat on on on a mat the cat",
        "\tthe cat\n sat ",  # whitespace-edged (the ASCII ws contract)
    ]
    got, want = _run(texts, ray_session)
    pd.testing.assert_frame_equal(got, want)
    # sanity: the in-model doc scores lower per bigram than the repeated
    # nonsense-free doc ordering is not asserted — just exactness above


def test_lm_scores_all_docs_too_short(ray_session):
    got, want = _run(["a", "b", "", None], ray_session)
    pd.testing.assert_frame_equal(got, want)
    assert got["n_bigrams"].tolist() == [0, 0, 0, 0]
    assert got["nll_milli"].tolist() == [0, 0, 0, 0]


def test_lm_distributed_regime_equals_broadcast(ray_session, monkeypatch):
    """Force the distributed path (cap -> 0) and pin equality with the
    bounded-broadcast fast path AND the SQL oracle on the same corpus —
    the dedup.py regime-test pattern."""
    import docler_ray.stages.lm as lm

    texts = [
        "the cat sat on the mat",
        "the cat ran fast",
        "a dog barked",
        "",
        "one",
        None,
        "the the the the",
        "sat on on a mat",
    ] * 3  # repetition across docs so grams have df > 1
    fast, want = _run(texts, ray_session)
    monkeypatch.setattr(lm, "_LM_BROADCAST_MODEL_ROWS", 0)
    dist, _ = _run(texts, ray_session)
    pd.testing.assert_frame_equal(fast, want)
    pd.testing.assert_frame_equal(dist, want)


def test_perplexity_tiers_match_sql_ntile(ray_session):
    """perplexity_tiers == the lm chain + NTILE(3) OVER (PARTITION BY lang
    ORDER BY ppl_milli, doc_id) in DuckDB, on a multi-lang corpus with
    ties (identical docs) and bigram-less docs."""
    import ray.data

    from docler_ray.stages.lm import perplexity_tiers

    texts = [
        "the cat sat on the mat",
        "the cat ran",
        "a dog",
        "",
        "one",
        None,
        "the the the the",
        "cat sat cat sat cat sat",
        "sat on on on a mat the cat",
        "the mat sat on a cat",
        "a cat on the mat",
        "dog cat dog cat",
        "the cat ran",  # exact duplicate -> ppl tie, doc_id break
    ]
    langs = ["en", "en", "fr", "fr", "en", "de", "de", "en", "fr", "en", "de", "fr", "en"]
    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": pd.array(texts, dtype="string"),
            "lang": langs,
        }
    )
    got = (
        perplexity_tiers(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import __ray_entry__ as e

    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(
        e.oracle_sql()["ccnet_perplexity_tiers"] + " ORDER BY doc_id"
    ).df()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_lm_cost_is_positive_and_scales_with_rarity(ray_session):
    """A bigram seen often must cost less than one seen once (monotone in
    c2 at fixed prefix), and every cost is >= 0."""
    texts = ["x y " * 50, "x z"]  # c2(x,y)=50, c2(x,z)=1, same prefix x
    got, _ = _run(texts, ray_session)
    # doc0: 99 bigrams (x y, y x alternating); doc1: 1 bigram
    per_big0 = got.loc[0, "nll_milli"] / got.loc[0, "n_bigrams"]
    per_big1 = got.loc[1, "nll_milli"] / got.loc[1, "n_bigrams"]
    assert per_big1 > per_big0 > 0
