"""Bigram-LM quality scoring (stages/lm.py) vs its DuckDB replay on
adversarial corpora — repetition, empty/None text, single-token docs —
plus the all-short-docs edge where no bigram exists anywhere."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

def _lm_sql() -> str:
    import __ray_entry__ as e

    return e.oracle_sql()["lm_quality_scores"]


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
    want = con.execute(_lm_sql() + " ORDER BY doc_id").df()
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
    texts.append("null lang row with words here")
    langs = [
        "en", "en", "fr", "fr", "en", "de", "de", "en", "fr", "en", "de",
        "fr", "en", None,  # NULL lang must form its own partition like SQL
    ]
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


def test_lm_scores_custom_id_col(ray_session):
    """Non-default id_col must work end-to-end and name the output id
    column accordingly (was hard-coded 'doc_id'; round-3 review)."""
    import ray.data

    from docler_ray.stages.lm import bigram_lm_scores, perplexity_tiers

    df = pd.DataFrame(
        {
            "page": [0, 1, 2, 3],
            "text": pd.array(
                ["a b c", "a b", "", "c a b"], dtype="string"
            ),
            "lang": ["en", "en", "fr", "fr"],
        }
    )
    out = (
        bigram_lm_scores(ray.data.from_pandas(df), id_col="page")
        .to_pandas()
        .sort_values("page")
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["page", "n_bigrams", "nll_milli"]
    assert out["n_bigrams"].tolist() == [2, 1, 0, 2]
    tiers = (
        perplexity_tiers(ray.data.from_pandas(df), id_col="page")
        .to_pandas()
        .sort_values("page")
        .reset_index(drop=True)
    )
    assert set(tiers["tier"]) <= {1, 2, 3}


def test_lm_cost_is_positive_and_scales_with_rarity(ray_session):
    """A bigram seen often must cost less than one seen once (monotone in
    c2 at fixed prefix), and every cost is >= 0."""
    texts = ["x y " * 50, "x z"]  # c2(x,y)=50, c2(x,z)=1, same prefix x
    got, _ = _run(texts, ray_session)
    # doc0: 99 bigrams (x y, y x alternating); doc1: 1 bigram
    per_big0 = got.loc[0, "nll_milli"] / got.loc[0, "n_bigrams"]
    per_big1 = got.loc[1, "nll_milli"] / got.loc[1, "n_bigrams"]
    assert per_big1 > per_big0 > 0


def test_perplexity_tiers_no_whole_language_group(ray_session, monkeypatch):
    """Round-3 verdict finding 1 (the one scale-killer): the tier exchange
    must never hand one task a whole language. Force a tiny bucket target
    on a 2-language corpus and prove AT RUNTIME (scan-side cap assertion,
    captured at build time so it ships with the closure) that no scan
    group received more than a fraction of a language — while the output
    still matches DuckDB's NTILE bit-for-bit."""
    import numpy as np
    import ray.data

    import docler_ray.stages.lm as lm
    import docler_ray.stages.packing as packing
    from docler_ray.stages.lm import perplexity_tiers

    # 240 docs, 2 langs, ppl spread by varying token mixes deterministically
    texts = [
        " ".join(f"t{(i * (k + 3)) % 41}" for k in range(4 + i % 9))
        for i in range(240)
    ]
    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": pd.array(texts, dtype="string"),
            "lang": ["en" if i % 2 else "fr" for i in range(len(texts))],
        }
    )
    monkeypatch.setattr(packing, "_PREFIX_BUCKETS", 8)
    monkeypatch.setattr(packing, "_TARGET_ROWS", 16)
    # a whole language is 120 rows; equal-width bit-bucketing is not
    # equidistributed, so allow skew but pin "far below one language"
    monkeypatch.setattr(lm, "_SCAN_GROUP_ROWS_CAP", 60)
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
    # and the cap is genuinely live: a cap below any group size must raise
    monkeypatch.setattr(lm, "_SCAN_GROUP_ROWS_CAP", 0)
    with pytest.raises(Exception):
        perplexity_tiers(ray.data.from_pandas(df)).to_pandas()


def test_coarse_key_cardinality_guard():
    """windows._make_add_coarse must warn when a large batch shows the
    low-cardinality-key signature that voided perplexity_tiers' group
    bound (round-3 verdict finding 1)."""
    import warnings

    import numpy as np
    import pyarrow as pa

    import docler_ray.stages.windows as w

    w._COARSE_WARNED.discard("lang")
    batch = pa.table({"lang": pa.array(["en", "fr"] * 4096)})
    fn = w._make_add_coarse("lang", 128)
    with pytest.warns(RuntimeWarning, match="cardinality"):
        fn(batch)
    # one-shot: second call stays silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        fn(batch)
    # high-cardinality keys never warn
    w._COARSE_WARNED.discard("user")
    big = pa.table({"user": pa.array(np.arange(8192, dtype=np.int64))})
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        w._make_add_coarse("user", 128)(big)


def _tiers_vs_oracle(df, monkeypatch, cap):
    import ray.data

    import docler_ray.stages.lm as lm
    import docler_ray.stages.packing as packing
    from docler_ray.stages.lm import perplexity_tiers

    monkeypatch.setattr(packing, "_PREFIX_BUCKETS", 4)
    monkeypatch.setattr(packing, "_TARGET_ROWS", 8)
    monkeypatch.setattr(lm, "_SCAN_GROUP_ROWS_CAP", cap)
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


def test_perplexity_tiers_tie_mass_refines_by_doc_id(ray_session, monkeypatch):
    """The round-4 first-cut's residual limit: ~all of one language at ONE
    ppl value (identical docs) collapsed the bit-range bucketing into a
    single bucket. The tie refinement must split it by doc_id range (tied
    rows order purely by id) — proven at runtime by the scan cap — while
    the output still matches DuckDB NTILE."""
    texts = ["the same exact document text here"] * 160
    texts += [
        " ".join(f"w{(i * (k + 2)) % 23}" for k in range(5 + i % 5))
        for i in range(40)
    ]
    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": pd.array(texts, dtype="string"),
            "lang": ["en"] * 160 + ["fr"] * 40,
        }
    )
    # tie mass = 160 rows; cap 64 proves no group held the whole mass
    _tiers_vs_oracle(df, monkeypatch, cap=64)


def test_perplexity_tiers_narrow_band_refines_on_bit_span(
    ray_session, monkeypatch
):
    """Resolution skew: every ppl lands in a narrow band, so the global
    bit-range bucketing puts ~everything in few buckets; the spread
    refinement re-ranges on the bucket's own bit span. Cap proves the
    split happened; values still match NTILE."""
    # two alternating near-identical doc shapes -> a handful of close ppl
    # values, plus per-doc unique words to spread ppl slightly
    texts = [
        f"alpha beta gamma delta w{i % 37} x{(3 * i) % 31}" for i in range(180)
    ]
    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": pd.array(texts, dtype="string"),
            "lang": ["en" if i % 2 else "fr" for i in range(len(texts))],
        }
    )
    _tiers_vs_oracle(df, monkeypatch, cap=64)
