"""DSIR hashed importance log-ratios (stages/dsir.py) vs the DuckDB
replay on adversarial corpora, plus semantic direction checks."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from docler_ray.stages.dsir import dsir_log_ratios, dsir_sql


def _run(texts, ray_session, target_mod=97):
    import ray.data

    df = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": pd.array(texts, dtype="string")}
    )
    got = (
        dsir_log_ratios(ray.data.from_pandas(df), target_mod=target_mod)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(dsir_sql(target_mod=target_mod) + " ORDER BY doc_id").df()
    return got, want


def test_dsir_matches_sql_on_adversarial_corpus(ray_session):
    texts = [
        "the cat sat on the mat",
        "quantum flux harmonics decay",
        "the cat ran",
        "",
        None,
        "one",
        "\tthe mat\n sat ",
    ] * 15
    got, want = _run(texts, ray_session)
    pd.testing.assert_frame_equal(got, want)


def test_dsir_target_vocabulary_scores_higher(ray_session):
    """Docs sharing the target sample's vocabulary must get a HIGHER
    log-ratio than docs with out-of-target vocabulary."""
    # target_mod=2 -> even doc_ids are the target sample
    texts = [
        "alpha beta gamma",   # 0 target
        "alpha beta gamma",   # 1 raw, identical to target vocab
        "alpha beta delta",   # 2 target
        "zeta eta theta",     # 3 raw, disjoint vocab
    ] * 2
    got, want = _run(texts, ray_session, target_mod=2)
    pd.testing.assert_frame_equal(got, want)
    by_id = dict(zip(got["doc_id"], got["llr_milli"]))
    assert by_id[1] > by_id[3]


def test_dsir_empty_corpus(ray_session):
    got, want = _run(["", None, " \t "], ray_session)
    pd.testing.assert_frame_equal(got, want)
    assert got["llr_milli"].tolist() == [0, 0, 0]
