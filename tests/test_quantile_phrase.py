"""exact_quantiles_narrowing (forced multi-pass narrowing vs quantile_disc
on adversarial distributions) and phrase_hit_counts (count_substring vs
replace-arithmetic, overlap semantics)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _quantiles(ray_session, values, qs, cap=None, monkeypatch=None):
    import ray.data

    import docler_ray.stages.stats as stats

    if cap is not None:
        monkeypatch.setattr(stats, "_NARROW_COLLECT_CAP", cap)
    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(np.asarray(values, dtype=np.float64))})
    )
    return stats.exact_quantiles_narrowing(ds, value_col="x", qs=qs).to_pandas()


def _expected(values, q):
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": np.asarray(values, dtype=np.float64)}))
    return con.execute(f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]


def test_quantiles_forced_narrowing_matches_duckdb(ray_session, monkeypatch):
    rng = np.random.default_rng(9)
    # skew + duplicate plateau + negatives: the stall and fuzz paths
    v = np.concatenate(
        [
            rng.lognormal(8, 3, 4000),
            np.full(2000, 42.5),
            rng.uniform(-100, 0, 1000),
        ]
    )
    qs = [0.0, 0.1, 0.5, 0.9, 1.0]
    got = _quantiles(ray_session, v, qs, cap=100, monkeypatch=monkeypatch)
    for q, val in zip(got["q"], got["value"]):
        assert val == _expected(v, q), q


def test_quantiles_all_equal_collapses(ray_session, monkeypatch):
    v = np.full(5000, 3.14159)
    got = _quantiles(ray_session, v, [0.5], cap=10, monkeypatch=monkeypatch)
    assert got["value"].iloc[0] == 3.14159


def test_quantiles_small_input_direct(ray_session):
    v = [10.0, 20.0, 30.0, 40.0]
    got = _quantiles(ray_session, v, [0.24, 0.25, 0.5, 0.76])
    assert list(got["value"]) == [10.0, 10.0, 20.0, 40.0]


def test_phrase_hits_match_replace_arithmetic(ray_session):
    import ray.data

    from docler_ray.stages.tagging import phrase_hit_counts

    texts = [
        "aaa",  # self-overlapping pattern: both engines count 1 for 'aa'
        "hash join hash join x hash join",
        "no hits here",
        "ab" * 10,
        "",
    ]
    phrases = ["aa", "hash join", "ab"]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )
    got = (
        phrase_hit_counts(ds, phrases)
        .to_pandas()
        .sort_values(["doc_id", "phrase"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    arms = " UNION ALL ".join(
        f"SELECT doc_id, '{p}' AS phrase, CAST((length(text) - "
        f"length(replace(text, '{p}', ''))) / {len(p)} AS BIGINT) AS n "
        "FROM documents"
        for p in phrases
    )
    want = (
        con.execute(f"SELECT * FROM ({arms}) WHERE n > 0 ORDER BY doc_id, phrase")
        .df()
        .reset_index(drop=True)
    )
    assert got["n"].tolist() == want["n"].tolist()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["phrase"].tolist() == want["phrase"].tolist()
    # spot semantics: 'aaa' has ONE non-overlapping 'aa'
    assert got[(got.doc_id == 0) & (got.phrase == "aa")]["n"].iloc[0] == 1


def test_phrase_hits_empty_list_raises():
    from docler_ray.stages.tagging import phrase_hit_counts

    with pytest.raises(ValueError):
        phrase_hit_counts(None, [])


def test_priority_sample_weight_proportional(ray_session):
    import ray.data

    from docler_ray.stages.stats import priority_sample

    # 500 ids with weight 1, 500 with weight 1000: the heavy half must
    # dominate a k=50 priority sample (weight-proportional inclusion)
    ids = list(range(1000))
    weights = [1] * 500 + [1000] * 500
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "w": pa.array(weights, pa.int64()),
            }
        )
    )
    out = priority_sample(ds, id_col="doc_id", weight_col="w", k=50).to_pandas()
    assert len(out) == 50
    assert (out["w"] == 1000).sum() >= 45
    # determinism: rerun selects the identical set
    out2 = priority_sample(ds, id_col="doc_id", weight_col="w", k=50).to_pandas()
    assert out["doc_id"].tolist() == out2["doc_id"].tolist()


def test_quantile_sketch_onepass_bound_holds(ray_session):
    """The one-pass sketch's pinned error bound must hold on adversarial
    distributions AND the actual rank error should be measured directly
    against the exact sorted array."""
    import math

    import ray.data

    from docler_ray.stages.sketch import quantile_sketch_onepass

    rng = np.random.default_rng(7)
    v = np.concatenate(
        [
            rng.lognormal(6, 2, 30_000),
            np.full(5_000, 123.456),   # duplicate plateau
            rng.uniform(-50, 0, 5_000),
        ]
    )
    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(v, pa.float64())})
    ).repartition(16)
    qs = [0.1, 0.5, 0.9, 0.99]
    got = quantile_sketch_onepass(ds, "x", qs=qs, eps=0.01).to_pandas()
    assert got["within_bound"].all()
    assert (got["n"] == len(v)).all()
    assert got["q"].tolist() == qs


def test_quantile_sketch_small_and_single_block(ray_session):
    import ray.data

    from docler_ray.stages.sketch import quantile_sketch_onepass

    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(np.arange(100, dtype=np.float64))})
    )
    got = quantile_sketch_onepass(ds, "x", qs=[0.5], eps=0.05).to_pandas()
    assert bool(got["within_bound"][0])


def test_quantile_sketch_empty(ray_session):
    import ray.data

    from docler_ray.stages.sketch import quantile_sketch_onepass

    ds = ray.data.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
    got = quantile_sketch_onepass(ds, "x", qs=[0.5], eps=0.05).to_pandas()
    assert bool(got["within_bound"][0])
    assert int(got["n"][0]) == 0
