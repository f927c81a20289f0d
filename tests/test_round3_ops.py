"""Round-3 operator additions: bloom anti join, per-key rolling sum,
weighted mixture sampling, JSONL sink."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _anti_expected(left: pd.DataFrame, right_keys: np.ndarray) -> list[int]:
    return sorted(left.k[~left.k.isin(right_keys)].tolist())


def test_bloom_anti_join_exact(ray_session):
    import ray.data

    from docler_ray.stages.joins import bloom_anti_join

    left = pd.DataFrame(
        {"k": np.arange(100, dtype=np.int64), "v": np.arange(100) * 3}
    )
    rk = np.array([5, 17, 99, 17, 2000], dtype=np.int64)
    out = (
        bloom_anti_join(
            ray.data.from_pandas(left).repartition(4),
            ray.data.from_pandas(pd.DataFrame({"rk": rk})),
            "k",
            "rk",
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out.k.tolist() == _anti_expected(left, rk)
    assert (out.v == out.k * 3).all()  # payload columns survive


def test_bloom_anti_join_empty_right(ray_session):
    import ray.data

    from docler_ray.stages.joins import bloom_anti_join

    left = ray.data.from_pandas(
        pd.DataFrame({"k": np.array([1, 2], dtype=np.int64)})
    )
    right = ray.data.from_pandas(pd.DataFrame({"k": np.array([], dtype=np.int64)}))
    out = bloom_anti_join(left, right, "k", "k").to_pandas()
    assert sorted(out.k.tolist()) == [1, 2]  # everything survives


def test_bloom_anti_join_regime_equality(ray_session, monkeypatch):
    """Forced-bloom plan must equal the broadcast isin plan exactly —
    false positives resolved by the trailing left_anti, misses passed
    through."""
    import ray.data

    from docler_ray.stages import joins

    rng = np.random.default_rng(7)
    left = pd.DataFrame({"k": rng.integers(0, 5000, 4000).astype(np.int64)})
    left["v"] = np.arange(len(left))
    right = pd.DataFrame({"k": rng.integers(0, 5000, 1500).astype(np.int64)})

    small = joins.bloom_anti_join(
        ray.data.from_pandas(left).repartition(5),
        ray.data.from_pandas(right).repartition(3),
        "k",
        "k",
    ).to_pandas()
    monkeypatch.setattr(joins, "_SMALL_SEMI_KEYS", 0)  # force bloom regime
    big = joins.bloom_anti_join(
        ray.data.from_pandas(left).repartition(5),
        ray.data.from_pandas(right).repartition(3),
        "k",
        "k",
    ).to_pandas()
    a = small.sort_values(["k", "v"]).reset_index(drop=True)
    b = big.sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])
    assert sorted(a.k.unique()) == sorted(
        set(left.k.unique()) - set(right.k.unique())
    )


def test_per_key_rolling_sum_vs_duckdb(ray_session):
    import duckdb
    import ray.data

    from docler_ray.stages.windows import per_key_rolling_sum

    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 40, n).astype(np.int64),
            "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
            "value": rng.random(n) * 500.0,
        }
    )
    out = (
        per_key_rolling_sum(
            ray.data.from_pandas(df).repartition(6),
            "user_id",
            "ts",
            "event_id",
            "value",
            window_rows=4,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", df)
    exp = con.sql(
        "WITH c AS (SELECT event_id, user_id, ts, "
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events) "
        "SELECT event_id, user_id, "
        "CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq, "
        "CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_sum_cents, "
        "CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_in_window "
        "FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) "
        "ORDER BY event_id"
    ).df()
    pd.testing.assert_frame_equal(out[exp.columns], exp)


def test_rolling_window_one(ray_session):
    """window_rows=1 degenerates to the row's own cents value."""
    import ray.data

    from docler_ray.stages.windows import per_key_rolling_sum

    df = pd.DataFrame(
        {
            "event_id": np.arange(5, dtype=np.int64),
            "user_id": np.array([1, 1, 1, 2, 2], dtype=np.int64),
            "ts": pd.to_datetime(np.arange(5), unit="s"),
            "value": [1.004, 2.005, 3.0, 4.5, 5.25],
        }
    )
    out = (
        per_key_rolling_sum(
            ray.data.from_pandas(df), "user_id", "ts", "event_id", "value",
            window_rows=1,
        )
        .to_pandas()
        .sort_values("event_id")
    )
    # floor(v*100 + 0.5): 1.004 -> 100, 2.005 -> 200 or 201 (FP repr decides
    # — but identically in SQL), so just pin the self-sum property
    assert (out.n_in_window == 1).all()
    assert (out.roll_sum_cents == np.floor(df.value.to_numpy() * 100 + 0.5)).all()


def test_weighted_group_sample(ray_session):
    import ray.data

    from docler_ray.stages.stats import sample_hash_bucket, weighted_group_sample

    n = 5000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": np.where(np.arange(n) % 3 == 0, "en", "de"),
        }
    )
    rates = {"en": 30, "de": 0}
    out = weighted_group_sample(
        ray.data.from_pandas(df).repartition(4),
        group_col="lang",
        id_col="doc_id",
        rates=rates,
    ).to_pandas()
    assert (out.lang == "en").all()  # de rate 0 -> nothing survives
    expected = df[(df.lang == "en") & (sample_hash_bucket(df.doc_id.to_numpy()) < 30)]
    assert sorted(out.doc_id.tolist()) == sorted(expected.doc_id.tolist())
    # determinism across partitionings
    out2 = weighted_group_sample(
        ray.data.from_pandas(df).repartition(9),
        group_col="lang",
        id_col="doc_id",
        rates=rates,
    ).to_pandas()
    assert sorted(out2.doc_id.tolist()) == sorted(out.doc_id.tolist())


def test_weighted_group_sample_validates_rates():
    import pytest

    from docler_ray.stages.stats import weighted_group_sample

    with pytest.raises(ValueError):
        weighted_group_sample(
            None, group_col="g", id_col="i", rates={"en": 101}
        )


def test_export_jsonl_roundtrip(ray_session, tmp_path):
    import json
    import os

    import ray.data

    from docler_ray.functions.export import export_jsonl

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": pa.array(["hello", "world"]),
                "payload": pa.array([b"\x00\x01", None], type=pa.binary()),
            }
        )
    )
    out_dir = str(tmp_path / "jsonl")
    export_jsonl(ds, out_dir)
    rows = []
    for name in sorted(os.listdir(out_dir)):
        with open(os.path.join(out_dir, name), encoding="utf-8") as f:
            rows += [json.loads(ln) for ln in f if ln.strip()]
    rows.sort(key=lambda r: r["doc_id"])
    assert [r["text"] for r in rows] == ["hello", "world"]
    assert rows[0]["payload_b64"] == "AAE="
    assert rows[1]["payload_b64"] is None
    assert "payload" not in rows[0]


def test_read_jsonl_closes_export_roundtrip(ray_session, tmp_path):
    """read_jsonl(export_jsonl(ds)) reproduces the original rows INCLUDING
    the binary column decoded back from base64 — the source/sink symmetry
    the WARC tier already has."""
    import ray.data

    from docler_ray.functions.export import export_jsonl, read_jsonl

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": pa.array(["hello", "", "wörld"]),
                "payload": pa.array([b"\x00\x01", None, b"\xff"], type=pa.binary()),
            }
        )
    )
    out_dir = str(tmp_path / "jsonl_rt")
    export_jsonl(ds, out_dir)
    back = (
        read_jsonl(out_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert back["doc_id"].tolist() == [1, 2, 3]
    assert back["text"].tolist() == ["hello", "", "wörld"]
    assert back["payload"].tolist() == [b"\x00\x01", None, b"\xff"]
    assert set(back.columns) == {"doc_id", "text", "payload"}


def test_count_min_never_undercounts_and_merges(ray_session):
    import ray.data

    from docler_ray.stages.sketch import count_min_build, count_min_estimate

    rng = np.random.default_rng(7)
    vocab = [f"tok{i}" for i in range(40)]
    docs = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 30)))
        for _ in range(300)
    ]
    ds = ray.data.from_pandas(pd.DataFrame({"text": docs})).repartition(8)
    tok = lambda t: t.split()
    sketch, total = count_min_build(ds, tok, text_col="text")

    truth = pd.Series([w for d in docs for w in d.split()]).value_counts()
    assert total == int(truth.sum())
    est = count_min_estimate(sketch, truth.index.tolist())
    # structural guarantee: the sketch never undercounts
    assert (est >= truth.to_numpy()).all()
    # 16384 columns vs 40 tokens: collisions negligible, estimates exact
    assert (est == truth.to_numpy()).all()


def test_count_min_partition_invariance(ray_session):
    import ray.data

    from docler_ray.stages.sketch import count_min_build

    docs = pd.DataFrame({"text": [f"a b c tok{i % 5}" for i in range(100)]})
    tok = lambda t: t.split()
    s1, t1 = count_min_build(ray.data.from_pandas(docs).repartition(1), tok)
    s8, t8 = count_min_build(ray.data.from_pandas(docs).repartition(8), tok)
    assert t1 == t8
    assert (s1 == s8).all()


def test_per_key_ntile_vs_duckdb(ray_session):
    import duckdb
    import ray.data

    from docler_ray.stages.windows import per_key_ntile

    rng = np.random.default_rng(11)
    n = 700
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 23, n).astype(np.int64),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n), unit="s"),
        }
    )
    got = (
        per_key_ntile(
            ray.data.from_pandas(df).repartition(6),
            "user_id",
            "ts",
            "event_id",
            buckets=4,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = (
        duckdb.connect()
        .execute(
            "SELECT event_id, user_id, "
            "CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq, "
            "CAST(NTILE(4) OVER w AS BIGINT) AS ntile, "
            "percent_rank() OVER w AS percent_rank, "
            "cume_dist() OVER w AS cume_dist FROM df "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) "
            "ORDER BY event_id"
        )
        .df()
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_per_key_ntile_small_groups(ray_session):
    """n < buckets: every row its own tile, percent_rank 0 for singletons."""
    import ray.data

    from docler_ray.stages.windows import per_key_ntile

    df = pd.DataFrame(
        {
            "event_id": np.array([1, 2, 3], dtype=np.int64),
            "user_id": np.array([5, 5, 9], dtype=np.int64),
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03"]),
        }
    )
    got = (
        per_key_ntile(
            ray.data.from_pandas(df), "user_id", "ts", "event_id", buckets=4
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got["ntile"].tolist() == [1, 2, 1]
    assert got["percent_rank"].tolist() == [0.0, 1.0, 0.0]
    assert got["cume_dist"].tolist() == [0.5, 1.0, 1.0]
