"""Joins (broadcast hash / as-of) and window (tumbling / session) operators."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def test_broadcast_hash_join_inner(ray_session):
    import ray.data

    from docler_ray.stages.joins import broadcast_hash_join

    left = ray.data.from_items(
        [{"k": 1, "v": "a"}, {"k": 2, "v": "b"}, {"k": 3, "v": "c"}, {"k": 2, "v": "d"}]
    )
    right = pa.table({"rk": [1, 2], "label": ["one", "two"]})
    out = (
        broadcast_hash_join(left, right, keys="k", right_keys="rk")
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 2, 2]
    assert out["label"].tolist() == ["one", "two", "two"]
    assert "c" not in out["v"].tolist()  # unmatched left row dropped (inner)


def test_broadcast_hash_join_left_outer(ray_session):
    import ray.data

    from docler_ray.stages.joins import broadcast_hash_join

    left = ray.data.from_items([{"k": 1}, {"k": 9}])
    right = pa.table({"k": [1], "label": ["one"]})
    out = broadcast_hash_join(left, right, keys="k", join_type="left outer").to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert out["label"].tolist()[0] == "one"
    assert pd.isna(out["label"].tolist()[1])


def test_broadcast_asof_join_backward(ray_session):
    import ray.data

    from docler_ray.stages.joins import broadcast_asof_join

    left = ray.data.from_items(
        [
            {"key": 1, "t": 10, "eid": 100},
            {"key": 1, "t": 25, "eid": 101},
            {"key": 2, "t": 7, "eid": 102},
            {"key": 1, "t": 5, "eid": 103},  # before any right row -> null
        ]
    )
    right = pa.table({"key": [1, 1, 2], "rt": [8, 20, 3], "val": [80, 200, 30]})
    out = broadcast_asof_join(
        left, right, by="key", left_on="t", right_on="rt", value_cols=["val"]
    ).to_pandas()
    by_eid = out.set_index("eid")["val"].to_dict()
    assert by_eid[100] == 80  # rt=8 is latest <= 10
    assert by_eid[101] == 200  # rt=20 is latest <= 25
    assert by_eid[102] == 30
    assert pd.isna(by_eid[103])


def test_sessionize_gap_semantics(ray_session):
    import ray.data

    from docler_ray.stages.windows import sessionize

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        # user 1: three events, gap of 2000s between 2nd and 3rd -> 2 sessions
        {"user_id": 1, "ts": base},
        {"user_id": 1, "ts": base + pd.Timedelta(seconds=100)},
        {"user_id": 1, "ts": base + pd.Timedelta(seconds=2200)},
        # user 2: one event -> 1 session
        {"user_id": 2, "ts": base + pd.Timedelta(seconds=50)},
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = sessionize(ds, "user_id", "ts", gap_secs=1800).to_pandas()
    out = out.sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    assert out[out.user_id == 1]["n_events"].tolist() == [2, 1]
    assert out[out.user_id == 1]["session_idx"].tolist() == [0, 1]
    assert out[out.user_id == 2]["n_events"].tolist() == [1]
    u1s0 = out[(out.user_id == 1) & (out.session_idx == 0)].iloc[0]
    assert u1s0["session_end"] - u1s0["session_start"] == 100


def test_tumbling_window_counts(ray_session):
    import ray.data

    from docler_ray.stages.windows import tumbling_window_counts

    base = pd.Timestamp("2024-01-01 00:30:00")
    rows = [
        {"ts": base, "event_type": "a"},
        {"ts": base + pd.Timedelta(minutes=10), "event_type": "a"},
        {"ts": base + pd.Timedelta(hours=1), "event_type": "a"},
        {"ts": base, "event_type": "b"},
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = tumbling_window_counts(ds, "ts", "event_type", window_secs=3600).to_pandas()
    a = out[out.event_type == "a"].sort_values("window_start")
    assert a["n"].tolist() == [2, 1]
    assert out[out.event_type == "b"]["n"].tolist() == [1]


def test_tumbling_window_distinct(ray_session):
    import ray.data

    from docler_ray.stages.windows import tumbling_window_distinct

    base = pd.Timestamp("2024-01-01 00:30:00")
    rows = [
        # user 1 twice in the same window: must count once
        {"ts": base, "event_type": "a", "user_id": 1},
        {"ts": base + pd.Timedelta(minutes=10), "event_type": "a", "user_id": 1},
        {"ts": base + pd.Timedelta(minutes=20), "event_type": "a", "user_id": 2},
        # same user, next window: counts again there
        {"ts": base + pd.Timedelta(hours=1), "event_type": "a", "user_id": 1},
        {"ts": base, "event_type": "b", "user_id": 1},
    ]
    # two blocks so the same (window, user) spans batches: batch-local
    # drop_duplicates alone would overcount without the global dedup exchange
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(2)
    out = tumbling_window_distinct(
        ds, "ts", "event_type", "user_id", window_secs=3600
    ).to_pandas()
    a = out[out.event_type == "a"].sort_values("window_start")
    assert a["n_distinct"].tolist() == [2, 1]
    assert out[out.event_type == "b"]["n_distinct"].tolist() == [1]


def test_tumbling_window_distinct_matches_pandas(ray_session):
    import ray.data

    from docler_ray.stages.windows import tumbling_window_distinct

    rng = np.random.default_rng(7)
    n = 2000
    df = pd.DataFrame(
        {
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 6 * 3600, n), unit="s"),
            "event_type": rng.choice(["x", "y", "z"], n),
            "user_id": rng.integers(0, 40, n),
        }
    )
    ds = ray.data.from_pandas(df).repartition(8)
    out = (
        tumbling_window_distinct(ds, "ts", "event_type", "user_id", window_secs=3600)
        .to_pandas()
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    exp = (
        df.assign(
            window_start=(
                df["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
                // 3600
            )
            * 3600
        )
        .groupby(["event_type", "window_start"])["user_id"]
        .nunique()
        .reset_index(name="n_distinct")
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    assert out["n_distinct"].tolist() == exp["n_distinct"].tolist()
    assert out["window_start"].tolist() == exp["window_start"].tolist()


def test_hopping_window_distinct(ray_session):
    """2h/1h sliding distinct: a user appearing in two covered hops counts
    once per covering window; cross-batch duplicates collapse."""
    import ray.data

    from docler_ray.stages.windows import hopping_window_distinct

    base = pd.Timestamp("2024-01-01 00:30:00")
    rows = [
        # user 1 at 00:30 and 01:30: windows starting 23:00/00:00 (hop 0/1)
        # for the first, 00:00/01:00 for the second -> window 00:00 sees
        # user 1 twice, must count once
        {"ts": base, "event_type": "a", "user_id": 1},
        {"ts": base + pd.Timedelta(hours=1), "event_type": "a", "user_id": 1},
        {"ts": base + pd.Timedelta(hours=1), "event_type": "a", "user_id": 2},
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(2)
    out = hopping_window_distinct(
        ds, "ts", "event_type", "user_id", window_secs=7200, hop_secs=3600
    ).to_pandas()
    w = {int(r["window_start"]): int(r["n_distinct"]) for _, r in out.iterrows()}
    epoch0 = int(pd.Timestamp("2024-01-01 00:00:00").timestamp())
    assert w[epoch0] == 2            # users 1 (deduped) and 2
    assert w[epoch0 - 3600] == 1     # only the 00:30 event's user
    assert w[epoch0 + 3600] == 2     # the 01:30 events


def test_broadcast_left_outer_string_coalesce(ray_session):
    """LEFT OUTER broadcast join with a STRING value column: misses come
    back null and coalesce cleanly (the round-2 ADVICE empty-right shape,
    exercised through the outer-join path)."""
    import pyarrow.compute as pc
    import ray.data

    from docler_ray.stages.joins import broadcast_hash_join

    left = ray.data.from_items([{"k": 1}, {"k": 9}, {"k": 9}])
    right = pa.table({"k": [1], "label": ["one"]})
    joined = broadcast_hash_join(left, right, keys="k", join_type="left outer")

    def coalesce(batch: pa.Table) -> pa.Table:
        lab = pc.coalesce(batch["label"], pa.scalar("__miss__", pa.string()))
        return batch.set_column(batch.schema.get_field_index("label"), "label", lab)

    out = (
        joined.map_batches(coalesce, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["k"])
        .reset_index(drop=True)
    )
    assert out["label"].tolist() == ["one", "__miss__", "__miss__"]


def test_broadcast_range_join(ray_session):
    import ray.data

    from docler_ray.stages.joins import broadcast_range_join

    left = ray.data.from_items(
        [{"v": 5.0, "id": 1}, {"v": 15.0, "id": 2}, {"v": 25.0, "id": 3},
         {"v": 99.0, "id": 4}, {"v": 10.0, "id": 5}]  # 10.0 -> band B (lo-inclusive)
    )
    bands = pa.table({"lo": [0.0, 10.0], "hi": [10.0, 20.0], "name": ["A", "B"]})
    out = broadcast_range_join(
        left, bands, value_col="v", lo_col="lo", hi_col="hi", right_cols=["name"]
    ).to_pandas()
    got = dict(zip(out["id"], out["name"]))
    assert got == {1: "A", 2: "B", 5: "B"}  # 25.0 and 99.0 unmatched


def test_broadcast_range_join_rejects_overlap(ray_session):
    import pytest
    import ray.data

    from docler_ray.stages.joins import broadcast_range_join

    left = ray.data.from_items([{"v": 1.0}])
    bad = pa.table({"lo": [0.0, 5.0], "hi": [6.0, 10.0], "name": ["A", "B"]})
    with pytest.raises(ValueError, match="non-overlapping"):
        broadcast_range_join(
            left, bad, value_col="v", lo_col="lo", hi_col="hi", right_cols=["name"]
        )


def test_per_key_rank_lag(ray_session):
    import ray.data

    from docler_ray.stages.windows import per_key_rank_lag

    ts = pd.to_datetime(
        [
            "2024-01-01 00:00:00.000001",
            "2024-01-01 00:00:00.000001",  # tie: event_id breaks order
            "2024-01-01 00:00:05.000000",
            "2024-01-01 00:00:00.000000",
        ]
    )
    df = pd.DataFrame(
        {
            "event_id": [2, 1, 3, 10],
            "user_id": [7, 7, 7, 9],
            "ts": ts,
        }
    )
    out = (
        per_key_rank_lag(ray.data.from_pandas(df), "user_id", "ts", "event_id")
        .to_pandas()
        .sort_values(["user_id", "seq"])
        .reset_index(drop=True)
    )
    assert out.event_id.tolist() == [1, 2, 3, 10]
    assert out.seq.tolist() == [1, 2, 3, 1]
    gaps = out.gap_usecs.tolist()
    assert pd.isna(gaps[0]) and pd.isna(gaps[3])
    assert gaps[1] == 0 and gaps[2] == 4_999_999


def test_per_key_rank_lag_keyspace_invariant(ray_session):
    """Output must not depend on the coarse keyspace size."""
    import ray.data

    from docler_ray.stages import windows
    from docler_ray.stages.windows import per_key_rank_lag

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "event_id": np.arange(200, dtype=np.int64),
            "user_id": rng.integers(0, 9, 200),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, 200), unit="us"),
        }
    )
    ds = ray.data.from_pandas(df)
    base = (
        per_key_rank_lag(ds, "user_id", "ts", "event_id")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    old = windows._SESSION_TARGET_ROWS
    windows._SESSION_TARGET_ROWS = 1  # force a per-row-sized keyspace
    try:
        wide = (
            per_key_rank_lag(ds, "user_id", "ts", "event_id")
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
    finally:
        windows._SESSION_TARGET_ROWS = old
    pd.testing.assert_frame_equal(base, wide)


def test_bloom_semi_join_exact(ray_session):
    import ray.data

    from docler_ray.stages.joins import bloom_semi_join

    left = pd.DataFrame(
        {"k": np.arange(1000, dtype=np.int64), "v": np.arange(1000) * 2}
    )
    right = pd.DataFrame({"rk": np.array([5, 17, 999, 17, 2000], dtype=np.int64)})
    out = (
        bloom_semi_join(
            ray.data.from_pandas(left).repartition(4),
            ray.data.from_pandas(right),
            "k",
            "rk",
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out.k.tolist() == [5, 17, 999]  # exact; no dup from repeated 17
    assert out.v.tolist() == [10, 34, 1998]


def test_bloom_semi_join_empty_right(ray_session):
    import ray.data

    from docler_ray.stages.joins import bloom_semi_join

    left = ray.data.from_pandas(
        pd.DataFrame({"k": np.array([1, 2], dtype=np.int64)})
    )
    right = ray.data.from_pandas(
        pd.DataFrame({"k": np.array([], dtype=np.int64)})
    )
    assert bloom_semi_join(left, right, "k", "k").count() == 0


def test_bloom_no_false_negatives(ray_session):
    """Every true key must survive the prefilter bitmap."""
    import ray.data

    from docler_ray.stages.joins import (
        _bloom_positions,
        build_bloom_ref,
    )
    import ray as _ray

    keys = np.random.default_rng(11).integers(0, 2**62, 5000).astype(np.int64)
    ds = ray.data.from_pandas(pd.DataFrame({"k": keys})).repartition(6)
    ref, m_bits = build_bloom_ref(ds, "k")
    words = _ray.get(ref)
    hit = np.ones(len(keys), dtype=bool)
    for pos in _bloom_positions(keys.astype(np.uint64), m_bits):
        w = words[(pos >> np.uint64(6)).astype(np.int64)]
        hit &= (w >> (pos & np.uint64(63))) & np.uint64(1) != 0
    assert hit.all()


def test_bloom_semi_join_regime_equality(ray_session, monkeypatch):
    """Broadcast fast path and the bloom+left_semi plan must agree."""
    import ray.data

    from docler_ray.stages import joins
    from docler_ray.stages.joins import bloom_semi_join

    rng = np.random.default_rng(5)
    left = ray.data.from_pandas(
        pd.DataFrame(
            {"k": rng.integers(0, 500, 2000).astype(np.int64),
             "v": np.arange(2000, dtype=np.int64)}
        )
    ).repartition(4)
    right = ray.data.from_pandas(
        pd.DataFrame({"rk": rng.integers(0, 500, 300).astype(np.int64)})
    )
    fast = (
        bloom_semi_join(left, right, "k", "rk")
        .to_pandas().sort_values("v").reset_index(drop=True)
    )
    monkeypatch.setattr(joins, "_SMALL_SEMI_KEYS", 0)  # force bloom regime
    dist = (
        bloom_semi_join(left, right, "k", "rk")
        .to_pandas().sort_values("v").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, dist)


def _brute_interval_pairs(pts: pd.DataFrame, ivs: pd.DataFrame) -> pd.DataFrame:
    """O(n*m) reference for the point-in-interval join (overlap allowed)."""
    m = pts.merge(ivs, on="k")
    m = m[(m["lo"] <= m["on"]) & (m["on"] < m["hi"])]
    return (
        m[["k", "on", "pv", "iv"]]
        .sort_values(["k", "on", "pv", "iv"])
        .reset_index(drop=True)
    )


def _interval_fixture(seed: int, n_pts: int = 400, n_ivs: int = 120):
    rng = np.random.default_rng(seed)
    pts = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n_pts).astype(np.int64),
            "on": rng.integers(0, 1000, n_pts).astype(np.int64),
            "pv": np.arange(n_pts, dtype=np.int64),
        }
    )
    lo = rng.integers(-50, 980, n_ivs).astype(np.int64)
    # heavily OVERLAPPING and length-skewed intervals, some empty (hi==lo)
    ln = rng.integers(0, 200, n_ivs).astype(np.int64)
    ivs = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n_ivs).astype(np.int64),
            "lo": lo,
            "hi": lo + ln,
            "iv": np.arange(n_ivs, dtype=np.int64),
        }
    )
    return pts, ivs


def test_interval_join_matches_bruteforce_broadcast(ray_session):
    import ray.data

    from docler_ray.stages.joins import interval_join

    pts, ivs = _interval_fixture(11)
    out = (
        interval_join(
            ray.data.from_pandas(pts).repartition(5),
            ray.data.from_pandas(ivs).repartition(3),
            by="k",
            point_on="on",
            lo_col="lo",
            hi_col="hi",
            value_cols=["iv"],
        )
        .to_pandas()[["k", "on", "pv", "iv"]]
        .sort_values(["k", "on", "pv", "iv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, _brute_interval_pairs(pts, ivs))


def test_interval_join_regime_equality(ray_session, monkeypatch):
    """Forced co-partitioned regime must equal the broadcast fast path —
    including with a bucket width SMALLER than interval lengths (multi-
    bucket replication must not duplicate pairs)."""
    import ray.data

    from docler_ray.stages import joins
    from docler_ray.stages.joins import interval_join

    pts, ivs = _interval_fixture(23)
    kwargs = dict(
        by="k", point_on="on", lo_col="lo", hi_col="hi", value_cols=["iv"]
    )

    def run(**extra):
        return (
            interval_join(
                ray.data.from_pandas(pts).repartition(5),
                ray.data.from_pandas(ivs).repartition(3),
                **kwargs,
                **extra,
            )
            .to_pandas()[["k", "on", "pv", "iv"]]
            .sort_values(["k", "on", "pv", "iv"])
            .reset_index(drop=True)
        )

    fast = run()
    monkeypatch.setattr(joins, "_INTERVAL_BROADCAST_MAX", 0)
    for width in (7, 64, 10_000):  # heavy replication / ~2 buckets / 1 bucket
        dist = run(bucket_width=width)
        pd.testing.assert_frame_equal(dist, fast)
    # probed bucket width (max interval length) — materializes the side once
    dist_probed = run(bucket_width=None)
    pd.testing.assert_frame_equal(dist_probed, fast)
    pd.testing.assert_frame_equal(fast, _brute_interval_pairs(pts, ivs))


def test_interval_join_boundaries_and_overlap(ray_session):
    """Half-open semantics (lo inclusive, hi exclusive), fan-out to every
    overlapping interval, key isolation, empty-interval drop."""
    import ray.data

    from docler_ray.stages.joins import interval_join

    pts = pd.DataFrame(
        {
            "k": np.array([1, 1, 1, 2, 3], dtype=np.int64),
            "on": np.array([10, 19, 20, 10, 10], dtype=np.int64),
            "pv": np.arange(5, dtype=np.int64),
        }
    )
    ivs = pd.DataFrame(
        {
            "k": np.array([1, 1, 2, 3], dtype=np.int64),
            "lo": np.array([10, 15, 10, 10], dtype=np.int64),
            "hi": np.array([20, 25, 11, 10], dtype=np.int64),  # last is empty
            "iv": np.array([100, 200, 300, 400], dtype=np.int64),
        }
    )
    out = (
        interval_join(
            ray.data.from_pandas(pts),
            ray.data.from_pandas(ivs),
            by="k",
            point_on="on",
            lo_col="lo",
            hi_col="hi",
            value_cols=["iv"],
        )
        .to_pandas()[["pv", "iv"]]
        .sort_values(["pv", "iv"])
        .reset_index(drop=True)
    )
    expect = pd.DataFrame(
        {
            # pv0 on=10: in [10,20) only; pv1 on=19: in BOTH (overlap fan-out)
            # pv2 on=20: hi-exclusive of [10,20), inside [15,25)
            # pv3 k=2 on=10: in [10,11); pv4 k=3: empty interval matches nothing
            "pv": np.array([0, 1, 1, 2, 3], dtype=np.int64),
            "iv": np.array([100, 100, 200, 200, 300], dtype=np.int64),
        }
    )
    pd.testing.assert_frame_equal(out, expect)


def test_interval_join_empty_sides(ray_session):
    import ray.data

    from docler_ray.stages.joins import interval_join

    pts = pd.DataFrame(
        {"k": np.array([1], dtype=np.int64), "on": np.array([5], dtype=np.int64)}
    )
    empty_ivs = pd.DataFrame(
        {
            "k": pd.Series([], dtype=np.int64),
            "lo": pd.Series([], dtype=np.int64),
            "hi": pd.Series([], dtype=np.int64),
            "iv": pd.Series([], dtype=np.int64),
        }
    )
    out = interval_join(
        ray.data.from_pandas(pts),
        ray.data.from_pandas(empty_ivs),
        by="k",
        point_on="on",
        lo_col="lo",
        hi_col="hi",
        value_cols=["iv"],
    )
    assert out.count() == 0


def test_interval_join_timestamps_and_string_keys(ray_session, monkeypatch):
    """Timestamp ordinals and string by-keys through BOTH regimes (string
    keys exercise the crc32 exchange hash; exactness must come from the
    payload match, not the hash)."""
    import ray.data

    from docler_ray.stages import joins
    from docler_ray.stages.joins import interval_join

    base = np.datetime64("2024-01-01T00:00:00", "us")
    pts = pd.DataFrame(
        {
            "k": ["a", "a", "b", "ab"],
            "on": base + np.array([0, 3600, 100, 0], dtype="timedelta64[s]"),
            "pv": np.arange(4, dtype=np.int64),
        }
    )
    ivs = pd.DataFrame(
        {
            "k": ["a", "b", "ab"],
            "lo": base + np.array([0, 0, 7200], dtype="timedelta64[s]"),
            "hi": base + np.array([3600, 3600, 9000], dtype="timedelta64[s]"),
            "iv": np.array([1, 2, 3], dtype=np.int64),
        }
    )
    expect = pd.DataFrame(
        {"pv": np.array([0, 2], dtype=np.int64), "iv": np.array([1, 2], dtype=np.int64)}
    )

    def run():
        return (
            interval_join(
                ray.data.from_pandas(pts),
                ray.data.from_pandas(ivs),
                by="k",
                point_on="on",
                lo_col="lo",
                hi_col="hi",
                value_cols=["iv"],
            )
            .to_pandas()[["pv", "iv"]]
            .sort_values(["pv", "iv"])
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(), expect)
    monkeypatch.setattr(joins, "_INTERVAL_BROADCAST_MAX", 0)
    pd.testing.assert_frame_equal(run(), expect)


def test_full_outer_join_aggregate_inputs(ray_session):
    """The canonical use: both sides are groupby outputs (whose empty
    blocks Ray's own join rejects without compaction), key domains only
    partially overlap, keys coalesce into ONE output column."""
    import ray.data
    from ray.data.aggregate import Count

    from docler_ray.stages.joins import full_outer_join

    left = (
        ray.data.from_items([{"k": k} for k in [1, 1, 2, 3, 3, 3]])
        .groupby("k")
        .aggregate(Count(alias_name="nl"))
    )
    right = (
        ray.data.from_items([{"rk": k} for k in [2, 2, 4]])
        .groupby("rk")
        .aggregate(Count(alias_name="nr"))
    )
    out = (
        full_outer_join(left, right, on="k", right_on="rk")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["k", "nl", "nr"]
    assert out["k"].tolist() == [1, 2, 3, 4]  # right-only 4 coalesced into k
    assert out["nl"].fillna(-1).tolist() == [2, 1, 3, -1]
    assert out["nr"].fillna(-1).tolist() == [-1, 2, -1, 1]


def test_full_outer_join_matches_pandas_outer_merge(ray_session):
    import ray.data

    from docler_ray.stages.joins import full_outer_join

    rng = np.random.default_rng(7)
    lf = pd.DataFrame(
        {"k": rng.integers(0, 40, 60).astype(np.int64)}
    ).drop_duplicates()
    lf["lv"] = lf["k"] * 10
    rf = pd.DataFrame(
        {"k": rng.integers(20, 60, 60).astype(np.int64)}
    ).drop_duplicates()
    rf["rv"] = rf["k"] * 100
    out = (
        full_outer_join(
            ray.data.from_pandas(lf), ray.data.from_pandas(rf), on="k", right_on="k"
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    expect = lf.merge(rf, on="k", how="outer").sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.astype({"lv": "float64", "rv": "float64"}), expect
    )


def test_full_outer_join_empty_sides(ray_session):
    import ray.data

    from docler_ray.stages.joins import full_outer_join

    filled = ray.data.from_items([{"k": 1, "v": 5}])
    empty = ray.data.from_arrow(
        pa.table({"rk": pa.array([], pa.int64()), "w": pa.array([], pa.int64())})
    )
    # right empty -> left survives as-is
    out = full_outer_join(filled, empty, on="k", right_on="rk").to_pandas()
    assert out["k"].tolist() == [1] and out["v"].tolist() == [5]
    # left empty -> right survives with the key renamed to `on`
    lempty = ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    )
    rfilled = ray.data.from_items([{"rk": 9, "w": 3}])
    out = full_outer_join(lempty, rfilled, on="k", right_on="rk").to_pandas()
    assert out["k"].tolist() == [9] and out["w"].tolist() == [3]
    # both empty -> None
    assert full_outer_join(lempty, empty, on="k", right_on="rk") is None


def test_salted_join_matches_unsalted_on_skew(ray_session):
    """One key owns half the left side; the salted composite-key join must
    return the identical multiset as the plain copartitioned join."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docler_ray.stages.joins import (
        copartition_hash_join,
        salted_copartition_join,
    )

    rng = np.random.default_rng(41)
    hot = np.zeros(4000, dtype=np.int64)  # key 0 = 50% of rows
    cold = rng.integers(1, 200, 4000)
    keys = np.concatenate([hot, cold])
    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(keys),
                "lv": pa.array(np.arange(len(keys), dtype=np.int64)),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "rk": pa.array(np.arange(0, 200, dtype=np.int64)),
                "rv": pa.array(np.arange(0, 200, dtype=np.int64) * 7),
            }
        )
    )
    plain = (
        copartition_hash_join(left, right, on="k", right_on="rk")
        .to_pandas()[["k", "lv", "rv"]]
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    salted = (
        salted_copartition_join(left, right, on="k", right_on="rk", salt=8)
        .to_pandas()[["k", "lv", "rv"]]
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(salted, plain)


def test_salted_join_salt_one_is_plain(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docler_ray.stages.joins import salted_copartition_join

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 2, 3], pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([2, 3, 4], pa.int64()),
                "rv": pa.array([20, 30, 40], pa.int64()),
            }
        )
    )
    out = (
        salted_copartition_join(left, right, on="k", salt=1)
        .to_pandas()
        .sort_values(["k"])
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [2, 2, 3]
    assert out["rv"].tolist() == [20, 20, 30]
