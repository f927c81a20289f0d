"""resample_ffill (grid + forward-fill semantics) and peak_concurrency
(sweep-line over the distributed prefix sum) on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from docler_ray.stages.windows import peak_concurrency, resample_ffill


def _events_ds(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [pd.Timestamp(r[1] * 1_000_000, unit="us") for r in rows],
                    pa.timestamp("us"),
                ),
                "v": pa.array([float(r[2]) for r in rows], pa.float64()),
            }
        )
    )


def test_resample_gap_fill_and_in_slot_max(ray_session):
    # key 1: slots 0 and 30 (step 10) with a 2-slot gap; slot 0 holds two
    # observations (max wins); key 2: single observation -> single row
    rows = [(1, 2, 5.0), (1, 7, 9.0), (1, 33, 1.5), (2, 100, 7.0)]
    got = (
        resample_ffill(_events_ds(rows), "k", "ts", "v", step_secs=10)
        .to_pandas()
        .sort_values(["k", "slot"])
        .reset_index(drop=True)
    )
    k1 = got[got["k"] == 1]
    assert k1["slot"].tolist() == [0, 10, 20, 30]
    assert k1["value"].tolist() == [9.0, 9.0, 9.0, 1.5]
    k2 = got[got["k"] == 2]
    assert k2["slot"].tolist() == [100]
    assert k2["value"].tolist() == [7.0]


def test_resample_slot_boundary(ray_session):
    # ts exactly on a slot boundary belongs to that slot
    rows = [(1, 10, 2.0), (1, 19, 3.0), (1, 20, 4.0)]
    got = (
        resample_ffill(_events_ds(rows), "k", "ts", "v", step_secs=10)
        .to_pandas()
        .sort_values("slot")
    )
    assert got["slot"].tolist() == [10, 20]
    assert got["value"].tolist() == [3.0, 4.0]


def test_resample_many_keys_cross_block(ray_session):
    # enough keys + rows to span multiple blocks/partials; compare against
    # a pandas reference
    rng = np.random.default_rng(5)
    rows = [
        (int(k), int(t), float(v))
        for k, t, v in zip(
            rng.integers(0, 20, 3000),
            rng.integers(0, 5000, 3000),
            rng.normal(0, 10, 3000),
        )
    ]
    got = (
        resample_ffill(_events_ds(rows), "k", "ts", "v", step_secs=100)
        .to_pandas()
        .sort_values(["k", "slot"])
        .reset_index(drop=True)
    )
    df = pd.DataFrame(rows, columns=["k", "ep", "v"])
    df["slot"] = (df["ep"] // 100) * 100
    s = df.groupby(["k", "slot"])["v"].max().reset_index()
    exp_parts = []
    for k, kdf in s.groupby("k"):
        grid = np.arange(kdf["slot"].min(), kdf["slot"].max() + 1, 100)
        idx = np.searchsorted(kdf["slot"].to_numpy(), grid, side="right") - 1
        exp_parts.append(
            pd.DataFrame(
                {"k": k, "slot": grid, "value": kdf["v"].to_numpy()[idx]}
            )
        )
    exp = pd.concat(exp_parts).sort_values(["k", "slot"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def _intervals_ds(pairs):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "s": pa.array([p[0] for p in pairs], pa.int64()),
                "e": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    )


def _peak(pairs):
    return (
        peak_concurrency(_intervals_ds(pairs), start_col="s", end_col="e")
        .to_pandas()
        .iloc[0]
    )


def test_peak_nested_and_closed_semantics(ray_session):
    # [1,5] and [5,9] touch at t=5 (closed intervals) -> concurrent there
    r = _peak([(1, 5), (5, 9)])
    assert (r["peak"], r["peak_time"]) == (2, 5)
    # [1,5] and [6,9] do NOT overlap
    r = _peak([(1, 5), (6, 9)])
    assert (r["peak"], r["peak_time"]) == (1, 1)
    # nesting: peak inside the innermost interval
    r = _peak([(0, 100), (10, 20), (12, 15), (50, 60)])
    assert (r["peak"], r["peak_time"]) == (3, 12)


def test_peak_tie_resolves_to_earliest(ray_session):
    # two disjoint overlap bursts both reach 2 -> earliest boundary wins
    r = _peak([(0, 10), (5, 15), (100, 110), (105, 115)])
    assert (r["peak"], r["peak_time"]) == (2, 5)


def test_peak_matches_brute_force_random(ray_session):
    rng = np.random.default_rng(11)
    pairs = []
    for _ in range(500):
        s = int(rng.integers(0, 10_000))
        pairs.append((s, s + int(rng.integers(0, 300))))
    r = _peak(pairs)
    # brute force over boundary times
    times = sorted({p[0] for p in pairs} | {p[1] + 1 for p in pairs})
    best, best_t = -1, None
    for t in times:
        c = sum(1 for s, e in pairs if s <= t <= e)
        if c > best:
            best, best_t = c, t
    assert int(r["peak"]) == best
    assert int(r["peak_time"]) == best_t


def test_peak_empty(ray_session):
    r = _peak([])
    assert int(r["peak"]) == 0
    assert pd.isna(r["peak_time"])


def test_detect_bursts_gap_and_threshold(ray_session):
    """A quiet hourly baseline, a 26-hour gap (absent windows must dilute
    the trailing sum implicitly), then a spike that must flag."""
    from docler_ray.stages.windows import detect_bursts

    rows = []
    # baseline: 2 events per hour for hours 0..23
    for h in range(24):
        rows += [(1, h * 3600 + 5, 0.0), (1, h * 3600 + 6, 0.0)]
    # spike at hour 24: 10 events (10*24 > 3*48 -> burst)
    rows += [(1, 24 * 3600 + k, 0.0) for k in range(10)]
    # after a 26h silence, hour 51 has 1 event; trailing window covers
    # hours 27..50 -> trail 0 -> NOT a burst (trail > 0 required)
    rows += [(1, 51 * 3600 + 1, 0.0)]
    ds = _events_ds(rows)
    got = (
        detect_bursts(
            ds.map_batches(
                lambda b: b.append_column(
                    "event_type", pa.array(["x"] * len(b), pa.string())
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            "ts",
            "event_type",
        )
        .to_pandas()
        .set_index("window_start")
        .sort_index()
    )
    assert bool(got.loc[24 * 3600, "is_burst"]) is True
    assert int(got.loc[24 * 3600, "trail"]) == 48
    assert bool(got.loc[51 * 3600, "is_burst"]) is False
    assert int(got.loc[51 * 3600, "trail"]) == 0
    # hour 1 with trail=2: 2*24 > 3*2 -> bursts (early-history semantics,
    # identical in the SQL twin)
    assert bool(got.loc[3600, "is_burst"]) is True
    # the first window has no trail -> never a burst
    assert bool(got.loc[0, "is_burst"]) is False


def test_band_pair_counts_boundaries_and_brute(ray_session):
    from docler_ray.stages.windows import band_pair_counts

    import ray.data

    # hand cases: exact band boundary included; equal ts ordered by id;
    # cross-bucket pairs (band=10: ep 9 and 19 differ by exactly 10)
    rows = [
        (1, 9, 100),
        (1, 19, 101),   # diff exactly 10 -> pair
        (1, 30, 102),   # diff 11 from 19 -> no pair
        (2, 5, 200),
        (2, 5, 201),    # equal ts -> one pair by id order
        (3, 0, 300),    # lone event -> no row
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [pd.Timestamp(r[1] * 1_000_000, unit="us") for r in rows],
                    pa.timestamp("us"),
                ),
                "event_id": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    )
    got = (
        band_pair_counts(ds, "user", "ts", "event_id", band_secs=10)
        .to_pandas()
        .set_index("user")["n_pairs"]
        .to_dict()
    )
    assert got == {1: 1, 2: 1}

    # random brute-force cross-check with many bucket-straddling pairs
    rng = np.random.default_rng(13)
    rows = [
        (int(k), int(t), i)
        for i, (k, t) in enumerate(
            zip(rng.integers(0, 5, 2000), rng.integers(0, 3000, 2000))
        )
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [pd.Timestamp(r[1] * 1_000_000, unit="us") for r in rows],
                    pa.timestamp("us"),
                ),
                "event_id": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    )
    got = (
        band_pair_counts(ds, "user", "ts", "event_id", band_secs=60)
        .to_pandas()
        .set_index("user")["n_pairs"]
        .to_dict()
    )
    exp: dict[int, int] = {}
    for i, (k1, t1, i1) in enumerate(rows):
        for k2, t2, i2 in rows[i + 1 :]:
            if k1 != k2:
                continue
            (ta, ia), (tb, ib) = sorted([(t1, i1), (t2, i2)])
            if tb - ta <= 60:
                exp[k1] = exp.get(k1, 0) + 1
    assert got == exp
