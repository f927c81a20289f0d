"""Event-time watermark / late-data detection: the exclusive distributed
prefix max vs a sequential scan, and the flag semantics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _arrivals_ds(ids, ts):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "arrival": pa.array(ids, pa.int64()),
                "ts_us": pa.array(ts, pa.int64()),
            }
        )
    ).repartition(4)


def test_prefix_max_matches_sequential(ray_session):
    from docler_ray.stages.packing import ordered_prefix_max

    rng = np.random.default_rng(7)
    ids = rng.permutation(500).tolist()
    ts = rng.integers(0, 10**15, 500).tolist()
    df = (
        ordered_prefix_max(_arrivals_ds(ids, ts), "arrival", "ts_us")
        .to_pandas()
        .sort_values("arrival")
        .reset_index(drop=True)
    )
    order = np.argsort(ids, kind="stable")
    seq_ts = np.asarray(ts)[order]
    want = [None] + np.maximum.accumulate(seq_ts)[:-1].tolist()
    got = [None if x is None or pd_na(x) else int(x) for x in df["cummax_excl"]]
    assert got == want
    assert df["ts_us"].tolist() == seq_ts.tolist()


def pd_na(x):
    import pandas as pd

    return pd.isna(x)


def test_prefix_max_exact_beyond_float53(ray_session):
    """Values above 2^53 must survive exactly (no float64 detour)."""
    from docler_ray.stages.packing import ordered_prefix_max

    big = 2**60 + 1
    df = (
        ordered_prefix_max(
            _arrivals_ds([0, 1, 2], [big, 5, big + 3]), "arrival", "ts_us"
        )
        .to_pandas()
        .sort_values("arrival")
    )
    assert df["cummax_excl"].tolist()[1:] == [big, big]


def test_late_flags_semantics(ray_session):
    from docler_ray.stages.windows import late_event_flags

    # arrival order 0..4; event times: 100, 40 (late at L=50? wm=100,
    # 100-50=50 > 40 -> LATE), 60 (100-50=50 < 60 -> on time), 200, 120
    # (wm=200, 150 > 120 -> LATE)
    ds = _arrivals_ds([0, 1, 2, 3, 4], [100, 40, 60, 200, 120])
    df = (
        late_event_flags(ds, order_col="arrival", ts_col="ts_us", lateness_us=50)
        .to_pandas()
        .sort_values("arrival")
    )
    assert df["late"].tolist() == [False, True, False, False, True]
    assert df["wm_excl_us"].tolist()[0] is None or pd_na(df["wm_excl_us"].iloc[0])


def test_late_flags_empty(ray_session):
    from docler_ray.stages.windows import late_event_flags

    ds = _arrivals_ds([], [])
    out = late_event_flags(ds, order_col="arrival", ts_col="ts_us", lateness_us=1)
    assert out.count() == 0


# --- per-key exact integer EWMA ----------------------------------------------


def test_grouped_int_ewma_matches_sequential(ray_session):
    import numpy as np
    import ray.data

    from docler_ray.stages.windows import grouped_int_ewma

    rng = np.random.default_rng(9)
    n = 400
    keys = rng.integers(0, 12, n)
    order = rng.permutation(n)
    vals = rng.integers(0, 10**6, n)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(keys, pa.int64()),
                "event_id": pa.array(order, pa.int64()),
                "cents": pa.array(vals, pa.int64()),
            }
        )
    ).repartition(5)
    got = (
        grouped_int_ewma(ds)
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    # sequential reference
    import collections

    seq = collections.defaultdict(list)
    for k, o, v in sorted(zip(keys, order, vals), key=lambda t: (t[0], t[1])):
        seq[int(k)].append(int(v))
    for k, vs in seq.items():
        s = vs[0]
        for v in vs[1:]:
            s = (s + v) // 2
        assert got.loc[k, "ewma"] == s
        assert got.loc[k, "n_events"] == len(vs)


def test_grouped_int_ewma_single_event_and_empty(ray_session):
    import ray.data

    from docler_ray.stages.windows import grouped_int_ewma

    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([7], pa.int64()),
                "event_id": pa.array([0], pa.int64()),
                "cents": pa.array([123], pa.int64()),
            }
        )
    )
    df = grouped_int_ewma(ds).to_pandas()
    assert df.iloc[0].tolist() == [7, 1, 123]
