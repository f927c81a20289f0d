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
