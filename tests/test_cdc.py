"""apply_cdc (last-writer-wins snapshot merge) semantics on small fixtures."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from docler_ray.stages.cdc import apply_cdc


def _ds(tbl: pa.Table):
    import ray.data

    return ray.data.from_arrow(tbl)


def _base():
    return _ds(
        pa.table(
            {
                "k": pa.array([1, 2, 3, 4], pa.int64()),
                "v": pa.array(["a", "b", "c", "d"], pa.string()),
            }
        )
    )


def _changes(rows):
    return _ds(
        pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.int64()),
                "version": pa.array([r[1] for r in rows], pa.int64()),
                "op": pa.array([r[2] for r in rows], pa.string()),
                "v": pa.array([r[3] for r in rows], pa.string()),
            }
        )
    )


def _merge(rows):
    out = (
        apply_cdc(
            _base(),
            _changes(rows),
            key_col="k",
            version_col="version",
            payload_cols=["v"],
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    return dict(zip(out["k"], out["v"]))


def test_upsert_update_insert_delete(ray_session):
    got = _merge(
        [
            (2, 1, "u", "B2"),      # update
            (9, 1, "u", "new9"),    # insert (no base row)
            (3, 1, "d", None),      # delete
            (4, 1, "u", "D1"),      # update...
            (4, 2, "d", None),      # ...then delete: delete wins
        ]
    )
    assert got == {1: "a", 2: "B2", 9: "new9"}


def test_reinsert_after_delete(ray_session):
    got = _merge([(3, 1, "d", None), (3, 2, "u", "c2")])
    assert got[3] == "c2"


def test_no_changes_is_identity(ray_session):
    got = _merge([])
    assert got == {1: "a", 2: "b", 3: "c", 4: "d"}


def test_larger_random_merge_matches_pandas(ray_session):
    import pandas as pd

    rng = np.random.default_rng(31)
    base_keys = np.arange(200, dtype=np.int64)
    base = _ds(
        pa.table(
            {
                "k": pa.array(base_keys),
                "v": pa.array([f"b{k}" for k in base_keys], pa.string()),
            }
        )
    )
    rows = []
    for ver in (1, 2, 3):
        ks = rng.choice(300, 80, replace=False)
        for k in ks:
            op = "d" if rng.random() < 0.3 else "u"
            rows.append((int(k), ver, op, None if op == "d" else f"v{ver}_{k}"))
    got = (
        apply_cdc(
            base,
            _changes(rows),
            key_col="k",
            version_col="version",
            payload_cols=["v"],
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    df = pd.DataFrame(
        [(int(k), 0, "u", f"b{k}") for k in base_keys] + rows,
        columns=["k", "version", "op", "v"],
    )
    w = df.sort_values(["k", "version"]).groupby("k").tail(1)
    exp = w[w["op"] == "u"].sort_values("k").reset_index(drop=True)[["k", "v"]]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
