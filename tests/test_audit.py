"""Data-quality audit kernels: null/range fusion, distinct counting, FK
orphan counting — each pinned on small adversarial tables with known
violation counts."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from docler_ray.stages.audit import (
    FKCheck,
    NullCheck,
    RangeCheck,
    UniqueCheck,
    run_audit,
)


def _ds(table: pa.Table):
    import ray.data

    return ray.data.from_arrow(table)


def _report(tables, checks) -> dict:
    df = run_audit(tables, checks).to_pandas()
    return {
        r["check"]: (int(r["n_violations"]), int(r["n_checked"]))
        for _, r in df.iterrows()
    }


def test_null_and_range_fused_single_table(ray_session):
    t = pa.table(
        {
            "x": pa.array([1.0, None, 5.0, -2.0, 100.0], pa.float64()),
            "y": pa.array([None, None, "a", "b", "c"], pa.string()),
        }
    )
    got = _report(
        {"t": _ds(t)},
        [
            NullCheck("null_y", "t", "y"),
            NullCheck("null_x", "t", "x"),
            RangeCheck("range_x", "t", "x", lo=0.0, hi=10.0),
        ],
    )
    assert got["null_y"] == (2, 5)
    assert got["null_x"] == (1, 5)
    # nulls are excluded from range checking: 4 checked, -2 and 100 violate
    assert got["range_x"] == (2, 4)


def test_range_one_sided_bounds(ray_session):
    t = pa.table({"v": pa.array([1, 2, 3, 4, 5], pa.int64())})
    got = _report(
        {"t": _ds(t)},
        [
            RangeCheck("lo_only", "t", "v", lo=3),
            RangeCheck("hi_only", "t", "v", hi=2),
        ],
    )
    assert got["lo_only"] == (2, 5)
    assert got["hi_only"] == (3, 5)


def test_unique_check(ray_session):
    t = pa.table({"k": pa.array([1, 1, 2, 3, 3, 3], pa.int64())})
    got = _report({"t": _ds(t)}, [UniqueCheck("uniq_k", "t", "k")])
    assert got["uniq_k"] == (3, 6)


def test_fk_check_orphans_and_null_child_keys(ray_session):
    child = pa.table(
        {"fk": pa.array([1, 2, 99, None, 98, 1], pa.int64())}
    )
    parent = pa.table({"pk": pa.array(np.arange(10, dtype=np.int64))})
    got = _report(
        {"c": _ds(child), "p": _ds(parent)},
        [FKCheck("fk", "c", "fk", "p", "pk")],
    )
    # 99 and 98 are orphans; the NULL child key is not checked
    assert got["fk"] == (2, 5)


def test_mixed_checks_report_shape(ray_session):
    t = pa.table(
        {
            "k": pa.array([1, 2, 2], pa.int64()),
            "v": pa.array([0.5, 1.5, None], pa.float64()),
        }
    )
    p = pa.table({"pk": pa.array([1, 2], pa.int64())})
    rep = run_audit(
        {"t": _ds(t), "p": _ds(p)},
        [
            NullCheck("a_null", "t", "v"),
            RangeCheck("b_range", "t", "v", hi=1.0),
            UniqueCheck("c_uniq", "t", "k"),
            FKCheck("d_fk", "t", "k", "p", "pk"),
        ],
    ).to_pandas()
    assert list(rep.columns) == ["check", "n_violations", "n_checked"]
    assert list(rep["check"]) == ["a_null", "b_range", "c_uniq", "d_fk"]
    assert rep["n_violations"].tolist() == [1, 1, 1, 0]
