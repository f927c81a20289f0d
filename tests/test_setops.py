"""Distributed set operations (stages/setops.py): INTERSECT / EXCEPT."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mkds(vals, col="v"):
    import ray.data

    return ray.data.from_arrow(pa.table({col: vals}))


def _run(left, right, op, *, on="v", right_on=None, n_rows=None):
    from docler_ray.stages.setops import set_op

    out = set_op(
        left, right, on=on, right_on=right_on, op=op, n_rows=n_rows
    ).to_pandas()
    return sorted(out[on].tolist())


def test_set_op_matches_python_sets_strings(ray_session):
    rng = np.random.default_rng(11)
    lv = [f"tok{int(i)}" for i in rng.integers(0, 300, 700)]
    rv = [f"tok{int(i)}" for i in rng.integers(150, 450, 700)]
    ls, rs = set(lv), set(rv)
    left, right = _mkds(lv), _mkds(rv)
    assert _run(left, right, "intersect") == sorted(ls & rs)
    assert _run(_mkds(lv), _mkds(rv), "except") == sorted(ls - rs)


def test_set_op_matches_python_sets_ints(ray_session):
    rng = np.random.default_rng(12)
    lv = rng.integers(0, 200, 500).astype(np.int64)
    rv = rng.integers(100, 300, 500).astype(np.int64)
    ls, rs = set(lv.tolist()), set(rv.tolist())
    assert _run(_mkds(lv), _mkds(rv), "intersect") == sorted(ls & rs)
    assert _run(_mkds(lv), _mkds(rv), "except") == sorted(ls - rs)


def test_set_op_keyspace_invariance(ray_session):
    """Output is invariant to the co-location keyspace P (n_rows hint)."""
    rng = np.random.default_rng(13)
    lv = [f"w{int(i)}" for i in rng.integers(0, 500, 900)]
    rv = [f"w{int(i)}" for i in rng.integers(250, 750, 900)]
    small = _run(_mkds(lv), _mkds(rv), "intersect", n_rows=None)
    large = _run(_mkds(lv), _mkds(rv), "intersect", n_rows=64 * 65536 * 8)
    assert small == large == sorted(set(lv) & set(rv))


def test_set_op_empty_result_keeps_schema(ray_session):
    """EXCEPT with total overlap is legitimately empty — the anchor block
    must still present the declared output column at the Dataset level
    (Ray's to_pandas drops columns on zero-row datasets regardless of
    block schemas, so the assertion reads the schema, not a frame)."""
    import ray

    from docler_ray.stages.setops import set_op

    out_ds = set_op(_mkds(["a", "b"]), _mkds(["a", "b", "c"]), on="v", op="except")
    schema = out_ds.schema()
    assert schema.names == ["v"]
    mat = out_ds.materialize()
    assert mat.count() == 0
    # every surviving block carries the declared schema (no schema-less
    # empties leak past the anchor union)
    for bundle in mat.iter_internal_ref_bundles():
        for ref, _meta in bundle.blocks:
            assert ray.get(ref).schema.names == ["v"]


def test_set_op_distinct_semantics_and_right_on(ray_session):
    """Duplicates on either side collapse (SQL INTERSECT/EXCEPT are
    DISTINCT); right column may be named differently."""
    left = _mkds(["x", "x", "y", "y", "z"])
    right = _mkds(["y", "y"], col="w")
    out = _run(left, right, "intersect", right_on="w")
    assert out == ["y"]
    out = _run(left, right, "except", right_on="w")
    assert out == ["x", "z"]


def test_set_op_rejects_unknown_op(ray_session):
    from docler_ray.stages.setops import set_op

    with pytest.raises(ValueError, match="op must be one of"):
        set_op(_mkds(["a"]), _mkds(["a"]), on="v", op="union")
