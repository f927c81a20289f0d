"""Schema conformance: fill/drop/cast/order policies and the strict mode."""

from __future__ import annotations

import pyarrow as pa
import pytest

from docler_ray.stages.conform import conform_batch


def _batch():
    return pa.table(
        {
            "b": pa.array([1, 2], pa.int32()),
            "a": pa.array(["x", None], pa.string()),
            "extra": pa.array([9, 9], pa.int64()),
        }
    )


def test_conform_fills_casts_orders():
    target = pa.schema(
        [
            pa.field("a", pa.string()),
            pa.field("b", pa.float64()),   # int32 -> float64 widening
            pa.field("c", pa.int64()),     # missing -> nulls
            pa.field("d", pa.string()),    # missing -> default
        ]
    )
    out = conform_batch(_batch(), target, defaults={"d": "dft"})
    assert out.schema.names == ["a", "b", "c", "d"]  # target order, extra gone
    assert out.column("b").to_pylist() == [1.0, 2.0]
    assert out.column("b").type == pa.float64()
    assert out.column("c").to_pylist() == [None, None]
    assert out.column("d").to_pylist() == ["dft", "dft"]


def test_conform_strict_rejects_extras():
    target = pa.schema([pa.field("a", pa.string()), pa.field("b", pa.int32())])
    with pytest.raises(ValueError, match="unexpected columns"):
        conform_batch(_batch(), target, strict=True)


def test_conform_bad_cast_fails_loudly():
    t = pa.table({"a": pa.array(["12", "not-a-number"])})
    target = pa.schema([pa.field("a", pa.int64())])
    with pytest.raises(Exception):
        conform_batch(t, target)


def test_conform_schema_stage(ray_session):
    import ray.data

    from docler_ray.stages.conform import conform_schema

    ds = ray.data.from_arrow(_batch())
    target = pa.schema([pa.field("b", pa.int64()), pa.field("z", pa.string())])
    out = conform_schema(ds, target)
    assert out.schema().names == ["b", "z"]
    assert out.to_pandas()["b"].tolist() == [1, 2]
