"""Distributed set operations over DISTINCT value sets: INTERSECT / EXCEPT.

The reference has no set operators (its only set-like step is the per-doc
image/chunk association); these are engine infrastructure for corpus
reconciliation — vocabulary overlap between language slices, snapshot
membership diffs, blocklist algebra — where BOTH operands are corpus-sized
so neither side may broadcast or land on the driver.

Plan (the coarse-key exchange rule, see stages/windows.py::_window_distinct):

1. map-side, each input batch reduces to its DISTINCT values (the only
   corpus-sized pass) tagged with a side byte (left=0 / right=1) and a
   single-int64 ``coarse = hash(value) % P`` key — never a string sort key;
2. ``groupby(coarse)`` co-locates with a single-int exchange: every
   occurrence of a value (either side) shares its bucket, so the in-bucket
   Arrow ``group_by(value)`` min/max over the side tag is GLOBAL truth —
   exactness never rests on hash collision-freedom, the true value rides
   as payload and is matched exactly;
3. the bucket kernel emits values passing the op predicate
   (INTERSECT: seen on both sides; EXCEPT: left-only).

P is sized from a caller-supplied row hint (~64Ki distinct values per
bucket, floored at 64), so no bucket materializes more than a bounded
slice at any corpus size. Output is invariant to P (forced-keyspace
equality test in tests/test_joins_windows.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SETOP_TARGET_ROWS = 65536
_SETOP_COARSE_FLOOR = 64

_OPS = ("intersect", "except")


def _coarse_count(n_rows: int | None) -> int:
    if not n_rows or n_rows <= 0:
        return _SETOP_COARSE_FLOOR
    return max(_SETOP_COARSE_FLOOR, 1 + n_rows // _SETOP_TARGET_ROWS)


def set_op(
    left,
    right,
    *,
    on: str,
    right_on: str | None = None,
    op: str = "intersect",
    n_rows: int | None = None,
):
    """Distinct-set INTERSECT / EXCEPT of two value columns.

    ``left``/``right`` are Datasets carrying the values in column ``on``
    (``right_on`` for the right side when named differently). Returns a
    Dataset with ONE column named ``on`` holding each qualifying value
    exactly once: values present on BOTH sides (``op="intersect"``) or
    present on the left and absent from the right (``op="except"``) —
    DISTINCT semantics on both sides, matching SQL INTERSECT / EXCEPT.

    ``n_rows`` is the co-location keyspace hint: pass (an estimate of) the
    total value-row count across both sides. The result is invariant to it;
    it only bounds per-bucket memory.
    """
    import ray.data

    from docler_ray.stages.joins import _ensure_arrow_schema, _key_int64

    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}")
    right_on = right_on or on
    nparts = _coarse_count(n_rows)
    # 0-row typed anchor block: a legitimately-empty result (EXCEPT with
    # total overlap) must still present the output schema — map_groups
    # emits schema-less blocks for it otherwise
    left, lschema = _ensure_arrow_schema(left)
    anchor = ray.data.from_arrow(
        pa.table({on: pa.array([], lschema.field(on).type)})
    )

    def tag(col: str, side: int):
        def fn(batch: pa.Table) -> pa.Table:
            vals = batch.select([col]).group_by([col]).aggregate([]).column(col)
            coarse = _key_int64(vals) % np.int64(nparts)
            n = len(vals)
            return pa.table(
                {
                    "v": vals,
                    "side": pa.array(np.full(n, side, dtype=np.int8)),
                    "coarse": pa.array(coarse, pa.int64()),
                }
            )

        return fn

    lt = left.map_batches(tag(on, 0), batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(
        tag(right_on, 1), batch_format="pyarrow", zero_copy_batch=True
    )

    want_both = op == "intersect"

    def bucket(t: pa.Table) -> pa.Table:
        g = t.group_by("v").aggregate([("side", "min"), ("side", "max")])
        lo = g.column("side_min").to_numpy(zero_copy_only=False)
        hi = g.column("side_max").to_numpy(zero_copy_only=False)
        if want_both:
            keep = (lo == 0) & (hi == 1)
        else:
            keep = hi == 0
        out = g.column("v").filter(pa.array(keep))
        return pa.table({on: out})

    return (
        lt.union(rt)
        .groupby("coarse")
        .map_groups(bucket, batch_format="pyarrow")
        .union(anchor)
    )
