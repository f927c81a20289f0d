"""Declarative data-quality audit: null / range / uniqueness / foreign-key
violation counts folded into one tiny report table.

The reference enforces its contracts at config time (pydantic strict models,
/root/reference/src/docler/configs — round-trip pinned in test_config); this
is the corpus-tier analog an ingest pipeline runs BEFORE training: count the
rows violating each declared constraint instead of failing mid-job.

Scale plan per check kind:

- ``NullCheck`` / ``RangeCheck``: row-local — all checks against one table
  fuse into ONE zero-shuffle pass (map partials, then a |checks|-sized
  groupby).
- ``UniqueCheck``: distinct count via map-side distinct partials + one
  key exchange; violations = rows - distinct.
- ``FKCheck``: exact bloom anti join (joins.bloom_anti_join) — map-side
  bitmap pass-through, the exchange ships only bitmap hits; the report
  counts the survivors (orphans). Integer keys (every TPC-H-ish FK is).

The report is |checks| rows — driver-side assembly is bounded by the check
list, never by the data.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa


@dataclass(frozen=True)
class NullCheck:
    """Violation: ``col`` IS NULL. n_checked = all rows."""

    name: str
    table: str
    col: str


@dataclass(frozen=True)
class RangeCheck:
    """Violation: non-null value outside [lo, hi] (either bound optional).
    n_checked = non-null rows; nulls are NullCheck's job."""

    name: str
    table: str
    col: str
    lo: float | None = None
    hi: float | None = None


@dataclass(frozen=True)
class UniqueCheck:
    """Violation count: rows - distinct values. Assumes a null-free key
    column (declare a NullCheck alongside when that isn't guaranteed)."""

    name: str
    table: str
    col: str


@dataclass(frozen=True)
class FKCheck:
    """Violation: non-null child key absent from the parent key column."""

    name: str
    table: str
    col: str
    parent_table: str
    parent_col: str


def _fused_rowlocal(ds, checks: list) -> list[tuple[str, int, int]]:
    """All Null/Range checks over one table in ONE zero-shuffle pass."""
    from ray.data.aggregate import Sum

    specs = [
        (
            c.name,
            c.col,
            "null" if isinstance(c, NullCheck) else "range",
            getattr(c, "lo", None),
            getattr(c, "hi", None),
        )
        for c in checks
    ]

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        names, viol, checked = [], [], []
        for name, col, kind, lo, hi in specs:
            arr = batch.column(col)
            n_null = arr.null_count
            if kind == "null":
                names.append(name)
                viol.append(n_null)
                checked.append(len(arr))
            else:
                bad = None
                if lo is not None:
                    bad = pc.less(arr, lo)
                if hi is not None:
                    over = pc.greater(arr, hi)
                    bad = over if bad is None else pc.or_(bad, over)
                n_bad = 0 if bad is None else int(
                    pc.sum(bad.cast(pa.int64())).as_py() or 0
                )
                names.append(name)
                viol.append(n_bad)
                checked.append(len(arr) - n_null)
        return pa.table(
            {
                "check": pa.array(names, pa.string()),
                "pv": pa.array(viol, pa.int64()),
                "pc_": pa.array(checked, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("check")
        .aggregate(
            Sum("pv", alias_name="n_violations"),
            Sum("pc_", alias_name="n_checked"),
        )
        .to_pandas()
    )
    return [
        (r["check"], int(r["n_violations"]), int(r["n_checked"]))
        for _, r in agg.iterrows()
    ]


def _distinct_count(ds, col: str) -> int:
    """Distinct values via map-side distinct partials + one key exchange."""
    from ray.data.aggregate import Count

    def dedup_partial(batch: pa.Table) -> pa.Table:
        g = batch.select([col]).group_by(col).aggregate([([], "count_all")])
        return g.select([col])

    return (
        ds.map_batches(dedup_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(col)
        .aggregate(Count(alias_name="_m"))
        .count()
    )


def run_audit(tables: dict, checks: list):
    """Run every check; returns a Dataset (check, n_violations, n_checked).

    ``tables`` maps table name -> Dataset (column-pruned reads are the
    caller's job — pass only the audited columns)."""
    from concurrent.futures import ThreadPoolExecutor

    import ray.data

    from docler_ray.stages.joins import bloom_anti_join

    by_table: dict[str, list] = {}
    for c in checks:
        if isinstance(c, (NullCheck, RangeCheck)):
            by_table.setdefault(c.table, []).append(c)

    def run_unique(c: UniqueCheck) -> list[tuple[str, int, int]]:
        ds = tables[c.table]
        total = ds.count()
        return [(c.name, total - _distinct_count(ds, c.col), total)]

    def run_fk(c: FKCheck) -> list[tuple[str, int, int]]:
        import pyarrow.compute as pc_mod

        child = tables[c.table].select_columns([c.col])

        def drop_null(batch: pa.Table, col=c.col) -> pa.Table:
            return batch.filter(pc_mod.is_valid(batch.column(col)))

        child_nn = child.map_batches(
            drop_null, batch_format="pyarrow", zero_copy_batch=True
        )
        n_checked = child_nn.count()
        orphans = bloom_anti_join(
            child_nn,
            tables[c.parent_table].select_columns([c.parent_col]),
            c.col,
            c.parent_col,
        )
        return [(c.name, orphans.count(), n_checked)]

    # Independent distributed jobs — run them concurrently from the driver
    # so the report's wall time is the slowest check, not the sum (the
    # streaming executor interleaves their tasks on the shared CPU pool).
    thunks = [
        (lambda t=t, cs=cs: _fused_rowlocal(tables[t], cs))
        for t, cs in by_table.items()
    ]
    thunks += [
        (lambda c=c: run_unique(c)) for c in checks if isinstance(c, UniqueCheck)
    ]
    thunks += [(lambda c=c: run_fk(c)) for c in checks if isinstance(c, FKCheck)]
    rows: list[tuple[str, int, int]] = []
    with ThreadPoolExecutor(max_workers=min(8, max(1, len(thunks)))) as pool:
        for part in pool.map(lambda f: f(), thunks):
            rows.extend(part)

    rows.sort()
    return ray.data.from_arrow(
        pa.table(
            {
                "check": pa.array([r[0] for r in rows], pa.string()),
                "n_violations": pa.array(
                    np.array([r[1] for r in rows], dtype=np.int64)
                ),
                "n_checked": pa.array(np.array([r[2] for r in rows], dtype=np.int64)),
            }
        )
    )
