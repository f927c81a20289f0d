"""Canary tests pinning the Ray 2.49 behaviors that force workarounds.

``_compact_nonempty`` (stages/dedup.py) materializes every dataset that
feeds a ``Dataset.join`` because Ray's hash shuffle emits SCHEMA-LESS
empty blocks for partitions that received no rows, ``map_batches``
passes empty blocks through WITHOUT invoking the UDF (so a cheap
schema-normalizing map cannot repair them — probed directly below), and
the join's HashShuffleAggregator raises ``ArrowInvalid`` on the mixed
schemas. Cost at scale: join inputs traverse the object store once more
than a streaming hand-off would (blocks are finalized, then re-read by
the join's shuffle) — a constant ~2x object-store traffic factor on the
join path only, bounded by the join input size, never a driver-side
row materialization (the driver touches refs + metadata only).

If EITHER test here starts failing after a Ray upgrade, the workaround
can be retired: delete ``_compact_nonempty`` call sites and feed joins
directly (keep ``_ensure_pair_schema`` until the second canary flips).
"""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray
import ray.data


def _grouped_with_empty_partitions():
    """groupby().map_groups output that carries schema-less empty blocks:
    4 rows / 2 keys spread over 8 partitions leaves shuffle partitions
    with no groups."""
    ds = ray.data.from_items([{"k": i % 2, "v": i} for i in range(4)])
    return ds.repartition(8).groupby("k").map_groups(
        lambda df: df.head(1), batch_format="pandas"
    )


def test_join_rejects_mixed_schema_empty_blocks():
    """Direct join of map_groups output fails on Ray 2.49 — the reason
    _compact_nonempty exists. A pass here (no raise) means Ray fixed it."""
    grouped = _grouped_with_empty_partitions()
    right = ray.data.from_items([{"k": 0, "w": 100}, {"k": 1, "w": 200}])
    with pytest.raises(Exception) as exc_info:
        grouped.join(right, join_type="inner", num_partitions=4, on=("k",)).take_all()
    assert "ArrowInvalid" in str(type(exc_info.value)) or "Arrow" in str(
        exc_info.value
    )


def test_map_batches_skips_empty_blocks():
    """map_batches never invokes the UDF on empty blocks, so a
    schema-normalizing map cannot repair schema-less empties (probed:
    the normalized pipeline still fails the join identically)."""
    grouped = _grouped_with_empty_partitions()
    schema = pa.schema([("k", pa.int64()), ("v", pa.int64())])
    saw_empty = []

    def norm(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            saw_empty.append(1)
            return schema.empty_table()
        return batch

    grouped.map_batches(norm, batch_format="pyarrow").materialize()
    assert not saw_empty, (
        "Ray now passes empty blocks to map_batches UDFs - the "
        "_compact_nonempty materialize may be replaceable by a "
        "schema-normalizing map; re-probe the join path."
    )


def test_compact_nonempty_repairs_join_input():
    """The workaround itself: compacting to non-empty blocks makes the
    same join succeed with correct results."""
    from docler_ray.stages import dedup as dd

    grouped = _grouped_with_empty_partitions()
    compacted, n_rows = dd._compact_nonempty(grouped)
    assert n_rows == 2
    right = ray.data.from_items([{"k": 0, "w": 100}, {"k": 1, "w": 200}])
    out = compacted.join(
        right, join_type="inner", num_partitions=4, on=("k",)
    ).take_all()
    assert len(out) == 2
    assert {r["w"] for r in out} == {100, 200}
