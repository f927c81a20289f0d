"""Join operators: broadcast hash join and broadcast as-of join.

The reference has no relational joins (SURVEY.md §2.7 — its only lookups are
the MIME->converter registry dispatch, registry.py:58-117, and intra-row
image/chunk association); these are engine infrastructure a Common-Crawl-scale
corpus pipeline needs for enrichment against dimension tables.

Scale design (the partitioning assumption, stated explicitly):
- Both operators BROADCAST the right side: it is `ray.put` once and read by
  every map task — never re-shipped per batch, never shuffled. This is the
  correct plan whenever the right side fits in a worker's heap (dimension
  tables, reference/config tables, golden tables). For a large right side the
  plan changes to co-partitioning both sides by key hash + per-partition
  merge; that variant is intentionally not implemented here — callers with
  two big tables should pre-bucket with `groupby` instead.
- The left side streams: each operator is a single `map_batches` over the
  left Dataset, preserving backpressure; nothing materializes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

# Per-worker-process memo of deserialized broadcast sides, keyed by object
# ref. Arrow tables come out of the object store zero-copy, but pandas
# frames deserialize on ray.get — this guarantees that cost is paid once per
# worker process, not once per batch, regardless of Ray's internal caching.
_BROADCAST_CACHE: dict[str, object] = {}


def _get_broadcast(ref):
    key = ref.hex()
    obj = _BROADCAST_CACHE.get(key)
    if obj is None:
        obj = ray.get(ref)
        if len(_BROADCAST_CACHE) >= 4:  # bound worker heap; 4 sides is plenty
            _BROADCAST_CACHE.clear()
        _BROADCAST_CACHE[key] = obj
    return obj


def broadcast_hash_join(
    left,
    right: pa.Table,
    *,
    keys: str | list[str],
    right_keys: str | list[str] | None = None,
    join_type: str = "inner",
    right_suffix: str = "_r",
):
    """Join a streaming left Dataset against a small in-memory right table.

    The right table is put in the object store ONCE; every batch task gets a
    zero-copy reference and runs a vectorized Arrow hash join
    (`pyarrow.Table.join`) locally — no shuffle, no per-batch reshipping.

    ``join_type``: "inner" or "left outer" (pyarrow's names);
    ``right_keys``: right-side key names when they differ from ``keys``.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    rkey_list = (
        None
        if right_keys is None
        else [right_keys] if isinstance(right_keys, str) else list(right_keys)
    )
    right_ref = ray.put(right)

    def join_batch(batch: pa.Table) -> pa.Table:
        rt = _get_broadcast(right_ref)
        return batch.join(
            rt,
            keys=key_list,
            right_keys=rkey_list,
            join_type=join_type,
            right_suffix=right_suffix,
        )

    return left.map_batches(join_batch, batch_format="pyarrow", zero_copy_batch=True)


def broadcast_range_join(
    left,
    right: pa.Table,
    *,
    value_col: str,
    lo_col: str,
    hi_col: str,
    right_cols: list[str],
):
    """Range (non-equi) join: each left row matches the right interval with
    ``lo <= value < hi``. Inner semantics — unmatched left rows drop.

    Partitioning assumption: the right intervals are NON-OVERLAPPING (each
    value matches at most one). They are sorted by ``lo`` once on the driver
    and broadcast; each left batch resolves its interval with one vectorized
    ``searchsorted`` — no shuffle, no per-row Python.
    """
    import numpy as np

    rdf = right.select([lo_col, hi_col, *right_cols]).to_pandas()
    rdf = rdf.sort_values(lo_col, kind="mergesort").reset_index(drop=True)
    los = rdf[lo_col].to_numpy()
    if (los[1:] < rdf[hi_col].to_numpy()[:-1]).any():
        msg = "broadcast_range_join requires non-overlapping intervals"
        raise ValueError(msg)
    right_ref = ray.put(rdf)

    def join_batch(batch: pa.Table) -> pa.Table:
        rt = _get_broadcast(right_ref)
        values = batch.column(value_col).to_numpy(zero_copy_only=False)
        r_lo = rt[lo_col].to_numpy()
        r_hi = rt[hi_col].to_numpy()
        idx = np.searchsorted(r_lo, values, side="right") - 1
        valid = idx >= 0
        idx_safe = np.where(valid, idx, 0)
        matched = valid & (values < r_hi[idx_safe])
        out = batch.filter(pa.array(matched))
        hit = idx_safe[matched]
        for col in right_cols:
            out = out.append_column(
                col, pa.array(rt[col].to_numpy()[hit])
            )
        return out

    return left.map_batches(join_batch, batch_format="pyarrow", zero_copy_batch=True)


def broadcast_asof_join(
    left,
    right: pa.Table,
    *,
    by: str,
    left_on: str,
    right_on: str,
    value_cols: list[str],
    direction: str = "backward",
):
    """As-of join: for each left row, attach the right row with the same
    ``by`` key whose ``right_on`` is the closest value <= ``left_on``
    (direction="backward"; "forward" for >=). Unmatched left rows get nulls.

    The right side is sorted by (by, right_on) once on the driver and
    broadcast; each left batch sorts itself and runs pandas ``merge_asof``
    (vectorized C merge), then restores input order. Right-side ties on
    (by, right_on) must be resolved by the caller beforehand (e.g. keep the
    max value per key+time) — merge_asof keeps the LAST tied row, which is
    only deterministic if the caller made it so.
    """
    rdf = right.select([by, right_on, *value_cols]).to_pandas()
    rdf = rdf.sort_values([right_on, by], kind="mergesort").reset_index(drop=True)
    right_ref = ray.put(rdf)

    def join_batch(batch: pa.Table) -> pa.Table:
        rt = _get_broadcast(right_ref)
        df = batch.to_pandas()
        order = np.argsort(df[left_on].to_numpy(), kind="stable")
        sorted_df = df.iloc[order].reset_index(drop=True)
        merged = pd.merge_asof(
            sorted_df,
            rt,
            left_on=left_on,
            right_on=right_on,
            left_by=by,
            right_by=by,
            direction=direction,
            suffixes=("", "_r"),
        )
        # restore the batch's input order
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        merged = merged.iloc[inv].reset_index(drop=True)
        return pa.Table.from_pandas(merged, preserve_index=False)

    return left.map_batches(join_batch, batch_format="pyarrow", zero_copy_batch=True)
