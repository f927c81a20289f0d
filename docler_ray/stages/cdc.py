"""Changelog application (CDC upsert/delete merge): fold a base snapshot
and a change stream into the next snapshot with last-writer-wins per key.

The lakehouse MERGE shape every incremental corpus pipeline needs (new
crawl deltas onto the previous crawl's snapshot). The plan is the grouped
top-k (k=1) winner pick: per-batch per-key max-version partials, ONE
key-keyed exchange, final winner per key; delete ops drop the key from the
output. The exchange ships one candidate row per (key, block) — never the
snapshot — and the output streams.
"""

from __future__ import annotations

import pyarrow as pa


def apply_cdc(
    base,
    changes,
    *,
    key_col: str,
    version_col: str,
    op_col: str = "op",
    delete_op: str = "d",
    base_version: int = 0,
    payload_cols: list[str] | None = None,
):
    """Merge ``changes`` (rows carry ``version_col`` > base_version and
    ``op_col`` in {upsert, delete}) onto ``base`` (treated as version
    ``base_version`` upserts). Versions must be unique per key — the
    changelog's own contract; last writer wins, a winning delete removes
    the key. Returns the next snapshot with ``payload_cols`` (defaults to
    every non-key/version/op column of ``base``)."""
    import pyarrow.compute as pc

    from docler_ray.stages.topk import grouped_topk

    if payload_cols is None:
        payload_cols = [
            c
            for c in base.schema().names
            if c not in (key_col, version_col, op_col)
        ]

    def tag_base(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {key_col: batch.column(key_col)}
        cols[version_col] = pa.array([base_version] * n, pa.int64())
        cols[op_col] = pa.array(["u"] * n, pa.string())
        for c in payload_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    def norm_changes(batch: pa.Table) -> pa.Table:
        cols = {
            key_col: batch.column(key_col),
            version_col: batch.column(version_col).cast(pa.int64()),
            op_col: batch.column(op_col),
        }
        for c in payload_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    unioned = base.map_batches(
        tag_base, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        changes.map_batches(norm_changes, batch_format="pyarrow", zero_copy_batch=True)
    )
    winners = grouped_topk(
        unioned,
        group_col=key_col,
        sort_col=version_col,
        k=1,
        keep_cols=[op_col, *payload_cols],
    )

    def finish(batch: pa.Table) -> pa.Table:
        live = batch.filter(pc.not_equal(batch.column(op_col), delete_op))
        return live.select([key_col, *payload_cols])

    return winners.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
