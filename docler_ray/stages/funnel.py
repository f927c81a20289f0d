"""Ordered funnel analysis: how many users reach each stage of an event
sequence IN ORDER (view -> click -> purchase), the classic product-analytics
conversion query and the event tier's sequential-pattern member (windows
count, sessionize segments, rank/lag orders — this one requires ORDER
ACROSS TYPES within a user).

Semantics (mirrored by the oracle): a user reaches stage 1 at t1 = their
earliest stage-1 event; reaches stage k at the earliest stage-k event
STRICTLY AFTER t_{k-1}. Greedy-earliest is the standard funnel definition
and is optimal (taking the earliest qualifying event never prevents a
later stage from matching).

Scale shape: the event stream filters to the funnel's types map-side (one
column predicate), then ONE user-keyed exchange groups each user's
relevant events; the per-group greedy is a few numpy mins over one user's
events (per-task state = one user's funnel-type events — hot users bound
it, not the corpus), and the output aggregate is stage-count-sized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def funnel_counts(
    ds,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
):
    """events -> (stage, stage_idx, n_users) with n monotonically
    non-increasing down the funnel."""
    from ray.data.aggregate import Sum

    stage_ix = {s: i for i, s in enumerate(stages)}

    def keep_funnel(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(
            batch.column(type_col), value_set=pa.array(list(stages))
        )
        t = batch.filter(mask)
        return pa.table(
            {
                "user": t.column(user_col),
                "stage_i": pa.array(
                    [stage_ix[s] for s in t.column(type_col).to_pylist()],
                    pa.int64(),
                ),
                "ts": t.column(ts_col),
            }
        )

    events = ds.map_batches(
        keep_funnel, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_user(df: pd.DataFrame) -> pa.Table:
        reached = np.zeros(len(stages), dtype=np.int64)
        ts = df["ts"].to_numpy()
        si = df["stage_i"].to_numpy()
        bound = None
        for i in range(len(stages)):
            cand = ts[(si == i)] if bound is None else ts[(si == i) & (ts > bound)]
            if len(cand) == 0:
                break
            bound = cand.min()
            reached[i] = 1
        return pa.table(
            {
                "stage_i": pa.array(
                    np.arange(len(stages), dtype=np.int64), pa.int64()
                ),
                "reached": pa.array(reached, pa.int64()),
            }
        )

    per_stage = (
        events.groupby("user")
        .map_groups(per_user, batch_format="pandas")
        .groupby("stage_i")
        .aggregate(Sum("reached", alias_name="n_users"))
        .to_pandas()  # stage-count-sized by construction
    )
    # reindex over ALL stages so a funnel nobody enters still reports
    # zeros (the oracle's UNION ALL always emits one row per stage)
    counts = dict(
        zip(per_stage.get("stage_i", []), per_stage.get("n_users", []))
    )
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "stage": pa.array(list(stages), pa.string()),
                "stage_idx": pa.array(
                    np.arange(1, len(stages) + 1, dtype=np.int64), pa.int64()
                ),
                "n_users": pa.array(
                    [int(counts.get(i, 0)) for i in range(len(stages))],
                    pa.int64(),
                ),
            }
        )
    )
