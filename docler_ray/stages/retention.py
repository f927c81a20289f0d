"""Retention cohort analysis: the (cohort day, active day, users) triangle
— the standard product-analytics aggregation over an event stream, and a
natural member of the engine's event tier (windows, sessionize, rank/lag).

Definitions (mirrored by the oracle): a user's cohort day is the calendar
day of their FIRST event; the output counts, for every (cohort_day, day)
pair, the distinct users from that cohort active on that day. Days
serialize as 'YYYY-MM-DD' strings so both engines agree on the type.

Scale shape: each batch reduces to its distinct (user, day) pairs
map-side (bounded by users x days seen in the batch, far below event
rows), ONE user-keyed groupby computes the cohort AND the user's distinct
active days in the same exchange (min + distinct-collect inside
map_groups — per-group state is one user's day set, days-bounded), and
the trailing (cohort, day)-keyed groupby is triangle-sized. The event
stream itself never shuffles.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def retention_cohorts(
    ds,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
):
    """events -> (cohort_day, day, n_users) with exact distinct counts."""
    from ray.data.aggregate import Count

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        day = pc.strftime(
            pc.floor_temporal(batch.column(ts_col), unit="day"), format="%Y-%m-%d"
        )
        t = pa.table({"user": batch.column(user_col), "day": day})
        return t.group_by(["user", "day"]).aggregate([])

    pairs = ds.map_batches(
        distinct_pairs, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_user(df: pd.DataFrame) -> pa.Table:
        days = sorted(set(df["day"]))
        cohort = days[0]
        return pa.table(
            {
                "cohort_day": pa.array([cohort] * len(days), pa.string()),
                "day": pa.array(days, pa.string()),
            }
        )

    triangle = pairs.groupby("user").map_groups(per_user, batch_format="pandas")
    return triangle.groupby(["cohort_day", "day"]).aggregate(
        Count(alias_name="n_users")
    )
