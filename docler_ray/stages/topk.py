"""Global top-k without a global sort.

The reference has no global sort/top-k (SURVEY.md §2.7); at corpus scale a
``Dataset.sort().limit(k)`` is an all-to-all shuffle of every block for k
rows of output. This operator keeps the reduction local: each batch emits
its own top-k (vectorized argpartition-style via pandas nlargest), and only
the tiny (k x num_blocks)-row partial set is merged at the end — no data
beyond the partials ever moves.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def grouped_topk(
    ds,
    *,
    group_col: str,
    sort_col: str,
    k: int,
    keep_cols: list[str] | None = None,
    descending: bool = True,
    tie_col: str | None = None,
):
    """Top-k rows PER GROUP (the SQL ``ROW_NUMBER() OVER (PARTITION BY g
    ORDER BY v) <= k`` pattern) without sorting the corpus: each batch
    emits at most k rows per group it sees (vectorized groupby-head), so
    the shuffle ships <= k x num_blocks rows per group; a groupby +
    map_groups merge keeps only the final k. Returns a Dataset with a
    1-based ``rank`` column; ties break ascending on ``tie_col``.

    Per-task state is bounded by k x (groups per batch) on the map side
    and k x num_blocks rows per group on the reduce side — never the
    corpus. Same scale argument as :func:`topk`, applied per key.
    """
    cols = list(
        dict.fromkeys(
            [group_col, *(keep_cols or []), sort_col]
            + ([tie_col] if tie_col else [])
        )
    )
    by = [sort_col] + ([tie_col] if tie_col else [])
    ascending = [not descending] + ([True] if tie_col else [])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas()
        df = df.sort_values(by, ascending=ascending, kind="mergesort")
        df = df.groupby(group_col, sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(by, ascending=ascending, kind="mergesort").head(k)
        df = df.reset_index(drop=True)
        df["rank"] = df.index.to_numpy() + 1
        return df

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .map_groups(final, batch_format="pandas")
    )


def topk(
    ds,
    *,
    sort_col: str,
    k: int,
    keep_cols: list[str] | None = None,
    descending: bool = True,
    tie_col: str | None = None,
) -> pa.Table:
    """Global top-k rows of ``ds`` by ``sort_col``. Returns an in-memory
    Arrow table of at most k rows (top-k output is driver-sized by
    definition). Ties are broken ascending on ``tie_col`` for a
    deterministic result; pass one whenever ``sort_col`` is not unique.
    """
    cols = list(dict.fromkeys([*(keep_cols or []), sort_col, *( [tie_col] if tie_col else [])]))
    by = [sort_col] + ([tie_col] if tie_col else [])
    ascending = [not descending] + ([True] if tie_col else [])

    def partial_topk(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas()
        df = df.sort_values(by, ascending=ascending, kind="mergesort").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    partials = ds.map_batches(
        partial_topk, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    final = partials.sort_values(by, ascending=ascending, kind="mergesort").head(k)
    return pa.Table.from_pandas(final.reset_index(drop=True), preserve_index=False)
