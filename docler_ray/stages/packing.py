"""Ordered prefix sums and token-budget sequence packing.

No reference precedent (docler stops at chunking single documents,
src/docler/chunkers/markdown_chunker/chunker.py); packing documents into
fixed-token-budget training sequences is the step AFTER extraction+dedup in
a training-data pipeline, and it needs a distributed ordered prefix sum —
"how many tokens precede this document in corpus order?" — without a global
sort or any corpus-proportional driver state.

Scale plan (the two-phase prefix-sum from the PRAM scan literature, mapped
onto Ray Data):

1. Range-bucket on the MONOTONE order key: ``bucket = (key - min) * B //
   span`` preserves order BETWEEN buckets (every key in bucket i precedes
   every key in bucket i+1), so no global sort is needed — one cheap
   min/max aggregate sizes the buckets, and B scales with measured rows
   (~``_TARGET_ROWS`` per bucket, same policy as dedup._coarse_group_count).
2. Per-bucket value sums: one small groupby -> B rows to the driver ->
   exclusive cumsum gives each bucket's global offset. Driver state is B
   rows, NOT corpus rows.
3. Per-bucket scan: ``groupby(bucket).map_groups`` sorts the ~TARGET_ROWS
   bucket by the key and adds offset + local cumsum. Each task holds one
   bucket — bounded by the target, never corpus-proportional.

The order key must be UNIQUE (ties make "preceding" ambiguous); doc ids
are. Output floats never appear — all int64, so the DuckDB window-SUM
oracle matches bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_PREFIX_BUCKETS = 64  # FLOOR for the range-bucket keyspace
_TARGET_ROWS = 65536  # target rows per bucket (per-task memory bound)


def _bucket_count(n_rows: int | None) -> int:
    if not n_rows or n_rows <= 0:
        return _PREFIX_BUCKETS
    return max(_PREFIX_BUCKETS, 1 + n_rows // _TARGET_ROWS)


def ordered_prefix_sum(
    ds,
    order_col: str,
    value_col: str,
    *,
    n_rows: int | None = None,
    _budget: int | None = None,
):
    """Dataset -> (order_col, value_col, ``cum`` = inclusive prefix sum of
    value_col in order_col order). See the module docstring for the
    three-phase plan; the returned Dataset streams, only the B-row bucket
    table ever touches the driver. ``_budget`` (internal, used by
    ``pack_sequences``) additionally emits ``seq_id = (cum - value) //
    budget`` from inside the scan — Ray skips map UDFs on zero-row blocks,
    so a follow-up map_batches could not preserve the seq_id column for
    empty inputs."""
    from ray.data.aggregate import Max, Min, Sum

    if n_rows is None:
        try:
            n_rows = ds.count()
        except Exception:  # pragma: no cover - count unavailable pre-exec
            n_rows = None
    n_buckets = _bucket_count(n_rows)

    ds = ds.select_columns([order_col, value_col])
    bounds = ds.aggregate(
        Min(order_col, alias_name="lo"), Max(order_col, alias_name="hi")
    )
    if bounds["lo"] is None:  # empty input: emit the output schema, no rows
        import ray.data

        cols = {
            order_col: pa.array([], type=pa.int64()),
            value_col: pa.array([], type=pa.int64()),
            "cum": pa.array([], type=pa.int64()),
        }
        if _budget is not None:
            cols["seq_id"] = pa.array([], type=pa.int64())
        return ray.data.from_arrow(pa.table(cols))
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    span = hi - lo + 1
    if span * n_buckets >= 2**62:  # bucket arithmetic must stay in int64
        raise ValueError("order-key span too large for range bucketing")

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = batch.column(order_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        # order-preserving range bucket: key in bucket i < key in bucket i+1
        b = ((keys - lo) * n_buckets) // span
        return batch.append_column("bucket", pa.array(b, type=pa.int64()))

    bucketed = ds.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )

    # phase 2: B-row bucket sums -> driver -> exclusive cumsum = offsets
    sums = (
        bucketed.groupby("bucket")
        .aggregate(Sum(value_col, alias_name="bucket_sum"))
        .to_pandas()
        .sort_values("bucket")
    )
    bucket_ids = sums["bucket"].to_numpy()
    offsets_arr = np.concatenate(
        ([0], np.cumsum(sums["bucket_sum"].to_numpy())[:-1])
    )
    offsets = dict(zip(bucket_ids.tolist(), offsets_arr.tolist()))

    # phase 3: per-bucket scan (one ~TARGET_ROWS bucket per task)
    def scan(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            out = pd.DataFrame(
                {
                    order_col: pd.Series([], dtype="int64"),
                    value_col: pd.Series([], dtype="int64"),
                    "cum": pd.Series([], dtype="int64"),
                }
            )
            if _budget is not None:
                out["seq_id"] = pd.Series([], dtype="int64")
            return out
        df = df.sort_values(order_col, kind="mergesort")
        base = offsets[int(df["bucket"].iloc[0])]
        vals = df[value_col].to_numpy().astype(np.int64)
        cum = base + np.cumsum(vals)
        out = pd.DataFrame(
            {
                order_col: df[order_col].to_numpy(),
                value_col: df[value_col].to_numpy(),
                "cum": cum,
            }
        )
        if _budget is not None:
            out["seq_id"] = (cum - vals) // _budget
        return out

    return bucketed.groupby("bucket").map_groups(scan, batch_format="pandas")


def pack_sequences(
    ds,
    order_col: str,
    token_col: str,
    *,
    budget: int,
    n_rows: int | None = None,
):
    """Greedy sequential packing: walk documents in order-key order,
    filling training sequences of ``budget`` tokens; a document whose
    tokens straddle a boundary starts in the earlier sequence (the
    streaming-concatenate-then-slice packing used for LM pretraining).
    Equivalently ``seq_id = (prefix_sum_before_this_doc) // budget`` —
    a pure function of the prefix sum, so the whole operator is
    ordered_prefix_sum + one vectorized map and the oracle is a SQL
    window SUM. Adds ``seq_id`` next to (order_col, token_col, cum)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    return ordered_prefix_sum(
        ds, order_col, token_col, n_rows=n_rows, _budget=int(budget)
    )


def ordered_prefix_max(ds, order_col: str, value_col: str, *, n_rows: int | None = None):
    """(order_col, value_col, ``cummax_excl``) — the EXCLUSIVE running max
    of value_col in order_col order (NULL for the first row: no
    predecessor). Same three-phase plan as :func:`ordered_prefix_sum`
    (range-bucket the monotone key, B-row bucket maxima to the driver,
    per-bucket scan) — the streaming-watermark primitive: "the largest
    event time seen BEFORE this arrival".
    """
    from ray.data.aggregate import Max, Min

    if n_rows is None:
        try:
            n_rows = ds.count()
        except Exception:  # pragma: no cover
            n_rows = None
    n_buckets = _bucket_count(n_rows)

    ds = ds.select_columns([order_col, value_col])
    bounds = ds.aggregate(
        Min(order_col, alias_name="lo"), Max(order_col, alias_name="hi")
    )
    if bounds["lo"] is None:
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    order_col: pa.array([], type=pa.int64()),
                    value_col: pa.array([], type=pa.int64()),
                    "cummax_excl": pa.array([], type=pa.int64()),
                }
            )
        )
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    span = hi - lo + 1
    if span * n_buckets >= 2**62:
        raise ValueError("order-key span too large for range bucketing")

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = batch.column(order_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        b = ((keys - lo) * n_buckets) // span
        return batch.append_column("bucket", pa.array(b, type=pa.int64()))

    bucketed = ds.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )

    maxes = (
        bucketed.groupby("bucket")
        .aggregate(Max(value_col, alias_name="bucket_max"))
        .to_pandas()
        .sort_values("bucket")
    )
    _SENTINEL = np.iinfo(np.int64).min
    ids = maxes["bucket"].to_numpy()
    # exclusive cummax across buckets: base of bucket i = max of buckets < i
    cm = np.maximum.accumulate(maxes["bucket_max"].to_numpy().astype(np.int64))
    bases_arr = np.concatenate(([_SENTINEL], cm[:-1]))
    bases = dict(zip(ids.tolist(), bases_arr.tolist()))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    order_col: pd.Series([], dtype="int64"),
                    value_col: pd.Series([], dtype="int64"),
                    "cummax_excl": pd.Series([], dtype="Int64"),
                }
            )
        df = df.sort_values(order_col, kind="mergesort")
        vals = df[value_col].to_numpy(dtype=np.int64)
        incl = np.maximum.accumulate(vals)
        excl = np.concatenate(([_SENTINEL], incl[:-1]))
        base = bases[int(df["bucket"].iloc[0])]
        excl = np.maximum(excl, base)
        return pd.DataFrame(
            {
                order_col: df[order_col].to_numpy(dtype=np.int64),
                value_col: vals,
                # nullable Int64 (NOT a float detour — epoch-us magnitudes
                # are int64-exact but would round beyond 2^53 in float64):
                # NULL where no predecessor exists
                "cummax_excl": pd.array(
                    np.where(excl == _SENTINEL, 0, excl),
                    dtype="Int64",
                ),
            }
        ).assign(
            cummax_excl=lambda d: d["cummax_excl"].mask(
                pd.Series(excl == _SENTINEL, index=d.index)
            )
        )

    return bucketed.groupby("bucket").map_groups(scan, batch_format="pandas")


def span_corruption_plan(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    rate_pct: int = 15,
):
    """T5-style span-corruption accounting (Raffel et al., JMLR'20
    denoising objective): token position i of a doc is masked iff the
    52-bit md5 of "{id}:{i}" lands below rate_pct % — an iid deterministic
    coin both engines replay — and maximal masked RUNS become spans, each
    replaced by one sentinel in the corrupted sequence. Returns per doc
    (id, n_tokens, n_masked, n_spans, corrupted_len = n_tokens - n_masked
    + n_spans): the exact length book-keeping a denoising data loader
    needs to budget batches BEFORE materializing corrupted text.

    Zero shuffle; the per-doc mask is positionally deterministic so the
    SQL twin replays it with a LAG window over the same hashes."""
    import hashlib

    def plan(batch: pa.Table) -> pa.Table:
        from docler_ray.functions.tokens import ws_tokens

        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        nt = np.empty(len(ids), dtype=np.int64)
        nm = np.empty(len(ids), dtype=np.int64)
        nsp = np.empty(len(ids), dtype=np.int64)
        for r, (d, t) in enumerate(zip(ids, texts)):
            n = len(ws_tokens(t or ""))
            nt[r] = n
            if n == 0:
                nm[r] = nsp[r] = 0
                continue
            mask = np.fromiter(
                (
                    int(
                        hashlib.md5(f"{d}:{i}".encode()).hexdigest()[:13], 16
                    ) % 100
                    < rate_pct
                    for i in range(1, n + 1)
                ),
                dtype=bool,
                count=n,
            )
            nm[r] = int(mask.sum())
            # span starts: masked with unmasked (or nothing) before
            starts = mask & ~np.concatenate(([False], mask[:-1]))
            nsp[r] = int(starts.sum())
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pa.array(nt),
                "n_masked": pa.array(nm),
                "n_spans": pa.array(nsp),
                "corrupted_len": pa.array(nt - nm + nsp),
            }
        )

    return ds.map_batches(plan, batch_format="pyarrow", zero_copy_batch=True)
