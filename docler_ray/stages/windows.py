"""Windowed/ordered event operators: tumbling windows and session windows.

No reference precedent (docler's only streaming surface is the progress
generator, dir_converter.py:95-166); these are the event-table operators a
training-data pipeline needs. Both follow the same scale pattern:
pre-aggregate or co-locate with ONE shuffle, vectorized pandas inside.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_SESSION_COARSE = 64  # FLOOR for the session co-location keyspace
_SESSION_TARGET_ROWS = 65536  # target event rows per coarse session group


def _session_group_count(n_rows: int | None) -> int:
    """Coarse-group keyspace for sessionize, sized from a MEASURED event
    count: target ~``_SESSION_TARGET_ROWS`` rows per group, floored at the
    round-2 constant. A fixed 64-group keyspace materialized ~corpus/64
    events in one pandas frame (round-2 VERDICT finding 2); deriving the
    count bounds per-group rows by the TARGET instead. Output is invariant
    to the count — groups only co-locate keys (hash % count), sessions are
    computed per key (pinned by the forced-large-keyspace equality test)."""
    if not n_rows or n_rows <= 0:
        return _SESSION_COARSE
    return max(_SESSION_COARSE, 1 + n_rows // _SESSION_TARGET_ROWS)


def _epoch_seconds(ts: pd.Series) -> np.ndarray:
    """Timestamp column -> int64 epoch seconds, independent of the pandas
    datetime unit (parquet timestamp[us] loads as datetime64[us] on pandas 2,
    while in-memory test frames are datetime64[ns] — a raw astype(int64)
    would differ by 1000x between the two)."""
    return ts.to_numpy().astype("datetime64[s]").astype(np.int64)


def _epoch_seconds_arrow(col) -> np.ndarray:
    """Arrow timestamp column -> int64 epoch seconds (the _epoch_seconds
    contract without the pandas detour)."""
    return col.to_numpy(zero_copy_only=False).astype("datetime64[s]").astype(
        np.int64
    )


def _group_count(tbl: pa.Table, keys: list[str], out: str) -> pa.Table:
    """Arrow group_by count — the map-side partial kernel (round-4: the
    pandas to/from round trip per batch was the window partials' only
    remaining copy; Arrow group_by also keeps NULL keys like SQL)."""
    g = tbl.group_by(keys).aggregate([([], "count_all")])
    cols = {k: g.column(k) for k in keys}
    cols[out] = pc.cast(g.column("count_all"), pa.int64())
    return pa.table(cols)


def tumbling_window_counts(ds, ts_col: str, group_col: str, *, window_secs: int = 3600):
    """Counts per (group, tumbling window): map-side partial combine inside
    map_batches, then a small groupby over the partials (SURVEY.md §4.2)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        epoch = _epoch_seconds_arrow(batch.column(ts_col))
        ws = (epoch // window_secs) * window_secs
        return _group_count(
            pa.table(
                {
                    group_col: batch.column(group_col),
                    "window_start": pa.array(ws, pa.int64()),
                }
            ),
            [group_col, "window_start"],
            "partial_n",
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby([group_col, "window_start"]).aggregate(
        Sum("partial_n", alias_name="n")
    )


def _triple_coarse(
    triples: pa.Table, group_col: str, distinct_col: str, n_groups: int
) -> np.ndarray:
    """Vectorized ``hash(group, window_start, member) % n_groups`` over a
    deduped triple table — the single-int64 co-location key for the
    distinct-aggregate exchange. Strings hash by crc32 computed once per
    DICTIONARY value (group_col is low-cardinality); integers mix through
    odd-constant multiplies; uint64 arithmetic wraps deterministically."""
    import zlib

    if triples.num_rows == 0:
        return np.empty(0, dtype=np.int64)

    def _col_hash(col) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type):
            return col.to_numpy(zero_copy_only=False).astype(np.uint64)
        enc = col.dictionary_encode()
        crcs = np.array(
            [
                zlib.crc32(str(v).encode("utf-8"))
                for v in enc.dictionary.to_pylist()
            ],
            dtype=np.uint64,
        )
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        return crcs[codes]

    gh = _col_hash(triples.column(group_col))
    w = triples.column("window_start").to_numpy(zero_copy_only=False).astype(
        np.uint64
    )
    dh = _col_hash(triples.column(distinct_col))
    h = (
        gh * np.uint64(0x9E3779B97F4A7C15)
        ^ (w + np.uint64(0x01234567)) * np.uint64(1000003)
        ^ dh * np.uint64(0x85EBCA6B)
    )
    return (h % np.uint64(n_groups)).astype(np.int64)


def _window_distinct(
    ds,
    ts_col: str,
    group_col: str,
    distinct_col: str,
    *,
    window_secs: int,
    hop_secs: int,
    n_rows: int | None = None,
):
    """Shared COUNT(DISTINCT x) per (group, window) plan for tumbling
    (hop == window) and hopping (window a multiple of hop) windows.

    Distinct counting cannot be partial-summed like plain counts, so one
    exchange must carry the distinct (group, window, member) triples. The
    round-5 sf1 tier showed Ray's sort-based aggregate pays a pathological
    constant on the multi-column string+int key (the triple-keyed groupby
    was 24.8 s of a 26.5 s query at 1M events, ~3.3 s per 28k-row block in
    AggregateMap), so the exchange is keyed on ONE int64 instead:

    1. map-side, each batch dedups to its unique triples (the only
       corpus-sized pass) and appends ``coarse = hash(triple) % P``;
    2. ``groupby(coarse)`` co-locates with a single-int sort — every
       occurrence of a triple lands in the same bucket, so the in-bucket
       Arrow ``group_by`` dedup is GLOBAL, and per-(group, window) partial
       counts from disjoint buckets sum exactly;
    3. a final Sum over the (group, window)-sized partials.

    P is sized from the measured event count like sessionize
    (~``_SESSION_TARGET_ROWS`` triples per bucket, floored at 64), so no
    bucket materializes more than a bounded slice. sf1 (1M events):
    hopping distinct 16.1 s -> ~2 s; output identical (exact counts)."""
    from ray.data.aggregate import Sum

    if window_secs % hop_secs != 0:
        raise ValueError("window_secs must be a multiple of hop_secs")
    fanout = window_secs // hop_secs
    if n_rows is None:
        # count() is free on raw reads (parquet metadata); pass n_rows
        # when ds is a lazy transform chain to avoid an extra execution
        try:
            n_rows = ds.count()
        except Exception:  # pragma: no cover - count unavailable pre-exec
            n_rows = None
    n_groups = _session_group_count((n_rows * fanout) if n_rows else None)

    def partial_distinct(batch: pa.Table) -> pa.Table:
        epoch = _epoch_seconds_arrow(batch.column(ts_col))
        w0 = (epoch // hop_secs) * hop_secs
        parts = [
            pa.table(
                {
                    group_col: batch.column(group_col),
                    "window_start": pa.array(w0 - k * hop_secs, pa.int64()),
                    distinct_col: batch.column(distinct_col),
                }
            )
            for k in range(fanout)
        ]
        triples = (
            pa.concat_tables(parts)
            .group_by([group_col, "window_start", distinct_col])
            .aggregate([])
        )
        coarse = _triple_coarse(triples, group_col, distinct_col, n_groups)
        return triples.append_column("coarse", pa.array(coarse, pa.int64()))

    def count_bucket(batch: pa.Table) -> pa.Table:
        dedup = (
            batch.select([group_col, "window_start", distinct_col])
            .group_by([group_col, "window_start", distinct_col])
            .aggregate([])
        )
        return _group_count(
            dedup.select([group_col, "window_start"]),
            [group_col, "window_start"],
            "partial_n",
        )

    partials = (
        ds.map_batches(partial_distinct, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(count_bucket, batch_format="pyarrow")
    )
    return partials.groupby([group_col, "window_start"]).aggregate(
        Sum("partial_n", alias_name="n_distinct")
    )


def tumbling_window_distinct(
    ds,
    ts_col: str,
    group_col: str,
    distinct_col: str,
    *,
    window_secs: int = 3600,
    n_rows: int | None = None,
):
    """COUNT(DISTINCT x) per (group, tumbling window) — the shared
    single-int64-key distinct plan with hop == window (no fan-out)."""
    return _window_distinct(
        ds,
        ts_col,
        group_col,
        distinct_col,
        window_secs=window_secs,
        hop_secs=window_secs,
        n_rows=n_rows,
    )


def hopping_window_distinct(
    ds,
    ts_col: str,
    group_col: str,
    distinct_col: str,
    *,
    window_secs: int = 7200,
    hop_secs: int = 3600,
    n_rows: int | None = None,
):
    """COUNT(DISTINCT x) per (group, hopping window): each event fans out
    to its window_secs/hop_secs covering windows map-side (bounded
    fan-out, like hopping_window_counts), then the shared
    single-int64-key distinct plan applies."""
    return _window_distinct(
        ds,
        ts_col,
        group_col,
        distinct_col,
        window_secs=window_secs,
        hop_secs=hop_secs,
        n_rows=n_rows,
    )


def hopping_window_counts(
    ds,
    ts_col: str,
    group_col: str,
    *,
    window_secs: int = 7200,
    hop_secs: int = 3600,
):
    """Counts per (group, HOPPING window): windows of ``window_secs`` start
    every ``hop_secs``, so each event lands in window_secs/hop_secs
    overlapping windows. Map-side: one vectorized pass per hop offset emits
    the event's window memberships pre-aggregated; the shuffle ships only
    (group, window_start, partial_n) — the tumbling-window scale pattern
    with a fixed small fan-out factor.
    """
    if window_secs % hop_secs:
        msg = "window_secs must be a multiple of hop_secs"
        raise ValueError(msg)
    fanout = window_secs // hop_secs
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        epoch = _epoch_seconds_arrow(batch.column(ts_col))
        base = (epoch // hop_secs) * hop_secs
        parts = [
            pa.table(
                {
                    group_col: batch.column(group_col),
                    "window_start": pa.array(base - i * hop_secs, pa.int64()),
                }
            )
            for i in range(fanout)
        ]
        return _group_count(
            pa.concat_tables(parts), [group_col, "window_start"], "partial_n"
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby([group_col, "window_start"]).aggregate(
        Sum("partial_n", alias_name="n")
    )


def _make_add_coarse(key_col: str, n_groups: int):
    """Batch fn appending ``coarse = hash(key) % n_groups`` — the shared
    co-location key for per-key ordered operators (sessionize, rank/lag).
    Integer keys mix through a prime multiply; other keys crc32.

    Cardinality guard (round-3 verdict): ``hash(key) % n_groups`` has at
    most |distinct keys| images, so a low-cardinality key silently voids
    the ~TARGET-rows-per-group bound (a whole key's rows land in one
    pandas group — the old perplexity_tiers scale bug). A coarse keyspace
    only bounds group sizes for keys with cardinality >> n_groups; when a
    large batch shows almost no coarse diversity, warn once per key."""

    def add_coarse(batch: pa.Table) -> pa.Table:
        col = batch.column(key_col)
        if pa.types.is_integer(col.type):
            keys = col.to_numpy().astype(np.uint64)
            coarse = ((keys * np.uint64(1000003)) % np.uint64(n_groups)).astype(
                np.int64
            )
        else:
            # string / other keys: crc32 into the same coarse bucket space
            import zlib

            coarse = np.array(
                [
                    zlib.crc32(str(k).encode("utf-8")) % n_groups
                    for k in col.to_pylist()
                ],
                dtype=np.int64,
            )
        if (
            len(coarse) >= 4096
            and n_groups >= 64
            and key_col not in _COARSE_WARNED
            and np.unique(coarse[:4096]).size <= 4
        ):
            import warnings

            _COARSE_WARNED.add(key_col)
            warnings.warn(
                f"coarse key {key_col!r} shows <=4 distinct coarse values in "
                f"a {len(coarse)}-row batch with n_groups={n_groups}: the key "
                "cardinality is likely too low for the per-group row bound to "
                "hold — one group may receive ~all rows of a key. Use a "
                "distributed-rank plan (lm.perplexity_tiers) instead.",
                RuntimeWarning,
            )
        return batch.append_column("coarse", pa.array(coarse))

    return add_coarse


# one-shot warning memo (per process) for the low-cardinality coarse guard
_COARSE_WARNED: set[str] = set()


def per_key_rank_lag(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    *,
    n_rows: int | None = None,
):
    """Per-key ordered analytics: ROW_NUMBER and LAG-delta without a global
    sort — ``seq`` = 1-based rank of each row within its key (ordered by
    ``(ts, id)``), ``gap_usecs`` = microseconds since the key's previous row
    (float64, NaN on each key's first row — exact below 2**53 us, and the
    same NULL representation DuckDB's BIGINT-with-NULL lands on in pandas,
    so the two sides compare without dtype ambiguity). The
    SQL-window-function family
    (ROW_NUMBER / LAG OVER (PARTITION BY ... ORDER BY ...)) as a Ray
    composition: same coarse co-location shuffle as :func:`sessionize`
    (keyspace sized from the measured row count, per-group rows bounded by
    the target constant), fully vectorized sort + cumcount + diff inside
    each coarse group. Microsecond integer arithmetic keeps the output
    exactly SQL-mirrorable (``epoch_us`` on the oracle side).
    """
    if n_rows is None:
        try:
            n_rows = ds.count()
        except Exception:  # pragma: no cover - count unavailable pre-exec
            n_rows = None
    add_coarse = _make_add_coarse(key_col, _session_group_count(n_rows))

    def rank_lag(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    key_col: pd.Series([], dtype="int64"),
                    "seq": pd.Series([], dtype="int64"),
                    "gap_usecs": pd.Series([], dtype="float64"),
                }
            )
        ep = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = df.assign(_ep=ep).sort_values(
            [key_col, "_ep", id_col], kind="mergesort"
        )
        key = df[key_col].to_numpy()
        ep = df["_ep"].to_numpy()
        first = np.empty(len(df), dtype=bool)
        first[0:1] = True
        first[1:] = key[1:] != key[:-1]
        seq = (
            df.groupby(key_col, sort=False).cumcount().to_numpy() + 1
        ).astype(np.int64)
        gap = np.empty(len(df), dtype=np.float64)
        gap[0:1] = np.nan
        gap[1:] = (ep[1:] - ep[:-1]).astype(np.float64)
        gap[first] = np.nan
        gap_col = gap
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                key_col: key,
                "seq": seq,
                "gap_usecs": gap_col,
            }
        )

    return (
        ds.select_columns([id_col, key_col, ts_col])
        .map_batches(add_coarse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(rank_lag, batch_format="pandas")
    )


def sessionize(
    ds, key_col: str, ts_col: str, *, gap_secs: int = 1800, n_rows: int | None = None
):
    """Session windows: events of one key separated by more than ``gap_secs``
    start a new session. Returns one row per (key, session_idx) with
    ``n_events``, ``session_start`` and ``session_end`` (epoch seconds).

    This is per-key ORDERED processing, which Ray Data has no primitive for;
    the composition is: co-locate each key's rows with one groupby over a
    COARSE key (hash(key) % N — one shuffle of (key, ts) pairs, not one
    Ray-level group per key), then assign sessions inside each coarse group
    with a fully vectorized sort + gap-cumsum. The keyspace N is sized from
    the measured row count (``_session_group_count`` — bounded rows per
    group at any corpus size); pass ``n_rows`` when known (parquet metadata
    count is free), else ``ds.count()`` measures it. A single key hotter
    than the target group size still bounds below at one group per key —
    the inherent skew floor of per-key ordered semantics.
    """
    if n_rows is None:
        try:
            n_rows = ds.count()
        except Exception:  # pragma: no cover - count unavailable pre-exec
            n_rows = None
    n_groups = _session_group_count(n_rows)
    add_coarse = _make_add_coarse(key_col, n_groups)

    def assign_sessions(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype=df[key_col].dtype if key_col in df else "int64"),
                    "session_idx": pd.Series([], dtype="int64"),
                    "n_events": pd.Series([], dtype="int64"),
                    "session_start": pd.Series([], dtype="int64"),
                    "session_end": pd.Series([], dtype="int64"),
                }
            )
        df = df.assign(_epoch=_epoch_seconds(df[ts_col]))
        df = df.sort_values([key_col, "_epoch"], kind="mergesort")
        key = df[key_col].to_numpy()
        ep = df["_epoch"].to_numpy()
        new_key = np.empty(len(df), dtype=bool)
        new_key[0:1] = True
        new_key[1:] = key[1:] != key[:-1]
        gap = np.empty(len(df), dtype=bool)
        gap[0:1] = True
        gap[1:] = (ep[1:] - ep[:-1]) > gap_secs
        boundary = new_key | gap
        session_global = np.cumsum(boundary) - 1  # contiguous session labels
        out = pd.DataFrame(
            {key_col: key, "_sid": session_global, "_epoch": ep}
        )
        g = out.groupby("_sid", sort=True)
        agg = g.agg(
            **{
                key_col: (key_col, "first"),
                "n_events": ("_epoch", "size"),
                "session_start": ("_epoch", "min"),
                "session_end": ("_epoch", "max"),
            }
        ).reset_index(drop=True)
        # session_idx: 0-based per key, sessions ordered by start time
        agg["session_idx"] = agg.groupby(key_col, sort=False).cumcount().astype("int64")
        agg["n_events"] = agg["n_events"].astype("int64")
        return agg[[key_col, "session_idx", "n_events", "session_start", "session_end"]]

    return (
        ds.select_columns([key_col, ts_col])
        .map_batches(add_coarse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(assign_sessions, batch_format="pandas")
    )


def per_key_rolling_sum(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    *,
    window_rows: int = 3,
    n_rows: int | None = None,
):
    """Per-key ROWS-frame rolling aggregate — SQL's
    ``SUM(x) OVER (PARTITION BY key ORDER BY ts, id
    ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW)`` as a Ray composition:
    one coarse co-location shuffle (keyspace sized from the measured row
    count like :func:`sessionize`), then a fully vectorized prefix-sum pass
    per coarse group (sort + segment-aware ``cs[i] - cs[max(seg, i-w+1)-1]``
    — no per-row Python, no pandas ``rolling``).

    The value is fixed-pointed to integer cents with ``floor(v*100 + 0.5)``
    BEFORE summation: integer arithmetic makes the result independent of
    addition order, so the DuckDB oracle (whose windowed SUM uses a segment
    tree with a different reduction order) matches bit-for-bit — a float
    rolling sum would be correct but unpinnable. Emits ``seq`` (ROW_NUMBER),
    ``roll_sum_cents`` and ``n_in_window`` per row.
    """
    if n_rows is None:
        try:
            n_rows = ds.count()
        except Exception:  # pragma: no cover - count unavailable pre-exec
            n_rows = None
    add_coarse = _make_add_coarse(key_col, _session_group_count(n_rows))
    w = int(window_rows)
    if w < 1:
        raise ValueError("window_rows must be >= 1")

    def rolling(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    key_col: pd.Series([], dtype="int64"),
                    "seq": pd.Series([], dtype="int64"),
                    "roll_sum_cents": pd.Series([], dtype="int64"),
                    "n_in_window": pd.Series([], dtype="int64"),
                }
            )
        ep = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        vals = df[value_col].to_numpy().astype(np.float64)
        cents = np.floor(vals * 100.0 + 0.5).astype(np.int64)
        df = df.assign(_ep=ep, _cents=cents).sort_values(
            [key_col, "_ep", id_col], kind="mergesort"
        )
        n = len(df)
        key = df[key_col].to_numpy()
        first = np.empty(n, dtype=bool)
        first[0:1] = True
        first[1:] = key[1:] != key[:-1]
        seg_start = np.maximum.accumulate(
            np.where(first, np.arange(n), 0)
        )
        j = np.maximum(seg_start, np.arange(n) - w + 1)
        p = np.concatenate([[0], np.cumsum(df["_cents"].to_numpy())])
        roll = p[np.arange(n) + 1] - p[j]
        seq = (
            df.groupby(key_col, sort=False).cumcount().to_numpy() + 1
        ).astype(np.int64)
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                key_col: key,
                "seq": seq,
                "roll_sum_cents": roll.astype(np.int64),
                "n_in_window": (np.arange(n) - j + 1).astype(np.int64),
            }
        )

    return (
        ds.select_columns([id_col, key_col, ts_col, value_col])
        .map_batches(add_coarse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(rolling, batch_format="pandas")
    )


def per_key_interarrival_stats(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    *,
    n_rows: int | None = None,
):
    """Per-key inter-arrival gap statistics — SQL's
    ``ep - LAG(ep) OVER (PARTITION BY key ORDER BY ep, id)`` folded to one
    row per key: (n_events, n_gaps, sum/max gap in integer microseconds,
    avg = ONE int->double cast pair + divide). Keys with no gap (a single
    event) are dropped, the oracle's ``HAVING COUNT(gap) >= 1``.

    Plan: the sessionize coarse co-location (one hash(key)%P exchange,
    keyspace sized from the measured row count), then a fully vectorized
    in-bucket pass — mergesort by (key, ep, id), adjacent diffs masked to
    same-key pairs, one pandas groupby agg. Gap values depend only on
    each key's sorted epoch sequence (ties give gap 0 either order), so
    the integer outputs are deterministic and the avg's single IEEE
    divide hash-matches the oracle.
    """
    if n_rows is None:
        try:
            n_rows = ds.count()
        except Exception:  # pragma: no cover - count unavailable pre-exec
            n_rows = None
    add_coarse = _make_add_coarse(key_col, _session_group_count(n_rows))

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                key_col: pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "n_gaps": pd.Series([], dtype="int64"),
                "sum_gap_us": pd.Series([], dtype="int64"),
                "max_gap_us": pd.Series([], dtype="int64"),
                "avg_gap_us": pd.Series([], dtype="float64"),
            }
        )
        if df.empty:
            return empty
        ep = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = df.assign(_ep=ep).sort_values(
            [key_col, "_ep", id_col], kind="mergesort"
        )
        key = df[key_col].to_numpy()
        ep = df["_ep"].to_numpy()
        n_events = (
            pd.Series(1, index=df.index).groupby(key, sort=False).size()
        )
        same = key[1:] == key[:-1]
        if not same.any():
            return empty
        gap = (ep[1:] - ep[:-1])[same]
        gkey = key[1:][same]
        g = (
            pd.DataFrame({key_col: gkey, "gap": gap})
            .groupby(key_col, sort=False)
            .agg(
                n_gaps=("gap", "size"),
                sum_gap_us=("gap", "sum"),
                max_gap_us=("gap", "max"),
            )
        )
        g["n_events"] = n_events.reindex(g.index).astype(np.int64)
        g["avg_gap_us"] = g["sum_gap_us"].to_numpy().astype(
            np.float64
        ) / g["n_gaps"].to_numpy().astype(np.float64)
        out = g.reset_index()
        return out[
            [key_col, "n_events", "n_gaps", "sum_gap_us", "max_gap_us", "avg_gap_us"]
        ]

    return (
        ds.select_columns([id_col, key_col, ts_col])
        .map_batches(add_coarse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(gaps, batch_format="pandas")
    )


def per_key_percent_rank(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    *,
    n_rows: int | None = None,
):
    """Per-key PERCENT_RANK — SQL's ``PERCENT_RANK() OVER (PARTITION BY
    key ORDER BY ep, id)``: (rank-1)/(n-1) with rank == ROW_NUMBER here
    because the (ep, id) order is tie-free; single-row keys get 0.0 (the
    SQL definition). Same plan as the rank/lag family: one coarse
    co-location exchange, vectorized in-bucket sort + cumcount + group
    size; the value is ONE divide of exact ints, so it hash-matches the
    oracle bit-for-bit.
    """
    if n_rows is None:
        try:
            n_rows = ds.count()
        except Exception:  # pragma: no cover - count unavailable pre-exec
            n_rows = None
    add_coarse = _make_add_coarse(key_col, _session_group_count(n_rows))

    def prank(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    key_col: pd.Series([], dtype="int64"),
                    "pct_rank": pd.Series([], dtype="float64"),
                }
            )
        ep = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = df.assign(_ep=ep).sort_values(
            [key_col, "_ep", id_col], kind="mergesort"
        )
        g = df.groupby(key_col, sort=False)
        rank0 = g.cumcount().to_numpy().astype(np.float64)
        n = g[id_col].transform("size").to_numpy().astype(np.int64)
        pr = np.where(n > 1, rank0 / (n - 1).astype(np.float64), 0.0)
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                key_col: df[key_col].to_numpy(),
                "pct_rank": pr,
            }
        )

    return (
        ds.select_columns([id_col, key_col, ts_col])
        .map_batches(add_coarse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(prank, batch_format="pandas")
    )


def per_key_ntile(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    *,
    buckets: int = 4,
    n_rows: int | None = None,
):
    """The rank-statistics window family — NTILE(b), PERCENT_RANK and
    CUME_DIST OVER (PARTITION BY key ORDER BY ts, id) — as one Ray
    composition on the shared coarse co-location shuffle. All three are
    pure functions of (seq, group size), so the per-group pass is a sort +
    cumcount + vectorized arithmetic; the float columns are single IEEE
    divisions ((seq-1)/(n-1), seq/n), so DuckDB's window functions produce
    bit-identical doubles and the oracle is exact.

    NTILE uses the SQL standard fill: with n = group rows, q = n // b,
    r = n % b, the first r buckets take q+1 rows each (0-based row i maps
    to ``i // (q+1)`` if ``i < r*(q+1)`` else ``r + (i - r*(q+1)) // q``).
    """
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    if n_rows is None:
        try:
            n_rows = ds.count()
        except Exception:  # pragma: no cover - count unavailable pre-exec
            n_rows = None
    add_coarse = _make_add_coarse(key_col, _session_group_count(n_rows))
    b = int(buckets)

    def rank_stats(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    key_col: pd.Series([], dtype="int64"),
                    "seq": pd.Series([], dtype="int64"),
                    "ntile": pd.Series([], dtype="int64"),
                    "percent_rank": pd.Series([], dtype="float64"),
                    "cume_dist": pd.Series([], dtype="float64"),
                }
            )
        ep = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = df.assign(_ep=ep).sort_values(
            [key_col, "_ep", id_col], kind="mergesort"
        )
        g = df.groupby(key_col, sort=False)
        i0 = g.cumcount().to_numpy().astype(np.int64)  # 0-based rank
        n = g[key_col].transform("size").to_numpy().astype(np.int64)
        q, r = n // b, n % b
        split = r * (q + 1)
        # q can be 0 when n < b (then r = n and every row sits before split)
        ntile = np.where(
            i0 < split, i0 // np.maximum(q + 1, 1), r + (i0 - split) // np.maximum(q, 1)
        ) + 1
        percent_rank = np.where(n > 1, i0 / np.maximum(n - 1, 1), 0.0)
        cume_dist = (i0 + 1) / n
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                key_col: df[key_col].to_numpy(),
                "seq": i0 + 1,
                "ntile": ntile.astype(np.int64),
                "percent_rank": percent_rank.astype(np.float64),
                "cume_dist": cume_dist.astype(np.float64),
            }
        )

    return (
        ds.select_columns([id_col, key_col, ts_col])
        .map_batches(add_coarse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(rank_stats, batch_format="pandas")
    )


def resample_ffill(
    ds,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    step_secs: int,
    n_rows: int | None = None,
):
    """Per-key regular-grid resampling with forward fill: one output row
    per (key, slot) on the key's own [min_slot, max_slot] grid at
    ``step_secs``; slot value = MAX(value) within the slot, forward-filled
    from the latest populated slot (gap-filling a sparse sensor/event
    stream into model-ready regular series). MAX is the in-slot aggregate
    so both engines agree without observation-order tie rules; the fill is
    pure selection — no float arithmetic, doubles pass through bit-intact.

    Plan: per-batch Arrow (key, slot, max) partials, then ONE coarse-key
    exchange (hash(key) % N groups — the sessionize co-location shape) and
    a vectorized per-key grid walk (np.searchsorted over the observed
    slots). Output size is sum over keys of span/step — the operator's
    inherent output, not a blowup; per-task memory is bounded by the
    coarse group target plus its grid.
    """
    if n_rows is None:
        try:
            n_rows = ds.count()
        except Exception:  # pragma: no cover - count unavailable pre-exec
            n_rows = None
    n_groups = _session_group_count(n_rows)

    def partial(batch: pa.Table) -> pa.Table:
        ep = _epoch_seconds_arrow(batch.column(ts_col))
        slot = (ep // step_secs) * step_secs
        t = pa.table(
            {
                key_col: batch.column(key_col),
                "slot": pa.array(slot, pa.int64()),
                "v": batch.column(value_col),
            }
        )
        g = t.group_by([key_col, "slot"]).aggregate([("v", "max")])
        return g.rename_columns([key_col, "slot", "v"])

    add_coarse = _make_add_coarse(key_col, n_groups)

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype="int64"),
                    "slot": pd.Series([], dtype="int64"),
                    "value": pd.Series([], dtype="float64"),
                }
            )
        # combine partial maxima across blocks, then walk each key's grid
        g = (
            df.groupby([key_col, "slot"], sort=True)["v"].max().reset_index()
        )
        keys_out: list[np.ndarray] = []
        slots_out: list[np.ndarray] = []
        vals_out: list[np.ndarray] = []
        for k, kdf in g.groupby(key_col, sort=False):
            obs_slots = kdf["slot"].to_numpy()
            obs_vals = kdf["v"].to_numpy()
            grid = np.arange(obs_slots[0], obs_slots[-1] + 1, step_secs)
            idx = np.searchsorted(obs_slots, grid, side="right") - 1
            keys_out.append(np.full(len(grid), k))
            slots_out.append(grid)
            vals_out.append(obs_vals[idx])
        return pd.DataFrame(
            {
                key_col: np.concatenate(keys_out),
                "slot": np.concatenate(slots_out),
                "value": np.concatenate(vals_out),
            }
        )

    return (
        ds.select_columns([key_col, ts_col, value_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_coarse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(fill, batch_format="pandas")
    )


def peak_concurrency(intervals, *, start_col: str, end_col: str, n_rows=None):
    """Global peak concurrency over closed integer intervals [start, end]:
    one row (peak, peak_time) where peak is the maximum number of
    simultaneously active intervals and peak_time the EARLIEST boundary
    reaching it.

    The sweep-line plan, fully distributed: map-side (+1 at start, -1 at
    end+1) delta partials -> ONE time-keyed exchange collapses deltas per
    distinct boundary -> packing.ordered_prefix_sum scans the running sum
    (range-bucket offsets, B-row driver state, no global sort) -> per-block
    (max cum, min t at max) partials fold on the driver (<= num_blocks
    rows). Ties in cum resolve to the smallest t exactly like the SQL
    window twin.
    """
    import ray.data
    from ray.data.aggregate import Sum

    from docler_ray.stages.packing import ordered_prefix_sum

    def deltas(batch: pa.Table) -> pa.Table:
        s = batch.column(start_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        e = batch.column(end_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = np.concatenate([s, e + 1])
        d = np.concatenate(
            [np.ones(len(s), dtype=np.int64), -np.ones(len(e), dtype=np.int64)]
        )
        tbl = pa.table({"t": pa.array(t), "d": pa.array(d)})
        g = tbl.group_by("t").aggregate([("d", "sum")])
        return g.rename_columns(["t", "d"])

    # Materialize the collapsed deltas: ordered_prefix_sum makes four
    # passes (count, bounds, bucket sums, scan) and would re-execute the
    # whole upstream lineage each time. The materialized table is one row
    # per DISTINCT boundary time — the exchange's own output, already in
    # the object store.
    collapsed = (
        intervals.select_columns([start_col, end_col])
        .map_batches(deltas, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("t")
        .aggregate(Sum("d", alias_name="delta"))
        .materialize()
    )
    ps = ordered_prefix_sum(collapsed, "t", "delta", n_rows=collapsed.count())

    def local_peak(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {"mx": pa.array([], pa.int64()), "tmin": pa.array([], pa.int64())}
            )
        cum = batch.column("cum").to_numpy(zero_copy_only=False)
        t = batch.column("t").to_numpy(zero_copy_only=False)
        mx = int(cum.max())
        tmin = int(t[cum == mx].min())
        return pa.table(
            {"mx": pa.array([mx], pa.int64()), "tmin": pa.array([tmin], pa.int64())}
        )

    parts = ps.map_batches(
        local_peak, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    if not parts:
        return ray.data.from_arrow(
            pa.table(
                {
                    "peak": pa.array([0], pa.int64()),
                    "peak_time": pa.array([None], pa.int64()),
                }
            )
        )
    peak = max(p["mx"] for p in parts)
    peak_time = min(p["tmin"] for p in parts if p["mx"] == peak)
    return ray.data.from_arrow(
        pa.table(
            {
                "peak": pa.array([peak], pa.int64()),
                "peak_time": pa.array([peak_time], pa.int64()),
            }
        )
    )


def detect_bursts(
    ds,
    ts_col: str,
    group_col: str,
    *,
    window_secs: int = 3600,
    trail_windows: int = 24,
    factor_num: int = 3,
    factor_den: int = 1,
):
    """Per-key burst flags over tumbling windows: a window bursts when its
    count exceeds ``factor`` x its trailing-average, tested by EXACT
    integer cross-multiply (n * trail_windows * factor_den > factor_num *
    trail_sum, trail_sum > 0) — no float thresholds to drift from the SQL
    twin. The trailing frame is value-RANGE based ([w - trail_windows*W,
    w - W]) so absent (zero-count) windows weigh in for free.

    Plan: tumbling count partials (map-side combine), ONE (key, window)
    exchange, then a key-keyed regroup whose per-key state is its window
    COUNT series (windows/key, not rows/key) walked with one cumsum + two
    searchsorteds. Keys are dimension-sized (event types, hosts); a
    high-cardinality key would swap the regroup for the coarse-key shape.
    """
    counts = tumbling_window_counts(
        ds, ts_col, group_col, window_secs=window_secs
    )
    span = trail_windows * window_secs

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    group_col: pd.Series([], dtype="object"),
                    "window_start": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                    "trail": pd.Series([], dtype="int64"),
                    "is_burst": pd.Series([], dtype="bool"),
                }
            )
        out = []
        for key, kdf in df.groupby(group_col, sort=False):
            kdf = kdf.sort_values("window_start", kind="mergesort")
            w = kdf["window_start"].to_numpy()
            n = kdf["n"].to_numpy().astype(np.int64)
            cum = np.concatenate([[0], np.cumsum(n)])
            lo = np.searchsorted(w, w - span, side="left")
            hi = np.searchsorted(w, w - window_secs, side="right")
            trail = cum[hi] - cum[lo]
            burst = (n * trail_windows * factor_den > factor_num * trail) & (
                trail > 0
            )
            out.append(
                pd.DataFrame(
                    {
                        group_col: key,
                        "window_start": w,
                        "n": n,
                        "trail": trail,
                        "is_burst": burst,
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    return counts.groupby(group_col).map_groups(flag, batch_format="pandas")


def band_pair_counts(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    *,
    band_secs: int,
    n_rows: int | None = None,
):
    """Temporal band SELF-join counts: per key, the number of event pairs
    (i, j) with (ep_i, id_i) < (ep_j, id_j) and ep_j - ep_i <= band_secs.

    The band-join bucketing plan: each event replicates into its
    ``ep // band`` bucket AND the next one, so every qualifying pair
    co-locates in the LATER event's native bucket; one (key, bucket)
    coarse exchange ships the 2x-replicated (key, ep, id) triples, and a
    sorted searchsorted count per bucket tallies each pair exactly once
    (j native to one bucket; predecessors within the band counted by
    position). No corpus-sized pair list ever materializes — the output
    is key-cardinality."""
    from ray.data.aggregate import Sum

    if n_rows is None:
        try:
            n_rows = ds.count()
        except Exception:  # pragma: no cover - count unavailable pre-exec
            n_rows = None
    n_groups = _session_group_count((n_rows or 0) * 2 or None)

    def replicate(batch: pa.Table) -> pa.Table:
        ep = _epoch_seconds_arrow(batch.column(ts_col))
        b = ep // band_secs
        key = batch.column(key_col)
        ids = batch.column(id_col)
        native = pa.table(
            {
                key_col: key,
                "bucket": pa.array(b, pa.int64()),
                "ep": pa.array(ep, pa.int64()),
                id_col: ids,
                "native": pa.array(np.ones(len(ep), dtype=np.bool_)),
            }
        )
        replica = pa.table(
            {
                key_col: key,
                "bucket": pa.array(b + 1, pa.int64()),
                "ep": pa.array(ep, pa.int64()),
                id_col: ids,
                "native": pa.array(np.zeros(len(ep), dtype=np.bool_)),
            }
        )
        both = pa.concat_tables([native, replica])
        kh = _col_hash_generic(both.column(key_col))
        bh = both.column("bucket").to_numpy(zero_copy_only=False).astype(np.uint64)
        coarse = (
            (kh * np.uint64(0x9E3779B97F4A7C15) ^ bh * np.uint64(1000003))
            % np.uint64(n_groups)
        ).astype(np.int64)
        return both.append_column("coarse", pa.array(coarse))

    def count_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """Fully vectorized across every (key, bucket) segment in the
        coarse group: segments map onto disjoint shifted-epoch ranges
        (each segment's epochs span < 2*band, segments sit 4*band apart),
        so ONE global searchsorted gives each row its in-band window
        start without a per-segment Python loop."""
        if df.empty:
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype="int64"),
                    "pn": pd.Series([], dtype="int64"),
                }
            )
        df = df.sort_values([key_col, "bucket", "ep", id_col], kind="mergesort")
        key_codes, key_uniques = pd.factorize(df[key_col], sort=False)
        bucket = df["bucket"].to_numpy()
        ep = df["ep"].to_numpy()
        seg_change = np.empty(len(df), dtype=bool)
        seg_change[0:1] = True
        seg_change[1:] = (key_codes[1:] != key_codes[:-1]) | (
            bucket[1:] != bucket[:-1]
        )
        seg_id = np.cumsum(seg_change) - 1
        local = ep - bucket * band_secs + band_secs  # in [0, 2*band)
        shifted = seg_id * (4 * band_secs) + local
        pos = np.arange(len(df), dtype=np.int64)
        lo = np.searchsorted(shifted, shifted - band_secs, side="left")
        native = df["native"].to_numpy()
        per_row = np.where(native, pos - lo, 0)
        sums = np.bincount(key_codes, weights=per_row).astype(np.int64)
        keep = sums > 0
        return pd.DataFrame(
            {key_col: np.asarray(key_uniques)[keep], "pn": sums[keep]}
        )

    return (
        ds.select_columns([key_col, ts_col, id_col])
        .map_batches(replicate, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(count_pairs, batch_format="pandas")
        .groupby(key_col)
        .aggregate(Sum("pn", alias_name="n_pairs"))
    )


def _col_hash_generic(col) -> np.ndarray:
    """uint64 hash of an Arrow column (integers pass through; strings crc32
    per dictionary value — the _triple_coarse kernel, shared)."""
    import zlib

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        return col.to_numpy(zero_copy_only=False).astype(np.uint64)
    enc = col.dictionary_encode()
    crcs = np.array(
        [zlib.crc32(str(v).encode("utf-8")) for v in enc.dictionary.to_pylist()],
        dtype=np.uint64,
    )
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return crcs[codes]


def late_event_flags(ds, *, order_col: str, ts_col: str, lateness_us: int):
    """Event-time watermark late-data detection (the Dataflow model,
    Akidau et al. VLDB'15, under BATCH replay semantics): arrivals in
    ``order_col`` order carry event times ``ts_col`` (int64 micros); the
    watermark BEFORE an arrival is the exclusive running max of event time
    minus the allowed lateness, and an event is LATE iff its event time
    sits below that watermark — exactly the rows a streaming engine would
    drop or side-output.

    Plan: one :func:`packing.ordered_prefix_max` (range-bucketed scan —
    no global sort, driver holds B bucket maxima) plus a stateless flag
    map. Returns (order_col, ts_us, wm_excl_us [NULL for the first
    arrival], late).
    """
    import pyarrow.compute as pc

    from docler_ray.stages.packing import ordered_prefix_max

    pm = ordered_prefix_max(ds, order_col, ts_col)

    def flag(batch: pa.Table) -> pa.Table:
        wm = batch.column("cummax_excl")
        ts = batch.column(ts_col)
        late = pc.fill_null(
            pc.greater(pc.subtract(wm, lateness_us), ts), False
        )
        return pa.table(
            {
                order_col: batch.column(order_col),
                "ts_us": ts,
                "wm_excl_us": wm,
                "late": late,
            }
        )

    return pm.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def grouped_int_ewma(
    ds,
    *,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "cents",
    n_rows: int | None = None,
):
    """Per-key integer EWMA with alpha = 1/2 carried EXACTLY: s_1 = v_1,
    s_i = (s_{i-1} + v_i) // 2 — the decayed-activity score a crawl/user
    profiler keeps, with floor-div halving instead of float decay so the
    distributed result hash-matches the recursive-CTE SQL twin
    bit-for-bit. Returns (key, n_events, ewma) at each key's last event.

    Plan: the shared crc-coarse per-key ordered pattern (ONE exchange,
    in-bucket mergesort across all keys). The halving recurrence is
    nonlinear in int arithmetic (no associative scan exists), so the
    in-bucket pass is a per-row loop — bounded by the ~TARGET-rows bucket,
    never corpus-sized, and each task's loop covers ALL its keys at once.
    """
    if n_rows is None:
        try:
            n_rows = ds.count()
        except Exception:  # pragma: no cover
            n_rows = None
    add_coarse = _make_add_coarse(key_col, _session_group_count(n_rows))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype="int64"),
                    "n_events": pd.Series([], dtype="int64"),
                    "ewma": pd.Series([], dtype="int64"),
                }
            )
        df = df.sort_values([key_col, order_col], kind="mergesort")
        keys = df[key_col].to_numpy()
        vals = df[value_col].to_numpy(dtype=np.int64)
        out_k: list[int] = []
        out_n: list[int] = []
        out_s: list[int] = []
        cur_k = None
        s = 0
        n = 0
        for k, v in zip(keys, vals):
            if k != cur_k:
                if cur_k is not None:
                    out_k.append(cur_k)
                    out_n.append(n)
                    out_s.append(s)
                cur_k, s, n = k, int(v), 1
            else:
                s = (s + int(v)) // 2
                n += 1
        out_k.append(cur_k)
        out_n.append(n)
        out_s.append(s)
        return pd.DataFrame(
            {
                key_col: np.asarray(out_k, dtype=np.int64),
                "n_events": np.asarray(out_n, dtype=np.int64),
                "ewma": np.asarray(out_s, dtype=np.int64),
            }
        )

    return (
        ds.map_batches(add_coarse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(scan, batch_format="pandas")
    )
