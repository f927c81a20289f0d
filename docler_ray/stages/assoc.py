"""Co-occurrence / association counting: how often two categorical values
appear for the SAME entity — the market-basket pair-count shape (event
types per user here; products per basket, tags per document in general).

No reference precedent (docler has no distributed operators, SURVEY.md
§2.7); this is the corpus-association member of the event tier.

Scale shape: each batch reduces map-side to its distinct (entity, value)
pairs — bounded by entities x the VALUE ALPHABET, which for a
co-occurrence matrix is dimension-sized by definition (event types, tags;
an unbounded value domain makes the output itself quadratic and is a
schema error, not a data size). ONE hash(entity) % P coarse exchange
co-locates every pair of an entity (exact in-bucket distinct because all
occurrences of an entity share its bucket), an in-bucket self-merge emits
each entity's ordered value pairs (a < b, at most C(|alphabet|, 2) per
entity), and the trailing pair-keyed groupby Sum is alphabet-squared
sized. The event stream itself never shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _entity_group_count(n_rows: int | None) -> int:
    # ~64Ki distinct (entity, value) rows per coarse bucket, floor 64 —
    # the shared coarse-exchange sizing rule (see windows._session_group_count)
    return max(64, (n_rows or 0) // 65536)


def transition_counts(
    ds,
    *,
    entity_col: str,
    value_col: str,
    ts_col: str,
    id_col: str,
    n_rows: int | None = None,
):
    """First-order Markov transition counts: for every ordered value pair
    (from, to), how many times ``to`` immediately follows ``from`` inside
    an entity's time-ordered stream — cooccurrence's SEQUENTIAL sibling
    (SQL: ``lag(value) OVER (PARTITION BY entity ORDER BY ep, id)``
    grouped on (prev, value)).

    Plan: ONE hash(entity) % P coarse co-location exchange (all rows ride,
    order needs the event stream), in-bucket mergesort by (entity, ep, id)
    + masked adjacent value pairs + one pandas groupby — partial rows per
    bucket bounded by the value alphabet squared — then a dimension-sized
    groupby Sum. -> (from_value, to_value, n_transitions).
    """
    from ray.data.aggregate import Sum

    if n_rows is None:
        try:
            n_rows = ds.count()
        except Exception:  # pragma: no cover - count unavailable pre-exec
            n_rows = None
    n_buckets = _entity_group_count(n_rows)

    def add_coarse(batch: pa.Table) -> pa.Table:
        ent = batch.column(entity_col).to_numpy(zero_copy_only=False)
        if not np.issubdtype(ent.dtype, np.integer):
            import zlib

            ent = np.array(
                [zlib.crc32(str(e).encode("utf-8")) for e in ent], np.uint64
            )
        coarse = (
            (ent.astype(np.uint64) * np.uint64(1000003)) % np.uint64(n_buckets)
        ).astype(np.int64)
        return batch.append_column("coarse", pa.array(coarse, pa.int64()))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "from_value": pd.Series([], dtype="object"),
                "to_value": pd.Series([], dtype="object"),
                "partial_n": pd.Series([], dtype="int64"),
            }
        )
        if df.empty:
            return empty
        ep = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = df.assign(_ep=ep).sort_values(
            [entity_col, "_ep", id_col], kind="mergesort"
        )
        ent = df[entity_col].to_numpy()
        same = ent[1:] == ent[:-1]
        if not same.any():
            return empty
        val = df[value_col].to_numpy()
        g = (
            pd.DataFrame(
                {"from_value": val[:-1][same], "to_value": val[1:][same]}
            )
            .groupby(["from_value", "to_value"], sort=False)
            .size()
            .reset_index(name="partial_n")
        )
        return g

    return (
        ds.select_columns([entity_col, value_col, ts_col, id_col])
        .map_batches(add_coarse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(pairs, batch_format="pandas")
        .groupby(["from_value", "to_value"])
        .aggregate(Sum("partial_n", alias_name="n_transitions"))
    )


def cooccurrence_counts(
    ds,
    *,
    entity_col: str,
    value_col: str,
    n_rows: int | None = None,
):
    """-> (value_a, value_b, n_entities) for value_a < value_b, counting
    entities where BOTH values occur at least once."""
    from ray.data.aggregate import Sum

    if n_rows is None:
        try:
            n_rows = ds.count()
        except Exception:  # pragma: no cover - count unavailable pre-exec
            n_rows = None
    n_buckets = _entity_group_count(n_rows)

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        g = batch.select([entity_col, value_col]).group_by(
            [entity_col, value_col]
        ).aggregate([])
        ent = g.column(entity_col).to_numpy(zero_copy_only=False)
        if not np.issubdtype(ent.dtype, np.integer):
            import zlib

            ent = np.array(
                [zlib.crc32(str(e).encode("utf-8")) for e in ent], np.uint64
            )
        coarse = (
            (ent.astype(np.uint64) * np.uint64(1000003)) % np.uint64(n_buckets)
        ).astype(np.int64)
        return g.append_column("coarse", pa.array(coarse, pa.int64()))

    def emit_pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "value_a": pd.Series([], dtype="object"),
                "value_b": pd.Series([], dtype="object"),
                "partial_n": pd.Series([], dtype="int64"),
            }
        )
        if df.empty:
            return empty
        d = df[[entity_col, value_col]].drop_duplicates()
        m = d.merge(d, on=entity_col, suffixes=("_a", "_b"))
        m = m[m[f"{value_col}_a"] < m[f"{value_col}_b"]]
        if m.empty:
            return empty
        g = (
            m.groupby([f"{value_col}_a", f"{value_col}_b"], sort=False)
            .size()
            .reset_index(name="partial_n")
        )
        g.columns = ["value_a", "value_b", "partial_n"]
        return g

    return (
        ds.map_batches(distinct_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(emit_pairs, batch_format="pandas")
        .groupby(["value_a", "value_b"])
        .aggregate(Sum("partial_n", alias_name="n_entities"))
    )
