"""Ordered prefix sum + sequence packing vs a DuckDB window oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _frame(n: int, seed: int = 3) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    ids = rng.permutation(np.arange(100, 100 + 3 * n, 3))[:n]  # sparse keys
    return pd.DataFrame(
        {
            "doc_id": ids.astype(np.int64),
            "n_tok": rng.integers(1, 900, n).astype(np.int64),
        }
    )


def test_ordered_prefix_sum_vs_duckdb(ray_session):
    import duckdb
    import ray.data

    from docler_ray.stages.packing import ordered_prefix_sum

    df = _frame(1000)
    got = (
        ordered_prefix_sum(
            ray.data.from_pandas(df).repartition(7), "doc_id", "n_tok"
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        duckdb.connect()
        .execute(
            "SELECT doc_id, n_tok, SUM(n_tok) OVER ("
            "ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum "
            "FROM df ORDER BY doc_id"
        )
        .df()
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_ordered_prefix_sum_forced_large_bucket_count(ray_session, monkeypatch):
    """Output is invariant to the bucket keyspace size."""
    import ray.data

    import docler_ray.stages.packing as packing

    df = _frame(400, seed=9)
    base = (
        packing.ordered_prefix_sum(ray.data.from_pandas(df), "doc_id", "n_tok")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    monkeypatch.setattr(packing, "_TARGET_ROWS", 16)  # ~25 buckets for 400 rows
    forced = (
        packing.ordered_prefix_sum(
            ray.data.from_pandas(df).repartition(5), "doc_id", "n_tok"
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, forced)


def test_pack_sequences_semantics(ray_session):
    import ray.data

    from docler_ray.stages.packing import pack_sequences

    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "n_tok": np.array([500, 600, 100, 900, 50, 950], dtype=np.int64),
        }
    )
    got = (
        pack_sequences(
            ray.data.from_pandas(df), "doc_id", "n_tok", budget=1000
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # cum-before: 0, 500, 1100, 1200, 2100, 2150 -> //1000
    assert got["seq_id"].tolist() == [0, 0, 1, 1, 2, 2]
    assert got["cum"].tolist() == [500, 1100, 1200, 2100, 2150, 3100]


def test_pack_sequences_empty_and_validation(ray_session):
    import pytest
    import ray.data

    from docler_ray.stages.packing import pack_sequences

    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "n_tok": pd.Series([], dtype="int64"),
        }
    )
    out_ds = pack_sequences(
        ray.data.from_pandas(empty), "doc_id", "n_tok", budget=10
    )
    assert out_ds.count() == 0
    # NOTE: Dataset.to_pandas() drops columns for 0-row datasets (Ray
    # skips empty blocks), so the schema is the contract to check here.
    assert {"doc_id", "n_tok", "cum", "seq_id"} <= set(out_ds.schema().names)
    with pytest.raises(ValueError):
        pack_sequences(ray.data.from_pandas(empty), "doc_id", "n_tok", budget=0)
