"""Driver-contract conformance: every oracle-backed query must match DuckDB
on the same parquet tables (the CORRECTNESS gate, run here at sf0.001 for
speed; the driver runs sf0.01)."""

from __future__ import annotations

import glob
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

import __ray_entry__ as entry_mod


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for path in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        name = os.path.splitext(os.path.basename(path))[0]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(ray_session, name):
    q = entry_mod.queries()[name]
    got = _canon(_to_pandas(q(SF_DIR)))
    want = _canon(_oracle(entry_mod.oracle_sql()[name]))
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for c in got.columns:
        if np.issubdtype(got[c].dtype, np.floating) or np.issubdtype(
            want[c].dtype, np.floating
        ):
            assert np.allclose(
                got[c].astype(float),
                want[c].astype(float),
                rtol=1e-9,
                atol=1e-9,
                equal_nan=True,
            ), f"{name}.{c} float mismatch"
        else:
            assert (got[c].to_numpy() == want[c].to_numpy()).all(), (
                f"{name}.{c} value mismatch"
            )


def test_asof_query_distributed_regime_matches_broadcast(ray_session, monkeypatch):
    """Force the co-partitioned as-of regime for events_last_order_asof and
    assert it matches the broadcast regime row-for-row — the right side must
    never need to land on the driver for the query to stay correct."""
    q = entry_mod.queries()["events_last_order_asof"]
    broadcast = _canon(_to_pandas(q(SF_DIR)))
    monkeypatch.setattr(entry_mod, "_ASOF_BROADCAST_MAX", 0)
    distributed = _canon(_to_pandas(q(SF_DIR)))
    pd.testing.assert_frame_equal(broadcast, distributed)


def test_rows_only_queries_run(ray_session):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name in sorted(set(qs) - set(oracles)):
        df = _to_pandas(qs[name](SF_DIR))
        assert len(df) > 0, f"{name} returned no rows"


def test_entry_smoke(ray_session):
    ds = entry_mod.entry()
    df = ds.to_pandas()
    assert len(df) == 500
    assert (df["error"].isna()).all()
    assert df["content"].str.startswith('<!-- docler:page_break {"next_page":1} -->').all()
    # extracted main content preserves the document text (boilerplate gone)
    assert df["content"].str.contains("Subscribe for updates").sum() == 0
