"""Seeded epoch shuffle: permutation validity, seed stability, SQL parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from docler_ray.stages.shuffle import (
    epoch_shuffle_rank,
    shuffle_key,
    shuffle_key_sql,
)


def test_shuffle_key_matches_sql():
    ids = np.array([0, 1, 7, 999, 1_000_002, 1_000_003, 123_456_789])
    got = shuffle_key(ids, seed=42).tolist()
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": ids}))
    want = con.execute(
        f"SELECT {shuffle_key_sql('i', 42)} AS k FROM t"
    ).df()["k"].tolist()
    assert got == want


def test_epoch_shuffle_is_seedstable_permutation(ray_session):
    import ray.data

    df = pd.DataFrame({"doc_id": np.arange(257, dtype=np.int64)})
    ds = ray.data.from_pandas(df).repartition(5)
    a = epoch_shuffle_rank(ds, seed=7).to_pandas().sort_values("doc_id")
    b = epoch_shuffle_rank(ds.repartition(3), seed=7).to_pandas().sort_values(
        "doc_id"
    )
    c = epoch_shuffle_rank(ds, seed=8).to_pandas().sort_values("doc_id")
    # valid permutation: ranks are exactly 1..n
    assert sorted(a["epoch_rank"]) == list(range(1, 258))
    # seed-stable across partitionings
    assert a["epoch_rank"].tolist() == b["epoch_rank"].tolist()
    # a different seed is a different permutation
    assert a["epoch_rank"].tolist() != c["epoch_rank"].tolist()


def test_epoch_shuffle_matches_window_oracle(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    ids = rng.choice(10_000, size=400, replace=False).astype(np.int64)
    df = pd.DataFrame({"doc_id": ids})
    got = (
        epoch_shuffle_rank(ray.data.from_pandas(df).repartition(4), seed=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(
        f"WITH k AS (SELECT doc_id, {shuffle_key_sql('doc_id', 5)} AS "
        "shuffle_key FROM documents) "
        "SELECT doc_id, shuffle_key, CAST(ROW_NUMBER() OVER "
        "(ORDER BY shuffle_key, doc_id) AS BIGINT) AS epoch_rank FROM k"
    ).df().sort_values("doc_id").reset_index(drop=True)
    for c in ["doc_id", "shuffle_key", "epoch_rank"]:
        assert got[c].tolist() == want[c].tolist(), c
