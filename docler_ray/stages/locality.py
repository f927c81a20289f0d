"""Storage-locality reordering gain — the measurement behind
similarity-ordered storage layouts (BtrBlocks/Procella-style: writing
near-duplicate rows adjacently lets generic compressors capture the
redundancy, and ORDER BY a similarity fingerprint is the standard cheap
proxy). This operator quantifies the gain EXACTLY: the sum of adjacent
SimHash hamming distances under ingestion order (doc_id) vs under
fingerprint order (simhash, doc_id) — lower total adjacent distance =
more co-located redundancy.

Distributed plan per order (no global sort): order-preserving UNSIGNED
range buckets (the signed int64 key xor-mapped to uint64, top bits as the
bucket — safe on the FULL key range, where (key - lo) * B arithmetic
overflows), per-bucket sorted scans sum in-bucket adjacent XOR popcounts
and export only their (first, last) rows, and the driver stitches the
B-bounded bucket boundaries. Popcount is a vectorized byte-table lookup.
The DuckDB twin is a window LAG + bit_count(xor(...)) replay.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def _popcount64(v: np.ndarray) -> np.ndarray:
    """Vectorized popcount of an int64/uint64 array (byte-table lookup)."""
    b = v.astype(np.uint64, copy=False).view(np.uint8).reshape(-1, 8)
    return _POP8[b].sum(axis=1)


_N_BUCKETS_BITS = 10  # 1024 order-preserving buckets


def _adjacent_hamming(ds, order_cols: list[str], hash_col: str):
    """Sum of popcount(xor(adjacent hashes)) under ORDER BY order_cols.
    Returns (total, n_rows). The primary order column is bucketed by its
    top bits; ties order by the remaining columns inside buckets (a tie
    spanning a bucket boundary is impossible: equal keys share a bucket).
    """
    primary = order_cols[0]

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = batch.column(primary).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        # order-preserving signed -> unsigned map, top bits = bucket
        ukeys = keys.astype(np.uint64) ^ np.uint64(1 << 63)
        b = (ukeys >> np.uint64(64 - _N_BUCKETS_BITS)).astype(np.int64)
        return batch.append_column("bucket", pa.array(b))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "bucket": pd.Series([], dtype="int64"),
                    "in_sum": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                    "first_h": pd.Series([], dtype="int64"),
                    "last_h": pd.Series([], dtype="int64"),
                }
            )
        df = df.sort_values(order_cols, kind="mergesort")
        h = df[hash_col].to_numpy(dtype=np.int64)
        if len(h) > 1:
            in_sum = int(_popcount64(h[1:] ^ h[:-1]).sum())
        else:
            in_sum = 0
        return pd.DataFrame(
            {
                "bucket": [int(df["bucket"].iloc[0])],
                "in_sum": [in_sum],
                "n": [len(h)],
                "first_h": [int(h[0])],
                "last_h": [int(h[-1])],
            }
        )

    rows = (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(scan, batch_format="pandas")
        .to_pandas()
        .sort_values("bucket")
    )
    total = int(rows["in_sum"].sum())
    n = int(rows["n"].sum())
    lasts = rows["last_h"].to_numpy(dtype=np.int64)[:-1]
    firsts = rows["first_h"].to_numpy(dtype=np.int64)[1:]
    if len(lasts):
        total += int(_popcount64(lasts ^ firsts).sum())
    return total, n


def storage_order_gain(ds, *, hash_col: str = "simhash", id_col: str = "doc_id"):
    """One-row Dataset (n_docs, adj_hamming_id_order,
    adj_hamming_hash_order): the exact adjacent-distance totals under
    ingestion order vs fingerprint order. Input must carry (id, hash)."""
    import ray.data

    ds = ds.select_columns([id_col, hash_col]).materialize()
    by_id, n = _adjacent_hamming(ds, [id_col], hash_col)
    by_hash, _ = _adjacent_hamming(ds, [hash_col, id_col], hash_col)
    return ray.data.from_arrow(
        pa.table(
            {
                "n_docs": pa.array([n], pa.int64()),
                "adj_hamming_id_order": pa.array([by_id], pa.int64()),
                "adj_hamming_hash_order": pa.array([by_hash], pa.int64()),
            }
        )
    )
