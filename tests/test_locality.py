"""Storage-locality reordering gain: popcount kernel, boundary stitching,
and the ordering invariant."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from docler_ray.stages.locality import _popcount64, storage_order_gain


def test_popcount64():
    v = np.array([0, 1, 3, -1, 1 << 62, (1 << 63) - 1], dtype=np.int64)
    assert _popcount64(v).tolist() == [0, 1, 2, 64, 1, 63]


def _brute(ids, hashes, order):
    rows = sorted(zip((int(i) for i in ids), (int(h) for h in hashes)), key=order)
    return sum(
        bin((a[1] ^ b[1]) & ((1 << 64) - 1)).count("1")
        for a, b in zip(rows, rows[1:])
    )


def test_storage_order_gain_exact(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    n = 500
    ids = np.arange(n, dtype=np.int64)
    # clustered hashes: pairs of near-identical values scattered in id order
    base = rng.integers(-(2**62), 2**62, n // 2, dtype=np.int64)
    hashes = np.empty(n, dtype=np.int64)
    hashes[0::2] = base
    hashes[1::2] = base ^ 1  # hamming-1 twin
    perm = rng.permutation(n)
    hashes = hashes[perm]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids), "simhash": pa.array(hashes)})
    ).repartition(7)
    df = storage_order_gain(ds).to_pandas().iloc[0]
    want_id = _brute(ids, hashes, order=lambda r: r[0])
    want_hash = _brute(ids, hashes, order=lambda r: (r[1], r[0]))
    assert int(df["n_docs"]) == n
    assert int(df["adj_hamming_id_order"]) == want_id
    assert int(df["adj_hamming_hash_order"]) == want_hash
    # fingerprint order must co-locate the hamming-1 twins: strictly better
    assert want_hash < want_id
