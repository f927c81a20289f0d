"""Hash-bucketed parquet storage: the co-location primitive for repeated
big-big joins.

At 100-TB scale, joining two fact tables co-partitions both per join
(stages/joins.py::copartition_hash_join — an all-to-all exchange each
time). When the same key is joined repeatedly, pay the shuffle ONCE by
writing both tables bucketed on that key: ``bucket = crc32(key) % n``,
hive-partitioned output. Downstream, bucket i of table A joins bucket i of
table B with NO exchange (read the two directories, join locally), and a
failed bucket re-runs independently (resumable unit = bucket directory).

The bucket function is plain crc32-of-decimal-string for integer keys (and
crc32 of utf-8 for strings) so any engine — DuckDB, Spark, a SQL oracle —
can reproduce the assignment.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa


def bucket_of(values, num_buckets: int) -> np.ndarray:
    """crc32-based bucket assignment, reproducible across engines."""
    out = np.empty(len(values), dtype=np.int32)
    for i, v in enumerate(values):
        data = str(v).encode("utf-8")
        out[i] = zlib.crc32(data) % num_buckets
    return out


def add_bucket_column(
    batch: pa.Table, key_col: str, num_buckets: int, bucket_col: str = "bucket"
) -> pa.Table:
    vals = batch.column(key_col).to_pylist()
    return batch.append_column(
        bucket_col, pa.array(bucket_of(vals, num_buckets), pa.int32())
    )


def write_bucketed_parquet(
    ds, out_dir: str, *, key_col: str, num_buckets: int
) -> None:
    """Write ``ds`` hive-partitioned by the key's hash bucket.

    One directory per bucket (``bucket=K/``) — never one giant file: each
    bucket is independently readable, re-writable, and joinable against the
    same bucket of any table written with the same (key hashing,
    num_buckets) pair.
    """
    with_bucket = ds.map_batches(
        lambda b: add_bucket_column(b, key_col, num_buckets),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    with_bucket.write_parquet(out_dir, partition_cols=["bucket"])


def read_bucket(out_dir: str, bucket: int):
    """One bucket of a bucketed table as a Dataset (no shuffle needed to
    join it against the same bucket of another table)."""
    import ray.data

    return ray.data.read_parquet(f"{out_dir}/bucket={bucket}")
