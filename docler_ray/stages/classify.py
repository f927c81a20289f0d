"""Classification stage: MIME sniff + url-hash bucket + shard lineage.

Stateless ``map_batches`` transform (Arrow in / Arrow out). Replaces the
reference's extension-based ``mimetypes.guess_type`` dispatch input
(/root/reference/src/docler/converters/base.py:269) with magic-byte sniffing
over the binary column, and adds the explicit partitioning keys the north
rule requires: ``url_hash`` (crc32 bucket for skew breaking / dedup
bucketing) and ``shard_id`` (input-file lineage for checkpoint manifests).
"""

from __future__ import annotations

import zlib

import pyarrow as pa

from docler_ray.mime_types import sniff_mime
from docler_ray.state.manifest import shard_id_for_path

DEFAULT_NUM_BUCKETS = 64


def classify_batch(batch: pa.Table, *, num_buckets: int = DEFAULT_NUM_BUCKETS) -> pa.Table:
    """Add mime_type / url_hash / shard_id columns to a pages batch."""
    urls = batch.column("url").to_pylist()
    payloads = batch.column("html").to_pylist()
    mimes = [sniff_mime(p or b"") for p in payloads]
    hashes = [zlib.crc32(u.encode("utf-8")) % num_buckets for u in urls]
    out = batch.append_column("mime_type", pa.array(mimes, type=pa.string()))
    out = out.append_column("url_hash", pa.array(hashes, type=pa.int32()))
    if "path" in batch.column_names and "shard_id" not in batch.column_names:
        memo: dict[str, str] = {}
        shard = [
            memo.get(p) or memo.setdefault(p, shard_id_for_path(p))
            for p in batch.column("path").to_pylist()
        ]
        out = out.append_column("shard_id", pa.array(shard, type=pa.string()))
        out = out.drop_columns(["path"])
    return out


def make_classifier(num_buckets: int = DEFAULT_NUM_BUCKETS):
    """A picklable stateless classify fn for ``map_batches``."""

    def classify(batch: pa.Table) -> pa.Table:
        return classify_batch(batch, num_buckets=num_buckets)

    return classify
