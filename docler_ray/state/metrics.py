"""In-flight pipeline metrics: a tiny counter actor fed from the hot path.

Replaces the reference's driver-side ``Conversion`` counters
(/root/reference/src/docler/converters/dir_converter.py:143-166) without
materializing anything: each extract batch reports per-shard deltas
(docs/errors/pages/bytes) to one small named-less actor via a fire-and-forget
remote call. Counts are metrics, not correctness: a retried task may double
count a batch; shard COMPLETION is tracked by manifests, not by these
numbers.
"""

from __future__ import annotations

import time
from collections import defaultdict

import pyarrow as pa
import pyarrow.compute as pc
import ray


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self) -> None:
        self.per_shard: dict[str, dict] = defaultdict(
            lambda: {"docs": 0, "errors": 0, "pages": 0, "bytes_in": 0}
        )
        self.started_at = time.time()

    def report(self, shard_id: str, docs: int, errors: int, pages: int, bytes_in: int) -> None:
        s = self.per_shard[shard_id]
        s["docs"] += docs
        s["errors"] += errors
        s["pages"] += pages
        s["bytes_in"] += bytes_in

    def snapshot(self) -> dict:
        total_docs = sum(s["docs"] for s in self.per_shard.values())
        elapsed = max(time.time() - self.started_at, 1e-9)
        return {
            "per_shard": {k: dict(v) for k, v in self.per_shard.items()},
            "total_docs": total_docs,
            "elapsed_secs": elapsed,
            "docs_per_sec": total_docs / elapsed,
        }


def make_metrics_reporter(metrics_actor, bytes_per_row: pa.Array | None = None):
    """Stateless pass-through ``map_batches`` fn that reports per-shard deltas.

    The actor handle is captured in the closure (serialized once per task,
    not per batch)."""

    def report(batch: pa.Table) -> pa.Table:
        if "shard_id" in batch.column_names:
            shard_ids = batch.column("shard_id")
            for shard in pc.unique(shard_ids).to_pylist():
                mask = pc.equal(shard_ids, shard)
                sub = batch.filter(mask)
                errors = pc.sum(
                    pc.cast(pc.is_valid(sub.column("error")), pa.int64())
                ).as_py() or 0
                pages = pc.sum(sub.column("page_count")).as_py() or 0
                bytes_in = (
                    pc.sum(pc.binary_length(sub.column("content"))).as_py() or 0
                )
                # synchronous: the task's output block only materializes after
                # its counts landed, so a snapshot taken after write_parquet
                # returns has seen every batch (fire-and-forget raced it).
                ray.get(
                    metrics_actor.report.remote(
                        shard, sub.num_rows - errors, errors, pages, bytes_in
                    )
                )
        return batch

    return report
