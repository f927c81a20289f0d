"""The flagship pipeline: pages parquet -> extracted docs parquet, resumable.

Physical plan (SURVEY.md §4.3):

    read_parquet(pending input shards, include_paths=True)
      -> map_batches(classify)            stateless: mime sniff, url_hash, shard_id
      -> [repartition(P)]                 optional skew break (config)
      -> map_batches(ExtractDocs, ...)    ACTOR POOL: the extraction proper
      -> map_batches(metrics reporter)    stateless pass-through
      -> write_parquet(out/docs, partition_cols=["shard_id"])
    then: one manifest row per completed shard (lineage + metrics), atomic.

Resume: completed shards are filtered out of the input list via their
manifest entries BEFORE the Dataset is built (docler_ray.state.manifest);
output directories of incomplete shards are deleted first so a crashed
write can never leave duplicate rows.

Streaming discipline: nothing materializes the docs table — the only
consuming call is write_parquet; counts come from the metrics actor.
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass, field

import ray
import ray.data

from docler_ray.models import EXTRACTOR_VERSION
from docler_ray.stages.classify import DEFAULT_NUM_BUCKETS, make_classifier
from docler_ray.stages.extract import ExtractDocs
from docler_ray.state.manifest import ManifestStore, filter_pending
from docler_ray.state.metrics import MetricsActor, make_metrics_reporter

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


@dataclass
class PipelineConfig:
    num_buckets: int = DEFAULT_NUM_BUCKETS
    extract_batch_size: int = 64
    # actor pool bounds; None -> (2, max(2, cluster CPUs - 2))
    extract_concurrency: tuple[int, int] | int | None = None
    repartition_blocks: int | None = None  # explicit skew break when set
    preferences: dict[str, str] | None = None
    extract_options: dict = field(default_factory=dict)
    shards_per_round: int | None = None  # checkpoint granularity; None = one round


def _auto_concurrency() -> int:
    """Fixed-size extract pool: all CPUs minus a proportional reservation for
    the read/write stages (1 per 8 CPUs, min 1). Fixed beats autoscaling here
    — measured 49.8s vs 63.6s on the 200k-page benchmark at 16 CPUs (the
    autoscaler ramps too slowly for a pool whose actors are cheap to start
    relative to the job)."""
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(2, cpus - max(1, cpus // 8))


def build_pages_dataset(
    input_files: list[str], num_blocks: int | None = None
) -> ray.data.Dataset:
    """Read pages shards with column pruning + per-row input-path lineage.

    ``num_blocks`` defaults to max(#files, 10x cluster CPUs): enough task
    granularity that the extract pool load-balances across skewed pages
    (measured 40.1s vs 49.9s at 16 CPUs for 160 vs 80 blocks on the 200k-page
    benchmark); at production scale #files >> CPUs and the override is a
    no-op.
    """
    if num_blocks is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        num_blocks = max(len(input_files), 10 * cpus)
    return ray.data.read_parquet(
        input_files,
        columns=PAGES_COLUMNS,
        include_paths=True,
        override_num_blocks=num_blocks,
    )


def extract_dataset(pages: ray.data.Dataset, cfg: PipelineConfig) -> ray.data.Dataset:
    """pages Dataset -> docs Dataset (lazy; no consumption here)."""
    ds = pages.map_batches(
        make_classifier(cfg.num_buckets),
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size * 4,
        zero_copy_batch=True,
    )
    if cfg.repartition_blocks:
        ds = ds.repartition(cfg.repartition_blocks)
    concurrency = cfg.extract_concurrency or _auto_concurrency()
    return ds.map_batches(
        ExtractDocs,
        fn_constructor_kwargs={
            "preferences": cfg.preferences,
            "options": cfg.extract_options,
        },
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
        concurrency=concurrency,
        num_cpus=1,
        zero_copy_batch=True,
    )


def extract_grouped_by_lang(
    pages: ray.data.Dataset, cfg: PipelineConfig
) -> ray.data.Dataset:
    """Per-language dispatch via ``groupby("lang").map_groups`` — the
    shuffle route (north-star dispatch axis; SURVEY.md §4.2).

    The default ``extract_dataset`` dispatches per-row inside one actor pool
    (zero shuffle) because this engine's per-language state is a lookup
    table. This variant co-locates each language's rows first, so a chain
    whose per-language state is expensive (per-lang models, tokenizers)
    initializes it once per group instead of once per language per actor.
    Prefer the default unless that state dominates.
    """
    from docler_ray.stages.extract import ExtractDocs

    ds = pages.map_batches(
        make_classifier(cfg.num_buckets),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    preferences = cfg.preferences
    options = cfg.extract_options

    def extract_group(group):
        extractor = ExtractDocs(preferences=preferences, options=options)
        return extractor(group)

    return ds.groupby("lang").map_groups(extract_group, batch_format="pyarrow")


def _clean_incomplete_outputs(docs_dir: str, pending_files: list[str]) -> None:
    for path in pending_files:
        shard_dir = os.path.join(docs_dir, f"shard_id={os.path.basename(path)}")
        if os.path.isdir(shard_dir):
            shutil.rmtree(shard_dir)


def run_extract_job(
    input_files: list[str],
    out_dir: str,
    cfg: PipelineConfig | None = None,
) -> dict:
    """Run (or resume) the flagship job. Returns aggregate metrics.

    Lineage per shard: {shard_id, input_file, row_start, row_end,
    extractor_version, docs, errors, pages, bytes_in, secs} — the row range
    is the whole file (shard == file, deterministic across runs).
    """
    cfg = cfg or PipelineConfig()
    docs_dir = os.path.join(out_dir, "docs")
    store = ManifestStore(os.path.join(out_dir, "manifests"))

    pending = filter_pending(input_files, store)
    skipped = len(input_files) - len(pending)
    _clean_incomplete_outputs(docs_dir, pending)

    round_size = cfg.shards_per_round or len(pending) or 1
    rounds = [pending[i : i + round_size] for i in range(0, len(pending), round_size)]

    for round_files in rounds:
        t0 = time.time()
        metrics = MetricsActor.remote()
        pages = build_pages_dataset(round_files)
        docs = extract_dataset(pages, cfg)
        docs = docs.map_batches(
            make_metrics_reporter(metrics),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        docs.write_parquet(docs_dir, partition_cols=["shard_id"])
        secs = time.time() - t0
        snap = ray.get(metrics.snapshot.remote())
        per_shard = snap["per_shard"]
        for path in round_files:
            shard_id = os.path.basename(path)
            stats = per_shard.get(
                shard_id, {"docs": 0, "errors": 0, "pages": 0, "bytes_in": 0}
            )
            store.record(
                {
                    "shard_id": shard_id,
                    "input_file": path,
                    "row_start": 0,
                    "row_end": stats["docs"] + stats["errors"],
                    "extractor_version": EXTRACTOR_VERSION,
                    "secs": secs / max(len(round_files), 1),
                    **stats,
                }
            )
        ray.kill(metrics)

    totals = store.totals()
    totals["skipped_shards"] = skipped
    totals["out_dir"] = out_dir
    return totals
