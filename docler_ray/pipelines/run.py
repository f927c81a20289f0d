"""CLI driver: generate / extract / resume from the command line.

The ``ray job submit``-able entry point (north rule). Examples:

    # generate a 5k-row corpus and extract it
    python -m docler_ray.pipelines.run --gen 5000 --corpus /tmp/corpus --out /tmp/out

    # resume after a crash (completed shards skipped via manifests)
    python -m docler_ray.pipelines.run --corpus /tmp/corpus --out /tmp/out

This script OWNS its Ray session (guarded init; the library never calls
ray.init, per the driver contract in __ray_entry__.py).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="docler_ray extraction job")
    parser.add_argument("--corpus", required=True, help="pages corpus directory")
    parser.add_argument("--out", required=True, help="output directory (docs + manifests)")
    parser.add_argument("--gen", type=int, default=0, help="generate N corpus rows first")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--rows-per-shard", type=int, default=10_000)
    parser.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 0)) or None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--shards-per-round", type=int, default=None)
    parser.add_argument(
        "--wet-out",
        default=None,
        help="also export the extracted docs as WET-style .warc.gz shards "
        "here (Common-Crawl text-archive interchange; re-ingestable by "
        "the WARC reader)",
    )
    parser.add_argument(
        "--chunks-out",
        default=None,
        help="also chunk the extracted docs and write a chunks table here",
    )
    parser.add_argument(
        "--chunker", default="markdown", choices=["markdown", "token", "bpe"]
    )
    parser.add_argument(
        "--input-tree",
        default=None,
        help="ingest a document TREE (html/pdf/docx/.doc/... files) into "
        "the corpus as pages parquet before extracting — the reference's "
        "convert_directory front door (dir_converter.py:60-138); bytes "
        "are read inside Ray tasks, not on the driver",
    )
    parser.add_argument(
        "--pattern",
        default=None,
        help="glob for --input-tree walk / corpus shard discovery "
        "(default '**/*' for trees; '*.parquet|*.warc|*.warc.gz' for "
        "corpus dirs)",
    )
    parser.add_argument(
        "--exclude",
        action="append",
        default=None,
        help="glob to exclude from the walk (repeatable; matches the "
        "relative path or the basename)",
    )
    parser.add_argument(
        "--max-depth",
        type=int,
        default=None,
        help="maximum directory depth for the walk (direct children = 1)",
    )
    parser.add_argument(
        "--no-recursive",
        action="store_true",
        help="do not search subdirectories (collapses '**' in the pattern)",
    )
    parser.add_argument(
        "--config",
        default=None,
        help="declarative JSON job config (docler_ray.config.JobConfig); "
        "CLI flags override its pipeline knobs",
    )
    parser.add_argument(
        "--quality",
        default=None,
        help="comma list of post-extraction curation gates applied in "
        "order: 'gopher' (drop failing docs), 'c4' (line-clean content). "
        "Off by default — enabling changes the byte-identical output "
        "contract deliberately",
    )
    parser.add_argument(
        "--address",
        default=os.environ.get("DOCLER_RAY_ADDRESS", "local"),
        help="'local' starts a private Ray (default); 'auto' or an explicit "
        "address ATTACHES to a standing cluster — the execution shape "
        "`ray job submit` wraps (the job driver attaches to the cluster "
        "it was submitted to; --num-cpus is ignored there, the cluster "
        "owns its size)",
    )
    args = parser.parse_args(argv)

    import ray

    if not ray.is_initialized():
        if args.address == "local":
            ray.init(
                address="local",
                num_cpus=args.num_cpus,
                include_dashboard=False,
                ignore_reinit_error=True,
                logging_level="ERROR",
            )
        else:
            ray.init(
                address=args.address,
                ignore_reinit_error=True,
                logging_level="ERROR",
            )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    try:
        from docler_ray.pipelines.extract_pipeline import PipelineConfig, run_extract_job
        from docler_ray.sources.synth import write_pages_corpus

        if args.gen:
            write_pages_corpus(
                args.corpus, args.gen, seed=args.seed, rows_per_shard=args.rows_per_shard
            )
        if args.input_tree:
            # Document-tree ingest (reference convert_directory parity):
            # walk names on the driver, read + shard bytes inside Ray
            # tasks, land ordinary pages parquet so resume manifests work.
            from docler_ray.sources.walk import pages_dataset_from_directory

            os.makedirs(args.corpus, exist_ok=True)
            pages = pages_dataset_from_directory(
                args.input_tree,
                pattern=args.pattern or "**/*",
                recursive=not args.no_recursive,
                exclude=args.exclude,
                max_depth=args.max_depth,
            )
            pages.write_parquet(args.corpus)
        if args.pattern and not args.input_tree:
            from docler_ray.sources.walk import list_files as _walk

            input_files = [
                os.path.join(args.corpus, rel)
                for rel in _walk(
                    args.corpus,
                    pattern=args.pattern,
                    recursive=not args.no_recursive,
                    exclude=args.exclude,
                    max_depth=args.max_depth,
                )
            ]
        else:
            input_files = sorted(
                glob.glob(os.path.join(args.corpus, "*.parquet"))
                + glob.glob(os.path.join(args.corpus, "*.warc"))
                + glob.glob(os.path.join(args.corpus, "*.warc.gz"))
            )
        if not input_files:
            print(f"no input shards in {args.corpus}", file=sys.stderr)
            return 2
        job = None
        if args.config:
            from docler_ray.config import JobConfig

            job = JobConfig.from_json(args.config)
            cfg = job.build_pipeline_config()
        else:
            cfg = PipelineConfig()
        if args.batch_size is not None:
            cfg.extract_batch_size = args.batch_size
        if args.shards_per_round is not None:
            cfg.shards_per_round = args.shards_per_round
        if args.quality:
            cfg.quality_filters = tuple(
                s.strip() for s in args.quality.split(",") if s.strip()
            )
        totals = run_extract_job(input_files, args.out, cfg)
        totals["docs_per_sec"] = round(totals["docs"] / totals["secs"], 2) if totals["secs"] else None
        if args.chunks_out:
            import ray.data

            from docler_ray.stages.chunk import make_chunker

            docs = ray.data.read_parquet(
                os.path.join(args.out, "docs"),
                columns=["url", "content", "error", "images"],
            )
            if job is not None and job.chunker is not None:
                from docler_ray.config import get_chunker

                chunk_fn = get_chunker(job.chunker)
            elif args.chunker == "bpe":
                # train the tokenizer ON the extracted corpus (the
                # reference's real-tokenizer budget, done corpus-scale)
                from docler_ray.stages.vocab import train_bpe

                merges = train_bpe(
                    docs, text_col="content", n_merges=40
                ).to_pandas()
                ranks = {
                    (l, r): int(k)
                    for k, l, r in zip(
                        merges["rank"], merges["left"], merges["right"]
                    )
                }
                chunk_fn = make_chunker("bpe", ranks=ranks)
            else:
                chunk_fn = make_chunker(args.chunker)
            chunks = docs.map_batches(
                chunk_fn,
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            chunks.write_parquet(args.chunks_out)
            totals["chunks_out"] = args.chunks_out
        if args.wet_out:
            import ray.data

            from docler_ray.sources.warc import export_wet

            def ok_rows(batch):
                import pyarrow.compute as pc

                return batch.filter(pc.is_null(batch.column("error")))

            docs = ray.data.read_parquet(
                os.path.join(args.out, "docs"),
                columns=["url", "content", "error"],
            ).map_batches(ok_rows, batch_format="pyarrow", zero_copy_batch=True)
            manifest = export_wet(
                docs, args.wet_out, text_col="content"
            ).to_pandas()
            totals["wet_out"] = args.wet_out
            totals["wet_shards"] = int(len(manifest))
            totals["wet_records"] = int(manifest["n_records"].sum())
        print(json.dumps(totals, sort_keys=True))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
