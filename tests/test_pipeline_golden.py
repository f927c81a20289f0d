"""Pipeline-level golden test: the Ray job must reproduce the committed
golden extractions byte-for-byte per url (SURVEY.md §5.2 — the north rule's
"byte-identical extracted text per url" gate)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from docler_ray.markers import count_page_breaks
from docler_ray.sources.synth import generate_pages_table

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
PAGES_FILES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "pages", "*.parquet")))


def test_shard_id_stable_across_path_spellings(tmp_path):
    """Symlinked / relative spellings of one input file must resolve to ONE
    shard id (realpath normalization), or a resume from a different cwd or
    mount spelling would re-run every shard and duplicate output rows."""
    from docler_ray.state.manifest import shard_id_for_path

    real = tmp_path / "pages-0.parquet"
    real.write_bytes(b"x")
    link_dir = tmp_path / "mnt"
    link_dir.mkdir()
    link = link_dir / "pages-0.parquet"
    link.symlink_to(real)
    rel = os.path.relpath(str(real))
    assert shard_id_for_path(str(real)) == shard_id_for_path(str(link))
    assert shard_id_for_path(str(real)) == shard_id_for_path(rel)
    other = tmp_path / "other" / "pages-0.parquet"
    other.parent.mkdir()
    other.write_bytes(b"x")
    assert shard_id_for_path(str(other)) != shard_id_for_path(str(real))


def test_generator_is_deterministic():
    """The committed pages corpus must be regenerable bit-for-bit — otherwise
    goldens silently detach from the generator."""
    committed = pq.read_table(PAGES_FILES[0])
    regenerated = generate_pages_table(committed.num_rows, seed=42, start=0)
    assert regenerated.equals(committed)


@pytest.fixture(scope="module")
def golden() -> dict[str, dict]:
    t = pq.read_table(os.path.join(GOLDEN_DIR, "golden_docs.parquet"))
    rows = t.to_pylist()
    return {r["url"]: r for r in rows}


def test_ray_pipeline_matches_goldens(ray_session, golden, tmp_path):
    import ray.data

    from docler_ray.pipelines.extract_pipeline import (
        PipelineConfig,
        extract_dataset,
        run_extract_job,
    )

    out_dir = str(tmp_path / "out")
    cfg = PipelineConfig(extract_batch_size=32, extract_concurrency=(1, 2))
    totals = run_extract_job(PAGES_FILES, out_dir, cfg)
    assert totals["shards"] == len(PAGES_FILES)

    import pyarrow.dataset as pds

    result = pds.dataset(os.path.join(out_dir, "docs"), partitioning="hive").to_table(
        columns=["url", "content", "title", "page_count", "error"]
    )
    assert result.num_rows == len(golden)

    mismatches = []
    for row in result.to_pylist():
        g = golden[row["url"]]
        if row["content"] != g["content"]:
            mismatches.append((row["url"], "content"))
        if row["title"] != g["title"]:
            mismatches.append((row["url"], "title"))
        if row["page_count"] != g["page_count"]:
            mismatches.append((row["url"], "page_count"))
        if (row["error"] or None) != (g["error"] or None):
            mismatches.append((row["url"], "error"))
    assert not mismatches, f"{len(mismatches)} golden mismatches: {mismatches[:5]}"

    # page_count invariant: declared == markers present in content
    for row in result.to_pylist():
        if not row["error"]:
            assert row["page_count"] == count_page_breaks(row["content"]), row["url"]


def test_resume_skips_completed(ray_session, tmp_path):
    from docler_ray.pipelines.extract_pipeline import PipelineConfig, run_extract_job

    out_dir = str(tmp_path / "out")
    cfg = PipelineConfig(extract_batch_size=32, extract_concurrency=(1, 2))
    first = run_extract_job(PAGES_FILES, out_dir, cfg)
    assert first["skipped_shards"] == 0
    second = run_extract_job(PAGES_FILES, out_dir, cfg)
    assert second["skipped_shards"] == len(PAGES_FILES)
    # totals unchanged (nothing re-ran, manifests intact)
    assert second["docs"] == first["docs"]
    assert second["errors"] == first["errors"]


def test_repartition_skew_break_preserves_output(ray_session, golden):
    """The url-hash skew-break repartition (north rule: explicit partitioning)
    must not change WHAT is extracted — only how rows are distributed."""
    from docler_ray.pipelines.extract_pipeline import (
        PipelineConfig,
        build_pages_dataset,
        extract_dataset,
    )

    cfg = PipelineConfig(
        extract_batch_size=32, extract_concurrency=(1, 2), repartition_blocks=7
    )
    docs = extract_dataset(build_pages_dataset(PAGES_FILES), cfg)
    result = {r["url"]: r for r in docs.select_columns(["url", "content"]).take_all()}
    assert len(result) == len(golden)
    assert all(result[u]["content"] == g["content"] for u, g in golden.items())


def test_boost4_content_hashes_pinned():
    """bench.py runs on boost=4 (~15 KB) pages but the full-text goldens are
    boost=1 — this hash set pins the larger-page extraction path so a
    size-dependent behavior change can't slip through the bench silently.
    Regenerate deliberately via the snippet in the file's git history."""
    import hashlib
    import json

    from docler_ray.html import extract_html
    from docler_ray.pdfish import extract_pdfish

    expected = json.load(
        open(os.path.join(GOLDEN_DIR, "golden_boost4_hashes.json"))
    )
    t = generate_pages_table(100, seed=1234, boost=4)
    mismatches = []
    for url, h in zip(t.column("url").to_pylist(), t.column("html").to_pylist()):
        if h and h[:6] == b"PDFISH":
            try:
                content = extract_pdfish(h).content
            except ValueError:
                try:
                    content = extract_pdfish(h, password="hunter2").content
                except ValueError:
                    content = "<error>"
        elif h:
            try:
                content = extract_html(h.decode("utf-8")).content
            except UnicodeDecodeError:
                content = "<error>"
        else:
            content = "<error>"
        got = hashlib.sha256(content.encode("utf-8")).hexdigest()
        if got != expected[url]:
            mismatches.append(url)
    assert not mismatches, mismatches[:5]


def test_crash_mid_job_resumes_incomplete_rounds_only(ray_session, golden, tmp_path):
    """Kill the job after its first checkpoint round: resume must redo ONLY
    the shards with no manifest, leave completed shard outputs untouched
    (mtime-stable), and converge to the exact golden output."""
    import pyarrow.dataset as pds

    from docler_ray.pipelines.extract_pipeline import PipelineConfig, run_extract_job
    from docler_ray.state.manifest import shard_id_for_path

    # re-shard the committed corpus into 6 small input files -> 3 rounds of 2
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    all_rows = pq.read_table(PAGES_FILES[0]).to_pylist() + pq.read_table(
        PAGES_FILES[1]
    ).to_pylist()
    files = []
    for i in range(0, len(all_rows), 50):
        import pyarrow as pa

        path = str(shard_dir / f"part-{i // 50:03d}.parquet")
        pq.write_table(
            pa.Table.from_pylist(all_rows[i : i + 50], schema=pq.read_table(PAGES_FILES[0]).schema),
            path,
        )
        files.append(path)
    assert len(files) == 6

    out_dir = str(tmp_path / "out")
    cfg = PipelineConfig(
        extract_batch_size=32, extract_concurrency=(1, 2), shards_per_round=2
    )

    class Crash(RuntimeError):
        pass

    def crash_after_first(round_idx: int) -> None:
        if round_idx == 0:
            raise Crash

    with pytest.raises(Crash):
        run_extract_job(files, out_dir, cfg, _after_round=crash_after_first)

    manifests = os.listdir(os.path.join(out_dir, "manifests"))
    assert len(manifests) == 2  # exactly the first round landed

    done_ids = {shard_id_for_path(p) for p in files[:2]}
    docs_dir = os.path.join(out_dir, "docs")
    mtimes_before = {}
    for sid in done_ids:
        d = os.path.join(docs_dir, f"shard_id={sid}")
        for name in os.listdir(d):
            mtimes_before[f"{sid}/{name}"] = os.path.getmtime(os.path.join(d, name))

    totals = run_extract_job(files, out_dir, cfg)
    assert totals["skipped_shards"] == 2  # round 1 not redone
    assert totals["shards"] == 6

    for key, before in mtimes_before.items():
        sid, name = key.split("/")
        after = os.path.getmtime(os.path.join(docs_dir, f"shard_id={sid}", name))
        assert after == before, f"completed shard output {key} was rewritten"

    result = pds.dataset(docs_dir, partitioning="hive").to_table(
        columns=["url", "content"]
    )
    assert result.num_rows == len(golden)
    assert all(r["content"] == golden[r["url"]]["content"] for r in result.to_pylist())


def test_manifest_counts_match_durable_output(ray_session, tmp_path):
    """Manifest docs/errors must equal the WRITTEN output's true counts
    (round-1 ADVICE: the metrics actor can double-count on retry, and the
    first stats implementation read the wrong parquet leaf for the nested
    schema). The synthetic corpus plants encrypted pdfish rows, so
    errors > 0 exercises the null-count path."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pds

    from docler_ray.pipelines.extract_pipeline import PipelineConfig, run_extract_job
    from docler_ray.sources.synth import write_pages_corpus

    files = write_pages_corpus(str(tmp_path / "corpus"), 300, seed=7, rows_per_shard=100)
    out_dir = str(tmp_path / "out")
    totals = run_extract_job(
        files, out_dir, PipelineConfig(extract_batch_size=32, extract_concurrency=(1, 2))
    )
    t = pds.dataset(os.path.join(out_dir, "docs"), partitioning="hive").to_table(
        columns=["error"]
    )
    actual_errors = pc.sum(pc.cast(pc.is_valid(t["error"]), "int64")).as_py() or 0
    assert t.num_rows == 300
    assert actual_errors > 0, "corpus should plant some encrypted/locked rows"
    assert totals["errors"] == actual_errors
    assert totals["docs"] == t.num_rows - actual_errors
