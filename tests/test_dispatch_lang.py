"""(mime, lang) dispatch, groupby-lang extraction route, embedding near-dup."""

from __future__ import annotations

import numpy as np
import pytest

from docler_ray.html.extract import ExtractionResult
from docler_ray.stages.dispatch import EXTRACTORS, build_dispatch, lookup, register_extractor


def test_lookup_most_specific_first():
    def de_extractor(payload, text, options):
        return ExtractionResult(content="DE")

    register_extractor("de_special", de_extractor)
    try:
        table = build_dispatch({"text/html|de": "de_special"})
        name, _fn = lookup(table, "text/html", "de")
        assert name == "de_special"
        name, _fn = lookup(table, "text/html", "fr")
        assert name == "html_extract"
        assert lookup(table, "application/nope", "en") is None
    finally:
        EXTRACTORS.pop("de_special", None)


def test_unknown_extractor_rejected():
    with pytest.raises(ValueError, match="Unknown extractor"):
        build_dispatch({"text/html": "missing_name"})


def test_extract_row_lang_dispatch():
    from docler_ray.stages.extract import ExtractDocs

    def zh_extractor(payload, text, options):
        return ExtractionResult(content="ZH-CHAIN", title="zh")

    register_extractor("zh_chain", zh_extractor)
    try:
        ex = ExtractDocs(preferences={"text/html|zh": "zh_chain"})
        fields, err, name = ex.extract_row("text/html", b"<html><body>x</body></html>", "", "zh")
        assert err is None and name == "zh_chain"
        assert fields["content"] == "ZH-CHAIN"
        fields, err, name = ex.extract_row("text/html", b"<html><body><p>hi</p></body></html>", "", "en")
        assert name == "html_extract"
    finally:
        EXTRACTORS.pop("zh_chain", None)


def test_grouped_by_lang_matches_default(ray_session):
    import pyarrow.parquet as pq
    import ray.data

    from docler_ray.pipelines.extract_pipeline import (
        PipelineConfig,
        extract_dataset,
        extract_grouped_by_lang,
    )

    files = ["tests/goldens/pages/pages-00000.parquet"]
    cfg = PipelineConfig(extract_concurrency=(1, 2))
    pages = ray.data.read_parquet(files)
    default = (
        extract_dataset(pages, cfg)
        .select_columns(["url", "content", "title"])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    grouped = (
        extract_grouped_by_lang(ray.data.read_parquet(files), cfg)
        .select_columns(["url", "content", "title"])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert default.equals(grouped)

    # forced LARGE bucket count (measured-rows sizing at a huge n_rows):
    # the grouped route's output must be invariant to the keyspace
    grouped_wide = (
        extract_grouped_by_lang(
            ray.data.read_parquet(files), cfg, n_rows=50_000_000
        )
        .select_columns(["url", "content", "title"])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert default.equals(grouped_wide)


def test_embedding_neardup(ray_session):
    import ray.data

    from docler_ray.stages.dedup import drop_id_set, embedding_neardup

    rng = np.random.RandomState(0)
    base = rng.standard_normal(64)
    near = base + rng.standard_normal(64) * 0.01  # cosine ~0.9999
    far = rng.standard_normal(64)
    rows = [
        {"vec_id": 1, "embedding": base.tolist()},
        {"vec_id": 2, "embedding": near.tolist()},
        {"vec_id": 3, "embedding": far.tolist()},
        {"vec_id": 4, "embedding": base.tolist()},  # exact dup
    ]
    ds = ray.data.from_items(rows)
    drop = drop_id_set(embedding_neardup(ds, threshold=0.99))
    assert 1 not in drop
    assert {2, 4} <= drop
    assert 3 not in drop


def test_semdedup_cluster_restriction(ray_session):
    """SemDeDup drops within-cluster near-dups but, BY DESIGN, never
    pairs vectors assigned to different clusters (the paper's recall
    tradeoff) — unlike embedding_neardup's hyperplane LSH."""
    import ray.data

    from docler_ray.stages.dedup import drop_id_set, embedding_neardup, semdedup

    rng = np.random.RandomState(7)
    a = rng.standard_normal(64)
    b = rng.standard_normal(64)
    rows = [
        {"vec_id": 0, "embedding": a.tolist()},            # centroid 0
        {"vec_id": 1, "embedding": b.tolist()},            # centroid 1
        {"vec_id": 2, "embedding": (a * 2.0).tolist()},    # cos(a)=1 -> cluster 0, dup of 0
        {"vec_id": 3, "embedding": (b * 0.5).tolist()},    # dup of 1 in cluster 1
        {"vec_id": 4, "embedding": (-a).tolist()},         # anti-a: cluster 1 side, dup of nobody
    ]
    ds = ray.data.from_items(rows)
    drop = drop_id_set(semdedup(ds, threshold=0.99, k=2))
    assert drop == {2, 3}
    # the same corpus under the LSH generator also finds exactly those
    assert drop_id_set(embedding_neardup(ds, threshold=0.99)) == {2, 3}


def test_semdedup_matches_sql_closure(ray_session):
    """semdedup survivors == the recursive-CTE oracle on a corpus with a
    3-vector duplicate chain inside one cluster."""
    import duckdb
    import pandas as pd
    import ray.data

    import __ray_entry__ as e
    from docler_ray.stages.dedup import anti_join_survivors, semdedup

    rng = np.random.RandomState(3)
    cents = [rng.standard_normal(32) for _ in range(8)]
    rows = [{"vec_id": i, "embedding": c.tolist()} for i, c in enumerate(cents)]
    base = rng.standard_normal(32)
    for i, scale in enumerate([1.0, 1.001, 0.999, -1.0]):
        rows.append({"vec_id": 100 + i, "embedding": (base * scale).tolist()})
    ds = ray.data.from_items(rows)
    n = len(rows)
    drop = semdedup(ds, threshold=0.98, k=8, corpus_rows=n)
    got = sorted(
        anti_join_survivors(ds.select_columns(["vec_id"]), drop, "vec_id", left_rows=n)
        .to_pandas()["vec_id"]
        .tolist()
    )
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame({"vec_id": [r["vec_id"] for r in rows],
                      "embedding": [r["embedding"] for r in rows]}),
    )
    want = sorted(
        x[0] for x in con.execute(e.oracle_sql()["semdedup_survivors"]).fetchall()
    )
    assert got == want
    assert 100 in got and 101 not in got and 102 not in got  # chain collapsed


def test_semdedup_auto_k_from_measured_rows(ray_session):
    """k=None derives the cluster count from measured rows (memory-bounded
    quadratic pair tasks) and still finds the duplicates."""
    import ray.data

    import docler_ray.stages.dedup as dd
    from docler_ray.stages.dedup import drop_id_set, semdedup

    rng = np.random.RandomState(11)
    n = 64
    rows = [
        {"vec_id": i, "embedding": rng.standard_normal(16).tolist()}
        for i in range(n)
    ]
    rows.append({"vec_id": 900, "embedding": (np.array(rows[20]["embedding"]) * 2).tolist()})
    ds = ray.data.from_items(rows)
    # target cluster size 16 -> auto k = 65/16 = 4 (floored at 8 -> 8)
    drop = drop_id_set(semdedup(ds, threshold=0.99))
    assert drop == {900}
    assert dd._SEMDEDUP_TARGET_CLUSTER >= 8  # the constant the default derives from


def test_bounded_assignments_split_oversized_clusters(ray_session):
    """Round-3 verdict finding 2: SemDeDup's per-cluster all-pairs must
    stay memory-bounded past the old 65,536-k cap. Force a tiny
    max_cluster on a corpus whose level-1 assignment dumps ~everything
    into one cluster and prove (a) the semantic level-2 split bounds
    every cluster, (b) every id keeps exactly one assignment."""
    import ray.data

    from docler_ray.stages.similarity import bounded_centroid_assignments

    rng = np.random.RandomState(5)
    cents = rng.standard_normal((8, 16))
    rows = [{"vec_id": i, "embedding": cents[i].tolist()} for i in range(8)]
    # 200 rows all nearest centroid 0 but with spread -> level 2 CAN split
    base = cents[0] * 10
    for i in range(200):
        rows.append(
            {
                "vec_id": 100 + i,
                "embedding": (base + rng.standard_normal(16) * 0.5).tolist(),
            }
        )
    ds = ray.data.from_items(rows)
    out = bounded_centroid_assignments(
        ds, k=8, n_rows=len(rows), max_cluster=24
    ).to_pandas()
    assert len(out) == len(rows)
    assert out["vec_id"].nunique() == len(rows)
    sizes = out.groupby("cluster").size()
    assert sizes.max() <= 24, sizes.sort_values().tail()


def test_bounded_assignments_identical_mass_backstop(ray_session):
    """The pathological regime: one embedding value repeated ~corpus
    times. No proximity split can separate it, so the level-3 id-hash
    backstop must bound cluster sizes (within hash variance of the part
    ceiling) while keeping every id assigned once."""
    import ray.data

    from docler_ray.stages.similarity import bounded_centroid_assignments

    rng = np.random.RandomState(9)
    cents = rng.standard_normal((8, 16))
    rows = [{"vec_id": i, "embedding": cents[i].tolist()} for i in range(8)]
    same = (cents[3] * 2.0).tolist()  # identical direction, 160 copies
    for i in range(160):
        rows.append({"vec_id": 500 + i, "embedding": same})
    ds = ray.data.from_items(rows)
    out = bounded_centroid_assignments(
        ds, k=8, n_rows=len(rows), max_cluster=20
    ).to_pandas()
    assert len(out) == len(rows)
    sizes = out.groupby("cluster").size()
    # id-hash parts: ceil(160/20)=8 parts, ~20 each; allow hash variance
    assert sizes.max() <= 2 * 20, sizes.sort_values().tail()


def test_semdedup_bounded_split_never_invents_drops(ray_session):
    """Forcing the split can only REMOVE candidate pairs (the paper's
    recall-for-tractability tradeoff one level deeper): drops under a
    forced tiny max_cluster must be a subset of flat-assignment drops,
    and true within-subcluster dups must still be caught."""
    import ray.data

    import docler_ray.stages.dedup as dd
    from docler_ray.stages.dedup import drop_id_set
    from docler_ray.stages.similarity import bounded_centroid_assignments

    rng = np.random.RandomState(13)
    cents = rng.standard_normal((8, 16))
    rows = [{"vec_id": i, "embedding": cents[i].tolist()} for i in range(8)]
    # 12 semantically distinct duplicate groups (4 colinear copies each),
    # all level-1-assigned near centroid 0 -> that cluster is oversized,
    # but level-2 references separate the groups (groups per subcluster
    # stay under the cap, so the id-hash backstop never fires)
    for g in range(12):
        d = cents[0] * 4 + rng.standard_normal(16) * 3.0
        for j, scale in enumerate([1.0, 2.0, 0.5, 1.5]):
            rows.append(
                {"vec_id": 100 + 4 * g + j, "embedding": (d * scale).tolist()}
            )
    ds = ray.data.from_items(rows)
    n = len(rows)

    def drops_with(assign):
        pairs, n_pairs = dd._compact_nonempty(
            dd._all_pairs_from_postings(assign, "vec_id", "cluster")
        )
        return drop_id_set(
            dd._cosine_pairs_to_drop(
                ds, pairs, n_pairs, "vec_id", "embedding", 0.999, n
            )
        )

    flat = drops_with(
        bounded_centroid_assignments(ds, k=8, n_rows=n, max_cluster=10**9)
    )
    split = drops_with(
        bounded_centroid_assignments(ds, k=8, n_rows=n, max_cluster=20)
    )
    assert split <= flat
    # colinear group members share their normalized vector, so groups
    # co-land under the semantic split — up to last-ulp argmax near-ties
    # between two sampled references (the same boundary effect flat
    # k-means assignment has at centroid boundaries), so pin >=90%
    # retention rather than exact equality
    assert len(flat - split) <= max(1, len(flat) // 10)
    assert len(split) >= 32  # ~3 drops per 4-copy group
