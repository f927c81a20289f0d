"""Levenshtein near-dup stage: kernel exactness vs DuckDB (byte
semantics), early-abandon sentinel, band-replication coverage across
length-band boundaries, and empty-result schema stability."""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from docler_ray.stages.editdist import (
    levenshtein_bytes,
    levenshtein_neardup_pairs,
)


def _b(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-8"), dtype=np.uint8)


def test_kernel_matches_duckdb_bytes():
    rng = random.Random(11)
    con = duckdb.connect()
    alphabet = "abcd你好é \t"
    for _ in range(200):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 50)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 50)))
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert levenshtein_bytes(_b(a), _b(b), 500) == want, (a, b)


def test_kernel_early_abandon_sentinel():
    rng = random.Random(13)
    for _ in range(60):
        a = "".join(rng.choice("abcdef") for _ in range(rng.randrange(0, 40)))
        b = "".join(rng.choice("abcdef") for _ in range(rng.randrange(0, 40)))
        full = levenshtein_bytes(_b(a), _b(b), 500)
        for d in (0, 1, 2, 5, 9):
            got = levenshtein_bytes(_b(a), _b(b), d)
            assert got == (full if full <= d else d + 1), (a, b, d)


def test_kernel_edges():
    assert levenshtein_bytes(_b(""), _b(""), 3) == 0
    assert levenshtein_bytes(_b("abc"), _b(""), 3) == 3
    assert levenshtein_bytes(_b(""), _b("abcd"), 3) == 4  # sentinel
    assert levenshtein_bytes(_b("kitten"), _b("sitting"), 10) == 3


def _oracle_pairs(rows, d_max: int):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    return con.execute(
        "SELECT a.doc_id, b.doc_id, levenshtein(a.text, b.text) FROM t a "
        "JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id "
        f"WHERE levenshtein(a.text, b.text) <= {d_max} ORDER BY 1, 2"
    ).fetchall()


def _ray_pairs(ray_session, rows, d_max: int):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array([r[2] for r in rows]),
            }
        )
    )
    pairs = levenshtein_neardup_pairs(
        ds, text_col="text", group_col="lang", id_col="doc_id", d_max=d_max
    )
    df = pairs.to_pandas()
    return sorted(
        (int(a), int(b), int(d))
        for a, b, d in df[["id_a", "id_b", "dist"]].itertuples(index=False)
    )


def test_pipeline_band_boundary_coverage(ray_session):
    # d_max=4 -> W=8; craft pairs whose lengths straddle a band boundary
    # (7 vs 9 bytes: bands 0 and 1) so coverage depends on the low-band
    # replica, plus same-band pairs, a cross-lang non-pair, and unicode.
    d_max = 4
    rows = [
        (1, "aaaaaaa", "en"),  # 7 bytes, band 0
        (2, "aaaaaaaba", "en"),  # 9 bytes, band 1 — dist 2 from doc 1
        (3, "aaaaaaa", "de"),  # same text, other lang: must NOT pair with 1
        (4, "zzzzzzzz", "en"),  # 8 bytes, far from everything
        (5, "你好你好", "en"),  # 12 bytes
        (6, "你好你是", "en"),  # 12 bytes — byte dist 3 from doc 5
        (7, "aaaaaaab", "en"),  # 8 bytes — dist 1 from doc 1, dist 1 from 2
    ]
    got = _ray_pairs(ray_session, rows, d_max)
    want = [tuple(r) for r in _oracle_pairs(rows, d_max)]
    assert got == want
    assert (1, 2, 2) in got and (5, 6, 3) in got and (1, 7, 1) in got
    assert not any(a == 1 and b == 3 for a, b, _ in got)


def test_pipeline_random_vs_oracle(ray_session):
    rng = random.Random(5)
    rows = []
    base = ["".join(rng.choice("abcdef ") for _ in range(rng.randrange(5, 60))) for _ in range(12)]
    i = 0
    for s in base:
        for _ in range(rng.randrange(1, 4)):
            chars = list(s)
            for _ in range(rng.randrange(0, 6)):
                pos = rng.randrange(0, len(chars))
                chars[pos] = rng.choice("abcdef ")
            rows.append((i, "".join(chars), rng.choice(["en", "de"])))
            i += 1
    d_max = 6
    assert _ray_pairs(ray_session, rows, d_max) == [
        tuple(r) for r in _oracle_pairs(rows, d_max)
    ]


def test_pipeline_no_pairs_schema(ray_session):
    import ray.data

    rows = [(1, "abcdefghij", "en"), (2, "zzzzzzzzzzzzzzzzzzzzzzzz", "en")]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array([r[2] for r in rows]),
            }
        )
    )
    pairs = levenshtein_neardup_pairs(
        ds, text_col="text", group_col="lang", id_col="doc_id", d_max=2
    )
    # Ray 2.49 to_pandas drops columns on an all-empty dataset, so assert
    # on the dataset-level schema (the anchor block carries it) + count
    assert pairs.schema().names == ["id_a", "id_b", "dist"]
    assert pairs.count() == 0


def test_keep_best_regimes_agree(ray_session, monkeypatch):
    import ray.data

    import docler_ray.stages.dedup as dedup
    from docler_ray.stages.editdist import levenshtein_neardup_pairs

    rows = [
        (1, "alpha beta gamma delta", "en", 22),
        (2, "alpha beta gamma deltaX", "en", 23),  # near-dup of 1, longer
        (3, "alpha beta gamma deltaXY", "en", 24),  # chain: longest wins
        (4, "completely different words here", "en", 31),
        (5, "zzz yyy", "de", 7),
        (6, "zzz yyyQ", "de", 8),  # de cluster: 6 survives (longer)
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array([r[2] for r in rows]),
                "n_chars": pa.array([r[3] for r in rows], pa.int64()),
            }
        )
    )

    def survivors():
        pairs = levenshtein_neardup_pairs(
            ds, text_col="text", group_col="lang", id_col="doc_id", d_max=4
        )
        drop = dedup.drop_from_pairs_keep_best(
            pairs, ds, id_col="doc_id", score_col="n_chars"
        )
        out = dedup.anti_join_survivors(ds, drop, "doc_id", left_rows=6)
        return sorted(out.to_pandas()["doc_id"].tolist())

    broadcast = survivors()
    assert broadcast == [3, 4, 6]  # longest member per cluster survives
    monkeypatch.setattr(dedup, "_SMALL_DROP", 0)  # force distributed join
    assert survivors() == broadcast
