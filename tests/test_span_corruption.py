"""T5 span-corruption accounting: mask determinism, run/span counting,
and the length identity."""

from __future__ import annotations

import hashlib

import pyarrow as pa

from docler_ray.functions.tokens import ws_tokens
from docler_ray.stages.packing import span_corruption_plan


def _mask(doc_id, n, rate=15):
    return [
        int(hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()[:13], 16) % 100 < rate
        for i in range(1, n + 1)
    ]


def test_span_plan_matches_reference(ray_session):
    import ray.data

    texts = ["one two three four five six seven eight nine ten " * 5, "a b", ""]
    ids = [3, 17, 99]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    df = span_corruption_plan(ds).to_pandas().set_index("doc_id")
    for d, t in zip(ids, texts):
        n = len(ws_tokens(t))
        m = _mask(d, n)
        spans = sum(
            1 for i, x in enumerate(m) if x and (i == 0 or not m[i - 1])
        )
        row = df.loc[d]
        assert row["n_tokens"] == n
        assert row["n_masked"] == sum(m)
        assert row["n_spans"] == spans
        # the denoising length identity
        assert row["corrupted_len"] == n - sum(m) + spans


def test_span_plan_rate_zero_and_full(ray_session):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": pa.array(["w1 w2 w3 w4"], pa.string()),
            }
        )
    )
    none = span_corruption_plan(ds, rate_pct=0).to_pandas().iloc[0]
    assert none["n_masked"] == 0 and none["corrupted_len"] == 4
    full = span_corruption_plan(ds, rate_pct=100).to_pandas().iloc[0]
    assert full["n_masked"] == 4 and full["n_spans"] == 1
    assert full["corrupted_len"] == 1  # everything collapses to one sentinel
