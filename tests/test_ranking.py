"""TF-IDF ranking: integer weights, tf counting, ties, absent terms."""

from __future__ import annotations

import pyarrow as pa
import pytest

from docler_ray.stages.ranking import _IDF_SCALE, tfidf_topk


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_scores_and_ranks(ray_session):
    ds = _ds(
        [
            (1, "apple apple banana"),  # tf(apple)=2
            (2, "apple cherry"),  # tf(apple)=1
            (3, "banana banana"),  # tf(banana)=2
            (4, "nothing relevant"),
        ]
    )
    out = tfidf_topk(ds, ["apple", "banana"], k=10).to_pandas()
    n = 4
    w_apple = (_IDF_SCALE * n) // 2  # df(apple)=2
    w_banana = (_IDF_SCALE * n) // 2  # df(banana)=2
    exp = {
        1: 2 * w_apple + w_banana,
        2: w_apple,
        3: 2 * w_banana,
    }
    got = dict(zip(out.doc_id, out.score))
    assert got == exp
    assert out.loc[out["rank"] == 1, "doc_id"].item() == 1
    assert len(out) == 3  # doc 4 scores 0 and is excluded


def test_tie_breaks_by_doc_id(ray_session):
    ds = _ds([(5, "x"), (2, "x"), (9, "y")])
    out = tfidf_topk(ds, ["x"], k=2).to_pandas()
    assert out.doc_id.tolist() == [2, 5]
    assert out["rank"].tolist() == [1, 2]


def test_absent_terms_empty(ray_session):
    ds = _ds([(1, "a b"), (2, "c")])
    out = tfidf_topk(ds, ["zzz"], k=5).to_pandas()
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "score", "rank"]


def test_empty_query_raises(ray_session):
    with pytest.raises(ValueError):
        tfidf_topk(_ds([(1, "a")]), [])
