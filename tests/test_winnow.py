"""Winnowing fingerprints (Schleimer-Wilkerson-Aiken SIGMOD'03): selection
rule vs a brute-force reference, the paper's two guarantees, and the
operator-level contracts."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from docler_ray.functions.tokens import ws_tokens
from docler_ray.stages.winnow import (
    gram_hashes,
    winnow_positions,
    winnow_profile,
    winnow_shared_pairs,
)


def _brute_positions(h, w):
    n = len(h)
    if n == 0:
        return []
    w = min(w, n)
    sel = set()
    for t in range(n - w + 1):
        window = h[t : t + w]
        m = min(window)
        # rightmost minimum
        for off in range(w - 1, -1, -1):
            if window[off] == m:
                sel.add(t + off)
                break
    return sorted(sel)


def test_winnow_positions_vs_brute_force():
    rng = np.random.default_rng(5)
    for trial in range(30):
        n = int(rng.integers(0, 60))
        # small value range forces plenty of ties -> exercises the
        # rightmost-tie rule hard
        h = rng.integers(0, 6, n).astype(np.int64)
        got = winnow_positions(h, 8).tolist()
        assert got == _brute_positions(h.tolist(), 8), (trial, h.tolist())


def test_winnow_rightmost_tie_rule():
    # all-equal hashes: every window picks its LAST element
    h = np.zeros(10, dtype=np.int64)
    assert winnow_positions(h, 4).tolist() == [3, 4, 5, 6, 7, 8, 9]


def test_winnow_density_bound():
    """Expected density is 2/(w+1); pin a loose 3x bound on random input
    (random 52-bit hashes are effectively tie-free)."""
    rng = np.random.default_rng(11)
    h = rng.integers(0, 2**52, 5000).astype(np.int64)
    sel = winnow_positions(h, 8)
    density = len(sel) / len(h)
    assert density < 3 * 2 / 9
    assert density > 2 / 9 / 3


def test_winnow_shared_substring_guarantee():
    """Any shared run of >= w+k-1 words yields >= 1 shared fingerprint
    HASH (the paper's correctness property)."""
    shared = " ".join(f"s{i}" for i in range(8 + 4 - 1))  # w+k-1 words
    a = "left filler words here " + shared + " tail alpha"
    b = "completely different prefix tokens " + shared + " other omega end"
    fa = gram_hashes(ws_tokens(a), 4)
    fb = gram_hashes(ws_tokens(b), 4)
    sa = set(fa[winnow_positions(fa, 8)].tolist())
    sb = set(fb[winnow_positions(fb, 8)].tolist())
    assert sa & sb


def test_winnow_short_and_empty_docs():
    assert winnow_positions(np.empty(0, dtype=np.int64), 8).tolist() == []
    assert gram_hashes([], 4).tolist() == []
    assert gram_hashes(["a", "b", "c"], 4).tolist() == []  # < k tokens
    # fewer grams than w: one degenerate window, rightmost global min
    h = np.array([5, 1, 1], dtype=np.int64)
    assert winnow_positions(h, 8).tolist() == [2]


def test_winnow_profile_pins_multiset(ray_session):
    import ray.data

    texts = [
        "the quick brown fox jumps over the lazy dog again and again ok",
        "",
        "tiny",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    df = winnow_profile(ds).to_pandas().set_index("doc_id")
    h = gram_hashes(ws_tokens(texts[0]), 4)
    sel = winnow_positions(h, 8)
    picked = h[sel]
    assert df.loc[0, "n_grams"] == len(h)
    assert df.loc[0, "n_fp"] == len(sel)
    assert df.loc[0, "fp_xor"] == int(np.bitwise_xor.reduce(picked))
    assert df.loc[0, "fp_sum"] == int(picked.sum())
    assert (df.loc[[1, 2], ["n_grams", "n_fp", "fp_min"]] == 0).all().all()


def test_winnow_shared_pairs_finds_plagiarism(ray_session):
    import ray.data

    shared = " ".join(f"w{i}" for i in range(30))
    texts = [
        "doc zero prefix " + shared + " zero suffix tail",
        "doc one other prefix " + shared + " one ending",
        "entirely unrelated third document with its own words only here",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    df = winnow_shared_pairs(ds, min_shared=2).to_pandas()
    assert [(int(r.a), int(r.b)) for r in df.itertuples()] == [(0, 1)]


# --- Broder containment ------------------------------------------------------


def test_containment_catches_quote_jaccard_misses(ray_session):
    import ray.data

    from docler_ray.stages.winnow import containment_pairs

    quote = " ".join(f"q{i}" for i in range(12))
    long_doc = (
        " ".join(f"l{i}" for i in range(80)) + " " + quote + " "
        + " ".join(f"m{i}" for i in range(80))
    )
    texts = [quote, long_doc, "an unrelated third document of words"]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    df = containment_pairs(ds, num=4, den=5).to_pandas()
    assert [(int(r.a), int(r.b)) for r in df.itertuples()] == [(0, 1)]
    row = df.iloc[0]
    # every gram of the quote appears in the long doc: full containment
    assert row["n_shared"] == row["n_a"] == 9  # 12 words -> 9 4-grams
    # Jaccard would be 9 / (9 + n_b - 9) ~ 0.05 — far below any threshold
    assert row["n_b"] > 100


def test_containment_threshold_cross_multiply(ray_session):
    import ray.data

    from docler_ray.stages.winnow import containment_pairs

    base = [f"w{i}" for i in range(13)]  # 10 grams
    # doc 1 shares exactly 7 of doc 0's 10 grams (7/10 < 4/5): dropped
    texts = [" ".join(base), " ".join(base[:10] + ["x", "y", "z"])]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    assert containment_pairs(ds, num=4, den=5).count() == 0
    # at 7/10 threshold they pass
    assert containment_pairs(ds, num=7, den=10).count() == 1
