"""Aho-Corasick automaton: brute-force equivalence on adversarial pattern
sets (substring patterns, cross-overlap, self-overlap) + the actor-pool
stage contract."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from docler_ray.stages.acmatch import AhoCorasick, ac_pattern_counts


def _brute(text, p):
    return sum(1 for i in range(len(text) - len(p) + 1) if text[i : i + len(p)] == p)


def test_ac_matches_brute_force_adversarial():
    import random

    pats = ["aba", "ab", "ba", "aab", "aa", "she", "he", "hers", "x"]
    ac = AhoCorasick(pats)
    rng = random.Random(4)
    for _ in range(300):
        text = "".join(rng.choice("abhersx") for _ in range(60))
        assert ac.counts(text).tolist() == [_brute(text, p) for p in pats], text


def test_ac_overlapping_and_suffix_outputs():
    ac = AhoCorasick(["aa", "she", "he"])
    # self-overlap: 'aa' twice in 'aaa'
    assert ac.counts("aaa").tolist() == [2, 0, 0]
    # suffix-link output: 'she' contains 'he' ending at the same position
    assert ac.counts("she").tolist() == [0, 1, 1]


def test_ac_empty_and_no_match():
    ac = AhoCorasick(["zz"])
    assert ac.counts("").tolist() == [0]
    assert ac.counts("zyzyz").tolist() == [0]


def test_ac_stage_counts(ray_session):
    import ray.data

    texts = ["the hash join beats the table scan", "hash join again", None]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    df = (
        ac_pattern_counts(ds, ["hash join", "table scan", "absent phrase"])
        .to_pandas()
        .set_index("pattern")
    )
    assert df["n"].to_dict() == {"hash join": 2, "table scan": 1}


def test_batch_automaton_equals_scalar():
    import random

    from docler_ray.stages.acmatch import AhoCorasickBatch

    pats = ["aba", "ab", "ba", "aab", "aa", "she", "he", "hers", "x", "hash join"]
    ac = AhoCorasick(pats)
    acb = AhoCorasickBatch(pats)
    rng = random.Random(9)
    texts = [
        "".join(rng.choice("abhersx j") for _ in range(rng.randint(0, 80)))
        for _ in range(200)
    ] + ["héllo she aa", "", "aaa"]  # unicode + empty + self-overlap
    want = np.zeros(len(pats), dtype=np.int64)
    for t in texts:
        ac.count_into(t, want)
    assert (acb.counts_batch(texts) == want).all()
    assert acb.counts_batch([]).tolist() == [0] * len(pats)
    assert acb.counts_batch(["", ""]).tolist() == [0] * len(pats)
