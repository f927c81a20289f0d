"""Near-dedup survivor goldens (VERDICT round-1 item 1).

The round-1 driver-side verify/cluster implementation's survivor sets were
pinned with tools/pin_dedup_goldens.py; the distributed round-2 rewrite
(Dataset-native pairs, hash-join payload co-location, min-label components,
left_anti survivors) must reproduce them EXACTLY at sf0.01 — identical
candidate generation, identical exact-Jaccard verify, identical
keep-min-per-cluster semantics; only the execution strategy changed.
"""

from __future__ import annotations

import json
import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "dedup_survivors.json")
SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _golden(name: str) -> list[int]:
    with open(GOLDEN) as f:
        return json.load(f)["sf0.01"][name]


@pytest.mark.parametrize(
    "qname,id_col",
    [
        ("minhash_survivors", "doc_id"),
        ("ngram_jaccard_survivors", "doc_id"),
        ("embedding_neardup_survivors", "vec_id"),
    ],
)
def test_survivors_match_round1_golden(ray_session, qname, id_col):
    import __ray_entry__ as entry

    res = entry.queries()[qname](SF_DIR)
    df = res.to_pandas()
    assert sorted(int(x) for x in df[id_col]) == _golden(qname)
