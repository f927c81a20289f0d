"""Pin the near-dedup survivor sets as goldens (VERDICT round-1 item 1).

Runs the three near-dedup survivor queries from __ray_entry__ at sf0.01 and
sf0.1 and writes the sorted surviving id lists to
tests/goldens/dedup_survivors.json. The distributed rewrite of
stages/dedup.py must reproduce these EXACTLY (same candidate generation,
same exact-Jaccard verify, same keep-min-per-cluster semantics) — only the
execution strategy may change.

Usage: python tools/pin_dedup_goldens.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "goldens",
    "dedup_survivors.json",
)


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__ as entry

    qs = entry.queries()
    out: dict[str, dict[str, list]] = {}
    for sf in ("sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            continue
        out[sf] = {}
        for name, id_col in (
            ("minhash_survivors", "doc_id"),
            ("ngram_jaccard_survivors", "doc_id"),
            ("embedding_neardup_survivors", "vec_id"),
        ):
            res = qs[name](sf_dir)
            tbl = res.to_arrow_refs() if hasattr(res, "to_arrow_refs") else None
            if hasattr(res, "to_pandas"):
                df = res.to_pandas()
            else:
                df = res
            ids = sorted(int(x) for x in df[id_col])
            out[sf][name] = ids
            print(f"{sf} {name}: {len(ids)} survivors")
    with open(GOLDEN_PATH, "w") as f:
        json.dump(out, f)
    print(f"wrote {GOLDEN_PATH}")
    ray.shutdown()


if __name__ == "__main__":
    main()
