"""Regenerate the committed golden corpus + golden extractions.

Analog of the reference's syrupy snapshot corpus
(/root/reference/tests/__snapshots__/test_output.ambr): run once, eyeball,
commit; from then on the pipeline must reproduce every byte. Run only when
the extraction contract intentionally changes:

    python tools/make_goldens.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from docler_ray.sources.synth import write_pages_corpus
from docler_ray.stages.classify import classify_batch
from docler_ray.stages.extract import ExtractDocs

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "goldens")
N_ROWS = 300
SEED = 42
ROWS_PER_SHARD = 150


def main() -> None:
    pages_dir = os.path.join(GOLDEN_DIR, "pages")
    if os.path.isdir(pages_dir):
        for f in os.listdir(pages_dir):
            os.remove(os.path.join(pages_dir, f))
    paths = write_pages_corpus(pages_dir, N_ROWS, seed=SEED, rows_per_shard=ROWS_PER_SHARD)

    # Single-threaded pure-Python extraction — the independent path the Ray
    # pipeline must match byte-for-byte.
    extractor = ExtractDocs()
    out_tables = []
    for p in paths:
        batch = pq.read_table(p)
        batch = classify_batch(batch)
        out_tables.append(extractor(batch))
    docs = pa.concat_tables(out_tables)
    golden = docs.select(["url", "content", "title", "page_count", "error", "extractor"])
    pq.write_table(golden, os.path.join(GOLDEN_DIR, "golden_docs.parquet"))

    n_err = sum(1 for e in golden.column("error").to_pylist() if e)
    print(
        json.dumps(
            {
                "rows": golden.num_rows,
                "errors": n_err,
                "pages_files": [os.path.basename(p) for p in paths],
            }
        )
    )


if __name__ == "__main__":
    main()
