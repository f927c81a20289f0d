"""Cross-document n-gram novelty: how much of each document's distinct
word-n-gram set also appears in OTHER documents.

The inter-document overlap signal of training-data curation (near-dup
discovery, template detection, memorization-risk scoring) — the
document-level complement of the span dedup in stages/spandedup.py. Pure
integer outputs (no float ratios) so the DuckDB oracle pins every value
exactly.

Definitions (mirrored by the oracle): tokens = whitespace split of
``trim(text)``; grams = the DISTINCT overlapping word ``n``-grams of a
document (decontam.py's spelling); ``n_grams`` = that distinct count;
``n_shared`` = how many of them occur in >= 2 distinct documents.

Scale shape — the min-owner trick avoids re-joining the gram table:

1. per-document distinct-gram counts are LOCAL to the document, so
   ``n_grams`` comes from a zero-shuffle map pass over the corpus.
2. the (gram, doc_id) pairs flat-map out ONCE into a coarse-keyed
   exchange computing df = COUNT and owner = MIN(doc_id) per gram. A gram
   with df == 1 belongs to exactly one document — its owner — so "unique
   grams per doc" needs NO join back to the gram table: filter df == 1,
   groupby(owner) -> (doc_id, n_unique). The exchange key is
   ``coarse = crc32(gram) % P`` (ONE int64), not the gram string: Ray's
   sort-based groupby re-materializes the first sort column per partition
   boundary (`find_partition_index`'s ``to_numpy()[left:right]``), which
   on a corpus-sized STRING column costs O(boundaries x rows) Python
   object conversions — the round-5 sf1 distinct-window audit measured
   ~3.3 s per 28k-row block on a string-first key. Every occurrence of a
   gram shares its coarse bucket, so the in-bucket Arrow ``group_by`` over
   the true gram strings computes GLOBAL df/owner — exactness does not
   rest on hash collision-freedom, the string rides as payload.
3. one narrow left join (2-int rows on both sides) gives
   n_shared = n_grams - n_unique.

The naive plan (join df back onto the gram table) ships the gram table
twice and its join output is gram-instance-sized; here the gram table
ships once and the join is document-sized. The corpus text is read twice
(once per pass) — streaming re-read beats materializing the
gram-instance-sized emit table that sharing one pass would require.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from docler_ray.stages.decontam import _ngrams


def ngram_novelty(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    n_rows: int | None = None,
):
    """documents -> (doc_id, n_grams, n_shared) with exact integer counts."""
    import zlib

    from ray.data.aggregate import Count

    from docler_ray.stages.dedup import _compact_nonempty, _num_partitions

    n_corpus = n_rows
    if n_corpus is None:
        # free on raw reads (parquet metadata); pass n_rows for lazy chains
        try:
            n_corpus = ds.count()
        except Exception:  # pragma: no cover - count unavailable pre-exec
            n_corpus = None
    # ~64 documents' distinct grams per bucket: bounded in-group tables at
    # any corpus size, enough buckets to keep every core busy
    n_buckets = max(64, (n_corpus or 0) // 64)

    def count_local(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        n = [len(set(_ngrams(t or "", ngram))) for t in texts]
        return pa.table(
            {
                "doc": pc.cast(batch.column(id_col), pa.int64()),
                "n_grams": pa.array(n, pa.int64()),
            }
        )

    def emit_pairs(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_doc: list[int] = []
        out_gram: list[str] = []
        out_coarse: list[int] = []
        for i, t in zip(ids, texts):
            grams = set(_ngrams(t or "", ngram))
            out_doc.extend([int(i)] * len(grams))
            out_gram.extend(grams)
            out_coarse.extend(
                zlib.crc32(g.encode("utf-8")) % n_buckets for g in grams
            )
        return pa.table(
            {
                "gram": pa.array(out_gram, pa.string()),
                "doc": pa.array(out_doc, pa.int64()),
                "coarse": pa.array(out_coarse, pa.int64()),
            }
        )

    per_doc = ds.map_batches(
        count_local, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = ds.map_batches(
        emit_pairs, batch_format="pyarrow", zero_copy_batch=True
    )

    # one coarse-keyed exchange; in-bucket Arrow group_by over the true
    # gram strings is GLOBAL per gram (all of a gram's occurrences share
    # the bucket): df + owning doc, emit the df==1 owners only. The column
    # is named "doc" HERE so the join side needs no rename_columns (a
    # rename fetches the schema, which executes the whole upstream gram
    # exchange a second time — measured 2x cost).
    def bucket_df1_owners(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["gram", "doc"])
            .group_by("gram")
            .aggregate([("doc", "count"), ("doc", "min")])
        )
        t = g.filter(pc.equal(g.column("doc_count"), 1))
        return pa.table({"doc": pc.cast(t.column("doc_min"), pa.int64())})

    uniques = (
        pairs.groupby("coarse")
        .map_groups(bucket_df1_owners, batch_format="pyarrow")
        .groupby("doc")
        .aggregate(Count(alias_name="n_unique"))
    )

    left, n_docs = _compact_nonempty(per_doc)
    right, n_right = _compact_nonempty(uniques)
    if left is None:
        return per_doc.map_batches(
            lambda b: pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_grams": pa.array([], pa.int64()),
                    "n_shared": pa.array([], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    if right is None:
        # no df==1 grams anywhere: every gram is shared
        return left.map_batches(
            lambda b: pa.table(
                {
                    "doc_id": b.column("doc"),
                    "n_grams": b.column("n_grams"),
                    "n_shared": b.column("n_grams"),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    joined = left.join(
        right,
        join_type="left_outer",
        on=("doc",),
        num_partitions=_num_partitions(n_docs),
    )

    def finish(batch: pa.Table) -> pa.Table:
        n_unique = pc.fill_null(batch.column("n_unique"), 0)
        shared = pc.subtract(batch.column("n_grams"), n_unique)
        return pa.table(
            {
                "doc_id": batch.column("doc"),
                "n_grams": batch.column("n_grams"),
                "n_shared": pc.cast(shared, pa.int64()),
            }
        )

    return joined.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )
