"""Rule-based document tagging: named RE2 patterns -> per-doc boolean tags.

The content-classification workhorse of web-curation pipelines (tag docs as
code-like / listy / boilerplate-bearing / domain-specific by regex rules,
then route or filter on the tags). Zero shuffle: one vectorized
``match_substring_regex`` kernel per rule per batch, all RE2 — the same
engine DuckDB uses, so the oracle replays each rule with ``regexp_matches``
verbatim and the two spellings cannot diverge on RE2-expressible patterns.

``rule_profile`` adds the corpus roll-up (docs matched per rule) with
map-side partial sums, shipping O(rules x blocks) integers — never rows.

No reference precedent (docler never classifies content; SURVEY.md §2.7);
this sits in the training-data quality tier next to the C4/Gopher filters.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def tag_batch(
    batch: pa.Table,
    rules: dict[str, str],
    *,
    text_col: str = "text",
    count_patterns: dict[str, str] | None = None,
) -> pa.Table:
    """Append one bool column per rule (named ``tag_<rule>``) and one int64
    match-count column per count pattern (named ``n_<name>``). Nulls read
    as empty text and never match."""
    text = pc.fill_null(batch.column(text_col), "")
    for name, pattern in rules.items():
        batch = batch.append_column(
            f"tag_{name}", pc.match_substring_regex(text, pattern)
        )
    for name, pattern in (count_patterns or {}).items():
        batch = batch.append_column(
            f"n_{name}",
            pc.cast(pc.count_substring_regex(text, pattern), pa.int64()),
        )
    return batch


def rule_tagger(
    ds,
    rules: dict[str, str],
    *,
    text_col: str = "text",
    count_patterns: dict[str, str] | None = None,
):
    """Dataset wrapper: stateless zero-copy map pass, no shuffle."""
    return ds.map_batches(
        lambda b: tag_batch(
            b, rules, text_col=text_col, count_patterns=count_patterns
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def rule_profile(ds, rules: dict[str, str], *, text_col: str = "text"):
    """Corpus roll-up: one row of ``(n_docs, <rule> counts...)``.

    Each batch reduces to a single partial-count row (O(rules) integers),
    so the trailing aggregate sums O(blocks) tiny rows — the map-side
    pre-aggregation shape; per-task and driver state are both
    rule-bounded, never corpus-bounded.
    """
    from ray.data.aggregate import Sum

    names = list(rules)

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column(text_col), "")
        row = {"n_docs": pa.array([batch.num_rows], pa.int64())}
        for name in names:
            hits = pc.sum(
                pc.cast(pc.match_substring_regex(text, rules[name]), pa.int64())
            ).as_py()
            row[name] = pa.array([hits or 0], pa.int64())
        return pa.table(row)

    agg = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(
        Sum("n_docs", alias_name="n_docs"),
        *[Sum(n, alias_name=n) for n in names],
    )
    return pa.table(
        {k: pa.array([v], pa.int64()) for k, v in sorted(agg.items())}
    )


def phrase_hit_counts(ds, phrases: list[str], *, text_col: str = "text", id_col: str = "doc_id"):
    """Multi-pattern literal phrase scan: per document, the non-overlapping
    occurrence count of each phrase in a FIXED list (blocklist / keyword /
    toxicity-phrase scanning — the literal-substring sibling of
    ``rule_tagger``). Output is sparse long format (id, phrase, n) with
    n > 0 only.

    Zero shuffle: the phrase list is a bounded constant dictionary (a
    dictionary too large for a task closure would ride ``ray.put`` like
    every other broadcast small side); counting is one vectorized Arrow
    ``count_substring`` kernel per phrase per batch. Arrow counts
    non-overlapping left-to-right matches — the same semantics as SQL
    replace-arithmetic ``(length(t) - length(replace(t, p, ''))) /
    length(p)``, so the oracle replays each phrase verbatim.
    """
    if not phrases:
        raise ValueError("phrase_hit_counts needs at least one phrase")

    def scan(batch: pa.Table) -> pa.Table:
        import numpy as np

        text = pc.fill_null(batch.column(text_col), "")
        ids = batch.column(id_col)
        id_parts, phrase_parts, n_parts = [], [], []
        for p in phrases:
            n = pc.cast(pc.count_substring(text, p), pa.int64())
            mask = pc.greater(n, 0)
            hit_n = n.filter(mask)
            id_parts.append(ids.filter(mask))
            phrase_parts.append(np.full(len(hit_n), p, dtype=object))
            n_parts.append(hit_n)
        return pa.table(
            {
                id_col: pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in id_parts]
                ),
                "phrase": pa.array(np.concatenate(phrase_parts), pa.string()),
                "n": pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in n_parts]
                ),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)
