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
