"""Semi-structured (JSON string column) operators.

The reference's only open-schema surface is ``Document.metadata: dict``
(SURVEY.md §1.3), carried here as a JSON string column; these operators make
that column queryable at corpus scale. Parsing happens inside map_batches
with MAP-SIDE pre-aggregation — the shuffle ships only (value, partial_n)
pairs, never the parsed documents.
"""

from __future__ import annotations

import json

import pyarrow as pa


_PLACEHOLDER = {int: 0, float: 0.0, str: "", bool: False}
_ARROW_TYPE = {int: pa.int64(), float: pa.float64(), str: pa.string(), bool: pa.bool_()}


def json_field_counts(ds, *, col: str, field: str, field_type: type = int):
    """Counts per distinct value of ``field`` inside the JSON column ``col``.

    Rows whose JSON is missing/invalid or lack the field count under null.
    Returns a Dataset with columns (<field>, n).

    ``field_type`` declares the field's scalar type (int/float/str/bool) —
    it fixes BOTH the null-placeholder value and the Arrow column type, so
    an all-null batch cannot emit a differently-typed block than its
    siblings (per-batch type inference gave the groupby incompatible block
    schemas — round-1 ADVICE finding). Missing/invalid rows ride through
    the shuffle under an ``is_null`` flag (Ray's sort-based groupby rejects
    null keys) and are re-nulled afterwards; values of a different type
    than declared count as null.
    """
    from ray.data.aggregate import Sum

    if field_type not in _PLACEHOLDER:
        msg = f"field_type must be one of {sorted(_PLACEHOLDER, key=str)}"
        raise ValueError(msg)
    placeholder = _PLACEHOLDER[field_type]
    arrow_type = _ARROW_TYPE[field_type]

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict = {}
        null_n = 0
        for blob in batch.column(col).to_pylist():
            val = None
            if blob:
                try:
                    val = json.loads(blob).get(field)
                except (ValueError, AttributeError):
                    val = None
            if val is None or not isinstance(val, field_type) or (
                field_type is not bool and isinstance(val, bool)
            ):
                null_n += 1
            else:
                counts[val] = counts.get(val, 0) + 1
        keys = list(counts.keys())
        ns = list(counts.values())
        flags = [False] * len(keys)
        if null_n:
            keys.append(placeholder)
            ns.append(null_n)
            flags.append(True)
        return pa.table(
            {
                field: pa.array(keys, type=arrow_type),
                "is_null": pa.array(flags, type=pa.bool_()),
                "partial_n": pa.array(ns, type=pa.int64()),
            }
        )

    def renull(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = pc.if_else(
            batch.column("is_null"),
            pa.scalar(None, type=batch.column(field).type),
            batch.column(field),
        )
        return pa.table({field: keys, "n": batch.column("n")})

    grouped = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([field, "is_null"])
        .aggregate(Sum("partial_n", alias_name="n"))
    )
    return grouped.map_batches(renull, batch_format="pyarrow", zero_copy_batch=True)
