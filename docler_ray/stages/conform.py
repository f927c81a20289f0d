"""Schema conformance — the ETL boundary every heterogeneous ingest needs:
force a Dataset onto a declared target Arrow schema. Crawl shards disagree
(a field appears mid-crawl, a type widens, an extractor version adds a
column); downstream operators need ONE schema.

Policy per batch, all vectorized Arrow kernels, zero shuffle:

- missing target column  -> typed all-null column (or a per-column default)
- extra column           -> dropped (strict=True raises instead)
- type mismatch          -> ``pyarrow.compute.cast`` with safe=False for
  WIDENING/narrowing numerics and safe string<->number casts; a cast that
  cannot represent the value raises (corrupt data should fail loudly, not
  silently null — the caller can pre-filter)
- column ORDER           -> target order, always

The docler reference normalizes per-document metadata ad hoc in each
converter (e.g. converters/base.py builds Document fields one by one);
this is the corpus-level equivalent expressed once.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def conform_batch(
    batch: pa.Table,
    schema: pa.Schema,
    *,
    defaults: dict | None = None,
    strict: bool = False,
) -> pa.Table:
    defaults = defaults or {}
    if strict:
        extra = set(batch.schema.names) - set(schema.names)
        if extra:
            raise ValueError(f"unexpected columns {sorted(extra)} under strict")
    cols = []
    for field in schema:
        if field.name in batch.schema.names:
            col = batch.column(field.name)
            if col.type != field.type:
                col = pc.cast(col, field.type, safe=False)
        elif field.name in defaults:
            col = pa.array([defaults[field.name]] * batch.num_rows, field.type)
        else:
            col = pa.nulls(batch.num_rows, field.type)
        cols.append(col)
    return pa.table(dict(zip(schema.names, cols)))


def conform_schema(ds, schema: pa.Schema, *, defaults: dict | None = None, strict: bool = False):
    """Zero-shuffle map pass conforming every batch to ``schema``."""
    return ds.map_batches(
        lambda b: conform_batch(b, schema, defaults=defaults, strict=strict),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
