"""Per-document directory export — the debug/inspection sink.

Analog of mkdown's ``Document.export_to_directory`` as exercised by the
reference's golden snapshot tests (/root/reference/tests/test_output.py:38-91;
golden layout at tests/__snapshots__/test_output.ambr:2-18): one directory per
document containing ``document.md`` (YAML frontmatter with
title/source_path/mime_type/page_count followed by the content) plus one file
per image. Not a scale path — the production sink is parquet — but the exact
file layout users of the reference expect for spot checks.
"""

from __future__ import annotations

import os


def export_document_markdown(
    content: str,
    title: str,
    source_path: str,
    mime_type: str,
    page_count: int,
) -> str:
    """The ``document.md`` payload: YAML frontmatter + blank line + content
    (field order frozen by the reference snapshot, test_output.ambr:9-15)."""
    return (
        "---\n"
        f"title: {title}\n"
        f"source_path: {source_path}\n"
        f"mime_type: {mime_type}\n"
        f"page_count: {page_count}\n"
        "---\n"
        "\n"
        f"{content}\n"
    )


def get_metadata(row: dict) -> dict:
    """Flat metadata dict for one extracted docs row — the standalone
    projection the reference exposes as ``get_metadata``
    (/root/reference/src/docler/converters/azure_provider/utils.py:33-42:
    first document's fields flattened to name -> string). This engine keeps
    open metadata as a JSON string column (SURVEY.md §1.4), so the
    projection parses that column and overlays the row's structured fields,
    values stringified like the reference's valueString/content access.
    """
    import json

    meta: dict = {}
    raw = row.get("metadata")
    if raw:
        try:
            parsed = json.loads(raw) if isinstance(raw, str) else dict(raw)
        except (ValueError, TypeError):
            parsed = {}
        meta.update({str(k): "" if v is None else str(v) for k, v in parsed.items()})
    for field in ("title", "mime_type", "page_count", "extractor"):
        if row.get(field) is not None:
            meta[field] = str(row[field])
    return meta


def export_to_directory(row: dict, out_dir: str) -> list[str]:
    """Write one extracted docs row as document.md + image files.

    Returns the sorted list of files written (the reference's
    ``files_list`` snapshot shape, test_output.ambr:3-6).
    """
    os.makedirs(out_dir, exist_ok=True)
    md = export_document_markdown(
        content=row["content"],
        title=row.get("title") or "Untitled",
        source_path=row.get("url") or row.get("source_path") or "",
        mime_type=row.get("mime_type") or "",
        page_count=int(row.get("page_count") or 0),
    )
    with open(os.path.join(out_dir, "document.md"), "w", encoding="utf-8") as f:
        f.write(md)
    written = ["document.md"]
    for img in row.get("images") or []:
        filename = img.get("filename") or f"{img['id']}.png"
        with open(os.path.join(out_dir, filename), "wb") as f:
            f.write(img.get("content") or b"")
        written.append(filename)
    return sorted(written)


def export_jsonl(ds, out_dir: str, *, encode_binary_b64: bool = True):
    """Sharded JSONL sink — the interchange format training-data tooling
    reads (one JSON object per line, one file per block, so output
    parallelism equals pipeline parallelism and a failed run can resume by
    shard). Streaming end: ``Dataset.write_json`` consumes the pipeline with
    backpressure; nothing materializes on the driver.

    JSON has no bytes type, so binary columns are base64-encoded first
    (``<name>_b64`` replaces ``<name>``), matching how the reference ships
    image payloads in-band (SURVEY.md §1.2: data-URI base64 content).
    """
    import base64

    import pyarrow as pa

    binary_cols = [
        f.name
        for f in ds.schema().base_schema
        if pa.types.is_binary(f.type) or pa.types.is_large_binary(f.type)
    ]
    if encode_binary_b64 and binary_cols:

        def encode(batch: pa.Table) -> pa.Table:
            for name in binary_cols:
                idx = batch.schema.get_field_index(name)
                col = batch.column(name).to_pylist()
                enc = pa.array(
                    [
                        None if v is None else base64.b64encode(v).decode("ascii")
                        for v in col
                    ],
                    type=pa.string(),
                )
                batch = batch.remove_column(idx).append_column(f"{name}_b64", enc)
            return batch

        ds = ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)
    ds.write_json(out_dir)


def read_jsonl(in_dir: str, *, decode_binary_b64: bool = True):
    """JSONL source — the inverse of :func:`export_jsonl`, closing the
    round-trip the same way the WARC source closes the WET sink
    (sources/warc.py). ``ray.data.read_json`` streams one task per shard
    file; ``<name>_b64`` string columns decode back to binary ``<name>``
    columns when ``decode_binary_b64`` is set, so
    ``read_jsonl(export_jsonl(ds))`` reproduces the original schema."""
    import base64

    import pyarrow as pa
    import ray.data

    ds = ray.data.read_json(in_dir)
    if not decode_binary_b64:
        return ds

    b64_cols = [f.name for f in ds.schema().base_schema if f.name.endswith("_b64")]
    if not b64_cols:
        return ds

    def decode(batch: pa.Table) -> pa.Table:
        for name in b64_cols:
            idx = batch.schema.get_field_index(name)
            col = batch.column(name).to_pylist()
            dec = pa.array(
                [None if v is None else base64.b64decode(v) for v in col],
                type=pa.binary(),
            )
            batch = batch.remove_column(idx).append_column(name[: -len("_b64")], dec)
        return batch

    return ds.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)
