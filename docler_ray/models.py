"""Arrow-first data model: the columnar restatement of the reference's
row objects (SURVEY.md §1.4).

- ``Document`` (mkdown, assembled at
  /root/reference/src/docler/converters/base.py:205-212) -> one row of the
  ``docs`` table.
- ``TextChunk`` (/root/reference/src/docler/chunkers/markdown_chunker/chunker.py:69-75)
  -> one row of the ``chunks`` table.
- open ``metadata: dict`` -> JSON string column.
"""

from __future__ import annotations

import pyarrow as pa

IMAGE_STRUCT = pa.struct(
    [
        pa.field("id", pa.string()),
        pa.field("filename", pa.string()),
        pa.field("mime_type", pa.string()),
        pa.field("content", pa.binary()),
    ]
)

DOCS_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("content", pa.string()),
        pa.field("title", pa.string()),
        pa.field("mime_type", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("page_count", pa.int32()),
        pa.field("metadata", pa.string()),
        pa.field("images", pa.list_(IMAGE_STRUCT)),
        pa.field("error", pa.string()),
        pa.field("extractor", pa.string()),
        pa.field("extractor_version", pa.string()),
    ]
)

CHUNKS_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("chunk_index", pa.int32()),
        pa.field("content", pa.string()),
        pa.field("header", pa.string()),
        pa.field("level", pa.int32()),
        pa.field("metadata", pa.string()),
        pa.field("image_ids", pa.list_(pa.string())),
    ]
)

MANIFEST_SCHEMA = pa.schema(
    [
        pa.field("partition_id", pa.string()),
        pa.field("input_file", pa.string()),
        pa.field("row_start", pa.int64()),
        pa.field("row_end", pa.int64()),
        pa.field("extractor_version", pa.string()),
        pa.field("docs", pa.int64()),
        pa.field("errors", pa.int64()),
        pa.field("pages", pa.int64()),
        pa.field("bytes_in", pa.int64()),
        pa.field("secs", pa.float64()),
    ]
)

EXTRACTOR_VERSION = "docler-ray/0.1.0"
