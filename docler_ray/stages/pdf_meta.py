"""PageMetadata probe stage: PDF-level metadata as columns on the docs table.

Columnar restatement of the reference's ``PageMetadata`` model
(/root/reference/src/docler/models.py:69-84) fed by ``get_pdf_info``
(/root/reference/src/docler/pdf_utils.py:187-256): a stateless
``map_batches`` stage probing each pdfish payload's header — page count,
file size, encryption flag, per-page dimensions, title, author — without
running extraction. Non-pdfish payloads produce null metadata rather than
errors (the probe is a triage stage, not a converter).
"""

from __future__ import annotations

import pyarrow as pa

from docler_ray.mime_types import PDFISH_ENCRYPTED_MAGIC, PDFISH_MAGIC
from docler_ray.pdfish.format import get_pdfish_info

PAGE_DIMS_TYPE = pa.list_(
    pa.struct([("width", pa.float64()), ("height", pa.float64())])
)


class PageMetadataProber:
    """docs/pages batch -> batch of (key, PageMetadata columns).

    ``password`` (optional) unlocks encrypted payloads; without it an
    encrypted payload reports is_encrypted=True with page_count=0, matching
    the reference's behavior (pdf_utils.py:216-225).
    """

    def __init__(
        self,
        payload_col: str = "html",
        key_col: str = "url",
        password: str | None = None,
    ) -> None:
        self.payload_col = payload_col
        self.key_col = key_col
        self.password = password

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_col)
        payloads = batch.column(self.payload_col).to_pylist()
        page_counts: list[int | None] = []
        file_sizes: list[int | None] = []
        encrypted: list[bool | None] = []
        titles: list[str | None] = []
        authors: list[str | None] = []
        dims: list[list[dict] | None] = []
        for data in payloads:
            data = data or b""
            if not (
                data.startswith(PDFISH_MAGIC)
                or data.startswith(PDFISH_ENCRYPTED_MAGIC)
            ):
                page_counts.append(None)
                file_sizes.append(None)
                encrypted.append(None)
                titles.append(None)
                authors.append(None)
                dims.append(None)
                continue
            info = get_pdfish_info(data, password=self.password)
            page_counts.append(info["page_count"])
            file_sizes.append(info["file_size"])
            encrypted.append(info["is_encrypted"])
            titles.append(info["title"])
            authors.append(info["author"])
            dims.append(info["page_dimensions"])
        return pa.table(
            {
                self.key_col: keys,
                "page_count": pa.array(page_counts, pa.int32()),
                "file_size": pa.array(file_sizes, pa.int64()),
                "is_encrypted": pa.array(encrypted, pa.bool_()),
                "title": pa.array(titles, pa.string()),
                "author": pa.array(authors, pa.string()),
                "page_dimensions": pa.array(dims, PAGE_DIMS_TYPE),
            }
        )
