"""Synthetic PDF-style layout payload ("pdfish") codec + layout extractor.

Real PDF parsing libraries (pypdf etc.) are unavailable in this environment
(SURVEY.md constraints) and real PDFs are out of scope; the pdfish format is
this engine's deterministic stand-in: a binary page/span layout payload that
exercises the same algorithmic surface the reference's PDF converters cover —
page/block/span accumulation, reading order, page segmentation, encryption
probing, page-range filtering (FIXTURES.md §5).
"""

from docler_ray.pdfish.extract import extract_pdfish  # noqa: F401
from docler_ray.pdfish.format import (  # noqa: F401
    PdfishDocument,
    PdfishPage,
    Span,
    decode_pdfish,
    encode_pdfish,
    encrypt_pdfish,
    get_pdfish_info,
)
