"""MIME taxonomy: the fixed universe of types this engine dispatches on.

Functional analog of the reference's hand-maintained MIME tables
(/root/reference/src/docler/mime_types.py:10-174) and ``check_mime``
(/root/reference/src/docler/utils.py:49-77), reduced to what the
Common-Crawl-style input actually carries: HTML payloads, a synthetic
PDF-style layout payload ("pdfish", see docler_ray.pdfish.format), plain
text and markdown. Content sniffing is magic-byte based so it can run
vectorized over an Arrow binary column without trusting file extensions.
"""

from __future__ import annotations

HTML_MIME = "text/html"
PDFISH_MIME = "application/x-pdfish"
PDF_MIME = "application/pdf"
TEXT_MIME = "text/plain"
MARKDOWN_MIME = "text/markdown"
UNKNOWN_MIME = "application/octet-stream"

SUPPORTED_MIME_TYPES: frozenset[str] = frozenset(
    {HTML_MIME, PDFISH_MIME, PDF_MIME, TEXT_MIME, MARKDOWN_MIME}
)

EXT_TO_MIME: dict[str, str] = {
    ".html": HTML_MIME,
    ".htm": HTML_MIME,
    ".xhtml": HTML_MIME,
    ".pdf": PDF_MIME,
    ".pdfish": PDFISH_MIME,
    ".txt": TEXT_MIME,
    ".md": MARKDOWN_MIME,
    ".markdown": MARKDOWN_MIME,
}

# Magic prefixes for payload sniffing (pdfish magics defined by this engine,
# see docler_ray/pdfish/format.py; %PDF is the standard PDF magic).
PDFISH_MAGIC = b"PDFISH01"
PDFISH_ENCRYPTED_MAGIC = b"PDFISHEN"
PDF_MAGIC = b"%PDF"


def sniff_mime(payload: bytes) -> str:
    """Classify a raw page payload by magic bytes / content shape.

    Replaces the reference's extension-driven ``mimetypes.guess_type`` path
    (/root/reference/src/docler/converters/base.py:269) — Common-Crawl URLs
    have no trustworthy extensions, so we sniff content.
    """
    if not payload:
        return UNKNOWN_MIME
    head = payload[:256]
    if head.startswith(PDFISH_MAGIC) or head.startswith(PDFISH_ENCRYPTED_MAGIC):
        return PDFISH_MIME
    if head.startswith(PDF_MAGIC):
        return PDF_MIME
    lowered = head.lstrip()[:64].lower()
    if (
        lowered.startswith(b"<!doctype html")
        or lowered.startswith(b"<html")
        or b"<html" in head.lower()
    ):
        return HTML_MIME
    # Heuristic: mostly-printable utf-8 => text.
    try:
        head.decode("utf-8")
    except UnicodeDecodeError:
        return UNKNOWN_MIME
    return TEXT_MIME


def mime_from_extension(path: str) -> str | None:
    """Extension -> MIME lookup against the fixed table (None if unknown)."""
    dot = path.rfind(".")
    if dot < 0:
        return None
    return EXT_TO_MIME.get(path[dot:].lower())
