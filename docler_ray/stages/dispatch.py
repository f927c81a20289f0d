"""Extractor registry + (mime, lang) dispatch.

The columnar restatement of the reference's converter registry and
``aggregated`` dispatcher
(/root/reference/src/docler/converters/registry.py:18-139,
src/docler/converters/aggregated_converter.py:23-104): extractors register by
NAME, each declares its supported MIME types, per-MIME preferences can be
overridden, and dispatch happens per row inside the extract stage (the
registry is tiny and broadcast by construction — it ships inside the actor,
never per batch).
"""

from __future__ import annotations

from typing import Callable

from docler_ray.html.extract import ExtractionResult, extract_html
from docler_ray.markers import prepend_first_page_marker
from docler_ray.mime_types import (
    DOCX_MIME,
    EPUB_MIME,
    HTML_MIME,
    MARKDOWN_MIME,
    MSEXCEL_MIME,
    MSPOWERPOINT_MIME,
    MSWORD_MIME,
    ODT_MIME,
    PDF_MIME,
    PDFISH_MIME,
    PPTX_MIME,
    RTF_MIME,
    TEXT_MIME,
    TEXTY_MIME_TYPES,
    XLSX_MIME,
    XML_MIME,
)
from docler_ray.office.biff import extract_xls
from docler_ray.office.epub import extract_epub
from docler_ray.office.odf import extract_odt
from docler_ray.office.ole2 import extract_doc
from docler_ray.office.ppt97 import extract_ppt
from docler_ray.office.rtf import extract_rtf
from docler_ray.office.ooxml import extract_docx, extract_pptx, extract_xlsx
from docler_ray.pdfish.extract import extract_pdfish
from docler_ray.pdfish.realpdf import extract_real_pdf

# An extractor: (payload, text_fallback, options) -> ExtractionResult
ExtractorFn = Callable[[bytes, str, dict], ExtractionResult]


def _html_extractor(payload: bytes, text: str, options: dict) -> ExtractionResult:
    # WHATWG-flavored charset ladder (BOM -> meta prescan -> utf-8 ->
    # cp1252); utf-8 pages decode identically to the old utf-8/replace
    # path, legacy/UTF-16 pages stop turning into mojibake (html/charset.py)
    from docler_ray.html.charset import decode_html

    html, _codec = decode_html(payload)
    result = extract_html(html)
    if not options.get("extract_images", True):
        result.images = []
    return result


def _pdfish_extractor(payload: bytes, text: str, options: dict) -> ExtractionResult:
    return extract_pdfish(
        payload,
        password=options.get("pdf_password"),
        page_range=options.get("page_range"),
    )


def _realpdf_extractor(payload: bytes, text: str, options: dict) -> ExtractionResult:
    # real %PDF bytes (stdlib Flate+Tj/TJ subset incl. RC4 standard-handler
    # decryption; pdfish/realpdf.py — the reference's pypdf path,
    # src/docler/pdf_utils.py:90-256)
    return extract_real_pdf(
        payload,
        password=options.get("pdf_password"),
        page_range=options.get("page_range"),
    )


def _text_extractor(payload: bytes, text: str, options: dict) -> ExtractionResult:
    if payload:
        from docler_ray.html.charset import decode_html

        content, _codec = decode_html(payload)
    else:
        content = text
    return ExtractionResult(content=prepend_first_page_marker(content))


def _docx_extractor(payload: bytes, text: str, options: dict) -> ExtractionResult:
    return extract_docx(payload)


def _pptx_extractor(payload: bytes, text: str, options: dict) -> ExtractionResult:
    return extract_pptx(payload)


def _xlsx_extractor(payload: bytes, text: str, options: dict) -> ExtractionResult:
    return extract_xlsx(payload)


def _doc_extractor(payload: bytes, text: str, options: dict) -> ExtractionResult:
    # legacy Word 97 binary via the stdlib CFB + piece-table reader
    # (office/ole2.py — the reference's markitdown legacy-office coverage,
    # markitdown_provider/provider.py:28-119)
    return extract_doc(payload)


def _xls_extractor(payload: bytes, text: str, options: dict) -> ExtractionResult:
    # legacy Excel BIFF8 via the stdlib CFB + record-stream reader
    # (office/biff.py — same markitdown legacy-office coverage precedent)
    return extract_xls(payload)


def _ppt_extractor(payload: bytes, text: str, options: dict) -> ExtractionResult:
    # legacy PowerPoint 97 via the stdlib CFB + record-tree reader
    # (office/ppt97.py — same markitdown legacy-office coverage precedent)
    return extract_ppt(payload)


def _odt_extractor(payload: bytes, text: str, options: dict) -> ExtractionResult:
    # OpenDocument Text via stdlib zip + ODF XML (office/odf.py — the
    # reference's markitdown ODT coverage, provider.py:35-44)
    return extract_odt(payload)


def _rtf_extractor(payload: bytes, text: str, options: dict) -> ExtractionResult:
    # RTF via the stdlib control-word parser (office/rtf.py — the
    # reference's markitdown RTF coverage, provider.py:44)
    return extract_rtf(payload)


def _epub_extractor(payload: bytes, text: str, options: dict) -> ExtractionResult:
    # EPUB via OCF container + OPF spine + this engine's HTML pipeline
    # (office/epub.py — the reference's markitdown EPUB coverage)
    return extract_epub(payload)


EXTRACTORS: dict[str, ExtractorFn] = {
    "html_extract": _html_extractor,
    "pdf_extract": _pdfish_extractor,
    "realpdf_extract": _realpdf_extractor,
    "text_passthrough": _text_extractor,
    "docx_extract": _docx_extractor,
    "pptx_extract": _pptx_extractor,
    "xlsx_extract": _xlsx_extractor,
    "doc_extract": _doc_extractor,
    "xls_extract": _xls_extractor,
    "ppt_extract": _ppt_extractor,
    "odt_extract": _odt_extractor,
    "rtf_extract": _rtf_extractor,
    "epub_extract": _epub_extractor,
}

# Default MIME -> extractor-name preference (overridable per pipeline config,
# the analog of registry.set_preference, registry.py:119-132). Every
# text-like member of the MIME universe routes to text_passthrough so the
# long tail of a real corpus (csv/rst/org/tex/json...) degrades to readable
# text instead of error rows; the OOXML trio, the legacy OLE2 trio
# (.doc/.xls/.ppt), ODT, RTF and EPUB route to the stdlib extractors
# (the reference's full MarkItDown document coverage,
# markitdown_provider/provider.py:35-60); remaining binary families
# (images/audio/video — the reference's OCR tier, env-gated here) stay
# unmapped -> per-row error.
DEFAULT_PREFERENCES: dict[str, str] = {
    HTML_MIME: "html_extract",
    PDFISH_MIME: "pdf_extract",
    PDF_MIME: "realpdf_extract",
    TEXT_MIME: "text_passthrough",
    MARKDOWN_MIME: "text_passthrough",
    XML_MIME: "text_passthrough",
    DOCX_MIME: "docx_extract",
    PPTX_MIME: "pptx_extract",
    XLSX_MIME: "xlsx_extract",
    MSWORD_MIME: "doc_extract",
    MSEXCEL_MIME: "xls_extract",
    MSPOWERPOINT_MIME: "ppt_extract",
    ODT_MIME: "odt_extract",
    RTF_MIME: "rtf_extract",
    EPUB_MIME: "epub_extract",
    **{m: "text_passthrough" for m in sorted(TEXTY_MIME_TYPES)},
}


def register_extractor(name: str, fn: ExtractorFn) -> None:
    """User-extension hook: register a new extractor; point a MIME at it via
    the pipeline config's ``preferences`` (SURVEY.md §2.8)."""
    EXTRACTORS[name] = fn


def build_dispatch(
    preferences: dict[str, str] | None = None,
) -> dict[str, tuple[str, ExtractorFn]]:
    """Resolve dispatch keys -> (extractor_name, fn) with preference overrides.

    Keys are either a bare MIME ("text/html") or "MIME|lang"
    ("text/html|de") for per-language chains; lookup tries the (mime, lang)
    key first, then the MIME (the reference's per-MIME preference model,
    registry.py:119-132, extended with the north rule's per-language
    dispatch axis).
    """
    prefs = dict(DEFAULT_PREFERENCES)
    if preferences:
        prefs.update(preferences)
    table: dict[str, tuple[str, ExtractorFn]] = {}
    for key, name in prefs.items():
        if name not in EXTRACTORS:
            msg = f"Unknown extractor {name!r} for dispatch key {key!r}"
            raise ValueError(msg)
        table[key] = (name, EXTRACTORS[name])
    return table


def lookup(
    table: dict[str, tuple[str, ExtractorFn]], mime: str, lang: str
) -> tuple[str, ExtractorFn] | None:
    """(mime, lang) -> extractor, most-specific key first."""
    entry = table.get(f"{mime}|{lang}")
    if entry is not None:
        return entry
    return table.get(mime)
