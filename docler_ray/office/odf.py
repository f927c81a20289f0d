"""OpenDocument Text (.odt) extraction — pure stdlib ``zipfile`` + XML.

The reference converts ODT through MarkItDown
(/root/reference/src/docler/converters/markitdown_provider/provider.py:35-44,
``application/vnd.oasis.opendocument.text`` in SUPPORTED_MIME_TYPES). An
ODF package is a zip whose ``content.xml`` carries the body (OASIS ODF
1.2 §3): ``text:h`` headings with ``text:outline-level``, ``text:p``
paragraphs, ``text:list`` items, with ``text:s``/``text:tab``/
``text:line-break`` whitespace elements; ``meta.xml`` carries the
``dc:title``.

Output follows the docx extractor's conventions (office/ooxml.py):
headings as ``#`` lines by outline level, paragraphs joined with blank
lines, a leading page-1 marker (ODT page breaks are style-driven and
out of the text tier's scope — documents render single-page).

A DETERMINISTIC writer (``make_odt``, fixed zip timestamps, ``mimetype``
stored first per ODF packaging rules) backs tests and SQL oracles.
"""

from __future__ import annotations

import io
import zipfile
from xml.etree import ElementTree as ET

from docler_ray.html.extract import ExtractionResult
from docler_ray.markers import prepend_first_page_marker

_TEXT_NS = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
_DC_NS = "http://purl.org/dc/elements/1.1/"


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _para_text(el) -> str:
    """Flatten one text:p/text:h: spans recurse, text:s expands to spaces,
    text:tab/line-break to whitespace."""
    parts: list[str] = []
    if el.text:
        parts.append(el.text)
    for child in el:
        ln = _local(child.tag)
        if ln == "s":
            n = child.attrib.get(f"{{{_TEXT_NS}}}c", "1")
            parts.append(" " * max(1, int(n)))
        elif ln == "tab":
            parts.append("\t")
        elif ln == "line-break":
            parts.append("\n")
        else:
            parts.append(_para_text(child))
        if child.tail:
            parts.append(child.tail)
    return "".join(parts)


def extract_odt(payload: bytes) -> ExtractionResult:
    """ODT -> markdown: outline-level headings, blank-line paragraphs,
    title from meta.xml dc:title (falling back to the first heading)."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as e:
        msg = "not a zip-packaged ODF document"
        raise ValueError(msg) from e
    try:
        content = ET.fromstring(zf.read("content.xml"))
    except KeyError as e:
        msg = "ODF package has no content.xml"
        raise ValueError(msg) from e

    lines: list[str] = []
    first_heading: str | None = None
    n_paragraphs = 0
    for el in content.iter():
        ln = _local(el.tag)
        if ln not in ("p", "h"):
            continue
        text = _para_text(el)
        if not text:
            continue
        n_paragraphs += 1
        if ln == "h":
            level = int(el.attrib.get(f"{{{_TEXT_NS}}}outline-level", "1"))
            lines.append("#" * max(1, min(6, level)) + " " + text)
            if first_heading is None:
                first_heading = text
        else:
            lines.append(text)

    title = None
    try:
        meta = ET.fromstring(zf.read("meta.xml"))
        node = meta.find(f".//{{{_DC_NS}}}title")
        if node is not None and node.text:
            title = node.text
    except KeyError:
        pass
    return ExtractionResult(
        content=prepend_first_page_marker("\n\n".join(lines)),
        title=title or first_heading,
        metadata={"office_format": "odt", "n_paragraphs": n_paragraphs},
    )


# --- deterministic writer ------------------------------------------------------

_ZIP_DATE = (1980, 1, 1, 0, 0, 0)

_MANIFEST = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<manifest:manifest xmlns:manifest='
    '"urn:oasis:names:tc:opendocument:xmlns:manifest:1.0">'
    '<manifest:file-entry manifest:full-path="/" manifest:media-type='
    '"application/vnd.oasis.opendocument.text"/>'
    '<manifest:file-entry manifest:full-path="content.xml" '
    'manifest:media-type="text/xml"/>'
    '<manifest:file-entry manifest:full-path="meta.xml" '
    'manifest:media-type="text/xml"/>'
    "</manifest:manifest>"
)


def _xml_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def make_odt(title: str, blocks: list[tuple[str, ...]]) -> bytes:
    """Deterministic minimal ODT. ``blocks`` are ("h", level, text) or
    ("p", text). ``mimetype`` is STORED uncompressed as the first member
    (the ODF packaging rule the zip sniff relies on)."""
    body_parts: list[str] = []
    for block in blocks:
        if block[0] == "h":
            _, level, text = block
            body_parts.append(
                f'<text:h text:outline-level="{level}">{_xml_escape(text)}</text:h>'
            )
        else:
            body_parts.append(f"<text:p>{_xml_escape(block[1])}</text:p>")
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<office:document-content xmlns:office='
        f'"urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        f'xmlns:text="{_TEXT_NS}" office:version="1.2">'
        f"<office:body><office:text>{''.join(body_parts)}</office:text>"
        f"</office:body></office:document-content>"
    )
    meta = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document-meta xmlns:office='
        '"urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        f'xmlns:dc="{_DC_NS}" office:version="1.2">'
        f"<office:meta><dc:title>{_xml_escape(title)}</dc:title></office:meta>"
        "</office:document-meta>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        mt = zipfile.ZipInfo("mimetype", date_time=_ZIP_DATE)
        mt.compress_type = zipfile.ZIP_STORED
        zf.writestr(mt, "application/vnd.oasis.opendocument.text")
        for name, data in (
            ("META-INF/manifest.xml", _MANIFEST),
            ("content.xml", content),
            ("meta.xml", meta),
        ):
            zf.writestr(zipfile.ZipInfo(name, date_time=_ZIP_DATE), data)
    return buf.getvalue()
