"""EPUB extraction — pure stdlib zip + OPF spine + the engine's own HTML
extractor.

The reference converts EPUB through MarkItDown
(/root/reference/src/docler/converters/markitdown_provider/provider.py:46,
``application/epub+zip`` in SUPPORTED_MIME_TYPES). An EPUB is a zip
(OCF): ``META-INF/container.xml`` points at the OPF package document,
whose ``<manifest>`` maps ids to XHTML parts and whose ``<spine>`` gives
reading order; ``dc:title`` carries the book title.

Each spine document runs through THIS engine's HTML pipeline
(html/extract.py: parse -> prune boilerplate -> density-select ->
markdown), one docler page per spine item, joined with numbered page
breaks — the chapter analog of the pptx slide contract.

A DETERMINISTIC writer (``make_epub``, fixed zip timestamps) backs tests
and SQL oracles.
"""

from __future__ import annotations

import io
import posixpath
import zipfile
from xml.etree import ElementTree as ET

from docler_ray.html.extract import (
    ExtractionResult,
    extract_title,
    parse_html,
    prune_boilerplate,
    select_main_content,
    serialize_to_markdown,
)
from docler_ray.markers import join_pages, prepend_first_page_marker

_CONTAINER_NS = "urn:oasis:names:tc:opendocument:xmlns:container"
_OPF_NS = "http://www.idpf.org/2007/opf"
_DC_NS = "http://purl.org/dc/elements/1.1/"


def _chapter_markdown(html: str) -> str:
    root = parse_html(html)
    prune_boilerplate(root)
    main = select_main_content(root)
    if main is None:
        return ""
    markdown, _images = serialize_to_markdown(main)
    return markdown


def extract_epub(payload: bytes) -> ExtractionResult:
    """EPUB -> markdown: one page per spine document in reading order,
    each through the HTML extraction pipeline; title from dc:title."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as e:
        msg = "not a zip-packaged EPUB"
        raise ValueError(msg) from e
    try:
        container = ET.fromstring(zf.read("META-INF/container.xml"))
    except KeyError as e:
        msg = "EPUB has no META-INF/container.xml"
        raise ValueError(msg) from e
    rootfile = container.find(f".//{{{_CONTAINER_NS}}}rootfile")
    if rootfile is None or "full-path" not in rootfile.attrib:
        msg = "EPUB container.xml names no rootfile"
        raise ValueError(msg)
    opf_path = rootfile.attrib["full-path"]
    opf = ET.fromstring(zf.read(opf_path))
    opf_dir = posixpath.dirname(opf_path)

    hrefs: dict[str, str] = {}
    for item in opf.iter(f"{{{_OPF_NS}}}item"):
        media = item.attrib.get("media-type", "")
        if "html" in media or "xml" in media:
            hrefs[item.attrib["id"]] = item.attrib["href"]
    spine = [
        ref.attrib["idref"]
        for ref in opf.iter(f"{{{_OPF_NS}}}itemref")
        if ref.attrib.get("idref") in hrefs
    ]

    title = None
    node = opf.find(f".//{{{_DC_NS}}}title")
    if node is not None and node.text:
        title = node.text

    chapter_mds: list[str] = []
    first_heading: str | None = None
    for idref in spine:
        path = posixpath.normpath(posixpath.join(opf_dir, hrefs[idref]))
        try:
            html = zf.read(path).decode("utf-8", errors="replace")
        except KeyError:
            continue
        if first_heading is None:
            first_heading = extract_title(parse_html(html))
        chapter_mds.append(_chapter_markdown(html))

    if len(chapter_mds) > 1:
        content = join_pages(chapter_mds)
    else:
        content = prepend_first_page_marker(chapter_mds[0] if chapter_mds else "")
    return ExtractionResult(
        content=content,
        title=title or first_heading,
        metadata={"office_format": "epub", "n_chapters": len(chapter_mds)},
    )


# --- deterministic writer ------------------------------------------------------

_ZIP_DATE = (1980, 1, 1, 0, 0, 0)

_CONTAINER_XML = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    f'<container version="1.0" xmlns="{_CONTAINER_NS}">'
    '<rootfiles><rootfile full-path="OEBPS/content.opf" '
    'media-type="application/oebps-package+xml"/></rootfiles></container>'
)


def _xml_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def make_epub(title: str, chapters: list[tuple[str, list[str]]]) -> bytes:
    """Deterministic minimal EPUB 2-style package. ``chapters`` is a list
    of (chapter heading, body paragraphs); each becomes one spine XHTML."""
    items: list[str] = []
    refs: list[str] = []
    files: list[tuple[str, str]] = []
    for i, (heading, paras) in enumerate(chapters):
        name = f"ch{i + 1}.xhtml"
        body = "".join(f"<p>{_xml_escape(p)}</p>" for p in paras)
        files.append(
            (
                f"OEBPS/{name}",
                "<html><head><title>"
                + _xml_escape(heading)
                + "</title></head><body><article><h1>"
                + _xml_escape(heading)
                + f"</h1>{body}</article></body></html>",
            )
        )
        items.append(
            f'<item id="c{i + 1}" href="{name}" media-type="application/xhtml+xml"/>'
        )
        refs.append(f'<itemref idref="c{i + 1}"/>')
    opf = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<package xmlns="{_OPF_NS}" version="2.0" unique-identifier="bookid">'
        f'<metadata xmlns:dc="{_DC_NS}"><dc:title>{_xml_escape(title)}</dc:title>'
        '<dc:identifier id="bookid">docler-fixture</dc:identifier></metadata>'
        f"<manifest>{''.join(items)}</manifest>"
        f"<spine>{''.join(refs)}</spine></package>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        mt = zipfile.ZipInfo("mimetype", date_time=_ZIP_DATE)
        mt.compress_type = zipfile.ZIP_STORED
        zf.writestr(mt, "application/epub+zip")
        zf.writestr(
            zipfile.ZipInfo("META-INF/container.xml", date_time=_ZIP_DATE),
            _CONTAINER_XML,
        )
        zf.writestr(zipfile.ZipInfo("OEBPS/content.opf", date_time=_ZIP_DATE), opf)
        for name, data in files:
            zf.writestr(zipfile.ZipInfo(name, date_time=_ZIP_DATE), data)
    return buf.getvalue()
