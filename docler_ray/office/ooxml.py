"""OOXML (docx / pptx / xlsx) extraction — pure stdlib ``zipfile`` + XML.

The reference converts office documents through the MarkItDown library
(/root/reference/src/docler/converters/markitdown_provider/provider.py:79-114;
test resources tests/resources/*.docx|pptx|xlsx) and normalizes its slide
markers into docler page breaks (provider.py:103-113). That library is not
available here and this engine builds its extractors from scratch, so this
module implements the OOXML text model directly: an OOXML file is a zip
archive of XML parts, and the text tier needs only three of them per format
(document body / slide parts / sheet + shared strings). Output follows this
engine's marker grammar (docler_ray.markers): pptx slides become numbered
page breaks exactly like pdfish pages (``join_pages``); docx honors explicit
``<w:br w:type="page"/>`` breaks; single-page outputs get the standard
first-page marker.

Scale shape: extraction is per row inside the extract actor pool (stateless
parse, zipfile over an in-memory payload) — the same placement as the HTML
and pdfish extractors; no new pipeline stage is needed.

The module also carries DETERMINISTIC writers (``make_docx`` / ``make_pptx``
/ ``make_xlsx``, fixed zip timestamps) used by tests and the synthetic
oracle corpus — the office analog of the pdfish codec, so goldens and SQL
oracles can pin extraction byte-for-byte.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

from docler_ray.html.extract import ExtractionResult
from docler_ray.markers import join_pages, prepend_first_page_marker

_HEADING_RE = re.compile(r"Heading([1-6])$")
_SLIDE_RE = re.compile(r"ppt/slides/slide(\d+)\.xml$")


def _local(tag: str) -> str:
    """Namespace-agnostic local element/attribute name."""
    return tag.rsplit("}", 1)[-1]


def _open_zip(payload: bytes) -> zipfile.ZipFile:
    try:
        return zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as e:
        msg = f"not an OOXML archive: {e}"
        raise ValueError(msg) from e


def _core_title(zf: zipfile.ZipFile) -> str | None:
    """dc:title from docProps/core.xml (the OOXML document-properties part)."""
    try:
        data = zf.read("docProps/core.xml")
    except KeyError:
        return None
    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        return None
    for el in root.iter():
        if _local(el.tag) == "title":
            return el.text or None
    return None


# --- docx --------------------------------------------------------------------


def extract_docx(payload: bytes) -> ExtractionResult:
    """word/document.xml -> markdown: paragraphs joined with blank lines,
    ``Heading{N}`` paragraph styles as ``#``-headings, explicit page breaks
    as numbered docler markers. Title = core properties title, else the
    first heading's text."""
    zf = _open_zip(payload)
    try:
        doc = ET.fromstring(zf.read("word/document.xml"))
    except KeyError as e:
        msg = "docx payload has no word/document.xml"
        raise ValueError(msg) from e
    pages: list[list[str]] = [[]]
    first_heading: str | None = None
    n_paragraphs = 0
    for p in doc.iter():
        if _local(p.tag) != "p":
            continue
        style = None
        texts: list[str] = []
        page_break = False
        for el in p.iter():
            ln = _local(el.tag)
            if ln == "pStyle":
                for k, v in el.attrib.items():
                    if _local(k) == "val":
                        style = v
            elif ln == "t":
                texts.append(el.text or "")
            elif ln == "tab":
                texts.append("\t")
            elif ln == "br" and any(
                _local(k) == "type" and v == "page" for k, v in el.attrib.items()
            ):
                page_break = True
        text = "".join(texts)
        if text:
            n_paragraphs += 1
            m = _HEADING_RE.match(style or "")
            if m:
                line = "#" * int(m.group(1)) + " " + text
                if first_heading is None:
                    first_heading = text
            else:
                line = text
            pages[-1].append(line)
        if page_break:
            pages.append([])
    page_markdowns = ["\n\n".join(lines) for lines in pages if lines]
    if len(page_markdowns) > 1:
        content = join_pages(page_markdowns)
    else:
        content = prepend_first_page_marker(page_markdowns[0] if page_markdowns else "")
    return ExtractionResult(
        content=content,
        title=_core_title(zf) or first_heading,
        metadata={"office_format": "docx", "n_paragraphs": n_paragraphs},
    )


# --- pptx --------------------------------------------------------------------


def extract_pptx(payload: bytes) -> ExtractionResult:
    """ppt/slides/slideN.xml (numeric order) -> one markdown page per slide
    joined with numbered page breaks (the docler slide-marker contract,
    markitdown_provider/provider.py:103-113): the slide's first text
    paragraph renders as a ``#`` heading, the rest as body paragraphs."""
    zf = _open_zip(payload)
    slide_names = sorted(
        (n for n in zf.namelist() if _SLIDE_RE.match(n)),
        key=lambda n: int(_SLIDE_RE.match(n).group(1)),
    )
    if not slide_names:
        msg = "pptx payload has no ppt/slides/slideN.xml parts"
        raise ValueError(msg)
    slides_md: list[str] = []
    first_text: str | None = None
    for name in slide_names:
        root = ET.fromstring(zf.read(name))
        paras: list[str] = []
        for ap in root.iter():
            if _local(ap.tag) != "p":
                continue
            txt = "".join(
                el.text or "" for el in ap.iter() if _local(el.tag) == "t"
            )
            if txt:
                paras.append(txt)
        if paras and first_text is None:
            first_text = paras[0]
        md = ""
        if paras:
            md = "# " + paras[0]
            if len(paras) > 1:
                md += "\n\n" + "\n\n".join(paras[1:])
        slides_md.append(md)
    return ExtractionResult(
        content=join_pages(slides_md),
        title=_core_title(zf) or first_text,
        metadata={"office_format": "pptx", "n_slides": len(slides_md)},
    )


# --- xlsx --------------------------------------------------------------------


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out: list[str] = []
    for si in root:
        if _local(si.tag) != "si":
            continue
        out.append(
            "".join(el.text or "" for el in si.iter() if _local(el.tag) == "t")
        )
    return out


def extract_xlsx(payload: bytes) -> ExtractionResult:
    """xl/worksheets/sheetN.xml + shared strings -> one markdown table per
    sheet (``## {sheet name}`` heading, first row as the header row).

    Sheet order comes from xl/workbook.xml; sheet N of the workbook is
    assumed to live at worksheets/sheetN.xml (true for this engine's writer
    and the common producer layout — full rels resolution is out of scope
    for the text tier)."""
    zf = _open_zip(payload)
    shared = _shared_strings(zf)
    try:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
    except KeyError as e:
        msg = "xlsx payload has no xl/workbook.xml"
        raise ValueError(msg) from e
    sheet_names = [
        next((v for k, v in el.attrib.items() if _local(k) == "name"), "Sheet")
        for el in wb.iter()
        if _local(el.tag) == "sheet"
    ]
    sheet_mds: list[str] = []
    n_cells = 0
    for idx, sheet_name in enumerate(sheet_names):
        try:
            root = ET.fromstring(zf.read(f"xl/worksheets/sheet{idx + 1}.xml"))
        except KeyError:
            continue
        rows: list[list[str]] = []
        for row in root.iter():
            if _local(row.tag) != "row":
                continue
            cells: list[str] = []
            for c in row:
                if _local(c.tag) != "c":
                    continue
                ctype = next(
                    (v for k, v in c.attrib.items() if _local(k) == "t"), None
                )
                raw = ""
                for el in c.iter():
                    ln = _local(el.tag)
                    if ln == "v" or (ctype == "inlineStr" and ln == "t"):
                        raw = el.text or ""
                if ctype == "s":
                    i = int(raw) if raw else -1
                    raw = shared[i] if 0 <= i < len(shared) else ""
                cells.append(raw)
            if cells:
                rows.append(cells)
                n_cells += len(cells)
        lines: list[str] = []
        for ri, cells in enumerate(rows):
            lines.append("| " + " | ".join(cells) + " |")
            if ri == 0:
                lines.append("|" + " --- |" * len(cells))
        sheet_mds.append("## " + sheet_name + "\n\n" + "\n".join(lines))
    return ExtractionResult(
        content=prepend_first_page_marker("\n\n".join(sheet_mds)),
        title=_core_title(zf),
        metadata={
            "office_format": "xlsx",
            "n_sheets": len(sheet_mds),
            "n_cells": n_cells,
        },
    )


# --- deterministic writers ---------------------------------------------------

_ZIP_DATE = (1980, 1, 1, 0, 0, 0)  # fixed timestamps -> byte-stable archives

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="xml" ContentType="application/xml"/></Types>'
)


def _writestr(zf: zipfile.ZipFile, name: str, data: str) -> None:
    zi = zipfile.ZipInfo(name, date_time=_ZIP_DATE)
    zi.compress_type = zipfile.ZIP_DEFLATED
    zf.writestr(zi, data)


def _core_xml(title: str) -> str:
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        "<cp:coreProperties "
        'xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/">'
        f"<dc:title>{escape(title)}</dc:title></cp:coreProperties>"
    )


def make_docx(
    title: str, paragraphs: list[tuple[int, str]], page_break_after: set[int] | None = None
) -> bytes:
    """Deterministic minimal docx. ``paragraphs`` is (heading_level, text)
    with level 0 = body text; ``page_break_after`` holds paragraph indices
    followed by an explicit page break."""
    breaks = page_break_after or set()
    body: list[str] = []
    for i, (level, text) in enumerate(paragraphs):
        ppr = f'<w:pPr><w:pStyle w:val="Heading{level}"/></w:pPr>' if level else ""
        body.append(
            f'<w:p>{ppr}<w:r><w:t xml:space="preserve">{escape(text)}</w:t></w:r></w:p>'
        )
        if i in breaks:
            body.append('<w:p><w:r><w:br w:type="page"/></w:r></w:p>')
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        f"<w:body>{''.join(body)}</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        _writestr(zf, "[Content_Types].xml", _CONTENT_TYPES)
        _writestr(zf, "docProps/core.xml", _core_xml(title))
        _writestr(zf, "word/document.xml", document)
    return buf.getvalue()


def make_pptx(title: str, slides: list[list[str]]) -> bytes:
    """Deterministic minimal pptx. ``slides`` is a list of text-paragraph
    lists; the first paragraph of each slide is its title."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        _writestr(zf, "[Content_Types].xml", _CONTENT_TYPES)
        _writestr(zf, "docProps/core.xml", _core_xml(title))
        for si, paras in enumerate(slides):
            runs = "".join(
                f"<a:p><a:r><a:t>{escape(t)}</a:t></a:r></a:p>" for t in paras
            )
            slide = (
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
                'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">'
                f"<p:cSld><p:spTree><p:sp><p:txBody>{runs}</p:txBody></p:sp>"
                "</p:spTree></p:cSld></p:sld>"
            )
            _writestr(zf, f"ppt/slides/slide{si + 1}.xml", slide)
    return buf.getvalue()


def make_xlsx(title: str, sheets: dict[str, list[list[object]]]) -> bytes:
    """Deterministic minimal xlsx. ``sheets`` maps sheet name -> rows; str
    cells go through shared strings, everything else is written as a
    numeric ``<v>`` literal."""
    shared: list[str] = []
    shared_idx: dict[str, int] = {}

    def sref(s: str) -> int:
        i = shared_idx.get(s)
        if i is None:
            i = shared_idx[s] = len(shared)
            shared.append(s)
        return i

    sheet_xmls: list[str] = []
    for rows in sheets.values():
        row_xml: list[str] = []
        for ri, cells in enumerate(rows):
            cell_xml: list[str] = []
            for ci, val in enumerate(cells):
                ref = f"{chr(ord('A') + ci)}{ri + 1}"
                if isinstance(val, str):
                    cell_xml.append(f'<c r="{ref}" t="s"><v>{sref(val)}</v></c>')
                else:
                    cell_xml.append(f'<c r="{ref}"><v>{val}</v></c>')
            row_xml.append(f'<row r="{ri + 1}">{"".join(cell_xml)}</row>')
        sheet_xmls.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f"<sheetData>{''.join(row_xml)}</sheetData></worksheet>"
        )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheets>"
        + "".join(
            f'<sheet name="{escape(name)}" sheetId="{i + 1}"/>'
            for i, name in enumerate(sheets)
        )
        + "</sheets></workbook>"
    )
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        + "".join(f"<si><t xml:space=\"preserve\">{escape(s)}</t></si>" for s in shared)
        + "</sst>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        _writestr(zf, "[Content_Types].xml", _CONTENT_TYPES)
        _writestr(zf, "docProps/core.xml", _core_xml(title))
        _writestr(zf, "xl/workbook.xml", workbook)
        _writestr(zf, "xl/sharedStrings.xml", sst)
        for i, xml in enumerate(sheet_xmls):
            _writestr(zf, f"xl/worksheets/sheet{i + 1}.xml", xml)
    return buf.getvalue()
