"""Legacy binary PowerPoint (.ppt) extraction — pure stdlib.

The reference converts legacy PowerPoint decks through MarkItDown
(/root/reference/src/docler/converters/markitdown_provider/provider.py:28-119,
``application/vnd.ms-powerpoint`` in SUPPORTED_MIME_TYPES). This module
reads the [MS-PPT] record tree in the CFB ``PowerPoint Document`` stream
directly:

* record framing: ``(recVerAndInstance u16, recType u16, recLen u32)``;
  a record whose version nibble is 0xF is a container holding child
  records in its payload,
* slide text lives under SlideListWithText (0x0FF0): each
  SlidePersistAtom (0x03F3) opens a slide, TextHeaderAtom (0x0F9F)
  declares the following text's placeholder type (0/6 = title), and the
  text itself arrives as TextCharsAtom (0x0FA0, UTF-16LE) or
  TextBytesAtom (0x0FA8, CP1252) with CR paragraph separators.

Output mirrors the OOXML pptx extractor (office/ooxml.py:135): one
markdown page per slide joined with numbered page breaks, the slide
title as a ``#`` heading, body paragraphs after it; deck title from the
SummaryInformation property set, falling back to the first slide title.

Scale shape: per-row parse inside the extract actor pool — identical
placement to the other extractors; no new pipeline stage.

A DETERMINISTIC writer (``make_ppt``) emits minimal [MS-PPT] record
trees (Document -> SlideListWithText -> per-slide persist/text atoms,
titles as TextCharsAtoms, CP1252-safe bodies as TextBytesAtoms) so tests
and SQL oracles can pin extraction byte-for-byte.
"""

from __future__ import annotations

import struct

from docler_ray.html.extract import ExtractionResult
from docler_ray.markers import join_pages, prepend_first_page_marker
from docler_ray.office.ole2 import (
    _summary_stream,
    _summary_title,
    build_cfb,
    cfb_streams,
)

_RT_DOCUMENT = 0x03E8
_RT_SLIDE_PERSIST_ATOM = 0x03F3
_RT_SLIDE_LIST_WITH_TEXT = 0x0FF0
_RT_TEXT_HEADER_ATOM = 0x0F9F
_RT_TEXT_CHARS_ATOM = 0x0FA0
_RT_TEXT_BYTES_ATOM = 0x0FA8

_TITLE_TYPES = {0, 6}  # Tx_TYPE_TITLE, Tx_TYPE_CENTER_TITLE


def _walk(data: bytes, pos: int, end: int, atoms: list[tuple[int, bytes]]) -> None:
    """Flatten the record tree into (recType, payload) atoms in stream
    order, recursing into containers (version nibble 0xF)."""
    while pos + 8 <= end:
        ver_inst, rtype, length = struct.unpack_from("<HHI", data, pos)
        body_start = pos + 8
        body_end = min(body_start + length, end)
        if ver_inst & 0x000F == 0x000F:
            _walk(data, body_start, body_end, atoms)
        else:
            atoms.append((rtype, data[body_start:body_end]))
        pos = body_end


def extract_ppt(payload: bytes) -> ExtractionResult:
    """Legacy .ppt -> markdown: one page per slide (SlidePersistAtom
    order), the title placeholder as a ``#`` heading, CR-separated text
    paragraphs as body lines."""
    streams = cfb_streams(payload)
    doc = streams.get("PowerPoint Document")
    if doc is None:
        msg = "OLE2 container without a PowerPoint Document stream"
        raise ValueError(msg)

    atoms: list[tuple[int, bytes]] = []
    _walk(doc, 0, len(doc), atoms)

    slides: list[dict[str, list[str]]] = []
    is_title = False
    for rtype, body in atoms:
        if rtype == _RT_SLIDE_PERSIST_ATOM:
            slides.append({"title": [], "body": []})
        elif rtype == _RT_TEXT_HEADER_ATOM:
            tx_type = struct.unpack_from("<I", body)[0] if len(body) >= 4 else 4
            is_title = tx_type in _TITLE_TYPES
        elif rtype in (_RT_TEXT_CHARS_ATOM, _RT_TEXT_BYTES_ATOM):
            text = (
                body.decode("utf-16-le", errors="replace")
                if rtype == _RT_TEXT_CHARS_ATOM
                else body.decode("cp1252")
            )
            if not slides:  # text outside any slide (masters): implicit slide
                slides.append({"title": [], "body": []})
            paras = [p for p in text.split("\r") if p]
            slides[-1]["title" if is_title else "body"].extend(paras)
            is_title = False

    slide_mds: list[str] = []
    first_title: str | None = None
    n_paragraphs = 0
    for slide in slides:
        parts: list[str] = []
        if slide["title"]:
            parts.append("# " + slide["title"][0])
            parts.extend(slide["title"][1:])
            if first_title is None:
                first_title = slide["title"][0]
        parts.extend(slide["body"])
        n_paragraphs += len(slide["title"]) + len(slide["body"])
        slide_mds.append("\n\n".join(parts))

    if len(slide_mds) > 1:
        content = join_pages(slide_mds)
    else:
        content = prepend_first_page_marker(slide_mds[0] if slide_mds else "")
    title = None
    summary = streams.get("\x05SummaryInformation")
    if summary is not None:
        title = _summary_title(summary)
    return ExtractionResult(
        content=content,
        title=title or first_title,
        metadata={
            "office_format": "ppt",
            "n_slides": len(slides),
            "n_paragraphs": n_paragraphs,
        },
    )


# --- deterministic writer ------------------------------------------------------


def _rec(ver_inst: int, rtype: int, payload: bytes) -> bytes:
    return struct.pack("<HHI", ver_inst, rtype, len(payload)) + payload


def make_ppt(title: str, slides: list[tuple[str | None, list[str]]]) -> bytes:
    """Deterministic minimal PowerPoint 97 .ppt. ``slides`` is a list of
    (slide title or None, body paragraphs). Slide titles are written as
    TextCharsAtoms (UTF-16), bodies as TextBytesAtoms when CP1252-safe
    else TextCharsAtoms — both reader arms stay exercised."""
    body = bytearray()
    for i, (slide_title, paras) in enumerate(slides):
        body += _rec(
            0, _RT_SLIDE_PERSIST_ATOM, struct.pack("<IIiHH", i + 1, 0, 0, 0, 0)
        )
        if slide_title is not None:
            body += _rec(0, _RT_TEXT_HEADER_ATOM, struct.pack("<I", 0))
            body += _rec(0, _RT_TEXT_CHARS_ATOM, slide_title.encode("utf-16-le"))
        if paras:
            body += _rec(0, _RT_TEXT_HEADER_ATOM, struct.pack("<I", 1))
            text = "\r".join(paras)
            try:
                body += _rec(0, _RT_TEXT_BYTES_ATOM, text.encode("cp1252"))
            except UnicodeEncodeError:
                body += _rec(0, _RT_TEXT_CHARS_ATOM, text.encode("utf-16-le"))
    slwt = _rec(0x000F, _RT_SLIDE_LIST_WITH_TEXT, bytes(body))
    doc = _rec(0x000F, _RT_DOCUMENT, slwt)
    return build_cfb(
        [
            ("PowerPoint Document", doc),
            ("\x05SummaryInformation", _summary_stream(title)),
        ]
    )
