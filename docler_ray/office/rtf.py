"""RTF extraction — pure stdlib control-word parser.

The reference converts RTF through MarkItDown
(/root/reference/src/docler/converters/markitdown_provider/provider.py:44,
``application/rtf`` in SUPPORTED_MIME_TYPES). This module parses the RTF
1.9 token stream directly:

* groups ``{...}`` with inherited state; destination groups that carry
  no body text (fonttbl, colortbl, stylesheet, pict, ...) and ``{\\*``
  unknown destinations are skipped wholesale,
* control words: ``\\par``/``\\line`` end a line, ``\\page`` breaks the
  page, ``\\tab`` tabs, ``\\'hh`` decodes a CP1252 byte, ``\\uN?``
  decodes a signed 16-bit Unicode scalar and skips the following
  ``\\ucN`` fallback characters,
* ``{\\info{\\title ...}}`` supplies the document title.

Output follows the legacy-.doc extractor's conventions (office/ole2.py):
paragraphs joined with blank lines, ``\\page`` breaks as numbered docler
markers, title falling back to the first paragraph.

A DETERMINISTIC writer (``make_rtf``) emits spec-valid minimal RTF
(CP1252 escapes + ``\\uN?`` for the rest) for tests and SQL oracles.
"""

from __future__ import annotations

from docler_ray.html.extract import ExtractionResult
from docler_ray.markers import join_pages, prepend_first_page_marker

# destinations whose body is control data, not document text
_SKIP_DESTINATIONS = frozenset(
    {
        "fonttbl",
        "colortbl",
        "stylesheet",
        "listtable",
        "listoverridetable",
        "pict",
        "object",
        "header",
        "footer",
        "headerl",
        "headerr",
        "footerl",
        "footerr",
        "ftnsep",
        "xmlnstbl",
        "themedata",
        "colorschememapping",
        "latentstyles",
        "datastore",
        "generator",
        "info",  # metadata destination; \title re-enables capture inside it
    }
)


def extract_rtf(payload: bytes) -> ExtractionResult:
    """RTF -> markdown: paragraphs, page-break markers, info-title."""
    data = payload.decode("latin-1", errors="replace")
    if not data.lstrip().startswith("{\\rtf"):
        msg = "not an RTF payload"
        raise ValueError(msg)

    pages: list[list[str]] = [[]]
    cur: list[str] = []
    title_parts: list[str] | None = None
    # group state: (skipping, uc_count, in_title)
    stack: list[tuple[bool, int, bool]] = []
    skipping, uc, in_title = False, 1, False
    pending_uc_skip = 0

    def flush_para() -> None:
        text = "".join(cur).strip()
        cur.clear()
        if text:
            pages[-1].append(text)

    def emit(ch: str) -> None:
        nonlocal pending_uc_skip
        if pending_uc_skip > 0:
            pending_uc_skip -= 1
            return
        if skipping:
            return
        if in_title and title_parts is not None:
            title_parts.append(ch)
        else:
            cur.append(ch)

    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c == "{":
            stack.append((skipping, uc, in_title))
            i += 1
        elif c == "}":
            if stack:
                skipping, uc, in_title = stack.pop()
            i += 1
        elif c == "\\":
            if i + 1 >= n:
                break
            nxt = data[i + 1]
            if nxt in "\\{}":
                emit(nxt)
                i += 2
            elif nxt == "'":
                if i + 3 < n:
                    try:
                        emit(bytes([int(data[i + 2 : i + 4], 16)]).decode("cp1252"))
                    except (ValueError, UnicodeDecodeError):
                        pass
                i += 4
            elif nxt == "*":
                # unknown destination: skip the whole group
                skipping = True
                i += 2
            elif nxt == "~":
                emit(" ")
                i += 2
            elif nxt in "-_:|":
                i += 2  # formatting hints: no text
            elif nxt.isalpha():
                j = i + 1
                while j < n and data[j].isalpha():
                    j += 1
                word = data[i + 1 : j]
                param = None
                k = j
                if k < n and (data[k] == "-" or data[k].isdigit()):
                    m = k + 1 if data[k] == "-" else k
                    while m < n and data[m].isdigit():
                        m += 1
                    param = int(data[k:m])
                    k = m
                if k < n and data[k] == " ":  # delimiter space is consumed
                    k += 1
                i = k
                if word in ("par", "line"):
                    if not skipping and not in_title:
                        flush_para()
                elif word == "page":
                    if not skipping and not in_title:
                        flush_para()
                        pages.append([])
                elif word == "tab":
                    emit("\t")
                elif word == "u":
                    scalar = param if param is not None else 0
                    if scalar < 0:
                        scalar += 65536
                    emit(chr(scalar))
                    pending_uc_skip = uc
                elif word == "uc":
                    uc = param if param is not None else 1
                elif word == "title":
                    if title_parts is None:
                        title_parts = []
                    in_title = True
                    skipping = False  # un-skip inside the \info destination
                elif word in _SKIP_DESTINATIONS:
                    skipping = True
            else:
                i += 2
        elif c in "\r\n":
            i += 1  # raw newlines are not document text
        else:
            emit(c)
            i += 1
    flush_para()

    page_markdowns = ["\n\n".join(lines) for lines in pages if lines]
    if len(page_markdowns) > 1:
        content = join_pages(page_markdowns)
    else:
        content = prepend_first_page_marker(
            page_markdowns[0] if page_markdowns else ""
        )
    title = "".join(title_parts).strip() if title_parts else None
    first_para = pages[0][0] if pages and pages[0] else None
    n_paragraphs = sum(len(p) for p in pages)
    return ExtractionResult(
        content=content,
        title=title or first_para,
        metadata={"office_format": "rtf", "n_paragraphs": n_paragraphs},
    )


# --- deterministic writer ------------------------------------------------------


def _rtf_escape(text: str) -> str:
    out: list[str] = []
    for ch in text:
        o = ord(ch)
        if ch in "\\{}":
            out.append("\\" + ch)
        elif o < 128:
            out.append(ch)
        else:
            try:
                b = ch.encode("cp1252")
                out.append(f"\\'{b[0]:02x}")
            except UnicodeEncodeError:
                s = o if o < 32768 else o - 65536
                out.append(f"\\u{s}?")
    return "".join(out)


def make_rtf(
    title: str,
    paragraphs: list[str],
    page_break_after: set[int] | None = None,
) -> bytes:
    """Deterministic minimal RTF 1.x: info-title, CP1252/unicode escapes,
    ``\\par`` paragraphs and explicit ``\\page`` breaks after the listed
    paragraph indices."""
    breaks = page_break_after or set()
    body: list[str] = []
    for idx, para in enumerate(paragraphs):
        body.append(_rtf_escape(para) + "\\par ")
        if idx in breaks:
            body.append("\\page ")
    doc = (
        "{\\rtf1\\ansi\\ansicpg1252\\deff0"
        "{\\fonttbl{\\f0 Times New Roman;}}"
        "{\\info{\\title " + _rtf_escape(title) + "}}"
        "\\f0\\fs24 " + "".join(body) + "}"
    )
    return doc.encode("ascii")
