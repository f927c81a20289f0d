"""Legacy binary Excel (.xls, BIFF8) extraction — pure stdlib.

The reference converts legacy Excel workbooks through MarkItDown
(/root/reference/src/docler/converters/markitdown_provider/provider.py:28-119,
``application/vnd.ms-excel`` in SUPPORTED_MIME_TYPES). That library is not
available here, so this module reads the [MS-XLS] BIFF8 record stream
directly from the CFB ``Workbook`` stream:

* record framing: ``(opcode u16, length u16, payload)``; record bodies may
  spill into CONTINUE (0x003C) records,
* the Shared String Table (SST 0x00FC) with full CONTINUE semantics — a
  string whose character data crosses a record boundary restarts with a
  fresh ``fHighByte`` flags byte (compressed/UTF-16 can switch mid-string),
* cell records: LABELSST (SST reference), LABEL (inline string), NUMBER
  (IEEE double), RK / MULRK (packed 30-bit int or truncated double, with
  the x100 divisor bit), BOOLERR, and FORMULA cached results (numeric
  inline; string results via the following STRING record),
* sheet structure: BOUNDSHEET names in the workbook-globals substream pair
  positionally with the worksheet BOF..EOF substreams that follow.

Output mirrors the OOXML xlsx extractor (office/ooxml.py:195): one
``## {sheet name}`` heading plus a markdown table per sheet, first row as
the header row, title from the SummaryInformation property set.

Scale shape: per-row parse inside the extract actor pool — identical
placement to the other extractors; no new pipeline stage.

A DETERMINISTIC writer (``make_xls``) emits spec-valid minimal BIFF8
workbooks (SST split across CONTINUE records mid-string when the body
exceeds the 8224-byte record cap, RK-encodable integers as RK, floats as
NUMBER) so tests and SQL oracles can pin extraction byte-for-byte.
"""

from __future__ import annotations

import struct

from docler_ray.html.extract import ExtractionResult
from docler_ray.markers import prepend_first_page_marker
from docler_ray.office.ole2 import (
    _summary_stream,
    _summary_title,
    build_cfb,
    cfb_streams,
)

_OP_BOF = 0x0809
_OP_EOF = 0x000A
_OP_BOUNDSHEET = 0x0085
_OP_SST = 0x00FC
_OP_LABELSST = 0x00FD
_OP_LABEL = 0x0204
_OP_NUMBER = 0x0203
_OP_RK = 0x027E
_OP_MULRK = 0x00BD
_OP_BOOLERR = 0x0205
_OP_FORMULA = 0x0006
_OP_STRING = 0x0207
_OP_CONTINUE = 0x003C

_BOF_WORKBOOK = 0x0005
_BOF_WORKSHEET = 0x0010

# [MS-XLS] 2.1.4: a record body holds at most 8224 bytes
_RECORD_CAP = 8224


def _records(data: bytes):
    """Yield (opcode, payload) from a BIFF record stream."""
    pos = 0
    n = len(data)
    while pos + 4 <= n:
        op, length = struct.unpack_from("<HH", data, pos)
        payload = data[pos + 4 : pos + 4 + length]
        yield op, payload
        pos += 4 + length
        if op == _OP_EOF and pos + 4 > n:
            break


class _SegCursor:
    """Cursor over an SST body split across CONTINUE segments.

    ``read`` is segment-transparent (headers / rich runs / ext data never
    gain a continuation flags byte); ``read_chars`` re-reads a fresh
    ``fHighByte`` byte whenever character data resumes in a new segment
    ([MS-XLS] 2.5.293 ContinueFrt / XLUnicodeRichExtendedString rules).
    """

    def __init__(self, segments: list[bytes]):
        self.segs = segments
        self.i = 0
        self.off = 0

    def _advance(self) -> None:
        while self.i < len(self.segs) and self.off >= len(self.segs[self.i]):
            self.i += 1
            self.off = 0

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            self._advance()
            if self.i >= len(self.segs):
                msg = "truncated SST"
                raise ValueError(msg)
            seg = self.segs[self.i]
            take = min(n, len(seg) - self.off)
            out += seg[self.off : self.off + take]
            self.off += take
            n -= take
        return bytes(out)

    def read_chars(self, cch: int, high: int) -> str:
        parts: list[str] = []
        remaining = cch
        while remaining > 0:
            self._advance()
            if self.i >= len(self.segs):
                msg = "truncated SST string"
                raise ValueError(msg)
            seg = self.segs[self.i]
            if self.off == 0 and parts:
                # mid-string continuation: fresh flags byte
                high = seg[0] & 1
                self.off = 1
            avail = len(seg) - self.off
            unit = 2 if high else 1
            take = min(remaining, avail // unit)
            if take == 0:
                msg = "SST char data split inside a UTF-16 unit"
                raise ValueError(msg)
            raw = seg[self.off : self.off + take * unit]
            parts.append(raw.decode("utf-16-le" if high else "cp1252"))
            self.off += take * unit
            remaining -= take
        return "".join(parts)


def _parse_sst(segments: list[bytes]) -> list[str]:
    cur = _SegCursor(segments)
    _total, unique = struct.unpack("<II", cur.read(8))
    out: list[str] = []
    for _ in range(unique):
        cch, flags = struct.unpack("<HB", cur.read(3))
        crun = struct.unpack("<H", cur.read(2))[0] if flags & 0x08 else 0
        cbext = struct.unpack("<I", cur.read(4))[0] if flags & 0x04 else 0
        out.append(cur.read_chars(cch, flags & 0x01))
        if crun:
            cur.read(4 * crun)
        if cbext:
            cur.read(cbext)
    return out


def _short_unicode(payload: bytes, off: int) -> str:
    """XLUnicodeString (cch u16, flags u8, chars) — LABEL / BOUNDSHEET-style
    inline strings (BOUNDSHEET uses a u8 cch; see caller)."""
    cch, flags = struct.unpack_from("<HB", payload, off)
    off += 3
    if flags & 1:
        return payload[off : off + 2 * cch].decode("utf-16-le")
    return payload[off : off + cch].decode("cp1252")


def _rk_number(rk: int) -> float:
    val: float
    if rk & 0x02:  # 30-bit signed integer
        v = rk >> 2
        if v >= 1 << 29:
            v -= 1 << 30
        val = float(v)
    else:  # high 30 bits of an IEEE double
        val = struct.unpack("<d", struct.pack("<I", 0) + struct.pack("<I", rk & 0xFFFFFFFC))[0]
    return val / 100 if rk & 0x01 else val


def _fmt_number(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def extract_xls(payload: bytes) -> ExtractionResult:
    """Legacy .xls -> markdown: one ``## {sheet}`` heading + markdown table
    per worksheet (first row as header — the xlsx extractor's contract),
    title from SummaryInformation, falling back to the first sheet name."""
    streams = cfb_streams(payload)
    wb = streams.get("Workbook") or streams.get("Book")
    if wb is None:
        msg = "OLE2 container without a Workbook stream"
        raise ValueError(msg)

    recs = list(_records(wb))

    # pass 1: globals — sheet names + SST (with CONTINUE segments)
    sheet_names: list[str] = []
    sst: list[str] = []
    i = 0
    while i < len(recs):
        op, body = recs[i]
        if op == _OP_BOUNDSHEET:
            # lbPlyPos u32, grbit u16, cch u8, flags u8, name
            cch, flags = body[6], body[7]
            raw = body[8:]
            name = (
                raw[: 2 * cch].decode("utf-16-le")
                if flags & 1
                else raw[:cch].decode("cp1252")
            )
            sheet_names.append(name)
        elif op == _OP_SST:
            segments = [body]
            j = i + 1
            while j < len(recs) and recs[j][0] == _OP_CONTINUE:
                segments.append(recs[j][1])
                j += 1
            sst = _parse_sst(segments)
            i = j - 1
        elif op == _OP_EOF:
            break  # end of workbook globals
        i += 1

    # pass 2: worksheet substreams, paired positionally with BOUNDSHEET order
    sheets: list[tuple[str, dict[tuple[int, int], str]]] = []
    cells: dict[tuple[int, int], str] | None = None
    pending_formula_cell: tuple[int, int] | None = None
    for op, body in recs:
        if op == _OP_BOF:
            dt = struct.unpack_from("<H", body, 2)[0]
            if dt == _BOF_WORKSHEET:
                name = (
                    sheet_names[len(sheets)]
                    if len(sheets) < len(sheet_names)
                    else f"Sheet{len(sheets) + 1}"
                )
                cells = {}
                sheets.append((name, cells))
            continue
        if cells is None:
            continue
        if op == _OP_LABELSST:
            rw, col, _ixfe, isst = struct.unpack_from("<HHHI", body)
            cells[(rw, col)] = sst[isst] if isst < len(sst) else ""
        elif op == _OP_LABEL:
            rw, col, _ixfe = struct.unpack_from("<HHH", body)
            cells[(rw, col)] = _short_unicode(body, 6)
        elif op == _OP_NUMBER:
            rw, col, _ixfe, num = struct.unpack_from("<HHHd", body)
            cells[(rw, col)] = _fmt_number(num)
        elif op == _OP_RK:
            rw, col, _ixfe, rk = struct.unpack_from("<HHHI", body)
            cells[(rw, col)] = _fmt_number(_rk_number(rk))
        elif op == _OP_MULRK:
            rw, col_first = struct.unpack_from("<HH", body)
            n_rk = (len(body) - 6) // 6
            for k in range(n_rk):
                rk = struct.unpack_from("<I", body, 4 + 6 * k + 2)[0]
                cells[(rw, col_first + k)] = _fmt_number(_rk_number(rk))
        elif op == _OP_BOOLERR:
            rw, col, _ixfe, v, is_err = struct.unpack_from("<HHHBB", body)
            cells[(rw, col)] = "#ERR" if is_err else ("TRUE" if v else "FALSE")
        elif op == _OP_FORMULA:
            rw, col, _ixfe = struct.unpack_from("<HHH", body)
            result = body[6:14]
            if result[6:8] == b"\xff\xff":
                if result[0] == 0:  # string result: value in next STRING rec
                    pending_formula_cell = (rw, col)
                elif result[0] == 1:
                    cells[(rw, col)] = "TRUE" if result[2] else "FALSE"
                else:
                    cells[(rw, col)] = "#ERR" if result[0] == 2 else ""
            else:
                cells[(rw, col)] = _fmt_number(struct.unpack("<d", result)[0])
        elif op == _OP_STRING and pending_formula_cell is not None:
            cells[pending_formula_cell] = _short_unicode(body, 0)
            pending_formula_cell = None

    sheet_mds: list[str] = []
    n_cells = 0
    for name, cell_map in sheets:
        if not cell_map:
            sheet_mds.append("## " + name)
            continue
        max_row = max(r for r, _ in cell_map)
        max_col = max(c for _, c in cell_map)
        lines: list[str] = []
        for r in range(max_row + 1):
            row_cells = [cell_map.get((r, c), "") for c in range(max_col + 1)]
            n_cells += sum(1 for c in row_cells if c)
            lines.append("| " + " | ".join(row_cells) + " |")
            if r == 0:
                lines.append("|" + " --- |" * (max_col + 1))
        sheet_mds.append("## " + name + "\n\n" + "\n".join(lines))

    title = None
    summary = streams.get("\x05SummaryInformation")
    if summary is not None:
        title = _summary_title(summary)
    return ExtractionResult(
        content=prepend_first_page_marker("\n\n".join(sheet_mds)),
        title=title or (sheets[0][0] if sheets else None),
        metadata={
            "office_format": "xls",
            "n_sheets": len(sheets),
            "n_cells": n_cells,
        },
    )


# --- deterministic writer ------------------------------------------------------


def _rec(op: int, payload: bytes) -> bytes:
    return struct.pack("<HH", op, len(payload)) + payload


def _sst_records(strings: list[str], cap: int = _RECORD_CAP) -> bytes:
    """SST (+ CONTINUE) records: strings written compressed when
    CP1252-safe else UTF-16, character data split mid-string across
    CONTINUE boundaries with a fresh flags byte when the cap is hit.
    Headers never split, and a header is only placed where at least one
    character unit fits after it, so every continuation is strictly
    mid-character-data (the unambiguous [MS-XLS] case)."""
    segments: list[bytearray] = [bytearray(struct.pack("<II", len(strings), len(strings)))]
    for s in strings:
        try:
            s.encode("cp1252")
            high = 0
        except UnicodeEncodeError:
            high = 1
        unit = 2 if high else 1
        header = struct.pack("<HB", len(s), high)
        if cap - len(segments[-1]) < len(header) + (unit if s else 0):
            segments.append(bytearray())
        segments[-1] += header
        remaining = s
        while remaining:
            room = (cap - len(segments[-1])) // unit
            if room == 0:
                segments.append(bytearray([high]))  # fresh flags byte
                continue
            chunk = remaining[:room]
            segments[-1] += chunk.encode("utf-16-le" if high else "cp1252")
            remaining = remaining[room:]
    out = _rec(_OP_SST, bytes(segments[0]))
    for seg in segments[1:]:
        out += _rec(_OP_CONTINUE, bytes(seg))
    return out


def make_xls(title: str, sheets: dict[str, list[list[object]]]) -> bytes:
    """Deterministic minimal BIFF8 .xls. ``sheets`` maps sheet name -> rows;
    str cells go through the SST (LABELSST), ints in 30-bit range become RK
    records, other numbers NUMBER records, bools BOOLERR, None a skipped
    cell."""
    strings: list[str] = []
    string_ix: dict[str, int] = {}
    for rows in sheets.values():
        for row in rows:
            for v in row:
                if isinstance(v, str) and v not in string_ix:
                    string_ix[v] = len(strings)
                    strings.append(v)

    sheet_streams: list[bytes] = []
    for rows in sheets.values():
        body = bytearray(_rec(_OP_BOF, struct.pack("<HHHH", 0x0600, _BOF_WORKSHEET, 0, 0)))
        for r, row in enumerate(rows):
            for c, v in enumerate(row):
                if v is None:
                    continue
                if isinstance(v, str):
                    body += _rec(
                        _OP_LABELSST, struct.pack("<HHHI", r, c, 0, string_ix[v])
                    )
                elif isinstance(v, bool):
                    body += _rec(
                        _OP_BOOLERR, struct.pack("<HHHBB", r, c, 0, int(v), 0)
                    )
                elif isinstance(v, int) and -(1 << 29) <= v < (1 << 29):
                    rk = ((v & 0x3FFFFFFF) << 2) | 0x02
                    body += _rec(_OP_RK, struct.pack("<HHHI", r, c, 0, rk))
                else:
                    body += _rec(_OP_NUMBER, struct.pack("<HHHd", r, c, 0, float(v)))
        body += _rec(_OP_EOF, b"")
        sheet_streams.append(bytes(body))

    # globals: BOF, BOUNDSHEETs (positions need globals length — the
    # BOUNDSHEET record sizes are name-dependent but position-independent,
    # so one sizing pass then one real pass)
    def globals_stream(positions: list[int]) -> bytes:
        g = bytearray(_rec(_OP_BOF, struct.pack("<HHHH", 0x0600, _BOF_WORKBOOK, 0, 0)))
        for name, pos in zip(sheets.keys(), positions):
            raw = name.encode("cp1252")
            g += _rec(
                _OP_BOUNDSHEET,
                struct.pack("<IHBB", pos, 0, len(raw), 0) + raw,
            )
        g += _sst_records(strings)
        g += _rec(_OP_EOF, b"")
        return bytes(g)

    sizing = globals_stream([0] * len(sheets))
    positions = []
    cursor = len(sizing)
    for s in sheet_streams:
        positions.append(cursor)
        cursor += len(s)
    workbook = globals_stream(positions) + b"".join(sheet_streams)

    return build_cfb(
        [
            ("Workbook", workbook),
            ("\x05SummaryInformation", _summary_stream(title)),
        ]
    )
