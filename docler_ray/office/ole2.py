"""Legacy binary Office (.doc) extraction — pure stdlib CFB + Word 97 text.

The reference converts legacy OLE2 office documents through MarkItDown
(/root/reference/src/docler/converters/markitdown_provider/provider.py:28-119,
``application/msword`` in SUPPORTED_MIME_TYPES). That library is not
available here and this engine builds extractors from scratch, so this
module implements the two public formats the text tier needs directly:

* **CFB** (Compound File Binary, the [MS-CFB] container all legacy Office
  formats share): header -> DIFAT -> FAT sector chains, directory entries,
  and the mini-stream/miniFAT tier for streams under the 4096-byte cutoff.
* **Word 97 binary** ([MS-DOC]): the FIB in the ``WordDocument`` stream
  points (``fcClx``/``lcbClx``, FIB offset 0x01A2) at the Clx in the
  ``0Table``/``1Table`` stream; the Pcdt's piece table (PlcPcd) maps
  character positions to file offsets, each piece either CP1252
  ("compressed", fc bit 30 set, byte offset = fc/2) or UTF-16LE. Paragraph
  marks are CR (0x0D), page breaks are FF (0x0C) — the same mapping
  antiword/catdoc document for the format.
* **SummaryInformation** ([MS-OLEPS] property set, stream
  ``\\x05SummaryInformation``): PIDSI_TITLE (VT_LPSTR) supplies the title,
  the legacy analog of OOXML's docProps/core.xml dc:title.

Output follows this engine's marker grammar (docler_ray.markers) exactly
like the docx extractor: pages split on 0x0C become numbered page breaks,
paragraphs join with blank lines.

Scale shape: extraction is per row inside the extract actor pool
(stateless parse over an in-memory payload) — the same placement as the
OOXML/HTML/pdfish extractors; no new pipeline stage.

The module also carries a DETERMINISTIC writer (``make_doc``) producing
byte-stable, spec-valid .doc files (big-sector WordDocument stream +
mini-stream 1Table and SummaryInformation, mixed ANSI/Unicode pieces) used
by tests and the synthetic oracle corpus, so goldens and SQL oracles can
pin legacy-office extraction byte-for-byte (the office_extract_docs
pattern).
"""

from __future__ import annotations

import struct

from docler_ray.html.extract import ExtractionResult
from docler_ray.markers import join_pages, prepend_first_page_marker

CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC
_NOSTREAM = 0xFFFFFFFF

_MINI_CUTOFF = 4096

_SUMMARY_FMTID = struct.pack(
    "<IHH8B", 0xF29F85E0, 0x4FF9, 0x1068, 0xAB, 0x91, 0x08, 0x00, 0x2B, 0x27, 0xB3, 0xD9
)
_PIDSI_TITLE = 0x00000002
_VT_LPSTR = 0x001E
_VT_I2 = 0x0002


# --- CFB reader ----------------------------------------------------------------


def _u32s(data: bytes) -> list[int]:
    return list(struct.unpack(f"<{len(data) // 4}I", data[: len(data) // 4 * 4]))


def cfb_streams(payload: bytes) -> dict[str, bytes]:
    """Parse a CFB container into {stream name: bytes} (storages skipped).

    Implements the [MS-CFB] read path: header DIFAT (109 entries) plus DIFAT
    sector chains -> FAT, directory chain -> 128-byte entries, root entry's
    chain -> mini stream, miniFAT chain for sub-cutoff streams. Chain walks
    are cycle-guarded (a corrupt FAT raises instead of looping).
    """
    if len(payload) < 512 or not payload.startswith(CFB_MAGIC):
        msg = "not an OLE2/CFB container"
        raise ValueError(msg)
    (
        sector_shift,
        mini_shift,
    ) = struct.unpack("<HH", payload[30:34])
    n_fat = struct.unpack("<I", payload[44:48])[0]
    first_dir = struct.unpack("<I", payload[48:52])[0]
    mini_cutoff = struct.unpack("<I", payload[56:60])[0]
    first_minifat = struct.unpack("<I", payload[60:64])[0]
    first_difat = struct.unpack("<I", payload[68:72])[0]
    n_difat = struct.unpack("<I", payload[72:76])[0]
    if sector_shift not in (9, 12):
        msg = f"bad CFB sector shift {sector_shift}"
        raise ValueError(msg)
    ssize = 1 << sector_shift
    msize = 1 << mini_shift

    def sector(n: int) -> bytes:
        off = 512 + n * ssize
        return payload[off : off + ssize]

    # DIFAT: 109 header entries, then DIFAT sector chain (last u32 = next).
    difat = _u32s(payload[76:512])
    sect, hops = first_difat, 0
    while sect not in (_ENDOFCHAIN, _FREESECT) and hops <= n_difat + 1:
        data = _u32s(sector(sect))
        difat.extend(data[:-1])
        sect = data[-1]
        hops += 1
    fat: list[int] = []
    for s in difat[:n_fat] if n_fat else []:
        if s in (_FREESECT, _ENDOFCHAIN):
            continue
        fat.extend(_u32s(sector(s)))

    max_hops = len(fat) + 1

    def chain(start: int) -> bytes:
        out: list[bytes] = []
        sect, hops = start, 0
        while sect != _ENDOFCHAIN:
            if sect >= len(fat) or hops > max_hops:
                msg = "corrupt CFB FAT chain"
                raise ValueError(msg)
            out.append(sector(sect))
            sect = fat[sect]
            hops += 1
        return b"".join(out)

    entries = chain(first_dir)
    streams: list[tuple[str, int, int]] = []  # (name, start, size)
    mini_start, mini_size = _ENDOFCHAIN, 0
    for i in range(len(entries) // 128):
        e = entries[i * 128 : (i + 1) * 128]
        name_len = struct.unpack("<H", e[64:66])[0]
        obj_type = e[66]
        if obj_type == 0 or name_len < 2:
            continue
        name = e[: name_len - 2].decode("utf-16-le", errors="replace")
        start = struct.unpack("<I", e[116:120])[0]
        size = struct.unpack("<Q", e[120:128])[0]
        if obj_type == 5:  # root: its chain IS the mini stream
            mini_start, mini_size = start, size
        elif obj_type == 2:
            streams.append((name, start, size))

    mini_stream = chain(mini_start)[:mini_size] if mini_size else b""
    minifat = _u32s(chain(first_minifat)) if first_minifat != _ENDOFCHAIN else []
    mini_hops = len(minifat) + 1

    def mini_chain(start: int, size: int) -> bytes:
        out: list[bytes] = []
        sect, hops = start, 0
        while sect != _ENDOFCHAIN and len(out) * msize < size:
            if sect >= len(minifat) or hops > mini_hops:
                msg = "corrupt CFB miniFAT chain"
                raise ValueError(msg)
            out.append(mini_stream[sect * msize : (sect + 1) * msize])
            sect = minifat[sect]
            hops += 1
        return b"".join(out)[:size]

    result: dict[str, bytes] = {}
    for name, start, size in streams:
        if size < mini_cutoff:
            result[name] = mini_chain(start, size)
        else:
            result[name] = chain(start)[:size]
    return result


# --- SummaryInformation title ----------------------------------------------


def _summary_title(stream: bytes) -> str | None:
    """PIDSI_TITLE out of a [MS-OLEPS] SummaryInformation property set."""
    try:
        n_sets = struct.unpack("<I", stream[24:28])[0]
        for i in range(n_sets):
            fmtid = stream[28 + i * 20 : 44 + i * 20]
            off = struct.unpack("<I", stream[44 + i * 20 : 48 + i * 20])[0]
            if fmtid != _SUMMARY_FMTID:
                continue
            n_props = struct.unpack("<I", stream[off + 4 : off + 8])[0]
            for j in range(n_props):
                pid, poff = struct.unpack(
                    "<II", stream[off + 8 + j * 8 : off + 16 + j * 8]
                )
                if pid != _PIDSI_TITLE:
                    continue
                vt = struct.unpack("<I", stream[off + poff : off + poff + 4])[0]
                if vt != _VT_LPSTR:
                    return None
                cch = struct.unpack(
                    "<I", stream[off + poff + 4 : off + poff + 8]
                )[0]
                raw = stream[off + poff + 8 : off + poff + 8 + cch]
                return raw.split(b"\x00", 1)[0].decode("cp1252") or None
    except (struct.error, IndexError):
        return None
    return None


# --- Word 97 text ------------------------------------------------------------

_FIB_MAGIC = 0xA5EC
_FC_COMPRESSED = 0x40000000
_FIB_FCCLX = 0x01A2


def _doc_text(word_stream: bytes, table_stream: bytes) -> str:
    """Retrieve the document text via the piece table ([MS-DOC] 2.4.1)."""
    if len(word_stream) < 0x01AA:
        msg = "WordDocument stream too short for a FIB"
        raise ValueError(msg)
    if struct.unpack("<H", word_stream[0:2])[0] != _FIB_MAGIC:
        msg = "WordDocument stream has no FIB magic"
        raise ValueError(msg)
    fc_clx, lcb_clx = struct.unpack(
        "<II", word_stream[_FIB_FCCLX : _FIB_FCCLX + 8]
    )
    if lcb_clx == 0:
        return ""
    clx = table_stream[fc_clx : fc_clx + lcb_clx]
    # Clx = RgPrc (clxt=0x01 Prc entries, skipped) then the Pcdt (clxt=0x02).
    pos = 0
    while pos < len(clx) and clx[pos] == 0x01:
        cb = struct.unpack("<h", clx[pos + 1 : pos + 3])[0]
        pos += 3 + cb
    if pos >= len(clx) or clx[pos] != 0x02:
        msg = "Clx has no Pcdt piece table"
        raise ValueError(msg)
    lcb = struct.unpack("<I", clx[pos + 1 : pos + 5])[0]
    plc = clx[pos + 5 : pos + 5 + lcb]
    n_pieces = (len(plc) - 4) // 12
    cps = _u32s(plc[: 4 * (n_pieces + 1)])
    parts: list[str] = []
    for k in range(n_pieces):
        pcd = plc[4 * (n_pieces + 1) + 8 * k : 4 * (n_pieces + 1) + 8 * (k + 1)]
        fc_raw = struct.unpack("<I", pcd[2:6])[0]
        n_cp = cps[k + 1] - cps[k]
        if fc_raw & _FC_COMPRESSED:
            off = (fc_raw & 0x3FFFFFFF) // 2
            parts.append(word_stream[off : off + n_cp].decode("cp1252"))
        else:
            off = fc_raw & 0x3FFFFFFF
            parts.append(
                word_stream[off : off + 2 * n_cp].decode("utf-16-le")
            )
    return "".join(parts)


def extract_doc(payload: bytes) -> ExtractionResult:
    """Legacy .doc -> markdown: piece-table text, CR paragraphs joined with
    blank lines, FF page breaks as numbered docler markers, title from the
    SummaryInformation property set (falling back to the first paragraph)."""
    streams = cfb_streams(payload)
    word = streams.get("WordDocument")
    if word is None:
        msg = (
            "OLE2 container without a WordDocument stream "
            "(legacy .xls/.ppt binary formats are not supported)"
        )
        raise ValueError(msg)
    # FibBase flag bit 9 (fWhichTblStm) selects 1Table vs 0Table.
    flags = struct.unpack("<H", word[0x000A:0x000C])[0]
    table_name = "1Table" if flags & 0x0200 else "0Table"
    table = streams.get(table_name) or streams.get(
        "0Table" if table_name == "1Table" else "1Table"
    )
    if table is None:
        msg = f"WordDocument FIB points at missing {table_name} stream"
        raise ValueError(msg)
    text = _doc_text(word, table)
    pages: list[list[str]] = [[]]
    n_paragraphs = 0
    first_para: str | None = None
    for chunk in text.split("\x0c"):
        for para in chunk.split("\r"):
            para = para.strip("\x07\x00")  # cell marks / padding
            if para:
                n_paragraphs += 1
                if first_para is None:
                    first_para = para
                pages[-1].append(para)
        pages.append([])
    page_markdowns = ["\n\n".join(lines) for lines in pages if lines]
    if len(page_markdowns) > 1:
        content = join_pages(page_markdowns)
    else:
        content = prepend_first_page_marker(
            page_markdowns[0] if page_markdowns else ""
        )
    title = None
    summary = streams.get("\x05SummaryInformation")
    if summary is not None:
        title = _summary_title(summary)
    return ExtractionResult(
        content=content,
        title=title or first_para,
        metadata={"office_format": "doc", "n_paragraphs": n_paragraphs},
    )


def sniff_ole2(payload: bytes) -> str | None:
    """Refine an OLE2-magic payload: 'application/msword' when the CFB
    directory carries a WordDocument stream (the legacy-office analog of the
    zip part-layout sniff), None when the directory names no known format
    (caller keeps the generic x-ole-storage MIME). Directory-only read —
    no stream payload is touched."""
    try:
        streams = cfb_streams(payload)
    except (ValueError, struct.error, IndexError):
        return None
    if "WordDocument" in streams:
        return "application/msword"
    if "Workbook" in streams or "Book" in streams:
        return "application/vnd.ms-excel"
    if "PowerPoint Document" in streams:
        return "application/vnd.ms-powerpoint"
    return None


# --- deterministic writer ------------------------------------------------------


def _pad(data: bytes, multiple: int, fill: bytes = b"\x00") -> bytes:
    rem = len(data) % multiple
    return data if rem == 0 else data + fill * (multiple - rem)


def _dir_entry(
    name: str,
    obj_type: int,
    *,
    start: int = _ENDOFCHAIN,
    size: int = 0,
    left: int = _NOSTREAM,
    right: int = _NOSTREAM,
    child: int = _NOSTREAM,
) -> bytes:
    raw = name.encode("utf-16-le")
    e = bytearray(128)
    e[: len(raw)] = raw
    struct.pack_into("<H", e, 64, len(raw) + 2)
    e[66] = obj_type
    e[67] = 1  # black
    struct.pack_into("<III", e, 68, left, right, child)
    struct.pack_into("<I", e, 116, start)
    struct.pack_into("<Q", e, 120, size)
    return bytes(e)


def _summary_stream(title: str) -> bytes:
    """Minimal [MS-OLEPS] SummaryInformation with codepage + title."""
    raw = title.encode("cp1252") + b"\x00"
    raw = _pad(raw, 4)
    # section: cb, cProps=2, (pid, off) x2, VT_I2 codepage, VT_LPSTR title
    title_prop = struct.pack("<II", _VT_LPSTR, len(raw)) + raw
    cp_prop = struct.pack("<IHH", _VT_I2, 1252, 0)
    off_cp = 8 + 2 * 8
    off_title = off_cp + len(cp_prop)
    section = (
        struct.pack(
            "<IIIIII",
            off_title + len(title_prop),
            2,
            0x00000001,  # PIDSI_CODEPAGE
            off_cp,
            _PIDSI_TITLE,
            off_title,
        )
        + cp_prop
        + title_prop
    )
    header = (
        struct.pack("<HHI", 0xFFFE, 0, 0x00020005)
        + b"\x00" * 16
        + struct.pack("<I", 1)
        + _SUMMARY_FMTID
        + struct.pack("<I", 48)
    )
    return header + section


def _word_streams(
    title: str, paragraphs: list[str], page_break_after: set[int] | None
) -> tuple[bytes, bytes]:
    """Build (WordDocument, 1Table): the first paragraph as a CP1252
    "compressed" piece, the rest as one UTF-16 piece — both real piece-table
    arms stay exercised by every fixture."""
    breaks = page_break_after or set()
    text_parts: list[str] = []
    for i, para in enumerate(paragraphs):
        text_parts.append(para + "\r")
        if i in breaks:
            text_parts.append("\x0c")
    text = "".join(text_parts)
    split = len(text_parts[0]) if text_parts else 0
    ansi, uni = text[:split], text[split:]
    try:
        ansi_bytes = ansi.encode("cp1252")
    except UnicodeEncodeError:  # non-CP1252 first paragraph: all unicode
        ansi, uni = "", text
        ansi_bytes = b""
    uni_bytes = uni.encode("utf-16-le")
    # CPs count UTF-16 code units ([MS-DOC] 2.2.1), not Python characters:
    # astral-plane text occupies two units per char in a non-compressed piece.
    cp_ansi = len(ansi)  # CP1252 chars are all BMP single units
    cp_total = cp_ansi + len(uni_bytes) // 2

    fib = bytearray(1024)
    struct.pack_into("<H", fib, 0, _FIB_MAGIC)
    struct.pack_into("<H", fib, 2, 0x00C1)  # nFib: Word 97
    struct.pack_into("<H", fib, 0x000A, 0x0200)  # fWhichTblStm -> 1Table
    struct.pack_into("<H", fib, 0x0020, 14)  # csw
    struct.pack_into("<H", fib, 0x003E, 22)  # cslw
    struct.pack_into("<I", fib, 0x004C, cp_total)  # ccpText
    struct.pack_into("<H", fib, 0x0098, 0x005D)  # cbRgFcLcb (Word 97)

    fc_ansi = 1024
    fc_uni = fc_ansi + len(ansi_bytes)
    pieces: list[tuple[int, int]] = []  # (cp_end, fc_raw)
    if ansi:
        pieces.append((cp_ansi, (fc_ansi * 2) | _FC_COMPRESSED))
    if uni:
        pieces.append((cp_total, fc_uni))
    cps = [0] + [cp for cp, _ in pieces]
    plc = b"".join(struct.pack("<I", cp) for cp in cps) + b"".join(
        struct.pack("<HIH", 0, fc, 0) for _, fc in pieces
    )
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    table = clx  # Clx at offset 0 of 1Table
    struct.pack_into("<II", fib, _FIB_FCCLX, 0, len(clx))

    word = bytes(fib) + ansi_bytes + uni_bytes
    # Keep WordDocument >= the mini cutoff so fixtures exercise the
    # big-sector FAT path (1Table + SummaryInformation cover the mini tier).
    if len(word) < _MINI_CUTOFF:
        word = _pad(word, _MINI_CUTOFF)
    return word, table


def make_doc(
    title: str,
    paragraphs: list[str],
    page_break_after: set[int] | None = None,
) -> bytes:
    """Deterministic minimal Word 97 .doc (CFB v3, 512-byte sectors).

    ``paragraphs`` are body-text paragraphs; ``page_break_after`` holds
    paragraph indices followed by an explicit page break. The WordDocument
    stream is padded past the 4096-byte mini cutoff (FAT tier); 1Table and
    SummaryInformation stay small (mini-stream tier), so a round trip
    covers every CFB read path.
    """
    word, table = _word_streams(title, paragraphs, page_break_after)
    summary = _summary_stream(title)

    # --- mini stream: 1Table then SummaryInformation, 64-byte mini sectors
    table_p, summary_p = _pad(table, 64), _pad(summary, 64)
    mini_stream = table_p + summary_p
    n_table_mini = len(table_p) // 64
    n_summary_mini = len(summary_p) // 64
    minifat: list[int] = []
    for base, count in ((0, n_table_mini), (n_table_mini, n_summary_mini)):
        minifat.extend(range(base + 1, base + count))
        minifat.append(_ENDOFCHAIN)
    minifat_sector = _pad(
        b"".join(struct.pack("<I", v) for v in minifat), 512, b"\xff"
    )

    # --- big sectors: [FAT][dir][word...][mini...][miniFAT]
    word_p = _pad(word, 512)
    mini_p = _pad(mini_stream, 512)
    n_word = len(word_p) // 512
    n_mini = len(mini_p) // 512
    sect_fat = 0
    sect_dir = 1
    sect_word = 2
    sect_mini = sect_word + n_word
    sect_minifat = sect_mini + n_mini
    n_sectors = sect_minifat + 1

    fat = [_FREESECT] * ((n_sectors + 127) // 128 * 128)
    fat[sect_fat] = _FATSECT
    fat[sect_dir] = _ENDOFCHAIN
    for i in range(n_word):
        fat[sect_word + i] = sect_word + i + 1 if i + 1 < n_word else _ENDOFCHAIN
    for i in range(n_mini):
        fat[sect_mini + i] = sect_mini + i + 1 if i + 1 < n_mini else _ENDOFCHAIN
    fat[sect_minifat] = _ENDOFCHAIN
    n_fat_sectors = (n_sectors + 127) // 128
    if n_fat_sectors != 1:  # one FAT sector covers 128 sectors; fixtures fit
        msg = f"fixture too large for the single-FAT writer ({n_sectors} sectors)"
        raise ValueError(msg)
    fat_sector = b"".join(struct.pack("<I", v) for v in fat[:128])

    directory = b"".join(
        (
            _dir_entry(
                "Root Entry",
                5,
                child=1,
                start=sect_mini,
                size=len(mini_stream),
            ),
            _dir_entry("WordDocument", 2, start=sect_word, size=len(word), right=2),
            _dir_entry("1Table", 2, start=0, size=len(table), right=3),
            _dir_entry(
                "\x05SummaryInformation",
                2,
                start=n_table_mini,
                size=len(summary),
            ),
        )
    )

    header = bytearray(512)
    header[0:8] = CFB_MAGIC
    struct.pack_into("<HH", header, 24, 0x003E, 0x0003)  # minor, major
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<HH", header, 30, 9, 6)  # sector/mini shifts
    struct.pack_into("<I", header, 44, 1)  # one FAT sector
    struct.pack_into("<I", header, 48, sect_dir)
    struct.pack_into("<I", header, 56, _MINI_CUTOFF)
    struct.pack_into("<I", header, 60, sect_minifat)
    struct.pack_into("<I", header, 64, 1)  # one miniFAT sector
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", header, 72, 0)
    struct.pack_into("<I", header, 76, sect_fat)  # DIFAT[0]
    for i in range(1, 109):
        struct.pack_into("<I", header, 76 + 4 * i, _FREESECT)

    return bytes(header) + fat_sector + directory + word_p + mini_p + minifat_sector


def _cfb_name_key(name: str) -> tuple[int, str]:
    """[MS-CFB] directory-entry ordering: shorter UTF-16 names first, then
    case-insensitive uppercase comparison."""
    return (len(name.encode("utf-16-le")), name.upper())


def build_cfb(streams: list[tuple[str, bytes]]) -> bytes:
    """Deterministic general-purpose CFB v3 writer (512-byte sectors).

    Streams >= the 4096-byte mini cutoff go to FAT sectors; smaller ones
    share the root mini stream (64-byte mini sectors + miniFAT), so any
    container with both kinds exercises every cfb_streams read path.
    Directory entries are sorted by the [MS-CFB] name order and chained as
    a right-spine BST (valid because sorted ascending). Single-FAT-sector
    capacity (~64 KiB of payload) — fixtures only, raises beyond it.
    """
    ordered = sorted(streams, key=lambda kv: _cfb_name_key(kv[0]))

    big = [(n, d) for n, d in ordered if len(d) >= _MINI_CUTOFF]
    small = [(n, d) for n, d in ordered if len(d) < _MINI_CUTOFF]

    # --- mini stream + miniFAT
    mini_parts: list[bytes] = []
    mini_starts: dict[str, int] = {}
    minifat: list[int] = []
    cursor = 0
    for name, data in small:
        padded = _pad(data, 64) if data else b""
        n_mini = len(padded) // 64
        mini_starts[name] = cursor if n_mini else _ENDOFCHAIN
        minifat.extend(range(cursor + 1, cursor + n_mini))
        if n_mini:
            minifat.append(_ENDOFCHAIN)
        mini_parts.append(padded)
        cursor += n_mini
    mini_stream = b"".join(mini_parts)
    minifat_sector = (
        _pad(b"".join(struct.pack("<I", v) for v in minifat), 512, b"\xff")
        if minifat
        else b""
    )
    n_minifat_sectors = len(minifat_sector) // 512

    # --- big sector layout: [FAT][dir][big streams...][mini][miniFAT]
    dir_count = 1 + len(ordered)
    n_dir = (dir_count * 128 + 511) // 512
    big_padded = [(n, _pad(d, 512)) for n, d in big]
    mini_padded = _pad(mini_stream, 512)
    sect_fat = 0
    sect_dir = 1
    cursor = sect_dir + n_dir
    big_starts: dict[str, int] = {}
    for name, padded in big_padded:
        big_starts[name] = cursor
        cursor += len(padded) // 512
    sect_mini = cursor if mini_stream else _ENDOFCHAIN
    cursor += len(mini_padded) // 512 if mini_stream else 0
    sect_minifat = cursor if n_minifat_sectors else _ENDOFCHAIN
    cursor += n_minifat_sectors
    n_sectors = cursor
    if n_sectors > 128:
        msg = f"fixture too large for the single-FAT writer ({n_sectors} sectors)"
        raise ValueError(msg)

    fat = [_FREESECT] * 128
    fat[sect_fat] = _FATSECT
    for i in range(n_dir):
        fat[sect_dir + i] = sect_dir + i + 1 if i + 1 < n_dir else _ENDOFCHAIN
    for name, padded in big_padded:
        start, count = big_starts[name], len(padded) // 512
        for i in range(count):
            fat[start + i] = start + i + 1 if i + 1 < count else _ENDOFCHAIN
    if mini_stream:
        start, count = sect_mini, len(mini_padded) // 512
        for i in range(count):
            fat[start + i] = start + i + 1 if i + 1 < count else _ENDOFCHAIN
    if n_minifat_sectors:
        for i in range(n_minifat_sectors):
            fat[sect_minifat + i] = (
                sect_minifat + i + 1 if i + 1 < n_minifat_sectors else _ENDOFCHAIN
            )
    fat_sector = b"".join(struct.pack("<I", v) for v in fat)

    entries = [
        _dir_entry(
            "Root Entry",
            5,
            child=1 if ordered else _NOSTREAM,
            start=sect_mini,
            size=len(mini_stream),
        )
    ]
    for idx, (name, data) in enumerate(ordered):
        start = big_starts[name] if len(data) >= _MINI_CUTOFF else mini_starts[name]
        entries.append(
            _dir_entry(
                name,
                2,
                start=start,
                size=len(data),
                right=idx + 2 if idx + 1 < len(ordered) else _NOSTREAM,
            )
        )
    directory = _pad(b"".join(entries), 512)

    header = bytearray(512)
    header[0:8] = CFB_MAGIC
    struct.pack_into("<HH", header, 24, 0x003E, 0x0003)
    struct.pack_into("<H", header, 28, 0xFFFE)
    struct.pack_into("<HH", header, 30, 9, 6)
    struct.pack_into("<I", header, 44, 1)
    struct.pack_into("<I", header, 48, sect_dir)
    struct.pack_into("<I", header, 56, _MINI_CUTOFF)
    struct.pack_into("<I", header, 60, sect_minifat)
    struct.pack_into("<I", header, 64, n_minifat_sectors)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)
    struct.pack_into("<I", header, 72, 0)
    struct.pack_into("<I", header, 76, sect_fat)
    for i in range(1, 109):
        struct.pack_into("<I", header, 76 + 4 * i, _FREESECT)

    return (
        bytes(header)
        + fat_sector
        + directory
        + b"".join(p for _, p in big_padded)
        + (mini_padded if mini_stream else b"")
        + minifat_sector
    )
