"""Legacy binary Excel (BIFF8) and PowerPoint 97 extraction tests."""

from __future__ import annotations

import struct

from docler_ray.office.biff import (
    _OP_CONTINUE,
    _OP_SST,
    _parse_sst,
    _records,
    _rk_number,
    _sst_records,
    extract_xls,
    make_xls,
)
from docler_ray.office.ole2 import build_cfb, cfb_streams, sniff_ole2
from docler_ray.office.ppt97 import extract_ppt, make_ppt
from docler_ray.stages.dispatch import DEFAULT_PREFERENCES, EXTRACTORS


def test_build_cfb_round_trip_mixed_tiers():
    streams = [
        ("BigStream", b"x" * 5000),  # FAT tier
        ("\x05SummaryInformation", b"s" * 100),  # mini tier
        ("Tiny", b"t" * 10),
    ]
    back = cfb_streams(build_cfb(streams))
    assert back["BigStream"] == b"x" * 5000
    assert back["\x05SummaryInformation"] == b"s" * 100
    assert back["Tiny"] == b"t" * 10


def test_xls_round_trip_cell_kinds():
    xls = make_xls(
        "Quarterly",
        {
            "Revenue": [
                ["region", "amount", "note"],
                ["EMEA", 1200, "ok"],
                ["APAC", 3.5, True],
            ],
            "Füll": [["köln", -42], [2**40, None]],
        },
    )
    assert sniff_ole2(xls) == "application/vnd.ms-excel"
    r = extract_xls(xls)
    assert r.title == "Quarterly"
    assert r.metadata == {"office_format": "xls", "n_sheets": 2, "n_cells": 12}
    assert "## Revenue" in r.content
    assert "| EMEA | 1200 | ok |" in r.content
    assert "| APAC | 3.5 | TRUE |" in r.content  # NUMBER + BOOLERR
    assert "| köln | -42 |" in r.content  # unicode sheet + negative RK
    assert "| 1099511627776 |  |" in r.content  # NUMBER (beyond RK range), gap


def test_sst_continue_mid_string_round_trip():
    strings = []
    for i in range(40):
        if i % 3 == 0:
            strings.append(("unicode-α-" + str(i) + "-") * 60)  # UTF-16 arm
        else:
            strings.append(("plain-" + str(i) + "-") * 80)  # CP1252 arm
    blob = _sst_records(strings, cap=300)  # tiny cap: many mid-string splits
    recs = list(_records(blob))
    assert recs[0][0] == _OP_SST
    assert all(op == _OP_CONTINUE for op, _ in recs[1:])
    assert len(recs) > 50
    assert _parse_sst([p for _, p in recs]) == strings


def test_sst_real_cap_workbook():
    big = {"S": [[f"r{r}c{c}-" + "x" * 200 for c in range(5)] for r in range(30)]}
    r = extract_xls(make_xls("Big", big))
    assert r.metadata["n_cells"] == 150
    assert "r29c4-" in r.content


def test_rk_decoding():
    assert _rk_number((7 << 2) | 0x02) == 7.0
    assert _rk_number(((-7 & 0x3FFFFFFF) << 2) | 0x02) == -7.0
    assert _rk_number((700 << 2) | 0x03) == 7.0  # x100 divisor bit
    # truncated double: 2.0 has only high-word bits
    high = struct.unpack("<I", struct.pack("<d", 2.0)[4:])[0]
    assert _rk_number(high & 0xFFFFFFFC) == 2.0


def test_xls_mulrk_and_formula_records():
    # hand-build a worksheet with MULRK, numeric FORMULA and string
    # FORMULA + STRING (the writer never emits them; the reader must)
    from docler_ray.office.biff import _rec
    from docler_ray.office.ole2 import _summary_stream

    def rk_int(v):
        return ((v & 0x3FFFFFFF) << 2) | 0x02

    globals_ = (
        _rec(0x0809, struct.pack("<HHHH", 0x0600, 0x0005, 0, 0))
        + _rec(0x0085, struct.pack("<IHBB", 0, 0, 2, 0) + b"S1")
        + _rec(0x000A, b"")
    )
    sheet = _rec(0x0809, struct.pack("<HHHH", 0x0600, 0x0010, 0, 0))
    # MULRK: row 0, cols 0..2 = 10, 20, 30
    body = struct.pack("<HH", 0, 0)
    for v in (10, 20, 30):
        body += struct.pack("<HI", 0, rk_int(v))
    body += struct.pack("<H", 2)
    sheet += _rec(0x00BD, body)
    # numeric FORMULA: row 1 col 0 cached 6.5
    sheet += _rec(
        0x0006, struct.pack("<HHH", 1, 0, 0) + struct.pack("<d", 6.5) + b"\x00" * 8
    )
    # string FORMULA: row 1 col 1, cached string "calc" via STRING record
    sheet += _rec(
        0x0006,
        struct.pack("<HHH", 1, 1, 0)
        + b"\x00" * 6
        + b"\xff\xff"
        + b"\x00" * 8,
    )
    sheet += _rec(0x0207, struct.pack("<HB", 4, 0) + b"calc")
    sheet += _rec(0x000A, b"")
    payload = build_cfb(
        [("Workbook", globals_ + sheet), ("\x05SummaryInformation", _summary_stream("T"))]
    )
    r = extract_xls(payload)
    assert "| 10 | 20 | 30 |" in r.content
    assert "| 6.5 | calc |" in r.content


def test_ppt_round_trip_slides_and_markers():
    ppt = make_ppt(
        "Deck Title",
        [
            ("Intro", ["Welcome to the deck.", "Agenda follows."]),
            (None, ["Slide two has no title."]),
            ("Résumé", ["Unicode bödy ünïcode ★ star."]),  # chars-atom body
        ],
    )
    assert sniff_ole2(ppt) == "application/vnd.ms-powerpoint"
    r = extract_ppt(ppt)
    assert r.title == "Deck Title"
    assert r.metadata == {
        "office_format": "ppt",
        "n_slides": 3,
        "n_paragraphs": 6,
    }
    assert '{"next_page":3}' in r.content
    assert "# Intro\n\nWelcome to the deck.\n\nAgenda follows." in r.content
    assert "Slide two has no title." in r.content
    assert "# Résumé\n\nUnicode bödy ünïcode ★ star." in r.content


def test_ppt_single_slide_and_title_fallback():
    # no SummaryInformation title match -> first slide title
    ppt = make_ppt("", [("Only Slide", ["One para."])])
    r = extract_ppt(ppt)
    assert r.title in ("", "Only Slide")
    assert r.content.startswith("<!-- docler:page_break")
    assert r.metadata["n_slides"] == 1


def test_dispatch_routes_legacy_office():
    assert DEFAULT_PREFERENCES["application/vnd.ms-excel"] == "xls_extract"
    assert DEFAULT_PREFERENCES["application/vnd.ms-powerpoint"] == "ppt_extract"
    xls = make_xls("T", {"S": [["a"]]})
    res = EXTRACTORS["xls_extract"](xls, "", {})
    assert "| a |" in res.content
    ppt = make_ppt("T", [("H", ["b"])])
    res = EXTRACTORS["ppt_extract"](ppt, "", {})
    assert "# H" in res.content
