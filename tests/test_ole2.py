"""Legacy binary Office (.doc): CFB container round trips, Word 97 piece
table decoding (both CP1252 and UTF-16 arms), SummaryInformation titles,
OLE2 directory sniffing, and dispatch through the extract actor stage."""

from __future__ import annotations

import struct

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from docler_ray.mime_types import MSWORD_MIME, OLE2_MIME, sniff_mime
from docler_ray.office.ole2 import (
    CFB_MAGIC,
    cfb_streams,
    extract_doc,
    make_doc,
    sniff_ole2,
)

PB1 = '<!-- docler:page_break {"next_page":1} -->'
PB2 = '<!-- docler:page_break {"next_page":2} -->'


def test_doc_golden():
    payload = make_doc("Annual Letter", ["Dear reader.", "We grew."])
    r = extract_doc(payload)
    assert r.title == "Annual Letter"
    assert r.content == PB1 + "\nDear reader.\n\nWe grew."
    assert r.metadata == {"office_format": "doc", "n_paragraphs": 2}


def test_doc_writer_deterministic():
    assert make_doc("T", ["a", "b"]) == make_doc("T", ["a", "b"])


def test_doc_page_breaks():
    from docler_ray.markers import count_page_breaks

    r = extract_doc(make_doc("T", ["p0", "p1", "p2"], page_break_after={0}))
    assert r.content == PB1 + "\n\n\np0\n\n\n" + PB2 + "\n\n\np1\n\np2"
    assert count_page_breaks(r.content) == 2


def test_doc_piece_table_uses_both_encodings():
    """The writer's piece split: first paragraph stored as a CP1252
    'compressed' piece, the rest as UTF-16LE — both bytes must be present
    verbatim in the WordDocument stream."""
    payload = make_doc("T", ["Lede ascii.", "Snowman ☃ here."])
    word = cfb_streams(payload)["WordDocument"]
    assert b"Lede ascii.\r" in word  # 8-bit piece
    assert "Snowman ☃ here.\r".encode("utf-16-le") in word
    r = extract_doc(payload)
    assert r.content == PB1 + "\nLede ascii.\n\nSnowman ☃ here."


def test_doc_unicode_first_paragraph_falls_back_to_all_unicode():
    r = extract_doc(make_doc("T", ["Ωmega leads.", "ascii follows"]))
    assert r.content == PB1 + "\nΩmega leads.\n\nascii follows"


def test_doc_title_falls_back_to_first_paragraph():
    """A title the CP1252 SummaryInformation writer can't encode is the
    extractor's cue to fall back (parity with docx's first-heading rule)."""
    payload = make_doc("Caf\xe9 notes", ["Body text."])
    assert extract_doc(payload).title == "Caf\xe9 notes"


def test_cfb_stream_tiers():
    """WordDocument rides the big-sector FAT tier (>= 4096 bytes); 1Table
    and SummaryInformation ride the mini stream; all three read back."""
    streams = cfb_streams(make_doc("T", ["hello world"]))
    assert set(streams) == {"WordDocument", "1Table", "\x05SummaryInformation"}
    assert len(streams["WordDocument"]) >= 4096
    assert 0 < len(streams["1Table"]) < 4096
    assert 0 < len(streams["\x05SummaryInformation"]) < 4096
    # 1Table begins with the Pcdt clxt byte of a Clx with no Prc prefix
    assert streams["1Table"][0] == 0x02


def test_sniff_ole2_directory():
    payload = make_doc("T", ["x"])
    assert sniff_ole2(payload) == MSWORD_MIME
    assert sniff_mime(payload) == MSWORD_MIME
    # bare magic / torn container stays the generic OLE2 MIME
    assert sniff_ole2(CFB_MAGIC + b"x") is None
    assert sniff_mime(CFB_MAGIC + b"x") == OLE2_MIME


def test_malformed_doc_payloads_raise_value_error():
    with pytest.raises(ValueError):
        cfb_streams(b"not a container")
    with pytest.raises(ValueError):
        extract_doc(CFB_MAGIC + b"\x00" * 600)  # magic but corrupt header
    # valid container whose WordDocument FIB is garbage
    payload = bytearray(make_doc("T", ["x"]))
    streams = cfb_streams(bytes(payload))
    word_off = bytes(payload).find(struct.pack("<H", 0xA5EC))
    payload[word_off : word_off + 2] = b"\x00\x00"
    with pytest.raises(ValueError):
        extract_doc(bytes(payload))
    assert streams["WordDocument"][:2] == struct.pack("<H", 0xA5EC)


def test_extract_stage_dispatches_doc_rows():
    """End-to-end through the extract actor stage: .doc payloads sniff as
    msword and route to doc_extract; a WordDocument-less OLE2 container
    stays x-ole-storage and becomes a per-row error."""
    from docler_ray.stages.extract import ExtractDocs

    doc = make_doc("Memo", ["Legacy body text."], page_break_after=None)
    # truncate past the header: magic intact, directory unreadable
    torn = make_doc("T", ["x"])[:512]
    payloads = [doc, torn]
    batch = pa.table(
        {
            "url": pa.array(["u0", "u1"], pa.string()),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array([""] * 2, pa.string()),
            "lang": pa.array(["en"] * 2, pa.string()),
            "mime_type": pa.array([sniff_mime(p) for p in payloads], pa.string()),
        }
    )
    out = ExtractDocs()(batch).to_pylist()
    assert out[0]["extractor"] == "doc_extract"
    assert out[0]["error"] is None
    assert out[0]["title"] == "Memo"
    assert "Legacy body text." in out[0]["content"]
    assert out[0]["page_count"] == 1
    assert out[1]["error"] is not None and OLE2_MIME in out[1]["error"]


_PARA = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_categories=("Cs", "Cc", "Zl", "Zp"),
        exclude_characters="\x07",
    ),
    min_size=1,
    max_size=60,
).filter(lambda s: s == s.strip("\x07\x00") and s.strip())


@settings(max_examples=25, deadline=None)
@given(paras=st.lists(_PARA, min_size=1, max_size=6))
def test_doc_roundtrip_property(paras):
    """Any printable paragraph list survives the writer -> CFB -> piece
    table -> markdown round trip with paragraphs intact and in order."""
    r = extract_doc(make_doc("T", paras))
    body = r.content.removeprefix(PB1 + "\n")
    assert body.split("\n\n") == paras
    assert r.metadata["n_paragraphs"] == len(paras)
