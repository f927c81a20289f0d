"""Charset ladder (html/charset.py): BOM priority, meta prescan with
WHATWG compatibility mappings, utf-8 strictness, cp1252 fallback, and the
BOM-aware sniff_mime gate (binary noise starting \\xff\\xfe must NOT flip
to text)."""

from __future__ import annotations

import codecs

from docler_ray.html.charset import bom_codec, decode_html, declared_charset
from docler_ray.mime_types import sniff_mime


def test_bom_wins_over_meta():
    # BOM'd UTF-16 with a (lying) meta declaring gb18030: BOM rung first
    payload = codecs.BOM_UTF16_LE + '<html><head><meta charset="gb18030"></head><body>héllo</body></html>'.encode(
        "utf-16-le"
    )
    text, codec = decode_html(payload)
    assert codec == "utf-16-le"
    assert "héllo" in text


def test_meta_declared_cp1252():
    payload = (
        '<html><head><meta http-equiv="Content-Type" '
        'content="text/html; charset=windows-1252"></head>'
        "<body>café résumé</body></html>"
    ).encode("cp1252")
    text, codec = decode_html(payload)
    assert codec == "cp1252"
    assert "café résumé" in text


def test_meta_iso_8859_1_maps_to_cp1252():
    # WHATWG: the 8859-1 label decodes as windows-1252 (0x93 is a smart
    # quote there, undefined in true latin-1 control range semantics)
    payload = (
        b'<html><head><meta charset="iso-8859-1"></head><body>\x93quoted\x94</body></html>'
    )
    text, codec = decode_html(payload)
    assert codec == "cp1252"
    assert "“quoted”" in text


def test_meta_gb2312_maps_to_gbk():
    payload = ('<html><head><meta charset="gb2312"></head><body>中文</body></html>').encode(
        "gbk"
    )
    text, codec = decode_html(payload)
    assert codec == "gbk"
    assert "中文" in text


def test_declared_utf16_treated_as_utf8():
    payload = '<html><head><meta charset="utf-16"></head><body>ok✓</body></html>'.encode(
        "utf-8"
    )
    text, codec = decode_html(payload)
    assert codec == "utf-8"
    assert "ok✓" in text


def test_valid_utf8_stays_utf8():
    payload = "<html><body>emoji ✓ über</body></html>".encode("utf-8")
    text, codec = decode_html(payload)
    assert codec == "utf-8"
    assert "über" in text


def test_invalid_utf8_falls_back_cp1252():
    payload = b"<html><body>caf\xe9</body></html>"  # latin-1 bytes, no meta
    text, codec = decode_html(payload)
    assert codec == "cp1252"
    assert "café" in text


def test_unknown_label_ignored():
    payload = b'<html><head><meta charset="klingon-8"></head><body>plain</body></html>'
    assert declared_charset(payload) is None
    _, codec = decode_html(payload)
    assert codec == "utf-8"


def test_sniff_bom_html_and_noise_gate():
    html = '<html><head><title>t</title></head><body><p>real text</p></body></html>'
    assert sniff_mime(codecs.BOM_UTF16_LE + html.encode("utf-16-le")) == "text/html"
    assert sniff_mime(codecs.BOM_UTF16_BE + html.encode("utf-16-be")) == "text/html"
    assert sniff_mime(codecs.BOM_UTF8 + html.encode("utf-8")) == "text/html"
    # binary noise behind a fake BOM: decoded junk is mostly CJK-PRINTABLE
    # (no ratio gate separates it from real CJK text), so the BOM branch
    # upgrades only on markup evidence — noise AND BOM'd plain text both
    # stay binary, the pre-ladder verdict
    import random

    rng = random.Random(4)
    noise = b"\xff\xfe" + bytes(rng.randrange(256) for _ in range(500))
    assert sniff_mime(noise) == "application/octet-stream"
    plain = codecs.BOM_UTF16_LE + "just plain words".encode("utf-16-le")
    assert sniff_mime(plain) == "application/octet-stream"


def test_bom_codec_longest_match():
    assert bom_codec(b"\xff\xfe\x00\x00rest") == "utf-32-le"
    assert bom_codec(b"\xff\xfeab") == "utf-16-le"
    assert bom_codec(b"\xef\xbb\xbfx") == "utf-8-sig"
    assert bom_codec(b"plain") is None
