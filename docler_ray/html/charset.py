"""HTML charset sniffing + decoding — WHATWG-encoding-flavored, stdlib-only.

Common-Crawl reality the reference inherits from its backends (markitdown
ships charset-normalizer; /root/reference/src/docler/converters/
markitdown_provider/provider.py:28-119 converts whatever bytes arrive):
a real page corpus is ~5% non-UTF-8 — windows-1252 tails, UTF-16 exports,
CJK legacy codecs. A utf-8/replace decode turns those pages into mojibake
BEFORE extraction, which no downstream dedup/quality stage can repair, so
the decode step is part of extraction correctness.

Decision order (the WHATWG "sniff an encoding" ladder, simplified to its
deterministic core):

1. BOM (highest priority, spec step 1): UTF-8 / UTF-16 LE-BE / UTF-32
   LE-BE, longest match first (UTF-32-LE's BOM starts with UTF-16-LE's).
2. meta prescan over the first _PRESCAN bytes: ``<meta charset=...`` or
   ``http-equiv Content-Type ... charset=...`` (ASCII-case-insensitive,
   byte-level — every supported legacy codec is ASCII-transparent there).
   Labels normalize through _LABEL_TO_CODEC, which bakes in the spec's
   compatibility mappings (iso-8859-1 -> windows-1252, gb2312 -> gbk,
   a declared utf-16 -> utf-8).
3. strict UTF-8 attempt (the modern-web default).
4. windows-1252 fallback (the spec's legacy default), errors="replace".

Every path is a pure function of the payload bytes — deterministic,
resume-safe, and replayable.
"""

from __future__ import annotations

import re

_PRESCAN = 1024

# longest-prefix first: utf-32-le's BOM ff fe 00 00 contains utf-16-le's
_BOMS: list[tuple[bytes, str]] = [
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
]

# WHATWG label -> python codec (spec compatibility mappings included)
_LABEL_TO_CODEC: dict[str, str] = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "unicode-1-1-utf-8": "utf-8",
    # a meta-DECLARED utf-16 is self-contradictory (the prescan read ASCII
    # bytes); the spec says treat it as utf-8
    "utf-16": "utf-8",
    "utf-16le": "utf-8",
    "utf-16be": "utf-8",
    "iso-8859-1": "cp1252",  # spec: 8859-1 IS windows-1252 on the web
    "latin-1": "cp1252",
    "latin1": "cp1252",
    "l1": "cp1252",
    "ascii": "cp1252",
    "us-ascii": "cp1252",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "x-cp1252": "cp1252",
    "iso-8859-2": "iso8859-2",
    "latin2": "iso8859-2",
    "windows-1250": "cp1250",
    "iso-8859-5": "iso8859-5",
    "windows-1251": "cp1251",
    "cp1251": "cp1251",
    "koi8-r": "koi8-r",
    "koi8": "koi8-r",
    "iso-8859-7": "iso8859-7",
    "windows-1253": "cp1253",
    "iso-8859-9": "iso8859-9",
    "windows-1254": "cp1254",
    "iso-8859-15": "iso8859-15",
    "latin9": "iso8859-15",
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "ms932": "shift_jis",
    "euc-jp": "euc_jp",
    "iso-2022-jp": "iso2022_jp",
    "gb2312": "gbk",  # spec: gb2312 label decodes as GBK
    "gb_2312": "gbk",
    "gbk": "gbk",
    "x-gbk": "gbk",
    "gb18030": "gb18030",
    "big5": "big5",
    "big5-hkscs": "big5hkscs",
    "euc-kr": "euc_kr",
    "ks_c_5601-1987": "euc_kr",
    "windows-949": "euc_kr",
    "tis-620": "cp874",
    "windows-874": "cp874",
}

# <meta ... charset=X> and <meta http-equiv=content-type content="...;charset=X">
# collapse to the same byte pattern: a charset= inside a <meta tag
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]{0,512}?charset\s*=\s*[\"']?\s*([a-zA-Z0-9._:\-]+)",
    re.IGNORECASE | re.DOTALL,
)


def declared_charset(payload: bytes) -> str | None:
    """The meta-declared codec (normalized python name) or None."""
    m = _META_CHARSET_RE.search(payload[:_PRESCAN])
    if not m:
        return None
    label = m.group(1).decode("ascii", "replace").strip().lower()
    return _LABEL_TO_CODEC.get(label)


def decode_html(payload: bytes) -> tuple[str, str]:
    """Decode page bytes per the ladder above -> (text, codec_used).

    ``codec_used`` is the normalized python codec name (lineage: which rung
    decoded this page), suffixed ``+replace`` when replacement characters
    were possible (rungs 1, 2, 4 decode lossily by design)."""
    for bom, codec in _BOMS:
        if payload.startswith(bom):
            return payload[len(bom) :].decode(
                "utf-8" if codec == "utf-8-sig" else codec, "replace"
            ), codec
    codec = declared_charset(payload)
    if codec is not None:
        return payload.decode(codec, "replace"), codec
    try:
        return payload.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        return payload.decode("cp1252", "replace"), "cp1252"


def bom_codec(payload: bytes) -> str | None:
    """BOM codec name or None — the classify-time hook (sniff_mime must
    decode a BOM'd head before its ASCII `<html` checks can fire)."""
    for bom, codec in _BOMS:
        if payload.startswith(bom):
            return codec
    return None
