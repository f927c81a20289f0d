"""The pdfish binary page/span payload: pack / parse / encrypt / probe.

Layout (all integers little-endian):

    magic   b"PDFISH01"
    uint16  n_pages
    uint16  title_len   + utf-8 title
    uint16  author_len  + utf-8 author
    per page:
        float32 width, height            # page dimensions in points
        uint16  n_spans
        per span:
            float32 x, y, w, h, font_size
            uint16  text_len             # utf-8 byte length
            bytes   text

Encrypted variant: b"PDFISHEN" + uint8 needs_password + sha256(pw)[:8]
+ XOR-keystream(body). ``needs_password=0`` means encrypted with the empty
password (decryptable without one) — mirroring the reference's empty-password
probe semantics (/root/reference/src/docler/pdf_utils.py:90-135,
src/docler/converters/base.py:167-200).
"""

from __future__ import annotations

import hashlib
import struct
from dataclasses import dataclass, field

from docler_ray.mime_types import PDFISH_ENCRYPTED_MAGIC, PDFISH_MAGIC


@dataclass
class Span:
    x: float
    y: float
    w: float
    h: float
    font_size: float
    text: str


@dataclass
class PdfishPage:
    width: float
    height: float
    spans: list[Span] = field(default_factory=list)


@dataclass
class PdfishDocument:
    pages: list[PdfishPage] = field(default_factory=list)
    title: str = ""
    author: str = ""


def encode_pdfish(doc: PdfishDocument) -> bytes:
    out = bytearray(PDFISH_MAGIC)
    out += struct.pack("<H", len(doc.pages))
    for s in (doc.title, doc.author):
        b = s.encode("utf-8")
        out += struct.pack("<H", len(b)) + b
    for page in doc.pages:
        out += struct.pack("<ffH", page.width, page.height, len(page.spans))
        for sp in page.spans:
            tb = sp.text.encode("utf-8")
            out += struct.pack("<fffffH", sp.x, sp.y, sp.w, sp.h, sp.font_size, len(tb))
            out += tb
    return bytes(out)


def decode_pdfish(data: bytes, password: str | None = None) -> PdfishDocument:
    """Parse a pdfish payload (decrypting first when needed).

    Raises ValueError with reference-compatible messages on encryption
    failures ("PDF is encrypted and requires a password" /
    "Incorrect password for encrypted PDF",
    /root/reference/src/docler/pdf_utils.py:118,123).
    """
    if data.startswith(PDFISH_ENCRYPTED_MAGIC):
        data = decrypt_pdfish(data, password)
    if not data.startswith(PDFISH_MAGIC):
        msg = "Not a pdfish payload (bad magic)"
        raise ValueError(msg)
    off = len(PDFISH_MAGIC)
    try:
        (n_pages,) = struct.unpack_from("<H", data, off)
        off += 2
        texts: list[str] = []
        for _ in range(2):
            (ln,) = struct.unpack_from("<H", data, off)
            off += 2
            texts.append(data[off : off + ln].decode("utf-8"))
            off += ln
        doc = PdfishDocument(title=texts[0], author=texts[1])
        for _ in range(n_pages):
            width, height, n_spans = struct.unpack_from("<ffH", data, off)
            off += 10
            page = PdfishPage(width=width, height=height)
            for _ in range(n_spans):
                x, y, w, h, size, tlen = struct.unpack_from("<fffffH", data, off)
                off += 22
                text = data[off : off + tlen].decode("utf-8")
                off += tlen
                page.spans.append(Span(x, y, w, h, size, text))
            doc.pages.append(page)
    except (struct.error, UnicodeDecodeError) as e:
        msg = f"Truncated or corrupt pdfish payload: {e}"
        raise ValueError(msg) from e
    return doc


def _keystream(password: str, n: int) -> bytes:
    out = bytearray()
    seed = hashlib.sha256(b"pdfish:" + password.encode("utf-8")).digest()
    block = seed
    while len(out) < n:
        block = hashlib.sha256(block).digest()
        out += block
    return bytes(out[:n])


def encrypt_pdfish(data: bytes, password: str) -> bytes:
    """XOR-encrypt a plain pdfish payload; empty password => decryptable
    without a password but still flagged encrypted (the common real-PDF case)."""
    if not data.startswith(PDFISH_MAGIC):
        msg = "Can only encrypt a plain pdfish payload"
        raise ValueError(msg)
    needs_password = 1 if password else 0
    check = hashlib.sha256(password.encode("utf-8")).digest()[:8]
    body = bytes(a ^ b for a, b in zip(data, _keystream(password, len(data))))
    return PDFISH_ENCRYPTED_MAGIC + bytes([needs_password]) + check + body


def decrypt_pdfish(data: bytes, password: str | None) -> bytes:
    if not data.startswith(PDFISH_ENCRYPTED_MAGIC):
        return data
    needs_password = data[len(PDFISH_ENCRYPTED_MAGIC)]
    check = data[len(PDFISH_ENCRYPTED_MAGIC) + 1 : len(PDFISH_ENCRYPTED_MAGIC) + 9]
    body = data[len(PDFISH_ENCRYPTED_MAGIC) + 9 :]
    if password is None:
        if needs_password:
            msg = "PDF is encrypted and requires a password"
            raise ValueError(msg)
        password = ""
    if hashlib.sha256(password.encode("utf-8")).digest()[:8] != check:
        msg = "Incorrect password for encrypted PDF"
        raise ValueError(msg)
    return bytes(a ^ b for a, b in zip(body, _keystream(password, len(body))))


def get_pdfish_info(data: bytes, password: str | None = None) -> dict:
    """PageMetadata-equivalent probe (/root/reference/src/docler/pdf_utils.py:187-256,
    model at src/docler/models.py:69-84): page_count, file_size, is_encrypted,
    page_dimensions, title, author.

    A truly encrypted payload without the right password returns the basic
    info with page_count=0 rather than raising, matching the reference
    (pdf_utils.py:216-225).
    """
    file_size = len(data)
    is_encrypted = data.startswith(PDFISH_ENCRYPTED_MAGIC)
    if is_encrypted:
        try:
            plain = decrypt_pdfish(data, password)
        except ValueError:
            return {
                "page_count": 0,
                "file_size": file_size,
                "is_encrypted": True,
                "page_dimensions": [],
                "title": "",
                "author": "",
            }
        # successful decrypt (empty-password probe or provided password) =>
        # reported as not encrypted (pdf_utils.py:205-215)
        is_encrypted = False
        doc = decode_pdfish(plain)
    else:
        doc = decode_pdfish(data)
    return {
        "page_count": len(doc.pages),
        "file_size": file_size,
        "is_encrypted": is_encrypted,
        "page_dimensions": [{"width": p.width, "height": p.height} for p in doc.pages],
        "title": doc.title,
        "author": doc.author,
    }
