"""Real %PDF extraction (docler_ray/pdfish/realpdf.py): writer round
trips, hand-built operator edge cases (TJ kern arrays, hex strings,
comments, uncompressed streams), dispatch routing, guards, and the
committed binary fixture golden — the stdlib stand-in for the
reference's pypdf path (src/docler/pdf_utils.py:90-256)."""

from __future__ import annotations

import pathlib
import zlib

import pytest

from docler_ray.markers import join_pages
from docler_ray.pdfish.realpdf import (
    build_simple_pdf,
    extract_real_pdf,
)

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"


def test_writer_round_trip_multi_page():
    pages = [
        "Hello world\nSecond line with (parens) and \\ backslash",
        "Page two text\nàccénts tøo",
        "",
    ]
    out = extract_real_pdf(build_simple_pdf(pages))
    assert out.content == join_pages(pages)
    assert out.metadata["parser"] == "realpdf"


def test_committed_fixture_golden():
    pdf = (GOLDEN_DIR / "realpdf_fixture.pdf").read_bytes()
    want = (GOLDEN_DIR / "realpdf_fixture.md").read_text(encoding="utf-8")
    assert extract_real_pdf(pdf).content == want


def test_round_trip_sweep_over_flate_pathologies():
    """Flate output sometimes embeds byte runs that look like 'N 0 obj' or
    'endstream' — the sequential /Length-driven scan must not split there
    (found live at sf0.01, docs ≡ 6 mod 9)."""
    for d in (15, 24, 33, 42, 51, 60):
        pages = [
            f"Real PDF doc {d} page {s}.\nSecond line {s} of doc {d}."
            for s in range(1 + d % 3)
        ]
        out = extract_real_pdf(build_simple_pdf(pages))
        assert out.content == join_pages(pages), d
        assert "skipped_streams" not in out.metadata


def _wrap_single_stream_pdf(ops: bytes, *, compress: bool = False) -> bytes:
    """Minimal one-page PDF around a hand-written content stream."""
    if compress:
        data = zlib.compress(ops)
        head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
    else:
        data = ops
        head = f"<< /Length {len(data)} >>".encode()
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        head + b"\nstream\n" + data + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref = len(out)
    out += f"xref\n0 {len(objs)+1}\n".encode() + b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs)+1} /Root 1 0 R >>\n"
        f"startxref\n{xref}\n%%EOF\n"
    ).encode()
    return bytes(out)


def test_tj_kern_arrays_hex_strings_and_comments():
    ops = (
        b"BT /F1 12 Tf 72 720 Td "
        b"[(Kerned ) -250 (text) 120 ( parts)] TJ "
        b"% a comment with (misleading) parens\n"
        b"0 -14 Td <48657821> Tj "
        b"T* (after T-star) Tj "
        b"ET"
    )
    out = extract_real_pdf(_wrap_single_stream_pdf(ops, compress=True))
    assert out.content == join_pages(["Kerned text parts\nHex!\nafter T-star"])


def test_uncompressed_stream_and_octal_escapes():
    ops = b"BT (Octal \\101\\102 end) Tj ET"
    out = extract_real_pdf(_wrap_single_stream_pdf(ops))
    assert out.content == join_pages(["Octal AB end"])


def test_quote_operators_break_lines():
    ops = b"BT (first) ' (second) ' ET"
    out = extract_real_pdf(_wrap_single_stream_pdf(ops, compress=True))
    assert out.content == join_pages(["first\nsecond"])


def test_unsupported_filter_counts_skipped():
    data = b"\x00\x01\x02"
    head = f"<< /Length {len(data)} /Filter /LZWDecode >>".encode()
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        head + b"\nstream\n" + data + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    for num, body in enumerate(objs, start=1):
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    out += b"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n"
    res = extract_real_pdf(bytes(out))
    assert res.metadata.get("skipped_streams") == 1
    assert res.content == join_pages([""])


def test_guards():
    with pytest.raises(ValueError, match="not a %PDF"):
        extract_real_pdf(b"GIF89a")
    pdf = build_simple_pdf(["x"])
    with pytest.raises(ValueError, match="encrypted"):
        extract_real_pdf(pdf + b"/Encrypt 9 0 R")


def test_page_range_selection():
    pages = [f"page {i}" for i in range(1, 6)]
    pdf = build_simple_pdf(pages)
    out = extract_real_pdf(pdf, page_range="2-3,5")
    assert out.content == join_pages(["page 2", "page 3", "page 5"])


def test_dispatch_routes_pdf_magic_to_realpdf(ray_session):
    """%PDF payloads sniff application/pdf and flow through the new
    realpdf_extract entry of the dispatch table inside ExtractDocs."""
    import pyarrow as pa

    from docler_ray.stages.classify import classify_batch
    from docler_ray.stages.extract import ExtractDocs

    pdf = build_simple_pdf(["dispatch me"])
    batch = pa.table(
        {
            "url": pa.array(["u"]),
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": pa.array([pdf], pa.binary()),
            "text": pa.array([""]),
            "lang": pa.array(["en"]),
        }
    )
    out = ExtractDocs()(classify_batch(batch))
    assert out.column("mime_type").to_pylist() == ["application/pdf"]
    assert out.column("error").to_pylist() == [None]
    assert out.column("content").to_pylist()[0] == join_pages(["dispatch me"])


def test_encrypted_pdf_round_trip_and_guards():
    """Standard-handler RC4 decryption (ISO 32000-1 §7.6.3, closing the
    reference parity at pdf_utils.py:90-137 for the non-AES case): right
    password round-trips, wrong/missing password raises, AES names the
    missing cipher, owner-password variant verifies via /U."""
    pages = ["Secret line one\nSecond (secret)", "Page 2 classified"]
    pdf = build_simple_pdf(pages, user_password="hunter2", owner_password="boss")
    out = extract_real_pdf(pdf, password="hunter2")
    assert out.content == join_pages(pages)
    assert out.metadata.get("decrypted") is True
    with pytest.raises(ValueError, match="wrong or missing password"):
        extract_real_pdf(pdf, password="nope")
    with pytest.raises(ValueError, match="wrong or missing password"):
        extract_real_pdf(pdf)
    with pytest.raises(ValueError, match="AES"):
        extract_real_pdf(
            pdf.replace(b"/V 2 /R 3", b"/V 4 /R 4"), password="hunter2"
        )


def test_encrypted_pdf_through_dispatch(ray_session):
    """pdf_password flows ExtractDocs options -> realpdf_extract."""
    import pyarrow as pa

    from docler_ray.stages.classify import classify_batch
    from docler_ray.stages.extract import ExtractDocs

    pdf = build_simple_pdf(["locked content"], user_password="sesame")
    batch = pa.table(
        {
            "url": pa.array(["u"]),
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": pa.array([pdf], pa.binary()),
            "text": pa.array([""]),
            "lang": pa.array(["en"]),
        }
    )
    ok = ExtractDocs(options={"pdf_password": "sesame"})(classify_batch(batch))
    assert ok.column("error").to_pylist() == [None]
    assert ok.column("content").to_pylist()[0] == join_pages(["locked content"])
    # without the password the row carries a per-row error, not a crash
    bad = ExtractDocs()(classify_batch(batch))
    assert bad.column("error").to_pylist()[0] is not None


def test_indirect_length_multi_digit():
    """Advisor repro: '/Length 10 0 R' must not backtrack-match the digit
    prefix '1' as a direct length (regex \\b fix), and the indirect ref is
    resolved via the second-pass re-slice."""
    import re as _re

    from docler_ray.pdfish.realpdf import _LENGTH_RE

    assert _LENGTH_RE.search(b"<< /Length 10 0 R >>") is None
    assert _LENGTH_RE.search(b"<< /Length 1070 0 R >>") is None
    m = _LENGTH_RE.search(b"<< /Length 107 /Filter /FlateDecode >>")
    assert m is not None and m.group(1) == b"107"

    pages = ["Indirect length page\nwith a second line", "page two"]
    pdf = build_simple_pdf(pages)
    # rewrite the FIRST content stream's direct /Length into an indirect
    # ref and append the integer object at the tail (the scanner is
    # sequential and xref-free, so appended objects are found)
    lm = _re.search(rb"/Length (\d+) /Filter /FlateDecode", pdf)
    assert lm is not None and len(lm.group(1)) >= 2
    length = lm.group(1)
    mutated = (
        pdf[: lm.start()]
        + b"/Length 99 0 R /Filter /FlateDecode"
        + pdf[lm.end() :]
        + b"\n99 0 obj\n"
        + length
        + b"\nendobj\n"
    )
    out = extract_real_pdf(mutated)
    assert out.content == join_pages(pages)
    assert "skipped_streams" not in out.metadata


def test_aes_fips_vectors():
    """pdfish/aes.py against published FIPS-197 vectors (Appendix B/C.1)."""
    import numpy as np

    from docler_ray.pdfish import aes

    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    rk = aes.expand_key(key)
    ct = aes.encrypt_blocks(rk, np.frombuffer(pt, np.uint8).reshape(1, 16))
    assert ct.tobytes().hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert aes.decrypt_blocks(rk, ct).tobytes() == pt
    # the scalar T-table encryptor agrees with the vectorized path
    rkw = aes._round_key_words(rk)
    assert aes._encrypt_block_scalar(rkw, pt) == ct.tobytes()
    key2 = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    pt2 = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
    ct2 = aes.encrypt_blocks(
        aes.expand_key(key2), np.frombuffer(pt2, np.uint8).reshape(1, 16)
    )
    assert ct2.tobytes().hex() == "3925841d02dc09fbdc118597196a0b32"
    # CBC round trip, multi-block, bad-padding guard
    data = bytes(range(256)) * 3 + b"tail"
    iv = bytes.fromhex("aabbccddeeff00112233445566778899")
    enc = aes.cbc_encrypt(key, iv, data)
    assert aes.cbc_decrypt(key, enc) == data
    with pytest.raises(ValueError, match="padding|length"):
        aes.cbc_decrypt(key2, enc)  # wrong key -> bad PKCS#7


def test_aes_encrypted_pdf_round_trip_and_guards():
    """AESV2 (V4/R4) standard handler: writer->extractor round trip,
    wrong password, owner-vs-user password, and the AESV3 honesty raise
    (reference decrypt parity: src/docler/pdf_utils.py:90-147)."""
    pages = ["AES page one\nsecond line", "AES päge twö"]
    pdf = build_simple_pdf(pages, user_password="k3y", cipher="aes")
    out = extract_real_pdf(pdf, password="k3y")
    assert out.content == join_pages(pages)
    assert out.metadata["decrypted"] is True
    assert out.metadata["cipher"] == "aes"
    with pytest.raises(ValueError, match="wrong or missing password"):
        extract_real_pdf(pdf, password="wrong")
    with pytest.raises(ValueError, match="wrong or missing password"):
        extract_real_pdf(pdf)
    # distinct owner password: user password still opens the document
    pdf2 = build_simple_pdf(
        pages, user_password="u", owner_password="o", cipher="aes"
    )
    assert extract_real_pdf(pdf2, password="u").content == join_pages(pages)


def test_aes256_fips_vectors():
    """AES-192/256 key schedule + both cores against FIPS-197 C.2/C.3."""
    import numpy as np

    from docler_ray.pdfish import aes

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    vectors = {
        "000102030405060708090a0b0c0d0e0f1011121314151617":
            "dda97ca4864cdfe06eaf70a0ec0d7191",
        "000102030405060708090a0b0c0d0e0f"
        "101112131415161718191a1b1c1d1e1f":
            "8ea2b7ca516745bfeafc49904b496089",
    }
    for kh, ch in vectors.items():
        key, want = bytes.fromhex(kh), bytes.fromhex(ch)
        rk = aes.expand_key(key)
        ct = aes.encrypt_blocks(rk, np.frombuffer(pt, np.uint8).reshape(1, 16))
        assert ct.tobytes() == want
        assert aes.decrypt_blocks(rk, ct).tobytes() == pt
        assert aes._encrypt_block_scalar(aes._round_key_words(rk), pt) == want
    # no-pad CBC + single-block ECB helpers (the R6 derivation primitives)
    key = bytes(range(32))
    iv = bytes(range(16, 32))
    blob = b"docler-v5-derivation-material-xx"  # 32 bytes
    assert aes.cbc_decrypt_nopad(key, iv, aes.cbc_encrypt_nopad(key, iv, blob)) == blob
    assert len(aes.ecb_encrypt_block(key, b"p" * 16)) == 16


def test_aes256_r6_encrypted_pdf_round_trip():
    """V5/R6 (/AESV3) standard handler: Algorithm 2.B hash, /UE//OE
    file-key unwrapping, user AND owner password arms, wrong-password
    guard, empty-user-password open (reference decrypt parity:
    src/docler/pdf_utils.py:90-147 via pypdf's AES-256 provider)."""
    pages = ["R6 page one\nsecond line", "R6 päge twö"]
    pdf = build_simple_pdf(pages, user_password="k3y256", cipher="aes256")
    assert b"/AESV3" in pdf and b"/V 5 /R 6" in pdf
    out = extract_real_pdf(pdf, password="k3y256")
    assert out.content == join_pages(pages)
    assert out.metadata["decrypted"] is True
    assert out.metadata["cipher"] == "aes256"
    with pytest.raises(ValueError, match="wrong or missing password"):
        extract_real_pdf(pdf, password="wrong")
    with pytest.raises(ValueError, match="wrong or missing password"):
        extract_real_pdf(pdf)
    # owner-password arm (udata = the 48-byte /U string)
    pdf2 = build_simple_pdf(
        pages, user_password="u", owner_password="o", cipher="aes256"
    )
    assert extract_real_pdf(pdf2, password="o").content == join_pages(pages)
    assert extract_real_pdf(pdf2, password="u").content == join_pages(pages)
    # empty user password: opens with no password at all (the common
    # "encrypted but not password-protected" real-world shape)
    pdf3 = build_simple_pdf(["open me"], user_password="", cipher="aes256")
    assert "open me" in extract_real_pdf(pdf3).content
