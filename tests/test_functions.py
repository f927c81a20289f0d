"""Scalar-function tier: text utils, tokens, analysis, mime sniffing."""

import pytest

from docler_ray.functions.analysis import (
    content_hash,
    detect_language,
    fingerprint,
    quality_signals,
)
from docler_ray.functions.text import add_line_numbers, apply_corrections, generate_unified_diff
from docler_ray.functions.tokens import count_tokens, count_whitespace_tokens
from docler_ray.mime_types import (
    HTML_MIME,
    PDFISH_MIME,
    TEXT_MIME,
    UNKNOWN_MIME,
    mime_from_extension,
    sniff_mime,
)


def test_add_line_numbers():
    out = add_line_numbers("alpha\nbeta")
    assert out == "    1 | alpha\n    2 | beta"


def test_apply_corrections_reverse_first_wins():
    """Semantics of /root/reference/src/docler/processors/ai_processor.py:39-58."""
    text = "a\nb\nc"
    corrected, idxs = apply_corrections(text, [(2, "B"), (2, "IGNORED"), (99, "nope")])
    assert corrected == "a\nB\nc"
    assert idxs == {1}


def test_unified_diff_labels():
    d = generate_unified_diff("a\nb", "a\nc")
    assert d.startswith("--- original\n+++ corrected")
    assert "+c" in d and "-b" in d


def test_token_counts():
    assert count_tokens("") == 0
    assert count_whitespace_tokens("one two  three") == 3
    assert count_tokens("Hello, world!") >= 3
    # determinism
    assert count_tokens("Hello, world!") == count_tokens("Hello, world!")


def test_detect_language():
    assert detect_language("the quick brown fox jumps over the lazy dog and the cat") == "en"
    assert detect_language("der schnelle braune Fuchs springt über den faulen Hund und die Katze") == "de"
    assert detect_language("le renard brun rapide saute par dessus le chien paresseux et les chats") == "fr"
    assert detect_language("el rápido zorro marrón salta sobre el perro perezoso y los gatos") == "es"
    assert detect_language("快速的棕色狐狸跳过了懒狗然后跑进了森林里面去了") == "zh"
    assert detect_language("") == "en"


def test_quality_signals():
    good = quality_signals(
        "This is a well formed paragraph. It has several sentences, with words "
        "of reasonable length, and the usual amount of punctuation."
    )
    assert good["quality_score"] >= 0.8
    bad = quality_signals("1 2 3 4 5 6 7 8 9 0 1 2 3 4 5 6")
    assert bad["quality_score"] < good["quality_score"]
    empty = quality_signals("")
    assert empty["quality_score"] == 0.0


def test_fingerprint_stability():
    text = "some document text that is long enough for rolling windows"
    assert fingerprint(text) == fingerprint(text)
    # robust to appends (min window survives) ...
    assert fingerprint(text) == fingerprint(text + " with an appended tail")
    # ... but disjoint content fingerprints differently
    assert fingerprint(text) != fingerprint("utterly unrelated material here")
    assert fingerprint("") == 0


def test_content_hash_distinguishes():
    assert content_hash("abc") != content_hash("abd")
    assert content_hash("abc") == content_hash("abc")


def test_sniff_mime():
    assert sniff_mime(b"<!DOCTYPE html><html></html>") == HTML_MIME
    assert sniff_mime(b"  <html lang='en'>") == HTML_MIME
    assert sniff_mime(b"PDFISH01rest") == PDFISH_MIME
    assert sniff_mime(b"PDFISHENrest") == PDFISH_MIME
    assert sniff_mime(b"plain text content") == TEXT_MIME
    assert sniff_mime(b"\xff\xfe\x00\x01binary") == UNKNOWN_MIME
    assert sniff_mime(b"") == UNKNOWN_MIME


def test_mime_from_extension():
    assert mime_from_extension("page.html") == HTML_MIME
    assert mime_from_extension("doc.pdfish") == PDFISH_MIME
    assert mime_from_extension("noext") is None
