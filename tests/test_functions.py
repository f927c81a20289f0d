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


def test_sniff_mime_binary_magics():
    from docler_ray.mime_types import sniff_mime

    assert sniff_mime(b"\x89PNG\r\n\x1a\nrest") == "image/png"
    assert sniff_mime(b"\xff\xd8\xff\xe0rest") == "image/jpeg"
    assert sniff_mime(b"GIF89a.....") == "image/gif"
    assert sniff_mime(b"II*\x00rest") == "image/tiff"
    assert sniff_mime(b"RIFF\x00\x00\x00\x00WAVEfmt ") == "audio/wav"
    assert sniff_mime(b"RIFF\x00\x00\x00\x00WEBPVP8 ") == "image/webp"
    assert sniff_mime(b"PK\x03\x04rest") == "application/zip"
    assert sniff_mime(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1x") == "application/x-ole-storage"
    assert sniff_mime(b"ID3\x04\x00mp3 frames") == "audio/mpeg"
    assert sniff_mime(b"OggS\x00vorbis") == "audio/ogg"
    assert sniff_mime(b"\x00\x00\x00\x18ftypmp42....") == "video/mp4"
    assert sniff_mime(b'<?xml version="1.0"?><a/>') == "application/xml"
    assert sniff_mime(b'{"json": true}') == "application/json"


def test_check_mime_reference_contract():
    """Transliteration of the reference's check_mime semantics
    (/root/reference/src/docler/utils.py:49-77): bare extensions work,
    unknown types optionally raise, allow-list violations always raise."""
    import pytest

    from docler_ray.mime_types import SUPPORTED_MIME_TYPES, check_mime

    assert check_mime(".pdf") == "application/pdf"
    assert check_mime("report.docx") == (
        "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
    )
    assert check_mime("notes.weirdext") is None
    with pytest.raises(ValueError):
        check_mime("notes.weirdext", raise_if_none_found=True)
    with pytest.raises(ValueError):
        check_mime(".png", allowed_mime_types={"text/html"})
    # undetermined + allow-list also raises (reference parity)
    with pytest.raises(ValueError):
        check_mime("x.weirdext", allowed_mime_types={"text/html"})
    assert check_mime(".html", allowed_mime_types=SUPPORTED_MIME_TYPES) == "text/html"


def test_texty_mimes_route_to_passthrough():
    from docler_ray.stages.dispatch import build_dispatch, lookup

    table = build_dispatch()
    for mime in ("text/csv", "text/x-rst", "application/json", "application/x-latex"):
        entry = lookup(table, mime, "en")
        assert entry is not None and entry[0] == "text_passthrough", mime
    # binary families have no default route -> error rows downstream
    assert lookup(table, "image/png", "en") is None
    assert lookup(table, "application/zip", "en") is None


def test_extension_map_covers_reference_breadth():
    """The extension map must cover at least the reference's local-format
    set (mime_types.py:124-166) — office, image, text, document types."""
    from docler_ray.mime_types import EXT_TO_MIME

    required = [
        ".txt", ".md", ".pdf", ".html", ".htm", ".xlsx", ".xls", ".xlsm",
        ".xlsb", ".xlam", ".xla", ".ods", ".pptx", ".bmp", ".gif", ".jpg",
        ".jpeg", ".png", ".tiff", ".tif", ".webp", ".jp2", ".jpx", ".jpm",
        ".mj2", ".pnm", ".pbm", ".pgm", ".ppm", ".csv", ".tsv", ".rst",
        ".org", ".epub", ".rtf", ".odt", ".docx", ".doc", ".bib", ".ipynb",
        ".tex",
    ]
    missing = [e for e in required if e not in EXT_TO_MIME]
    assert not missing, missing


def test_fingerprint_vectorized_equals_scalar():
    """The vectorized Mersenne-modmul window hashing must be bit-identical
    to the scalar rolling recurrence across the dispatch threshold."""
    import random

    from docler_ray.functions.analysis import (
        _window_hashes_vec,
        fingerprint,
        rolling_hashes,
    )

    rng = random.Random(11)
    alpha = "ab 中é\n\t\U0001F600xyz0123!"
    for n in (0, 1, 7, 8, 9, 100, 2047, 2048, 2049, 5000):
        s = "".join(rng.choice(alpha) for _ in range(n))
        expected = (
            min(rolling_hashes(s, 8)) & 0xFFFFFFFFFFFFFFFF
            if rolling_hashes(s, 8)
            else 0
        )
        assert fingerprint(s) == expected, n
        if n >= 8:
            assert list(_window_hashes_vec(s, 8)) == rolling_hashes(s, 8), n


def test_short_ascii_magics_validated():
    """'BM'/'ID3' are ordinary ASCII prefixes — plain text starting with
    them must stay text, while structurally valid headers still sniff."""
    from docler_ray.mime_types import sniff_mime

    assert sniff_mime(b"BMW engines are remarkable machines") == "text/plain"
    assert sniff_mime(b"ID3 tags are metadata containers ok") == "text/plain"
    bmp = b"BM" + (1000).to_bytes(4, "little") + b"\x00\x00\x00\x00" + (54).to_bytes(4, "little")
    assert sniff_mime(bmp) == "image/bmp"
    id3 = b"ID3\x04\x00\x00\x00\x00\x02\x01rest"
    assert sniff_mime(id3) == "audio/mpeg"


ADVERSARIAL_TEXTS = [
    "",
    None,
    "the quick brown fox jumps over the lazy dog and the cat. Again!",
    "der schnelle braune Fuchs springt über den faulen Hund und die Katze",
    "le renard brun rapide saute par dessus le chien paresseux où ça?",
    "el rápido zorro marrón salta sobre el perro perezoso y los gatos",
    "快速的棕色狐狸跳过了懒狗然后跑进了森林里面去了",
    "mixed 中文 and english the of and to in is was for that with",
    "1 2 3 4 5 6 7 8 9 0 !!! ??? ...",
    "٣٤٥ arabic-indic digits ٦٧",  # Nd outside ASCII
    "combining m̀árks and nbsp line sep",
    "   \t\n\v\f\r   ",
    "x",
    "supercalifragilisticexpialidocious " * 80,  # >2000-char sample edge
    "word. word! word? 。！？ tail",
    "_underscores_ and_mixed_words_ the the the",
]


def test_batch_text_stats_matches_scalar_functions():
    """The vectorized Arrow kernels must be bit-identical to the per-row
    quality_signals / detect_language / count_whitespace_tokens on
    adversarial unicode (round-4 TextAnalyzer vectorization)."""
    import numpy as np
    import pyarrow as pa

    from docler_ray.functions.analysis import batch_text_stats
    from docler_ray.functions.tokens import count_whitespace_tokens

    texts = ADVERSARIAL_TEXTS
    stats = batch_text_stats(pa.array(texts, pa.string()))
    for i, t in enumerate(texts):
        t = t or ""
        q = quality_signals(t)
        assert stats["lang"][i] == detect_language(t), (i, t[:40])
        assert stats["n_chars"][i] == int(q["n_chars"])
        assert stats["n_words"][i] == int(q["n_words"])
        assert stats["sentence_count"][i] == int(q["sentence_count"])
        assert stats["n_ws_tokens"][i] == count_whitespace_tokens(t)
        for k in (
            "mean_word_len",
            "stopword_ratio",
            "punct_ratio",
            "digit_ratio",
            "quality_score",
        ):
            got, want = float(stats[k][i]), float(q[k])
            assert got == want, (k, i, got, want)  # bit-identical, no approx


def test_re2_class_equivalence_over_bmp():
    """The RE2 character-class spellings behind batch_text_stats equal
    the Python `re` classes per-codepoint over the whole non-surrogate
    BMP (the proof the vectorization preserves semantics)."""
    import re as _re

    import pyarrow as pa
    import pyarrow.compute as pc

    from docler_ray.functions.analysis import (
        _RE2_CJK,
        _RE2_DIGIT,
        _RE2_PUNCT,
        _RE2_SENT,
    )

    chars = [chr(c) for c in range(32, 0x10000) if not (0xD800 <= c <= 0xDFFF)]
    arr = pa.array(chars)
    for re2_pat, py_pat in (
        (_RE2_PUNCT, r"[^\w\s]"),
        (_RE2_DIGIT, r"\d"),
        (_RE2_SENT, r"[.!?。！？]"),
        (_RE2_CJK, r"[一-鿿㐀-䶿]"),
    ):
        py = _re.compile(py_pat, _re.UNICODE)
        got = pc.count_substring_regex(arr, re2_pat).to_pylist()
        bad = [
            hex(ord(ch))
            for ch, g in zip(chars, got)
            if g != (1 if py.match(ch) else 0)
        ]
        assert not bad, (py_pat, bad[:10])
