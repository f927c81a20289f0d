"""Deterministic tokenization: whitespace and BPE-ish regex token counting.

Replaces the reference's ``tokonomics``-backed ``count_tokens``
(/root/reference/src/docler/chunkers/token_chunker/chunker.py:21-36), which is
unavailable here, with the GPT-2-style pretokenizer regex published in the
open-source tiktoken/GPT-2 tokenizers. Counts are deterministic and cheap —
the point is stable chunk budgeting, not model-exact token numbers.
"""

from __future__ import annotations

import re

# GPT-2 pretokenizer pattern (public domain; used by tiktoken's r50k/gpt2).
_BPE_ISH_RE = re.compile(
    r"""'(?:[sdmt]|ll|ve|re)| ?[A-Za-zÀ-ɏ一-鿿]+| ?\d+| ?[^\sA-Za-z\d]+|\s+(?!\S)|\s+"""
)

_WS_RE = re.compile(r"\S+")


def count_tokens(text: str) -> int:
    """BPE-ish token count (regex pretokenization, one token per match)."""
    if not text:
        return 0
    return len(_BPE_ISH_RE.findall(text))


# The ASCII whitespace-token contract, shared by every ws-tokenizing
# operator (decontam/novelty/span-dedup/repetition/tfidf/token counts) AND
# their DuckDB oracles. The class is EXPLICIT ASCII on both engines because
# the engines' shorthands disagree at the edges: Python's unicode \s
# includes \xa0 etc., RE2's \s omits \v — and DuckDB trim() strips only
# spaces, so the previous trim()+\s+ oracle spelling produced an empty
# leading token for tab/newline-edged text (round-3 review finding,
# latent on the all-ASCII corpus). Splitting then dropping empties handles
# edges without any trim.
_ASCII_WS_RE = re.compile(r"[ \t\n\r\f\v]+")


def ws_tokens(text: str) -> list[str]:
    """ASCII-whitespace tokens, no empties — the canonical tokenizer.

    Fast path: for ASCII text without the 0x1c-0x1f separators,
    ``str.split()`` produces EXACTLY the contract's tokens (str.split's
    whitespace set minus the class is \\x1c-\\x1f on ASCII; minus those,
    the sets coincide) and is ~5x faster than the regex — this sits inside
    shingle/simhash/decontam per-doc loops, so it's a measured hot path.
    """
    t = text or ""
    if (
        t.isascii()
        and "\x1c" not in t
        and "\x1d" not in t
        and "\x1e" not in t
        and "\x1f" not in t
    ):
        return t.split()
    return [tok for tok in _ASCII_WS_RE.split(t) if tok]


def ws_tokens_sql(expr: str) -> str:
    """The DuckDB replay of :func:`ws_tokens` over a SQL expression."""
    return (
        f"list_filter(string_split_regex(coalesce({expr}, ''), "
        "'[ \\t\\n\\r\\f\\v]+'), x -> x <> '')"
    )


def count_whitespace_tokens(text: str) -> int:
    """Plain whitespace token count (ASCII contract, see ws_tokens)."""
    if not text:
        return 0
    return len(ws_tokens(text))


def tokenize(text: str) -> list[str]:
    """The BPE-ish pretokens themselves (for fingerprinting / shingling)."""
    return _BPE_ISH_RE.findall(text)
