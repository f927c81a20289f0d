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


def count_whitespace_tokens(text: str) -> int:
    """Plain whitespace token count."""
    if not text:
        return 0
    return len(_WS_RE.findall(text))


def tokenize(text: str) -> list[str]:
    """The BPE-ish pretokens themselves (for fingerprinting / shingling)."""
    return _BPE_ISH_RE.findall(text)
