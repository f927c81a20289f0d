"""Shared type universe: supported languages and dispatch keys.

Mirrors the reference's fixed language universe
(/root/reference/src/docler/common_types.py:9) and its per-backend language
code mapping tables (common_types.py:19-49) without porting them — this
engine only needs ISO codes.
"""

from __future__ import annotations

from typing import Literal

SupportedLanguage = Literal["en", "de", "fr", "es", "zh"]

SUPPORTED_LANGUAGES: tuple[str, ...] = ("en", "de", "fr", "es", "zh")

# ISO 639-1 -> full English name, for metadata display parity.
LANGUAGE_NAMES: dict[str, str] = {
    "en": "English",
    "de": "German",
    "fr": "French",
    "es": "Spanish",
    "zh": "Chinese",
}

# Page range strings like "1-5,7,9-11" (1-based), see docler_ray.page_ranges.
PageRangeString = str
