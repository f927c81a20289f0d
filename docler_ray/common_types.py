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


# --- per-backend language-code tables ---------------------------------------
#
# Functional analog of the reference's backend mapping tables
# (/root/reference/src/docler/common_types.py:19-49): OCR engines and cloud
# APIs each want their own code style for the same 5-language universe.
# Values are the standard public codes (ISO 639-2/B, BCP-47, English names).

ISO639_2_CODES: dict[str, str] = {
    "en": "eng",
    "de": "deu",
    "fr": "fra",
    "es": "spa",
    "zh": "zho",
}

# tesseract-style (ISO 639-2 with chi_sim for simplified Chinese)
OCR_ENGINE_CODES: dict[str, str] = {
    "en": "eng",
    "de": "deu",
    "fr": "fra",
    "es": "spa",
    "zh": "chi_sim",
}

BCP47_CODES: dict[str, str] = {
    "en": "en-US",
    "de": "de-DE",
    "fr": "fr-FR",
    "es": "es-ES",
    "zh": "zh-CN",
}

LOWERCASE_NAME_CODES: dict[str, str] = {
    "en": "english",
    "de": "german",
    "fr": "french",
    "es": "spanish",
    "zh": "chinese",
}

_BACKEND_CODE_TABLES: dict[str, dict[str, str]] = {
    "iso639_2": ISO639_2_CODES,
    "ocr": OCR_ENGINE_CODES,
    "bcp47": BCP47_CODES,
    "name": LOWERCASE_NAME_CODES,
}


def to_backend_language(lang: str, backend: str) -> str:
    """Map an engine language code to a backend's expected style; raises on
    unknown backend, falls back to the input code for unmapped languages
    (the reference's dict.get pattern)."""
    table = _BACKEND_CODE_TABLES.get(backend)
    if table is None:
        msg = f"Unknown language backend {backend!r}; one of {sorted(_BACKEND_CODE_TABLES)}"
        raise ValueError(msg)
    return table.get(lang, lang)
