"""Per-row text utilities: line numbering, correction merge, diffs.

Functional re-implementations of the reference's scalar text helpers:
``add_line_numbers`` (/root/reference/src/docler/utils.py:142-145),
``apply_corrections`` (/root/reference/src/docler/processors/ai_processor.py:39-58,
reverse-sorted, last-wins-guarded) and ``generate_unified_diff``
(/root/reference/src/docler/diffs.py:9-28). The diff-match-patch variants are
gated on importability exactly as the reference gates them
(diffs.py:80-90); that package is absent here so only the unified diff is
produced.
"""

from __future__ import annotations

from difflib import unified_diff


def add_line_numbers(text: str) -> str:
    """``"    N | line"`` prefixing (5-wide line number, 1-based)."""
    lines = text.splitlines()
    return "\n".join(f"{i + 1:5d} | {line}" for i, line in enumerate(lines))


def apply_corrections(
    text: str, corrections: list[tuple[int, str]]
) -> tuple[str, set[int]]:
    """Merge (line_number, corrected_text) pairs into text.

    1-based line numbers; corrections applied in reverse line order; the first
    correction seen for a line wins (last-wins-guarded via the corrected set).
    """
    lines = text.splitlines()
    ordered = sorted(corrections, key=lambda c: c[0], reverse=True)
    corrected_lines: set[int] = set()
    for line_number, corrected in ordered:
        line_idx = line_number - 1
        if 0 <= line_idx < len(lines) and line_idx not in corrected_lines:
            lines[line_idx] = corrected
            corrected_lines.add(line_idx)
    return "\n".join(lines), corrected_lines


def generate_unified_diff(original: str, corrected: str) -> str:
    """Unified diff with the reference's exact from/to labels."""
    diff_lines = unified_diff(
        original.splitlines(),
        corrected.splitlines(),
        fromfile="original",
        tofile="corrected",
        lineterm="",
    )
    return "\n".join(diff_lines)


def generate_all_diffs(original: str, corrected: str) -> dict[str, str]:
    """All available diff formats; semantic/html variants only when
    diff-match-patch is importable (it is not in this environment)."""
    import importlib.util

    result = {"unified_diff": generate_unified_diff(original, corrected)}
    if importlib.util.find_spec("diff_match_patch") is not None:  # pragma: no cover
        from diff_match_patch import diff_match_patch  # type: ignore

        dmp = diff_match_patch()
        diffs = dmp.diff_main(original, corrected)
        dmp.diff_cleanupSemantic(diffs)
        import json

        result["semantic_diff"] = json.dumps(
            [
                {"operation": {-1: "delete", 0: "equal", 1: "insert"}[op], "text": t}
                for op, t in diffs
            ]
        )
        result["html_diff"] = dmp.diff_prettyHtml(diffs)
    return result


def nfc_normalize_batch(texts: list) -> tuple[list, "object"]:
    """NFC-normalize a batch of strings; returns (normalized, changed_mask).

    Unicode normalization is the first text-canonicalization step of a
    multilingual corpus pipeline (decomposed combining marks from PDF
    extractors and mojibake repair differ byte-wise but compare equal
    after NFC — exact dedup keys must normalize first). Semantics match
    DuckDB's nfc_normalize (UAX #15; probed on combining marks, Hangul
    Jamo, precomposed Latin)."""
    import unicodedata

    import numpy as np

    out = []
    changed = np.zeros(len(texts), dtype=bool)
    for i, t in enumerate(texts):
        if t is None:
            out.append(None)
            continue
        n = unicodedata.normalize("NFC", t)
        out.append(n)
        changed[i] = n != t
    return out, changed
