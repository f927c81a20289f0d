"""Page range parsing — "1-5,7,9-11" <-> set[int], with shifting.

Functional re-implementation of the reference semantics at
/root/reference/src/docler/pdf_utils.py:22-87, including the exact error
message prefixes its tests assert on
(/root/reference/tests/test_pdf_utils.py:15-46, transliterated in
tests/test_page_ranges.py here).
"""

from __future__ import annotations

from docler_ray.common_types import PageRangeString


def shift_page_range(page_range: PageRangeString, shift: int = 0) -> PageRangeString:
    """Shift every page number in a range string by ``shift``.

    Raises ValueError("Invalid shift ...") when any page would go negative and
    ValueError("Invalid page range format: ...") on malformed input.
    """
    parts: list[str] = []
    try:
        for part in page_range.split(","):
            if "-" in part:
                start, end = map(int, part.split("-"))
                if start + shift < 0 or end + shift < 0:
                    msg = f"Invalid shift {shift} for page range {page_range}"
                    raise _ShiftError(msg)
                parts.append(f"{start + shift}-{end + shift}")
            else:
                page = int(part)
                if page + shift < 0:
                    msg = f"Invalid shift {shift} for page {page}"
                    raise _ShiftError(msg)
                parts.append(str(page + shift))
    except _ShiftError as e:
        raise ValueError(str(e)) from None
    except ValueError as e:
        msg = f"Invalid page range format: {page_range}. Expected format: '1-5,7,9-11'"
        raise ValueError(msg) from e
    return ",".join(parts)


class _ShiftError(Exception):
    """Internal sentinel so shift errors aren't re-wrapped as format errors."""


def parse_page_range(page_range: PageRangeString, shift: int = 0) -> set[int]:
    """Parse "1-5,7,9-11" into {1,2,3,4,5,7,9,10,11}, optionally shifted."""
    if shift:
        page_range = shift_page_range(page_range, shift)
    pages: set[int] = set()
    try:
        for part in page_range.split(","):
            if "-" in part:
                start, end = map(int, part.split("-"))
                pages.update(range(start, end + 1))
            else:
                pages.add(int(part))
    except ValueError as e:
        msg = f"Invalid page range format: {page_range}. Expected format: '1-5,7,9-11'"
        raise ValueError(msg) from e
    return pages
