"""Page-range semantics transliterated from
/root/reference/tests/test_pdf_utils.py:12-46 (FIXTURES.md §4)."""

import pytest

from docler_ray.page_ranges import parse_page_range, shift_page_range


def test_parse_simple_range():
    assert parse_page_range("1-3") == {1, 2, 3}


def test_parse_mixed():
    assert parse_page_range("1-3,5,7-9") == {1, 2, 3, 5, 7, 8, 9}


def test_parse_single():
    assert parse_page_range("4") == {4}


def test_parse_with_shift():
    assert parse_page_range("1-3", shift=-1) == {0, 1, 2}


def test_shift_positive():
    assert shift_page_range("1-3,5,7-9", 2) == "3-5,7,9-11"


def test_shift_zero():
    assert shift_page_range("1-3", 0) == "1-3"


def test_parse_invalid():
    with pytest.raises(ValueError, match="Invalid page range format"):
        parse_page_range("invalid")
    with pytest.raises(ValueError, match="Invalid page range format"):
        parse_page_range("1-2-3")


def test_shift_invalid_negative():
    with pytest.raises(ValueError, match="Invalid shift"):
        shift_page_range("1-3", -2)
    with pytest.raises(ValueError, match="Invalid shift"):
        parse_page_range("1-3", shift=-2)
