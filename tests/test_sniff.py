"""Unit tests: content-type sniffing + validation (SURVEY.md M1/M2;
reference test analog: tests/test_file_validator.py)."""

from pdf_extraction_ray.functions.sniff import (
    CT_EMPTY, CT_HTML, CT_PDF, CT_TEXT, CT_UNKNOWN,
    sniff_content_type, validate_payload)


def test_pdf_magic():
    assert sniff_content_type(b"%PDF-1.4\nrest") == CT_PDF


def test_html_doctype():
    assert sniff_content_type(b"<!DOCTYPE html><html></html>") == CT_HTML


def test_html_tag_case_insensitive():
    assert sniff_content_type(b"  \n<HTML><body>x</body>") == CT_HTML


def test_html_marker_beyond_window_is_not_html():
    payload = b"x" * 2000 + b"<html>"
    assert sniff_content_type(payload) == CT_TEXT  # printable prefix


def test_plain_text():
    assert sniff_content_type(b"just some plain words\nand lines") == CT_TEXT


def test_empty():
    assert sniff_content_type(b"") == CT_EMPTY


def test_binary_garbage():
    assert sniff_content_type(bytes(range(256)) * 4) == CT_UNKNOWN


def test_validate_order_empty_first():
    assert validate_payload(b"", CT_EMPTY, 10) == (False, "empty")


def test_validate_size_cap():
    assert validate_payload(b"x" * 11, CT_HTML, 10) == (False, "too_large")


def test_validate_type():
    assert validate_payload(b"\x00\x01", CT_UNKNOWN, 10) == (False, "unsupported_type")


def test_validate_ok():
    assert validate_payload(b"%PDF-", CT_PDF, 10) == (True, "")


def test_utf8_boundary_split_still_text():
    """A multibyte char split at the 4096-byte probe boundary is not
    evidence of binary content."""
    from pdf_extraction_ray.functions.sniff import sniff_content_type
    payload = b"a" * 4095 + "é".encode() + b" trailing words " * 50
    assert sniff_content_type(payload) == "text"
    # genuinely invalid UTF-8 mid-payload still rejects
    assert sniff_content_type(b"a" * 100 + b"\xc3\x28" + b"b" * 100) == "unknown"
