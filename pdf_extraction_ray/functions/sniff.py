"""Content-type sniffing and payload validation.

Re-expresses the reference's upload validation (reference:
app/services/file_validator.py:32-81 — empty check, 200 MB cap, libmagic MIME
sniff) as pure functions over raw payload bytes. libmagic is replaced by a
magic-byte sniff over the leading bytes; rejection is a row-level status, not
an HTTP error (reference returns 400/413 — SURVEY.md §2.9 maps that to
``status='rejected'`` rows that never poison a batch).
"""

from __future__ import annotations

CT_PDF = "pdf"
CT_HTML = "html"
CT_TEXT = "text"
CT_EMPTY = "empty"
CT_UNKNOWN = "unknown"

_HTML_MARKERS = (b"<!doctype html", b"<html", b"<head", b"<body")


def sniff_content_type(payload: bytes) -> str:
    """Classify raw payload bytes into {pdf, html, text, empty, unknown}.

    Deterministic magic-byte dispatch:
    * ``%PDF-`` prefix → pdf (the reference's only accepted type,
      file_validator.py:30 ``application/pdf``)
    * an HTML tag marker in the first 1024 bytes (case-insensitive) → html
    * valid UTF-8 with a high printable ratio in the first 4096 bytes → text
    * zero-length → empty; anything else → unknown
    """
    if not payload:
        return CT_EMPTY
    if payload.startswith(b"%PDF-"):
        return CT_PDF
    head = payload[:1024].lower()
    if any(m in head for m in _HTML_MARKERS):
        return CT_HTML
    probe = payload[:4096]
    try:
        s = probe.decode("utf-8")
    except UnicodeDecodeError as e:
        # a multibyte char split at the probe BOUNDARY is not evidence of
        # binary content — trim the incomplete tail and retry; an error
        # anywhere else really is non-UTF-8
        if e.start < len(probe) - 3:
            return CT_UNKNOWN
        try:
            s = probe[:e.start].decode("utf-8")
        except UnicodeDecodeError:
            return CT_UNKNOWN
    if not s:
        return CT_EMPTY
    printable = sum(1 for c in s if c.isprintable() or c in "\n\r\t")
    if printable / len(s) >= 0.95:
        return CT_TEXT
    return CT_UNKNOWN


def validate_meta(n_bytes: int, content_type: str,
                  max_bytes: int) -> tuple[bool, str]:
    """Validation verdict from metadata alone (the batch path sniffs
    through zero-copy views and must not materialize payloads just to
    take ``len``). Checks in order: empty → size cap → type. Error
    strings are stable (part of the output contract)."""
    if n_bytes == 0:
        return False, "empty"
    if n_bytes > max_bytes:
        return False, "too_large"
    if content_type not in (CT_PDF, CT_HTML, CT_TEXT):
        return False, "unsupported_type"
    return True, ""


def validate_payload(payload: bytes, content_type: str, max_bytes: int) -> tuple[bool, str]:
    """Row-level validation verdict ``(valid, error)``.

    Mirrors file_validator.py checks (reference:
    app/services/file_validator.py:32-81) — delegates to the one
    metadata-level rule set above.
    """
    return validate_meta(len(payload), content_type, max_bytes)
