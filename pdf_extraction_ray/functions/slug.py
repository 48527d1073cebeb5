"""String canonicalization scalar functions.

``slugify`` mirrors the reference's ``_slug``
(reference: app/models/extraction.py:146-151); ``sanitize_filename``
mirrors the validator's sanitizer semantics
(reference: app/services/file_validator.py:84-142);
``canonical_name`` mirrors ``build_canonical_filename``
(reference: app/models/extraction.py:131-161).
"""

from __future__ import annotations

import re
import unicodedata

_SLUG_SEP_RE = re.compile(r"[/\\]+")
_SLUG_BAD_RE = re.compile(r"[^a-z0-9\-]+")
_SLUG_DASH_RE = re.compile(r"-+")
_SAFE_CHAR_RE = re.compile(r"[^a-zA-Z0-9._-]")

_WINDOWS_RESERVED = (
    {"con", "prn", "aux", "nul"}
    | {f"com{i}" for i in range(1, 10)}
    | {f"lpt{i}" for i in range(1, 10)}
)


def slugify(text: str) -> str:
    text = text.lower()
    text = _SLUG_SEP_RE.sub("-", text)
    text = _SLUG_BAD_RE.sub("-", text)
    text = _SLUG_DASH_RE.sub("-", text)
    return text.strip("-")


def canonical_name(document_id: str, subject: str, grade: str,
                   session: str, year: int, suffix: str = "qp") -> str:
    """{doc_id}-{subject}-gr{grade}-{session}-{year}-{suffix}."""
    return "-".join([
        document_id, slugify(subject), f"gr{slugify(grade)}",
        slugify(session), str(year), suffix,
    ])


def sanitize_filename(filename: str) -> str:
    """Path-traversal-safe filename, forced ``.pdf``, <=255 chars."""
    filename = filename.rsplit("/", 1)[-1].rsplit("\\", 1)[-1]
    filename = unicodedata.normalize("NFKD", filename)
    filename = "".join(c for c in filename if ord(c) >= 32 and ord(c) != 127)
    filename = filename.replace("..", "").replace("/", "").replace("\\", "")
    filename = filename.replace("\0", "")
    filename = _SAFE_CHAR_RE.sub("_", filename)
    if not filename or filename == ".pdf":
        filename = "upload.pdf"
    stem = filename.rsplit(".", 1)[0].lower() if "." in filename else filename.lower()
    if stem in _WINDOWS_RESERVED:
        filename = "upload.pdf"
    if not filename.lower().endswith(".pdf"):
        filename += ".pdf"
    if len(filename) > 255:
        filename = filename[:-4][:250] + ".pdf"
    return filename
