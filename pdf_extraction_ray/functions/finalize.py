"""Row finalization: routing, salvage, classification, output record.

Pure per-document logic shared by the direct extraction stage and the
page-range reassembly stage, so both paths produce identical bytes for
identical documents (the north rule's invariant). Semantics mirrored from
the reference:

* quality routing threshold (reference: app/services/pdf_extractor.py:451)
* salvage = the pre-extracted ``text`` column, the analog of the
  reference's vision-fallback second route
  (reference: app/services/pdf_extractor.py:226-400)
* partial-result rows instead of exceptions
  (reference: app/services/pdf_extractor.py:588-618)
* classification cascade (reference: app/services/document_classifier.py)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .classify import classify
from .hashing import sha256_hex
from .html_extract import Span
from .quality import quality_score_pct, route_for

STATUS_COMPLETED = "completed"
STATUS_REJECTED = "rejected"
STATUS_PARTIAL = "partial"


@dataclass
class Primary:
    """Result of the primary (layout-parse) extraction of one document."""
    text: str = ""
    spans: list[Span] = field(default_factory=list)
    element_count: int = 0
    heading_count: int = 0
    table_row_counts: list[int] = field(default_factory=list)
    n_pages: int = 0
    # layout elements with bboxes as plain dicts (kind/page/x0/y0/x1/y1);
    # PDF layout parse fills these, HTML extraction has no coordinates
    elements: list[dict] = field(default_factory=list)


def finalize_row(url: str,
                 warc_ts,
                 lang: str,
                 fallback_text: str,
                 content_type: str,
                 status: str,
                 error: str,
                 primary: Primary | None,
                 quality_threshold_pct: int = 70,
                 attempts: int = 1) -> dict:
    """Assemble the final output record for one document."""
    if status == STATUS_REJECTED or primary is None:
        q_pct = 0
        route = "none"
        text = ""
        spans: list[Span] = []
        elements: list[dict] = []
        doc_kind, conf, method = "unknown", 0, "none"
    else:
        q_pct = quality_score_pct(len(primary.text), primary.element_count,
                                  primary.heading_count, primary.table_row_counts)
        route = route_for(q_pct, quality_threshold_pct)
        if route == "primary":
            text = primary.text
            spans = primary.spans
            elements = primary.elements
        else:
            text = fallback_text
            spans = [Span(0, len(text), "document", 0)] if text else []
            elements = []
        doc_kind, conf, method = classify(url, text)
    return {
        "url": url,
        "warc_ts": warc_ts,
        "lang": lang,
        "content_type": content_type,
        "status": status,
        "error": error,
        "route": route,
        "quality_pct": q_pct,
        "doc_kind": doc_kind,
        "doc_conf_pct": conf,
        "doc_method": method,
        "extracted_text": text,
        "n_chars": len(text),
        "n_blocks": 0 if primary is None else primary.element_count,
        "n_pages": 0 if primary is None else primary.n_pages,
        "spans": spans,  # list[Span]; stages assemble Arrow columns from these
        "elements": elements,  # list[dict] kind/page/x0/y0/x1/y1
        "text_sha256": sha256_hex(text),
        "attempts": attempts,  # semantic retry counter (reference:
        # routers/extraction.py:155-190 — retry_count cap 5 → review queue)
    }
