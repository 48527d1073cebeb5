"""Doc-type classification: the reference's cascade, deterministic layers only.

Layer 1 scans the url/filename for memo vs question-paper markers
(reference: app/services/document_classifier.py:23-60, confidence 0.9 on an
unambiguous hit); layer 2 scans the first 3000 chars of extracted text for
6+6 content phrases (document_classifier.py:67-114, confidence
``min(0.7 + 0.05*hits, 0.95)``); the reference's Gemini layer 3
(document_classifier.py:121-154) is replaced by the deterministic default
``question_paper @ 0.5`` (its own fallback, document_classifier.py:195-200)
— no network in this engine by design.

Confidence is carried as an integer percent for exact SQL parity.
"""

from __future__ import annotations

import re

DOC_MEMO = "memo"
DOC_QP = "question_paper"

_MEMO_FILENAME_RE = re.compile(r"\b(?:mg|memo|marking|memorandum)\b", re.IGNORECASE)
_QP_FILENAME_RE = re.compile(r"\b(?:qp|question[_\s]?paper)\b", re.IGNORECASE)

MEMO_PHRASES = (
    "marking guideline",
    "memorandum",
    "notes to markers",
    "model answer",
    "mark allocation",
    "marks will be awarded",
)

QP_PHRASES = (
    "instructions and information",
    "answer all",
    "write in the answer book",
    "this question paper consists of",
    "read the following",
    "answer book",
)


def classify(url: str, text: str) -> tuple[str, int, str]:
    """-> (doc_kind, confidence_pct, method)."""
    has_memo = _MEMO_FILENAME_RE.search(url) is not None
    has_qp = _QP_FILENAME_RE.search(url) is not None
    if has_memo and not has_qp:
        return DOC_MEMO, 90, "filename"
    if has_qp and not has_memo:
        return DOC_QP, 90, "filename"

    sample = text[:3000].lower()
    memo_hits = sum(1 for p in MEMO_PHRASES if p in sample)
    qp_hits = sum(1 for p in QP_PHRASES if p in sample)
    if memo_hits > 0 and memo_hits > qp_hits:
        return DOC_MEMO, min(70 + 5 * memo_hits, 95), "content_keywords"
    if qp_hits > 0 and qp_hits > memo_hits:
        return DOC_QP, min(70 + 5 * qp_hits, 95), "content_keywords"

    return DOC_QP, 50, "default"


_MEMO_URL_PATTERN = r"\b(?:mg|memo|marking|memorandum)\b"
_QP_URL_PATTERN = r"\b(?:qp|question[_\s]?paper)\b"


def classify_batch(urls, texts):
    """Vectorized ``classify`` over Arrow arrays: RE2 url regexes +
    12 substring scans over the lowered 3000-char sample, all in C
    kernels. Returns (kinds, conf_pcts, methods) numpy arrays with
    semantics identical to the scalar cascade.
    """
    import numpy as np
    import pyarrow.compute as pc

    def np_bool(arr) -> "np.ndarray":
        return arr.to_numpy(zero_copy_only=False)

    has_memo = np_bool(pc.match_substring_regex(urls, _MEMO_URL_PATTERN,
                                                ignore_case=True))
    has_qp = np_bool(pc.match_substring_regex(urls, _QP_URL_PATTERN,
                                              ignore_case=True))
    sample = pc.utf8_lower(pc.utf8_slice_codeunits(texts, 0, 3000))
    memo_hits = sum(np_bool(pc.match_substring(sample, p)).astype(np.int64)
                    for p in MEMO_PHRASES)
    qp_hits = sum(np_bool(pc.match_substring(sample, p)).astype(np.int64)
                  for p in QP_PHRASES)

    fn_memo = has_memo & ~has_qp
    fn_qp = has_qp & ~has_memo
    fn_any = fn_memo | fn_qp
    kw_memo = ~fn_any & (memo_hits > 0) & (memo_hits > qp_hits)
    kw_qp = ~fn_any & (qp_hits > 0) & (qp_hits > memo_hits)

    kinds = np.select([fn_memo, fn_qp, kw_memo, kw_qp],
                      [DOC_MEMO, DOC_QP, DOC_MEMO, DOC_QP], DOC_QP)
    confs = np.select([fn_any, kw_memo, kw_qp],
                      [90, np.minimum(70 + 5 * memo_hits, 95),
                       np.minimum(70 + 5 * qp_hits, 95)], 50)
    methods = np.select([fn_any, kw_memo | kw_qp],
                        ["filename", "content_keywords"], "default")
    return kinds, confs.astype(np.int64), methods
