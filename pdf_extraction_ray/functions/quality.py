"""Quality scoring + route dispatch.

Reproduces the reference's routing score exactly
(reference: app/services/opendataloader_extractor.py:18-80 — weights
40/30/15/15 with thresholds 1000/500/100 chars, 50/20/5 elements, 5/3/1
headings, valid table = >3 rows) and its routing threshold
(reference: app/services/pdf_extractor.py:451 — ``quality < 0.7`` →
vision fallback; here → the salvage route).

The score is carried as an **integer percent** so the 70 threshold compares
exactly in Python, Arrow, and the DuckDB oracle alike — the reference's
float weights quantize to ints without loss.
"""

from __future__ import annotations

ROUTE_PRIMARY = "primary"
ROUTE_SALVAGE = "salvage"


def quality_score_pct(text_length: int,
                      element_count: int,
                      heading_count: int,
                      table_row_counts: list[int]) -> int:
    """0–100 quality score (reference formula, integer arithmetic)."""
    score = 0
    # text completeness (40%)
    if text_length > 1000:
        score += 40
    elif text_length > 500:
        score += 30
    elif text_length > 100:
        score += 20
    # structure detection (30%)
    if element_count > 50:
        score += 30
    elif element_count > 20:
        score += 20
    elif element_count > 5:
        score += 10
    # heading hierarchy (15%)
    if heading_count >= 5:
        score += 15
    elif heading_count >= 3:
        score += 10
    elif heading_count >= 1:
        score += 5
    # table extraction (15%): valid table = more than 3 rows
    if any(r > 3 for r in table_row_counts):
        score += 15
    elif table_row_counts:
        score += 10
    return min(score, 100)


def route_for(quality_pct: int, threshold_pct: int = 70) -> str:
    """quality below threshold → salvage (reference's vision fallback)."""
    return ROUTE_SALVAGE if quality_pct < threshold_pct else ROUTE_PRIMARY


def quality_batch(text_len, element_count, heading_count,
                  has_table, has_valid_table):
    """Vectorized ``quality_score_pct`` over numpy arrays (identical
    integer semantics; the batch finalize path uses this, the per-row
    reassembly path uses the scalar — golden tests pin them equal)."""
    import numpy as np

    q = np.where(text_len > 1000, 40,
                 np.where(text_len > 500, 30,
                          np.where(text_len > 100, 20, 0)))
    q = q + np.where(element_count > 50, 30,
                     np.where(element_count > 20, 20,
                              np.where(element_count > 5, 10, 0)))
    q = q + np.where(heading_count >= 5, 15,
                     np.where(heading_count >= 3, 10,
                              np.where(heading_count >= 1, 5, 0)))
    q = q + np.where(has_valid_table, 15, np.where(has_table, 10, 0))
    return np.minimum(q, 100)
