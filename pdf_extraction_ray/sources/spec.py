"""Synthetic pages-corpus specification (single source of truth).

The engine's canonical input is a Parquet table of Common-Crawl-style pages
``(url, warc_ts, html, text, lang)`` (BASELINE.json ``input_hint``). No such
table ships with the test data, so we synthesize one deterministically from
``documents.parquet`` (TESTDATA.md): every payload, url, and timestamp is a
pure function of ``(doc_id, text, source)``. This module defines that
function ONCE; three consumers read it:

* sources/gen_html.py + sources/corpus.py — build the payload bytes
* this module's ``expected_*`` helpers — the serial ground truth used by
  the golden diff suite (north rule: byte-identical extracted text per url)
* oracle.py — the same ground truth re-expressed as DuckDB SQL over the
  ``documents`` view, giving the driver's correctness gate a real
  value-hash oracle for the extraction pipeline

Payload kind by ``doc_id % 100`` (FIXTURES.md F1 row mix):

====  ==========================================================
0-39  HTML, <article> main content amid nav/header/footer/ads
40-49 HTML with an <h1> heading block
50-59 HTML div-soup (no semantic root; density scoring must find it)
60-64 HTML list variant (<li> blocks)
65-69 HTML with a trailing data table (<tr> blocks)
70-74 PDF with a trailing table (aligned cell chunks; the parser's
      x-signature run detection must find it for the quality table term)
75-87 PDF, 1-2 pages
88-89 PDF oversized (20+ pages; exercises skew splitting)
90-91 HTML tiny (<100 chars → quality<70 → salvage route)
92-93 PDF "scanned" (no text ops → quality 0 → salvage route)
94    HTML empty body
95-97 garbage bytes  → status=rejected (unsupported_type)
98    empty payload  → status=rejected (empty)
99    HTML + oversize padding → status=rejected (too_large)
====  ==========================================================

Orthogonally by ``doc_id % 10``: 3 → url ends ``-memo``; 7 → url ends
``-qp`` (classifier layer 1); 5 (content kinds only) → a memo-phrase block
is prepended (classifier layer 2).

Orthogonally by ``doc_id % 3`` (PDF kinds only, ``pdf_variant``): the
on-disk encoding cycles plain / flate / objstm — compressed variants
change only the payload bytes, never the extracted ground truth.

Orthogonally by ``doc_id % 7`` (PDF kinds only, ``pdf_text_style``):
``doc_id % 7 == 3`` documents use the real-world content-stream
operator mix (Td-relative advances, TJ kerning arrays, hex strings)
instead of simple ``Tm…Tj`` — again extraction-invariant, pinning the
full tokenizer's operator coverage through every pipeline oracle.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

HTML_PIECE_W = 40          # chars per HTML paragraph piece
PDF_LINE_W = 60            # chars per PDF text line
LINES_PER_PAGE = 45
EPOCH = datetime(2020, 1, 1)
TS_STEP_S = 137            # warc_ts = EPOCH + doc_id * 137 s
DUP_MOD = 43               # doc_id % 43 == 0 → a duplicate row (+3600 s)
DUP_OFFSET_S = 3600
PHRASE = "notes to markers mark allocation"
OVERSIZE_PAD = 300_000     # bytes of comment padding on kind `oversize`
CORPUS_MAX_BYTES = 262_144  # pipeline size cap used with this corpus
CORPUS_QUALITY_THRESHOLD_PCT = 70  # routing threshold (reference: quality < 0.7)
# oversized PDFs are >= ceil(150/45)=4 pages; normal PDFs are <= 2 pages,
# so threshold 3 cleanly routes pdf_big (and only pdf_big) to the shard path
CORPUS_SPLIT_PAGE_THRESHOLD = 3
SPEC_VERSION = "v9"        # bump to invalidate cached generated corpora
SESSION = "May/June"       # metadata header session value

# --- planted inter-page link graph (pipelines/linkgraph.py) ----------------
# Non-divsoup HTML pages carry a "related" block in the footer boilerplate:
# 3 site-internal permalinks /doc/d{hub:07d} to hub pages. Hub ids are pure
# functions of doc_id in 0..REL_HUBS-1 (always-valid targets on any corpus
# with >= REL_HUBS documents), giving the extracted link graph the same
# 16-hub skew topology as analytics.pagerank_docs' planted edges. Links sit
# INSIDE <footer> so the content extractor strips them — extracted text is
# byte-identical to the pre-link spec (golden suite pins this).
REL_HUBS = 16
REL_PARAMS = ((1, 0), (7, 3), (13, 5))   # hub_j = (doc_id*a + b) % REL_HUBS
REL_SALT = 700                           # anchor-word salt (gen_html._word)


def rel_hubs_of(doc_id: int) -> list[int]:
    """Target hub ids of the planted related-links, in document order
    (duplicates kept: parallel edges collapse only in link_graph)."""
    return [(doc_id * a + b) % REL_HUBS for a, b in REL_PARAMS]


# --- kind assignment --------------------------------------------------------

def sub(doc_id: int) -> int:
    return doc_id % 100


def kind_of(doc_id: int) -> str:
    s = sub(doc_id)
    if s <= 39:
        return "html_plain"
    if s <= 49:
        return "html_heading"
    if s <= 59:
        return "html_divsoup"
    if s <= 64:
        return "html_list"
    if s <= 69:
        return "html_table"
    if s <= 74:
        return "pdf_table"
    if s <= 87:
        return "pdf_normal"
    if s <= 89:
        return "pdf_big"
    if s <= 91:
        return "html_tiny"
    if s <= 93:
        return "pdf_scanned"
    if s == 94:
        return "html_emptybody"
    if s <= 97:
        return "garbage"
    if s == 98:
        return "empty"
    return "oversize"


def pdf_twocol(doc_id: int) -> bool:
    """20% of plain pdf_normal docs lay out in TWO COLUMNS (left band
    top-to-bottom, then right) — reading-order sort is text-invariant by
    construction, so the extraction oracles are untouched while the
    pdf_elements bbox oracle pins the band geometry."""
    return kind_of(doc_id) == "pdf_normal" and doc_id % 5 == 4


def pdf_variant(doc_id: int) -> str:
    """On-disk encoding of PDF payloads — extraction-invariant, so the
    ground truth (and every oracle) is untouched by the cycle:

    * ``plain``  — classic xref, uncompressed streams (PDF 1.4)
    * ``flate``  — zlib-compressed content streams (/Filter /FlateDecode),
      what real-world PDF writers emit
    * ``objstm`` — PDF 1.5 compressed-xref layout (object streams + xref
      stream + Flate content)
    """
    return ("plain", "flate", "objstm")[doc_id % 3]


def pdf_text_style(doc_id: int) -> str:
    """Content-stream operator mix — extraction-invariant (see module
    docstring): most PDFs use the simple ``Tm…Tj`` form (fast-path
    eligible); every 7th-ish uses Td/TJ/hex (full tokenizer)."""
    return "tjhex" if doc_id % 7 == 3 else "tj"


def rep_html(doc_id: int) -> int:
    return 3 + doc_id % 5


def rep_pdf(doc_id: int) -> int:
    return 2 + doc_id % 4


def rep_big(doc_id: int) -> int:
    return 150 + (doc_id * 7) % 50


def n_table_rows(doc_id: int) -> int:
    return 2 + doc_id % 6


def has_phrase(doc_id: int) -> bool:
    return doc_id % 10 == 5 and sub(doc_id) < 90


def heading_text(doc_id: int, source: str) -> str:
    return f"{source} #{doc_id}"


# --- document metadata header (parsed back out by the canonical-name
#     pipeline — reference: FullExamPaper subject/grade/session/year
#     parsed from the document, app/models/extraction.py:110-161) -----------

def grade_of(doc_id: int) -> int:
    return doc_id % 12 + 1


def year_of(doc_id: int) -> int:
    return 2017 + doc_id % 8


def subject_of(doc_id: int, source: str) -> str:
    return f"{source} Studies P1"


def has_meta(doc_id: int) -> bool:
    """Content kinds carry a metadata header line; junk/tiny/scanned/empty
    kinds do not (their canonical name is unresolvable, as with the
    reference's failed metadata parse)."""
    return sub(doc_id) <= 89


def meta_line(doc_id: int, source: str) -> str:
    return (f"Subject: {subject_of(doc_id, source)}"
            f" | Grade: {grade_of(doc_id)}"
            f" | Session: {SESSION}"
            f" | Year: {year_of(doc_id)}")


def url_of(doc_id: int, source: str) -> str:
    last = doc_id % 10
    suffix = "-memo" if last == 3 else ("-qp" if last == 7 else "")
    return f"https://corpus.example/{source}/d{doc_id:07d}{suffix}"


def warc_ts_of(doc_id: int) -> datetime:
    return EPOCH + timedelta(seconds=TS_STEP_S * doc_id)


def is_dup(doc_id: int) -> bool:
    return doc_id % DUP_MOD == 0


def garbage_bytes(doc_id: int) -> bytes:
    h = hashlib.sha256(f"garbage-{doc_id}".encode()).digest()
    return h * 64  # 2 KiB of deterministic non-UTF8 noise


# --- ground-truth content ---------------------------------------------------

def pieces(text: str, width: int) -> list[str]:
    return [text[i:i + width] for i in range(0, len(text), width)] or [""]


def table_row_text(doc_id: int, r: int) -> str:
    return f"r{r}\tv{doc_id * r}"


def expected_blocks(doc_id: int, text: str, source: str) -> list[str]:
    """Ground-truth block texts of the PRIMARY extraction, in order.

    Applies to HTML kinds; PDF kinds use ``expected_pdf_lines``.
    """
    k = kind_of(doc_id)
    blocks: list[str] = []
    if has_meta(doc_id):
        blocks.append(meta_line(doc_id, source))
    if has_phrase(doc_id):
        blocks.append(PHRASE)
    if k in ("html_plain", "html_divsoup", "html_list", "oversize"):
        blocks += pieces(text, HTML_PIECE_W) * rep_html(doc_id)
    elif k == "html_heading":
        blocks.append(heading_text(doc_id, source))
        blocks += pieces(text, HTML_PIECE_W) * rep_html(doc_id)
    elif k == "html_table":
        blocks += pieces(text, HTML_PIECE_W) * rep_html(doc_id)
        blocks += [table_row_text(doc_id, r) for r in range(1, n_table_rows(doc_id) + 1)]
    elif k == "html_tiny":
        blocks.append(text[:80])
    elif k == "html_emptybody":
        pass
    else:
        raise ValueError(f"not an HTML kind: {k}")
    return blocks


def pdf_table_cells(doc_id: int, r: int) -> list[str]:
    """Cells of table row ``r`` — ``"\\t".join`` equals the HTML kind's
    ``table_row_text`` so the two table paths share one ground truth."""
    return [f"r{r}", f"v{doc_id * r}"]


def expected_pdf_lines(doc_id: int, text: str, source: str = "") -> list[str]:
    k = kind_of(doc_id)
    if k == "pdf_scanned":
        return []
    rep = rep_big(doc_id) if k == "pdf_big" else rep_pdf(doc_id)
    lines: list[str] = []
    if has_meta(doc_id):
        lines.append(meta_line(doc_id, source))
    if has_phrase(doc_id):
        lines.append(PHRASE)
    lines += pieces(text, PDF_LINE_W) * rep
    if k == "pdf_table":
        lines += ["\t".join(pdf_table_cells(doc_id, r))
                  for r in range(1, n_table_rows(doc_id) + 1)]
    return lines


def pdf_line_specs(doc_id: int, text: str, source: str = "") -> list:
    """Generator-side line specs: plain strings, plus table rows as cell
    lists (the generator positions each cell as its own chunk so the
    parser's table detection has real layout structure to find)."""
    k = kind_of(doc_id)
    specs: list = expected_pdf_lines(doc_id, text, source)
    if k == "pdf_table":
        nrows = n_table_rows(doc_id)
        specs = specs[:-nrows] + [pdf_table_cells(doc_id, r)
                                  for r in range(1, nrows + 1)]
    return specs


def expected_primary_text(doc_id: int, text: str, source: str) -> str:
    k = kind_of(doc_id)
    if k in ("garbage", "empty"):
        return ""
    if k.startswith("pdf"):
        return "\n".join(expected_pdf_lines(doc_id, text, source))
    return "\n\n".join(expected_blocks(doc_id, text, source))


def fallback_text(doc_id: int, text: str, source: str) -> str:
    """The ``text`` column of the pages table (pre-extracted fallback, the
    salvage route's input). Equals the primary ground truth for content
    kinds so routing never changes the extracted bytes; the scanned-PDF
    kind carries an "external OCR" prefix instead; junk kinds carry ''.
    """
    k = kind_of(doc_id)
    if k == "pdf_scanned":
        return text[:100]
    if k in ("garbage", "empty", "html_emptybody"):
        return ""
    return expected_primary_text(doc_id, text, source)


def expected_status(doc_id: int) -> tuple[str, str]:
    """-> (status, error)."""
    k = kind_of(doc_id)
    if k == "garbage":
        return "rejected", "unsupported_type"
    if k == "empty":
        return "rejected", "empty"
    if k == "oversize":
        return "rejected", "too_large"
    return "completed", ""


def expected_content_type(doc_id: int) -> str:
    k = kind_of(doc_id)
    if k == "garbage":
        return "unknown"
    if k == "empty":
        return "empty"
    if k.startswith("pdf"):
        return "pdf"
    return "html"


def expected_final_text(doc_id: int, text: str, source: str) -> str:
    """Extracted text after validation + routing (the output contract)."""
    status, _ = expected_status(doc_id)
    if status == "rejected":
        return ""
    if kind_of(doc_id) == "pdf_scanned":
        return text[:100]  # salvage route returns the fallback column
    return expected_primary_text(doc_id, text, source)
