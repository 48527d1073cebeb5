"""Minimal uncompressed PDF writer for the synthetic corpus.

Emits fully valid PDFs over a tractable subset — xref table, catalog, page
tree, per-page uncompressed content streams with ``BT/Tf/Tm/(…)Tj/ET`` text
operators and integer coordinates — the subset our layout parser
(functions/pdf_extract.py) handles completely. Mirrors the reference's
golden-fixture approach of hand-built ``%PDF-1.4`` bytes
(reference: tests/integration/test_extraction_flow.py:43-45) scaled up to
multi-page documents.

Determinism: layout is a pure function of the input lines; integer
coordinates only (SURVEY.md §7.5 hard part #1).
"""

from __future__ import annotations

PAGE_W = 612
PAGE_H = 792
MARGIN_X = 72
TOP_Y = 720
LEADING = 14
LINES_PER_PAGE = 45
COL2_X = 320  # x origin of the right column in two-column mode


def _esc(line: str) -> bytes:
    b = line.encode("utf-8")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _content_stream(lines: list[str], xs: list[int] | None = None) -> bytes:
    """One page's content stream: absolute-positioned text lines."""
    ops = [b"BT", b"/F1 12 Tf"]
    for i, line in enumerate(lines):
        x = MARGIN_X if xs is None else xs[i]
        y = TOP_Y - LEADING * (i if xs is None else _col_row(i, len(lines)))
        ops.append(b"1 0 0 1 %d %d Tm (%s) Tj" % (x, y, _esc(line)))
    ops.append(b"ET")
    return b"\n".join(ops)


def _col_row(i: int, n: int) -> int:
    half = (n + 1) // 2
    return i if i < half else i - half


def build_pdf(lines: list[str],
              lines_per_page: int = LINES_PER_PAGE,
              two_column: bool = False,
              no_text: bool = False,
              n_empty_pages: int = 1) -> bytes:
    """Serialize ``lines`` into a multi-page uncompressed PDF.

    ``no_text``: emit ``n_empty_pages`` pages with empty content streams
    (a "scanned" document — exercises the quality-0 salvage route).
    ``two_column``: split each page's lines into a left and right x-band
    (reading order = left column top-to-bottom, then right).
    """
    if no_text:
        page_lines: list[list[str]] = [[] for _ in range(max(1, n_empty_pages))]
    else:
        page_lines = [lines[i:i + lines_per_page]
                      for i in range(0, len(lines), lines_per_page)] or [[]]

    streams: list[bytes] = []
    for pls in page_lines:
        if two_column and pls:
            half = (len(pls) + 1) // 2
            xs = [MARGIN_X] * half + [COL2_X] * (len(pls) - half)
            streams.append(_content_stream(pls, xs))
        else:
            streams.append(_content_stream(pls))

    n_pages = len(streams)
    # object numbering: 1 catalog, 2 pages, 3 font,
    # then per page i: 4+2i = page, 5+2i = contents
    objs: dict[int, bytes] = {}
    kids = b" ".join(b"%d 0 R" % (4 + 2 * i) for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n_pages)
    objs[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    for i, stream in enumerate(streams):
        pno, cno = 4 + 2 * i, 5 + 2 * i
        objs[pno] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
            % (PAGE_W, PAGE_H, cno)
        )
        objs[cno] = (b"<< /Length %d >>\nstream\n" % len(stream)) + stream + b"\nendstream"

    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num
        out += objs[num]
        out += b"\nendobj\n"
    xref_at = len(out)
    maxnum = max(objs)
    out += b"xref\n0 %d\n" % (maxnum + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, maxnum + 1):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (maxnum + 1, xref_at))
    return bytes(out)
