"""Minimal PDF writer for the synthetic corpus.

Emits fully valid PDFs over a tractable subset — xref table, catalog, page
tree, per-page content streams with ``BT/Tf/Tm/(…)Tj/ET`` text operators
and integer coordinates — the subset our layout parser
(functions/pdf_extract.py) handles completely. Mirrors the reference's
golden-fixture approach of hand-built ``%PDF-1.4`` bytes
(reference: tests/integration/test_extraction_flow.py:43-45) scaled up to
multi-page documents.

Three on-disk variants (all extracting to identical bytes):

* ``plain``  — classic xref table, uncompressed streams (PDF 1.4)
* ``flate``  — classic xref table, zlib-compressed content streams with
  ``/Filter /FlateDecode`` — what real-world writers emit
* ``objstm`` — PDF 1.5 compressed-xref layout: catalog/page-tree/page
  dicts packed into a Flate-compressed ``/Type /ObjStm`` object, a
  cross-reference STREAM (``/Type /XRef``, /W-encoded binary entries)
  instead of the classic table, plus Flate content streams

Determinism: layout is a pure function of the input lines; integer
coordinates only (SURVEY.md §7.5 hard part #1).
"""

from __future__ import annotations

import zlib

PAGE_W = 612
PAGE_H = 792
MARGIN_X = 72
TOP_Y = 720
LEADING = 14
LINES_PER_PAGE = 45
COL2_X = 320       # x origin of the right column in two-column mode
CELL_STRIDE = 98   # x stride between table cells: >= parser CELL_GAP_MIN
                   # (tab join) and < column_gap_min (no band split)


def _esc(line: str) -> bytes:
    b = line.encode("utf-8")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


# a "line spec" is either a plain string (one positioned chunk) or a list
# of cell strings (one chunk per cell at CELL_STRIDE x offsets — a table
# row; consecutive rows share the x-signature the parser detects)
LineSpec = "str | list[str]"


def _tjhex_show(text: str) -> bytes:
    """``[<hex> kern (literal)] TJ`` show operator: first half of the
    bytes hex-encoded, a kerning number the extractor must ignore, the
    rest a literal — one TJ array concatenates back to the same chunk
    (splitting raw utf-8 bytes is safe: the parser joins parts BEFORE
    decoding)."""
    b = text.encode("utf-8")
    half = len(b) // 2
    return b"[<%s> -120 (%s)] TJ" % (b[:half].hex().encode(),
                                     _esc_bytes(b[half:]))


def _esc_bytes(b: bytes) -> bytes:
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _content_stream(lines: list, xs: list[int] | None = None,
                    style: str = "tj") -> bytes:
    """One page's content stream.

    ``style='tj'``: absolute ``Tm … (…) Tj`` lines (the simple form the
    fast-path regex recognizes). ``style='tjhex'``: the real-world
    operator mix — ``Td``-relative line advances, ``TJ`` kerning arrays,
    and hex strings — extracting to byte-identical text through the full
    tokenizer.
    """
    ops = [b"BT", b"/F1 12 Tf"]
    # Td-relative advances are only sound when every preceding show op
    # sits at MARGIN_X — a table row's cell Tm would re-base the line
    # start mid-page
    sequential = xs is None and all(isinstance(ln, str) for ln in lines)
    for i, line in enumerate(lines):
        x = MARGIN_X if xs is None else xs[i]
        y = TOP_Y - LEADING * (i if xs is None else _col_row(i, len(lines)))
        if isinstance(line, str):
            if style == "tjhex":
                if sequential and i > 0:
                    ops.append(b"0 %d Td %s" % (-LEADING, _tjhex_show(line)))
                else:
                    ops.append(b"1 0 0 1 %d %d Tm %s"
                               % (x, y, _tjhex_show(line)))
            else:
                ops.append(b"1 0 0 1 %d %d Tm (%s) Tj" % (x, y, _esc(line)))
        else:  # table row: one chunk per cell
            for j, cell in enumerate(line):
                cx = x + CELL_STRIDE * j
                if style == "tjhex":
                    ops.append(b"1 0 0 1 %d %d Tm %s"
                               % (cx, y, _tjhex_show(cell)))
                else:
                    ops.append(b"1 0 0 1 %d %d Tm (%s) Tj"
                               % (cx, y, _esc(cell)))
    ops.append(b"ET")
    return b"\n".join(ops)


def _col_row(i: int, n: int) -> int:
    half = (n + 1) // 2
    return i if i < half else i - half


def _stream_obj(stream: bytes, compress: bool) -> bytes:
    if compress:
        comp = zlib.compress(stream, 6)
        return (b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
                ) + comp + b"\nendstream"
    return (b"<< /Length %d >>\nstream\n" % len(stream)
            ) + stream + b"\nendstream"


def _serialize_classic(objs: dict[int, bytes], version: bytes) -> bytes:
    out = bytearray(b"%PDF-" + version + b"\n")
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


def _serialize_objstm(dicts: dict[int, bytes],
                      stream_objs: dict[int, bytes]) -> bytes:
    """PDF 1.5 layout: dict objects packed into a Flate ObjStm; stream
    objects stay top-level; a cross-reference STREAM replaces the table."""
    import struct

    maxnum = max(list(dicts) + list(stream_objs))
    objstm_num = maxnum + 1
    xref_num = maxnum + 2

    packed = sorted(dicts)
    header_parts: list[bytes] = []
    payload = bytearray()
    for num in packed:
        header_parts.append(b"%d %d" % (num, len(payload)))
        payload += dicts[num] + b"\n"
    header = b" ".join(header_parts) + b"\n"
    comp = zlib.compress(bytes(header + payload), 6)
    objstm_obj = (
        b"<< /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode >>"
        b"\nstream\n" % (len(packed), len(header), len(comp))
    ) + comp + b"\nendstream"

    out = bytearray(b"%PDF-1.5\n")
    offsets: dict[int, int] = {}
    for num in sorted(stream_objs) + [objstm_num]:
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num
        out += stream_objs[num] if num != objstm_num else objstm_obj
        out += b"\nendobj\n"
    xref_at = len(out)

    size = xref_num + 1
    rows = bytearray()
    for num in range(size):
        if num == 0:
            rows += struct.pack(">BIH", 0, 0, 65535)
        elif num in dicts:
            rows += struct.pack(">BIH", 2, objstm_num, packed.index(num))
        elif num == xref_num:
            rows += struct.pack(">BIH", 1, xref_at, 0)
        else:
            rows += struct.pack(">BIH", 1, offsets[num], 0)
    xcomp = zlib.compress(bytes(rows), 6)
    xref_obj = (
        b"<< /Type /XRef /Size %d /Root 1 0 R /W [1 4 2] /Length %d "
        b"/Filter /FlateDecode >>\nstream\n" % (size, len(xcomp))
    ) + xcomp + b"\nendstream"
    out += b"%d 0 obj\n" % xref_num
    out += xref_obj
    out += b"\nendobj\n"
    out += b"startxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out)


def build_pdf(lines: list[str],
              lines_per_page: int = LINES_PER_PAGE,
              two_column: bool = False,
              no_text: bool = False,
              n_empty_pages: int = 1,
              variant: str = "plain",
              text_style: str = "tj") -> bytes:
    """Serialize ``lines`` into a multi-page PDF.

    ``no_text``: emit ``n_empty_pages`` pages with empty content streams
    (a "scanned" document — exercises the quality-0 salvage route).
    ``two_column``: split each page's lines into a left and right x-band
    (reading order = left column top-to-bottom, then right).
    ``variant``: on-disk encoding — ``plain`` | ``flate`` | ``objstm``
    (see module docstring); extracted text is identical for all three.
    ``text_style``: content-stream operator mix — ``tj`` (simple
    ``Tm…Tj``) | ``tjhex`` (Td-relative advances + TJ kerning arrays +
    hex strings); extraction-invariant.
    """
    if variant not in ("plain", "flate", "objstm"):
        raise ValueError(f"unknown variant: {variant}")
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
            streams.append(_content_stream(pls, xs, style=text_style))
        else:
            streams.append(_content_stream(pls, style=text_style))

    n_pages = len(streams)
    compress = variant in ("flate", "objstm")
    # object numbering: 1 catalog, 2 pages, 3 font,
    # then per page i: 4+2i = page, 5+2i = contents
    dicts: dict[int, bytes] = {}
    stream_objs: dict[int, bytes] = {}
    kids = b" ".join(b"%d 0 R" % (4 + 2 * i) for i in range(n_pages))
    dicts[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    dicts[2] = b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n_pages)
    dicts[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    for i, stream in enumerate(streams):
        pno, cno = 4 + 2 * i, 5 + 2 * i
        dicts[pno] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
            % (PAGE_W, PAGE_H, cno)
        )
        stream_objs[cno] = _stream_obj(stream, compress)

    if variant == "objstm":
        return _serialize_objstm(dicts, stream_objs)
    return _serialize_classic({**dicts, **stream_objs},
                              b"1.4" if variant == "plain" else b"1.5")
