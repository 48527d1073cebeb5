"""PDF layout parsing: page/line assembly with reading-order sort.

A from-scratch, stdlib-only layout parser in the pdfminer.six style (page →
text chunks → lines → reading order), replacing the reference's
OpenDataLoader stage (reference: app/services/opendataloader_extractor.py:
83-201 — which parses real-world Flate-compressed PDFs). Steps:

1. structural scan: ``N 0 obj … endobj`` objects with ``/Length``-exact
   stream extraction (binary-safe: scan skips stream payloads, so
   compressed bytes can never masquerade as object headers),
   FlateDecode stream decompression (stdlib zlib), object-stream
   (``/Type /ObjStm``, PDF 1.5 compressed-xref layout) expansion,
   catalog → /Pages → /Kids walk for page order, ``/Contents N 0 R``
   to pair pages with streams (fallbacks: /Type /Page objects in
   object order, then raw stream order)
2. content-stream tokenizer: literal strings with escapes, numbers, names,
   arrays; text ops BT/ET, Tf, TL, Tm, Td, TD, T*, Tj, ', TJ
3. line assembly per page: chunks grouped by y (|dy| <= tolerance), column
   bands split on x gaps > ``column_gap_min`` (two-column reading order:
   left band top-to-bottom, then right), lines sorted top-to-bottom,
   in-line chunks left-to-right
4. page texts join lines with ``\\n``; document text joins pages with
   ``\\n`` — so a page-range shard split (stages/skew) reassembles to the
   identical byte string (SURVEY.md §7.5 hard part #2).

Everything is deterministic: stable tuple sort keys, no dict-order
dependence.
"""

from __future__ import annotations

import re
import time
import zlib
from dataclasses import dataclass, field
from typing import NamedTuple

from .html_extract import Span
from .retry_policy import DocumentTimeout

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?![0-9])(?!\s+\d+\s+R)")
_FLATE_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode\b")
_KIDS_RE = re.compile(rb"/Kids\s*\[([^\]]*)\]")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[([^\]]*)\]")
_ROOT_RE = re.compile(rb"/Root\s+(\d+)\s+\d+\s+R")
_PAGES_RE = re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R")
_TYPE_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_OBJSTM_RE = re.compile(rb"/Type\s*/ObjStm\b")
_FIRST_RE = re.compile(rb"/First\s+(\d+)")
_NOBJS_RE = re.compile(rb"/N\s+(\d+)")
_COUNT_RE = re.compile(rb"/Count\s+(\d+)")


@dataclass
class PdfObject:
    num: int
    body: bytes           # dict part (before any stream)
    stream: bytes | None  # raw (still-encoded) stream payload, if present


def decoded_stream(obj: PdfObject) -> bytes | None:
    """The object's stream with its declared filter applied.

    FlateDecode (the filter every real-world PDF content stream uses —
    stdlib zlib) is supported; an undecodable or unknown-filter stream
    falls back to the raw bytes (lenient, like the rest of the scan).
    """
    if obj.stream is None:
        return None
    if _FLATE_RE.search(obj.body):
        try:
            return zlib.decompress(obj.stream)
        except zlib.error:
            try:  # raw deflate without the zlib header
                return zlib.decompress(obj.stream, wbits=-15)
            except zlib.error:
                return obj.stream
    return obj.stream


def parse_objects(payload: bytes) -> dict[int, PdfObject]:
    """Split a PDF into its indirect objects (sequential structural scan).

    ``/Length``-declared streams are extracted by exact byte count and the
    scan pointer jumps past them, so binary (compressed) stream payloads
    are never mistaken for object boundaries; objects without a literal
    /Length fall back to delimiter search.
    """
    objs: dict[int, PdfObject] = {}
    pos = 0
    n = len(payload)
    while pos < n:
        m = _OBJ_RE.search(payload, pos)
        if m is None:
            break
        num = int(m.group(1))
        start = m.end()
        endobj = payload.find(b"endobj", start)
        sm = _STREAM_RE.search(payload, start,
                               endobj if 0 <= endobj else n)
        if sm is None:
            body = payload[start:endobj if endobj >= 0 else n]
            objs[num] = PdfObject(num, body, None)
            pos = (endobj + 6) if endobj >= 0 else n
            continue
        body = payload[start:sm.start()]
        data_start = sm.end()
        lm = _LENGTH_RE.search(body)
        if lm is not None:
            length = int(lm.group(1))
            stream = payload[data_start:data_start + length]
            after = payload.find(b"endobj", data_start + length)
        else:
            se = payload.find(b"endstream", data_start)
            if se < 0:
                se = n
            stream = payload[data_start:se]
            if stream.endswith(b"\r\n"):
                stream = stream[:-2]
            elif stream.endswith(b"\n"):
                stream = stream[:-1]
            after = payload.find(b"endobj", se)
        objs[num] = PdfObject(num, body, stream)
        pos = (after + 6) if after >= 0 else n
    return objs


def expand_object_streams(objs: dict[int, PdfObject]) -> None:
    """Unpack ``/Type /ObjStm`` objects (PDF 1.5 compressed-xref layout):
    the inflated stream holds N ``objnum offset`` header pairs followed by
    the packed object bodies. Top-level objects win on number conflicts.
    """
    for o in list(objs.values()):
        if o.stream is None or not _OBJSTM_RE.search(o.body):
            continue
        fm = _FIRST_RE.search(o.body)
        nm = _NOBJS_RE.search(o.body)
        data = decoded_stream(o)
        if data is None or fm is None or nm is None:
            continue
        first = int(fm.group(1))
        count = int(nm.group(1))
        header = data[:first].split()
        if len(header) < 2 * count or not all(
                t.isdigit() for t in header[:2 * count]):
            continue  # corrupt/undecodable ObjStm: skip, never raise
        offsets = [int(header[2 * k + 1]) for k in range(count)]
        for k in range(count):
            num = int(header[2 * k])
            lo = first + offsets[k]
            hi = first + offsets[k + 1] if k + 1 < count else len(data)
            objs.setdefault(num, PdfObject(num, data[lo:hi], None))


def parse_all_objects(payload: bytes) -> dict[int, PdfObject]:
    """Structural scan + object-stream expansion."""
    objs = parse_objects(payload)
    expand_object_streams(objs)
    return objs


def page_content_streams(payload: bytes) -> list[bytes]:
    """Per-page DECODED content streams in page-tree order (with
    fallbacks)."""
    objs = parse_all_objects(payload)

    def contents_of(page: PdfObject) -> bytes:
        m = _CONTENTS_RE.search(page.body)
        if m:
            c = objs.get(int(m.group(1)))
            if c is not None and c.stream is not None:
                return decoded_stream(c) or b""
        am = _CONTENTS_ARR_RE.search(page.body)
        if am:  # array form: streams concatenate in order (PDF spec)
            parts = []
            for rm in _REF_RE.finditer(am.group(1)):
                c = objs.get(int(rm.group(1)))
                if c is not None and c.stream is not None:
                    parts.append(decoded_stream(c) or b"")
            return b"\n".join(parts)
        return b""

    # primary: walk catalog → pages tree
    root_num = None
    tail = payload[-2048:]
    m = _ROOT_RE.search(tail)
    if m:
        root_num = int(m.group(1))
    else:
        for o in objs.values():
            if b"/Type" in o.body and b"/Catalog" in o.body:
                root_num = o.num
                break
    if root_num is not None and root_num in objs:
        pm = _PAGES_RE.search(objs[root_num].body)
        if pm:
            pages: list[bytes] = []

            def walk(num: int, depth: int = 0) -> None:
                if depth > 64 or num not in objs:
                    return
                node = objs[num]
                km = _KIDS_RE.search(node.body)
                if km:
                    for rm in _REF_RE.finditer(km.group(1)):
                        walk(int(rm.group(1)), depth + 1)
                elif _TYPE_PAGE_RE.search(node.body):
                    pages.append(contents_of(node))

            walk(int(pm.group(1)))
            if pages:
                return pages

    # fallback 1: /Type /Page objects in object-number order
    pages = [contents_of(o) for o in sorted(objs.values(), key=lambda o: o.num)
             if _TYPE_PAGE_RE.search(o.body)]
    if pages:
        return pages
    # fallback 2: every non-ObjStm stream in object order
    return [decoded_stream(o) or b""
            for o in sorted(objs.values(), key=lambda o: o.num)
            if o.stream is not None and not _OBJSTM_RE.search(o.body)]


def page_count(payload: bytes) -> int:
    """Cheap page count for skew routing — no text tokenization.

    Raw-byte probes first (/Count in the page tree, /Type /Page
    occurrences); a compressed-xref PDF keeps its page tree inside an
    object stream, so the fallback inflates ObjStm objects (still far
    cheaper than tokenizing content)."""
    # prefer /Count entries that co-occur with a /Pages node (an
    # /Outlines or interior-subtree Count appearing first in file order
    # must not win); the root node's total is the max of those
    # bytes() on the window: `in` over a memoryview slice compares
    # elementwise ints and would silently disable this guard for the
    # zero-copy sniff path
    page_counts = [int(m.group(1)) for m in _COUNT_RE.finditer(payload)
                   if b"/Pages" in bytes(payload[max(0, m.start() - 256):
                                                 m.end() + 256])]
    if page_counts:
        return max(page_counts)
    m = _COUNT_RE.search(payload)
    if m:
        return int(m.group(1))
    raw_pages = len(_TYPE_PAGE_RE.findall(payload))
    if raw_pages:
        return raw_pages
    if _OBJSTM_RE.search(payload):
        # accept memoryviews from the zero-copy sniff path; the copy is
        # confined to compressed-xref PDFs that actually need the scan
        objs = parse_all_objects(bytes(payload))
        best = 0
        n_pages = 0
        for o in objs.values():
            if _TYPE_PAGE_RE.search(o.body):
                n_pages += 1
            cm = _COUNT_RE.search(o.body)
            if cm and b"/Pages" in o.body:
                best = max(best, int(cm.group(1)))
        if best or n_pages:
            return best or n_pages
    return 1


# ---------------------------------------------------------------------------
# Content-stream tokenizer
# ---------------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")

_OCTAL = {c: i for i, c in enumerate(b"01234567")}


def _parse_literal(buf: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ``(…)`` literal string starting at ``buf[i] == '('``."""
    # fast path: no escapes and no nested parens before the closing paren
    j = buf.find(b")", i + 1)
    if j >= 0:
        chunk = buf[i + 1:j]
        if b"\\" not in chunk and b"(" not in chunk:
            return chunk, j + 1
    out = bytearray()
    depth = 1
    i += 1
    n = len(buf)
    while i < n:
        c = buf[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = buf[i]
            if e in b"nrtbf":
                out += {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                        0x62: b"\b", 0x66: b"\f"}[e]
            elif e in b"()\\":
                out.append(e)
            elif e in b"01234567":
                val = _OCTAL[e]
                for _ in range(2):
                    if i + 1 < n and buf[i + 1] in b"01234567":
                        i += 1
                        val = val * 8 + _OCTAL[buf[i]]
                out.append(val & 0xFF)
            elif e == 0x0A:
                pass  # line continuation
            else:
                out.append(e)
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
        else:
            out.append(c)
        i += 1
    return bytes(out), i


class TextChunk(NamedTuple):
    # NamedTuple (not dataclass): C-speed construction — one is built per
    # show operator, the single hottest allocation in the PDF parse
    x: float
    y: float
    text: str


# fast-path scanner: the two positioned-show forms the wild overwhelmingly
# uses — an absolute integer ``Tm`` translate OR a ``0 dy Td`` relative
# line advance, followed by either a literal ``(…) Tj`` or a one-hex-one-
# literal kerning array ``[<hex> k (…)] TJ``. Only used when the WHOLE
# stream provably consists of these plus BT/ET/Tf framing — anything else
# falls back to the general operator loop below.
_SIMPLE_SHOW = re.compile(
    rb"(?:(BT)"          # matched (not residue) so Td runs reset with it
    rb"|(?:1 0 0 1 (-?\d+) (-?\d+) Tm|0 (-?\d+) Td) "
    rb"(?:\(((?:[^()\\]|\\.)*+)\) Tj"
    rb"|\[<([0-9A-Fa-f]*+)> -?\d+ \(((?:[^()\\]|\\.)*+)\)\] TJ))")
# possessive quantifiers: a residue MISmatch must fail fast — with
# backtracking quantifiers a long non-matching residue is catastrophic
_SIMPLE_RESIDUE = re.compile(
    rb"^(?:\s++|BT|ET|/[A-Za-z0-9]++\s++\d++\s++Tf)*+$")


def _tokenize_fast(stream: bytes) -> list[TextChunk] | None:
    # single pass: validate each BETWEEN-match gap as we go (the common
    # gap is one whitespace byte — ``isspace`` short-circuits the residue
    # regex), dispatch on ``lastindex`` (5 = literal Tj, 7 = hex-array TJ,
    # 1 = BT) instead of fetching all seven groups. Validation is strictly
    # conservative — any unrecognized residue falls back to the full
    # tokenizer, which handles it correctly.
    out: list[TextChunk] = []
    lx = ly = 0.0
    prev = 0
    matched = False
    residue = _SIMPLE_RESIDUE.match
    parse_lit = _parse_literal
    append = out.append
    for m in _SIMPLE_SHOW.finditer(stream):
        matched = True
        s = m.start()
        if s != prev:
            gap = stream[prev:s]
            if not (gap.isspace() or residue(gap)):
                return None
        prev = m.end()
        li = m.lastindex
        if li == 1:           # BT resets the text matrix
            lx = ly = 0.0
            continue
        tmx = m.group(2)
        if tmx is not None:   # absolute translate
            lx, ly = float(tmx), float(m.group(3))
        else:                 # 0 dy Td relative advance
            ly += float(m.group(4))
        if li == 5:           # (…) Tj
            raw = m.group(5)
            if b"\\" in raw:
                raw = parse_lit(b"(" + raw + b")", 0)[0]
        else:                 # [<hex> k (…)] TJ
            hexs = m.group(6)
            if len(hexs) & 1:
                hexs += b"0"
            lit2 = m.group(7)
            if b"\\" in lit2:
                lit2 = parse_lit(b"(" + lit2 + b")", 0)[0]
            raw = bytes.fromhex(hexs.decode()) + lit2
        append(TextChunk(lx, ly, raw.decode("utf-8", errors="replace")))
    if not matched:
        return None
    if prev != len(stream):
        gap = stream[prev:]
        if not (gap.isspace() or residue(gap)):
            return None
    return out


def tokenize_text_ops(stream: bytes,
                      deadline: float | None = None) -> list[TextChunk]:
    """Run the text operators of one content stream; emit positioned chunks.

    ``deadline`` (monotonic seconds): cooperative timeout for pathological
    documents (SURVEY.md §4 per-row wall-clock guard) — checked every few
    thousand tokens, raising DocumentTimeout.
    """
    fast = _tokenize_fast(stream)
    if fast is not None:
        if deadline is not None and time.monotonic() > deadline:
            raise DocumentTimeout("content-stream tokenization over budget")
        return fast
    chunks: list[TextChunk] = []
    operands: list[object] = []
    x = y = 0.0
    lx = ly = 0.0  # line start (for T*)
    leading = 0.0
    i, n = 0, len(stream)
    budget_probe = 0

    def emit(text: bytes) -> None:
        chunks.append(TextChunk(x, y, text.decode("utf-8", errors="replace")))

    while i < n:
        if deadline is not None:
            budget_probe += 1
            if budget_probe % 4096 == 0 and time.monotonic() > deadline:
                raise DocumentTimeout("content-stream tokenization over budget")
        c = stream[i]
        if c in _WS:
            i += 1
            continue
        if c == 0x25:  # % comment
            j = stream.find(b"\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == 0x28:  # literal string
            s, i = _parse_literal(stream, i)
            operands.append(s)
            continue
        if c == 0x3C and i + 1 < n and stream[i + 1] == 0x3C:  # << dict
            depth = 1
            i += 2
            while i < n and depth:
                if stream.startswith(b"<<", i):
                    depth += 1
                    i += 2
                elif stream.startswith(b">>", i):
                    depth -= 1
                    i += 2
                else:
                    i += 1
            continue
        if c == 0x3C:  # hex string
            j = stream.find(b">", i)
            if j < 0:
                break
            hexs = re.sub(rb"[^0-9A-Fa-f]", b"", stream[i + 1:j])
            if len(hexs) % 2:
                hexs += b"0"
            operands.append(bytes.fromhex(hexs.decode()))
            i = j + 1
            continue
        if c in b"[]":
            operands.append(b"[" if c == 0x5B else b"]")
            i += 1
            continue
        if c == 0x2F:  # name
            j = i + 1
            while j < n and stream[j] not in _WS and stream[j] not in _DELIM:
                j += 1
            operands.append(stream[i:j])
            i = j
            continue
        m = _NUM_RE.match(stream, i)
        if m and (c in b"0123456789+-." ):
            operands.append(float(m.group()))
            i = m.end()
            continue
        # operator word
        j = i
        while j < n and stream[j] not in _WS and stream[j] not in _DELIM:
            j += 1
        op = stream[i:j] if j > i else stream[i:i + 1]
        i = j if j > i else i + 1

        if op == b"BT":
            x = y = lx = ly = 0.0
        elif op == b"Tm" and len(operands) >= 6:
            x = lx = float(operands[-2])  # type: ignore[arg-type]
            y = ly = float(operands[-1])  # type: ignore[arg-type]
        elif op in (b"Td", b"TD") and len(operands) >= 2:
            lx += float(operands[-2])  # type: ignore[arg-type]
            ly += float(operands[-1])  # type: ignore[arg-type]
            if op == b"TD":
                leading = -float(operands[-1])  # type: ignore[arg-type]
            x, y = lx, ly
        elif op == b"TL" and operands:
            leading = float(operands[-1])  # type: ignore[arg-type]
        elif op == b"T*":
            ly -= leading
            x, y = lx, ly
        elif op == b"Tj" and operands and isinstance(operands[-1], bytes):
            emit(operands[-1])
        elif op == b"'" and operands and isinstance(operands[-1], bytes):
            ly -= leading
            x, y = lx, ly
            emit(operands[-1])
        elif op == b'"' and operands and isinstance(operands[-1], bytes):
            # set word/char spacing + advance + show: spacing operands
            # are layout-only, the string still renders on the next line
            ly -= leading
            x, y = lx, ly
            emit(operands[-1])
        elif op == b"TJ":
            # concatenate the string items of the trailing [ … ] array
            parts: list[bytes] = []
            k = len(operands) - 1
            if k >= 0 and operands[k] == b"]":
                k -= 1
                while k >= 0 and operands[k] != b"[":
                    v = operands[k]
                    if isinstance(v, bytes) and v not in (b"[", b"]"):
                        parts.append(v)
                    k -= 1
            if parts:
                emit(b"".join(reversed(parts)))
        operands.clear()
    return chunks


# ---------------------------------------------------------------------------
# Line / column assembly
# ---------------------------------------------------------------------------

# deterministic layout estimates for element bounding boxes (the corpus
# emits 12pt type; a fixed 7-unit advance keeps bboxes integer and
# oracle-expressible — reference analog: BoundingBox per element,
# app/models/extraction.py:169-181)
CHAR_W = 7
LINE_H = 12
# chunks in one line further apart than this are separate table cells and
# join with "\t"; closer chunks are kerning splits and join seamlessly
CELL_GAP_MIN = 40.0


@dataclass
class PdfLine:
    """One reading-ordered line: joined text + the chunk x-signature
    (used for table-run detection) and a bbox estimate."""
    text: str
    y: float
    xs: tuple[float, ...]      # chunk x origins, ascending
    x1: float                  # right edge estimate


def assemble_line_objs(chunks: list[TextChunk],
                       y_tolerance: float = 2.0,
                       column_gap_min: float = 120.0) -> list[PdfLine]:
    """Chunks → reading-ordered PdfLine objects for one page."""
    if not chunks:
        return []
    # column bands: cluster chunk x-origins on gaps > column_gap_min
    xs = sorted({c.x for c in chunks})
    bands: list[float] = [xs[0]]
    for prev, v in zip(xs, xs[1:]):
        # adjacent-gap split (the documented rule): comparing to the
        # band START instead wrongly split gradually-spread lines and
        # wide table rows into bogus columns
        if v - prev > column_gap_min:
            bands.append(v)

    def band_of(cx: float) -> int:
        b = 0
        for k, start in enumerate(bands):
            if cx >= start - column_gap_min / 2:
                b = k
        return b

    def emit(cur: list[TextChunk], y: float) -> PdfLine:
        if len(cur) == 1:  # dominant case: one chunk per line
            t = cur[0]
            return PdfLine(t.text, y, (t.x,), t.x + CHAR_W * len(t.text))
        cur = sorted(cur, key=lambda t: t.x)
        parts: list[str] = []
        for k, t in enumerate(cur):
            if k > 0 and t.x - cur[k - 1].x >= CELL_GAP_MIN:
                parts.append("\t")
            parts.append(t.text)
        last = cur[-1]
        return PdfLine("".join(parts), y, tuple(t.x for t in cur),
                       last.x + CHAR_W * len(last.text))

    lines: list[PdfLine] = []
    for b in range(len(bands)):
        # single-column page (the dominant case): every chunk is band 0
        band_chunks = (list(chunks) if len(bands) == 1 else
                       [c for c in chunks if band_of(c.x) == b])
        band_chunks.sort(key=lambda c: (-c.y, c.x))
        cur_y: float | None = None
        cur: list[TextChunk] = []
        for c in band_chunks:
            if cur_y is None or abs(c.y - cur_y) > y_tolerance:
                if cur:
                    lines.append(emit(cur, cur_y))
                cur = [c]
                cur_y = c.y
            else:
                cur.append(c)
        if cur:
            lines.append(emit(cur, cur_y))
    return lines


def assemble_lines(chunks: list[TextChunk],
                   y_tolerance: float = 2.0,
                   column_gap_min: float = 120.0) -> list[str]:
    """Chunks → reading-ordered text lines for one page."""
    return [ln.text for ln in assemble_line_objs(chunks, y_tolerance,
                                                 column_gap_min)]


def mark_table_lines(lines: list[tuple[int, PdfLine]]) -> list[bool]:
    """Which lines are table rows: maximal runs of >= 2 CONSECUTIVE lines
    sharing an identical multi-chunk x-signature (aligned cells across
    rows — the layout signature of a table). ``lines`` carries global
    (page, line) order so runs may straddle page boundaries.
    """
    flags = [False] * len(lines)
    i = 0
    while i < len(lines):
        _, ln = lines[i]
        if len(ln.xs) < 2:
            i += 1
            continue
        j = i + 1
        while j < len(lines) and lines[j][1].xs == ln.xs:
            j += 1
        if j - i >= 2:
            for k in range(i, j):
                flags[k] = True
        i = j
    return flags


class Element(NamedTuple):
    """One layout element with its page and bbox (SURVEY.md §1.2
    ``elements: list<struct>``; reference: the OpenDataLoader bounding
    boxes keyed {type}_{page}_{idx},
    app/services/opendataloader_extractor.py:156-171)."""
    kind: str
    page: int
    x0: int
    y0: int
    x1: int
    y1: int


@dataclass
class PdfExtract:
    text: str
    spans: list[Span] = field(default_factory=list)
    element_count: int = 0   # total lines (quality's structure input)
    n_pages: int = 0
    table_row_counts: list[int] = field(default_factory=list)
    elements: list[Element] = field(default_factory=list)


def extract_pdf_pages(streams: list[bytes],
                      first_page: int = 1,
                      y_tolerance: float = 2.0,
                      column_gap_min: float = 120.0,
                      deadline: float | None = None) -> PdfExtract:
    """Extract text from per-page content streams.

    ``first_page`` sets the page numbers recorded in spans — page-range
    shards pass their absolute page offset so reassembled spans match a
    whole-document parse. Table runs are detected over the global line
    order (a table may straddle page boundaries within one call; the
    skew-shard path's partitioning assumption is that oversized documents
    carry no cross-SHARD tables).
    """
    page_lines: list[tuple[int, PdfLine]] = []
    for p, stream in enumerate(streams):
        for ln in assemble_line_objs(tokenize_text_ops(stream, deadline),
                                     y_tolerance, column_gap_min):
            page_lines.append((first_page + p, ln))

    table_flags = mark_table_lines(page_lines)
    table_row_counts: list[int] = []
    run = 0
    for f in table_flags:
        if f:
            run += 1
        elif run:
            table_row_counts.append(run)
            run = 0
    if run:
        table_row_counts.append(run)

    parts: list[str] = []
    spans: list[Span] = []
    elements: list[Element] = []
    pos = 0
    for (page_no, ln), is_table in zip(page_lines, table_flags):
        if parts:
            pos += 1  # "\n"
        kind = "table" if is_table else "line"
        spans.append(Span(pos, pos + len(ln.text), kind, page_no))
        elements.append(Element(kind, page_no, int(ln.xs[0]), int(ln.y),
                                int(ln.x1), int(ln.y) + LINE_H))
        parts.append(ln.text)
        pos += len(ln.text)
    return PdfExtract(
        text="\n".join(parts),
        spans=spans,
        element_count=len(page_lines),
        n_pages=len(streams),
        table_row_counts=table_row_counts,
        elements=elements,
    )


def extract_pdf(payload: bytes,
                y_tolerance: float = 2.0,
                column_gap_min: float = 120.0,
                deadline: float | None = None) -> PdfExtract:
    """Whole-document PDF extraction (pages joined with ``\\n``)."""
    return extract_pdf_pages(page_content_streams(payload), 1,
                             y_tolerance, column_gap_min, deadline)
