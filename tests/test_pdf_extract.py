"""Unit tests: PDF writer + layout parser (FIXTURES.md F3 pdf fixtures)."""

from pdf_extraction_ray.functions import pdf_extract
from pdf_extraction_ray.sources.gen_pdf import build_pdf


def test_one_page_reading_order():
    pdf = build_pdf(["first line", "second line", "third line"])
    r = pdf_extract.extract_pdf(pdf)
    assert r.text == "first line\nsecond line\nthird line"
    assert r.n_pages == 1
    assert r.element_count == 3
    assert [s.page for s in r.spans] == [1, 1, 1]


def test_spans_offsets():
    pdf = build_pdf(["ab", "cde"])
    r = pdf_extract.extract_pdf(pdf)
    assert [(s.start, s.end) for s in r.spans] == [(0, 2), (3, 6)]
    assert all(s.kind == "line" for s in r.spans)


def test_escapes_roundtrip():
    lines = ["parens (x) and \\ backslash", "tab\tand ) close"]
    r = pdf_extract.extract_pdf(build_pdf(lines))
    assert r.text == "\n".join(lines)


def test_empty_lines_preserved():
    lines = ["a", "", "b"]
    r = pdf_extract.extract_pdf(build_pdf(lines))
    assert r.text == "a\n\nb"


def test_multipage_order():
    lines = [f"PAGE-LINE-{i:03d}" for i in range(100)]
    pdf = build_pdf(lines, lines_per_page=45)
    r = pdf_extract.extract_pdf(pdf)
    assert r.text == "\n".join(lines)
    assert r.n_pages == 3
    assert r.spans[0].page == 1 and r.spans[-1].page == 3


def test_page_count_cheap():
    pdf = build_pdf([f"l{i}" for i in range(100)], lines_per_page=10)
    assert pdf_extract.page_count(pdf) == 10


def test_two_column_reading_order():
    lines = ["L1", "L2", "L3", "R1", "R2", "R3"]
    pdf = build_pdf(lines, two_column=True)
    r = pdf_extract.extract_pdf(pdf)
    assert r.text == "L1\nL2\nL3\nR1\nR2\nR3"


def test_no_text_pdf():
    pdf = build_pdf([], no_text=True, n_empty_pages=2)
    r = pdf_extract.extract_pdf(pdf)
    assert r.text == ""
    assert r.element_count == 0
    assert r.n_pages == 2


def test_fragment_extraction_equals_whole(
        ):
    """Page-range shards reassemble to the whole-document parse
    (SURVEY.md §7.5 hard part #2)."""
    lines = [f"line {i} of the big document" for i in range(200)]
    pdf = build_pdf(lines, lines_per_page=20)
    whole = pdf_extract.extract_pdf(pdf)
    streams = pdf_extract.page_content_streams(pdf)
    assert len(streams) == 10
    parts = []
    for lo in range(0, 10, 3):
        frag = pdf_extract.extract_pdf_pages(streams[lo:lo + 3], first_page=lo + 1)
        parts.append(frag.text)
    assert "\n".join(parts) == whole.text
    # fragment page numbering is absolute
    frag = pdf_extract.extract_pdf_pages(streams[3:6], first_page=4)
    assert {s.page for s in frag.spans} == {4, 5, 6}


def test_tj_array_concatenation():
    # hand-built stream: TJ with kerning numbers between strings
    stream = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm [(Hel) -20 (lo) 5 ( world)] TJ ET"
    chunks = pdf_extract.tokenize_text_ops(stream)
    assert len(chunks) == 1 and chunks[0].text == "Hello world"


def test_td_relative_positioning():
    stream = (b"BT /F1 12 Tf 72 700 Td (one) Tj 0 -14 Td (two) Tj "
              b"0 -14 Td (three) Tj ET")
    lines = pdf_extract.assemble_lines(pdf_extract.tokenize_text_ops(stream))
    assert lines == ["one", "two", "three"]


def test_tstar_and_quote():
    stream = b"BT /F1 12 Tf 14 TL 72 700 Td (a) Tj T* (b) Tj (c) ' ET"
    lines = pdf_extract.assemble_lines(pdf_extract.tokenize_text_ops(stream))
    assert lines == ["a", "b", "c"]


def test_octal_escape():
    stream = b"BT 72 700 Td (A\\101B) Tj ET"
    chunks = pdf_extract.tokenize_text_ops(stream)
    assert chunks[0].text == "AAB"


def test_malformed_pdf_fallback():
    # no page tree: falls back to stream order
    payload = (b"%PDF-1.4\n1 0 obj\n<< /Length 30 >>\nstream\n"
               b"BT 72 700 Td (orphan) Tj ET\nendstream\nendobj\n")
    r = pdf_extract.extract_pdf(payload)
    assert r.text == "orphan"


def test_flate_variant_identical_extraction():
    lines = [f"line {i} of the flate test document" for i in range(100)]
    ref = pdf_extract.extract_pdf(build_pdf(lines))
    for variant in ("flate", "objstm"):
        pdf = build_pdf(lines, variant=variant)
        got = pdf_extract.extract_pdf(pdf)
        assert got.text == ref.text
        assert got.spans == ref.spans
        assert got.n_pages == ref.n_pages
        assert len(pdf) < len(build_pdf(lines))  # actually compressed


def test_page_count_all_variants():
    lines = [f"l{i}" for i in range(200)]  # 5 pages at 45/page
    for variant in ("plain", "flate", "objstm"):
        assert pdf_extract.page_count(build_pdf(lines, variant=variant)) == 5


def test_length_exact_stream_with_embedded_delimiters():
    """A /Length-declared stream may contain 'endstream'/'N 0 obj' bytes
    (routine for compressed data); the scan must not split on them."""
    body = b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (hello) Tj ET\n% endstream 7 0 obj"
    raw = (b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
           b"4 0 obj\n<< /Length " + str(len(body)).encode()
           + b" >>\nstream\n" + body + b"\nendstream\nendobj\n"
           b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n")
    assert pdf_extract.extract_pdf(raw).text == "hello"


def test_objstm_expansion_and_variant_mix():
    """The big-PDF shard path consumes decoded streams for every variant."""
    lines = [f"content row {i}" for i in range(150)]
    for variant in ("flate", "objstm"):
        pdf = build_pdf(lines, variant=variant)
        streams = pdf_extract.page_content_streams(pdf)
        assert len(streams) == 4
        # decoded: tokenizable plain text ops, not zlib bytes
        assert streams[0].startswith(b"BT")
        whole = pdf_extract.extract_pdf(pdf)
        parts = [pdf_extract.extract_pdf_pages([s], first_page=i + 1)
                 for i, s in enumerate(streams)]
        assert "\n".join(p.text for p in parts) == whole.text


def test_table_run_detection_and_elements():
    """Aligned multi-chunk rows become a table run; bbox elements carry
    the layout estimate; cells join with tabs."""
    lines = ["intro line one", "intro line two",
             ["a1", "b1"], ["a2", "b2"], ["a3", "b3"],
             "outro line"]
    pdf = build_pdf(lines)
    r = pdf_extract.extract_pdf(pdf)
    assert r.text == ("intro line one\nintro line two\n"
                      "a1\tb1\na2\tb2\na3\tb3\noutro line")
    assert r.table_row_counts == [3]
    kinds = [s.kind for s in r.spans]
    assert kinds == ["line", "line", "table", "table", "table", "line"]
    assert [e.kind for e in r.elements] == kinds
    e0 = r.elements[0]
    assert (e0.x0, e0.y0) == (72, 720)
    assert e0.x1 == 72 + 7 * len("intro line one")
    assert e0.y1 == 720 + 12
    et = r.elements[2]  # first table row: cells at x=72 and x=170
    assert et.x0 == 72
    assert et.x1 == 72 + 98 + 7 * len("b1")


def test_isolated_multichunk_line_is_not_a_table():
    lines = ["plain", ["c1", "c2"], "plain two"]
    r = pdf_extract.extract_pdf(build_pdf(lines))
    assert r.table_row_counts == []
    assert [s.kind for s in r.spans] == ["line", "line", "line"]
    assert r.text == "plain\nc1\tc2\nplain two"  # tab join still applies


def test_table_straddling_page_boundary():
    filler = [f"filler {i}" for i in range(44)]
    rows = [["x1", "y1"], ["x2", "y2"], ["x3", "y3"]]
    r = pdf_extract.extract_pdf(build_pdf(filler + rows, lines_per_page=45))
    assert r.n_pages == 2
    assert r.table_row_counts == [3]  # run crosses the page break
    assert [s.page for s in r.spans if s.kind == "table"] == [1, 2, 2]


def test_pdf_table_quality_term():
    """A table-heavy PDF earns the 15% table term (reference formula,
    app/services/opendataloader_extractor.py:45-80) — the round-1 gap."""
    from pdf_extraction_ray.functions.quality import quality_score_pct
    lines = [f"padding line {i} abcdefghijklmnopqrstuvwxyz" for i in range(30)]
    rows = [[f"k{i}", f"v{i}"] for i in range(5)]
    r = pdf_extract.extract_pdf(build_pdf(lines + rows))
    base = quality_score_pct(len(r.text), r.element_count, 0, [])
    with_tables = quality_score_pct(len(r.text), r.element_count, 0,
                                    r.table_row_counts)
    assert r.table_row_counts == [5]
    assert with_tables == base + 15


def test_fast_path_negative_coords_and_no_backtracking():
    """The tokenizer fast path handles signed Tm coordinates, and a
    non-matching residue fails FAST (possessive quantifiers — a plain
    residue regex backtracks catastrophically on long streams)."""
    import time
    s = b"BT\n/F1 12 Tf\n1 0 0 1 72 -50 Tm (neg) Tj\nET"
    chunks = pdf_extract.tokenize_text_ops(s)
    assert [(c.x, c.y, c.text) for c in chunks] == [(72.0, -50.0, "neg")]

    # stream the fast path must REJECT (a Td operator), large enough that
    # any backtracking blowup would stall for minutes
    lines = b"\n".join(b"1 0 0 1 72 %d Tm (line %d) Tj" % (700 - i, i)
                       for i in range(5000))
    bad = b"BT\n" + lines + b"\n10 10 Td\nET"
    t0 = time.monotonic()
    chunks = pdf_extract.tokenize_text_ops(bad)
    assert time.monotonic() - t0 < 5.0
    assert len(chunks) == 5000  # general loop parsed it fine


def test_two_column_elements_geometry():
    """Two-column layout: reading order is left band then right; elements
    carry the band x origins; text equals the single-column layout."""
    lines = [f"line number {i}" for i in range(11)]
    one = pdf_extract.extract_pdf(build_pdf(lines))
    two = pdf_extract.extract_pdf(build_pdf(lines, two_column=True))
    assert two.text == one.text  # reading order is text-invariant
    xs = [e.x0 for e in two.elements]
    assert xs == [72] * 6 + [320] * 5  # ceil(11/2) left, rest right
    # left band rows stack from the top; right band restarts at the top
    assert [e.y0 for e in two.elements][:2] == [720, 706]
    assert two.elements[6].y0 == 720


def test_malformed_objstm_never_raises():
    """A /Type /ObjStm whose stream is not valid zlib (header tokens are
    garbage) must be skipped, not crash page_count/parse."""
    from pdf_extraction_ray.functions import pdf_extract as P
    bad = (b"%PDF-1.5\n1 0 obj\n"
           b"<< /Type /ObjStm /N 1 /First 10 /Length 8 >>\n"
           b"stream\nAB CD EF\nendstream\nendobj")
    assert P.page_count(bad) >= 0
    P.parse_all_objects(bad)  # must not raise


def test_indirect_length_not_truncated():
    """'/Length 123 0 R' (indirect, multi-digit) must not match as a
    direct length of 12 — that truncated streams and desynced the
    object scan."""
    from pdf_extraction_ray.functions.pdf_extract import _LENGTH_RE
    assert _LENGTH_RE.search(b"<< /Length 123 0 R >>") is None
    assert _LENGTH_RE.search(b"<< /Length 7 0 R >>") is None
    assert _LENGTH_RE.search(b"<< /Length 123 >>").group(1) == b"123"
    assert _LENGTH_RE.search(b"<< /Length 8 /Filter /FlateDecode >>"
                             ).group(1) == b"8"


def test_tjhex_style_extraction_invariant():
    """The Td/TJ/hex operator mix must extract byte-identically to the
    simple Tm/Tj form across encodings and layouts (corpus v8 cycles
    it through every pipeline oracle)."""
    import itertools
    from pdf_extraction_ray.sources import gen_pdf
    from pdf_extraction_ray.functions import pdf_extract
    cases = [
        [f"word{i} alpha (x) \\ beta" for i in range(12)],
        [["c1", "c2"], ["d1", "d2"], "tail line"],
    ]
    for lines, two_col, variant in itertools.product(
            cases, (False, True), ("plain", "flate", "objstm")):
        a = gen_pdf.build_pdf(lines, two_column=two_col, variant=variant,
                              text_style="tj")
        b = gen_pdf.build_pdf(lines, two_column=two_col, variant=variant,
                              text_style="tjhex")
        ea, eb = pdf_extract.extract_pdf(a), pdf_extract.extract_pdf(b)
        assert ea.text == eb.text
        assert list(ea.spans) == list(eb.spans)
        assert ea.table_row_counts == eb.table_row_counts


def test_quote_operator_shows_text():
    """The '"' (spacing + advance + show) operator must render its
    string like the sibling ' operator."""
    from pdf_extraction_ray.functions import pdf_extract as P
    s = (b"BT /F1 12 Tf 14 TL 1 0 0 1 72 700 Tm (line one) Tj "
         b'2 1 (line two) " ET')
    frag = P.extract_pdf_pages([s], 1, 2.0, 120.0)
    assert frag.text == "line one\nline two"


def test_gradual_spread_stays_one_line():
    """Adjacent-gap column splitting: x positions 0/60/120/180 have no
    adjacent gap above column_gap_min, so they are ONE tab-joined line
    (the band-anchored logic wrongly split them into two columns)."""
    from pdf_extraction_ray.functions import pdf_extract as P
    s = b"BT /F1 12 Tf " + b" ".join(
        b"1 0 0 1 %d 700 Tm (c%d) Tj" % (x, x)
        for x in (0, 60, 120, 180)) + b" ET"
    frag = P.extract_pdf_pages([s], 1, 2.0, 120.0)
    assert frag.text == "c0\tc60\tc120\tc180"


def test_contents_array_form():
    """'/Contents [a 0 R b 0 R]' pages concatenate their streams."""
    from pdf_extraction_ray.functions import pdf_extract as P
    body = (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
            b"/Contents [4 0 R 5 0 R] >>\nendobj\n"
            b"4 0 obj\n<< /Length 44 >>\nstream\n"
            b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (part A) Tj ET\nendstream\nendobj\n"
            b"5 0 obj\n<< /Length 44 >>\nstream\n"
            b"BT /F1 12 Tf 1 0 0 1 72 686 Tm (part B) Tj ET\nendstream\nendobj\n")
    out = P.extract_pdf(body)
    assert out.text == "part A\npart B"


def test_page_count_prefers_pages_context():
    """An /Outlines /Count appearing first must not win over the page
    tree's /Count."""
    from pdf_extraction_ray.functions import pdf_extract as P
    payload = (b"%PDF-1.4\n"
               b"9 0 obj\n<< /Type /Outlines /Count 3 >>\nendobj\n"
               b"2 0 obj\n<< /Type /Pages /Kids [] /Count 250 >>\nendobj\n")
    assert P.page_count(payload) == 250
