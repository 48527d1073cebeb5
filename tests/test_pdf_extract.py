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
