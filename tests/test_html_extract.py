"""Unit tests: HTML boilerplate stripper (FIXTURES.md F3 micro-documents;
reference test analog: tests/test_opendataloader_extractor.py)."""

from pdf_extraction_ray.functions.html_extract import extract_html


def test_trivial():
    r = extract_html(b"<html><body><p>Hello</p></body></html>")
    assert r.text == "Hello"
    assert r.element_count == 1
    assert [(s.start, s.end, s.kind) for s in r.spans] == [(0, 5, "paragraph")]


def test_boilerplate_stripped():
    nav = "".join(f'<li><a href="/{i}">link {i}</a></li>' for i in range(20))
    html = (f"<html><body><nav><ul>{nav}</ul></nav>"
            "<article><p>real content here</p></article>"
            '<footer><p><a href="/a">about</a> <a href="/b">legal</a></p></footer>'
            "</body></html>")
    r = extract_html(html.encode())
    assert r.text == "real content here"


def test_junk_class_stripped():
    html = ('<html><body><div class="sidebar-widget"><p>subscribe now</p></div>'
            "<article><p>keep me</p></article></body></html>")
    assert extract_html(html.encode()).text == "keep me"


def test_link_density_49_kept():
    link, plain = "a" * 49, "b" * 51
    html = f'<div><p><a href="#">{link}</a>{plain}</p></div>'
    assert extract_html(html.encode()).text == link + plain


def test_link_density_51_dropped():
    link, plain = "a" * 51, "b" * 49
    html = f'<div><p><a href="#">{link}</a>{plain}</p><p>other text</p></div>'
    assert extract_html(html.encode()).text == "other text"


def test_nested_layout_tables():
    html = ("<html><body><table><tr><td>"
            "<article><p>content in a layout cell</p></article>"
            "</td></tr></table></body></html>")
    assert extract_html(html.encode()).text == "content in a layout cell"


def test_data_table_rows():
    html = ("<article><p>intro</p><table>"
            "<tr><td>a</td><td>b</td></tr>"
            "<tr><td>c</td><td>d</td></tr>"
            "<tr><td>e</td><td>f</td></tr>"
            "<tr><td>g</td><td>h</td></tr></table></article>")
    r = extract_html(html.encode())
    assert r.text == "intro\n\na\tb\n\nc\td\n\ne\tf\n\ng\th"
    assert r.table_row_counts == [4]
    assert [s.kind for s in r.spans] == ["paragraph"] + ["table"] * 4


def test_headings_and_kinds():
    html = ("<article><h1>Title</h1><h2>Sub</h2><p>body</p>"
            "<ul><li>one</li><li>two</li></ul></article>")
    r = extract_html(html.encode())
    assert r.text == "Title\n\nSub\n\nbody\n\none\n\ntwo"
    assert r.heading_count == 2
    assert [s.kind for s in r.spans] == [
        "title", "heading", "paragraph", "list_item", "list_item"]


def test_empty_document():
    r = extract_html(b"")
    assert r.text == ""
    assert r.element_count == 0


def test_empty_p_kept_in_article_for_roundtrip():
    r = extract_html(b"<article><p>a</p><p></p><p>b</p></article>")
    assert r.text == "a\n\n\n\nb"


def test_empty_p_outside_semantic_root_dropped():
    r = extract_html(b"<div><p>a</p><p></p><p>b</p></div>")
    assert r.text == "a\n\nb"


def test_malformed_unclosed_tags():
    r = extract_html(b"<html><body><div><p>first<p>second<li>third")
    assert "first" in r.text and "second" in r.text


def test_entities_unescaped():
    r = extract_html(b"<article><p>a &amp; b &lt;c&gt;</p></article>")
    assert r.text == "a & b <c>"


def test_whitespace_preserved_within_block():
    r = extract_html(b"<article><p>a  b\tc</p></article>")
    assert r.text == "a  b\tc"


def test_br_becomes_newline():
    r = extract_html(b"<article><p>line1<br>line2</p></article>")
    assert r.text == "line1\nline2"


def test_density_scoring_without_semantic_root():
    links = " ".join(f'<a href="/{i}">lnk {i}</a>' for i in range(8))
    html = (f'<div id="page"><div class="x1"><p>{links}</p></div>'
            '<div class="x2"><p>the actual long form article body text</p></div>'
            f'<div class="x3"><p>{links}</p></div></div>')
    assert extract_html(html.encode()).text == "the actual long form article body text"


def test_script_style_dropped():
    html = ("<article><script>var x=1;</script><style>p{}</style>"
            "<p>visible</p></article>")
    assert extract_html(html.encode()).text == "visible"


def test_uppercase_junk_attributes_stripped():
    """Attribute names are case-insensitive in HTML: <div CLASS=...>
    must strip exactly like <div class=...> (a lowercase-only fast path
    once leaked uppercase-attribute boilerplate)."""
    from pdf_extraction_ray.functions.html_extract import extract_html
    html = (b"<html><body><article><p>keep me</p>"
            b'<div CLASS="sidebar">junk A</div>'
            b"<div HIDDEN><p>junk B</p></div>"
            b'<div ROLE="navigation"><p>junk C</p></div></article>'
            b"</body></html>")
    out = extract_html(html)
    assert out.text == "keep me"
