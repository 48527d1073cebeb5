"""Deterministic HTML page synthesis for the corpus.

Wraps the spec's ground-truth blocks (sources/spec.py) in realistic
boilerplate — site header, nav menus, ad blocks, sidebars, footers, script
and style tags — that the extractor (functions/html_extract.py) must strip.
All boilerplate is a pure function of ``doc_id``.
"""

from __future__ import annotations

import html as _html

from . import spec

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi"
).split()


def _word(doc_id: int, i: int) -> str:
    return _WORDS[(doc_id * 31 + i * 7) % len(_WORDS)]


def _links(doc_id: int, n: int, salt: int) -> str:
    parts = []
    for i in range(n):
        w1 = _word(doc_id, salt + 2 * i)
        w2 = _word(doc_id, salt + 2 * i + 1)
        parts.append(f'<a href="/x/{salt}/{i}">{w1} {w2}</a>')
    return " &middot; ".join(parts)


def _boilerplate_top(doc_id: int, source: str) -> str:
    nav_items = "".join(
        f'<li><a href="/nav/{i}">{_word(doc_id, i)} {_word(doc_id, i + 1)}</a></li>'
        for i in range(20)
    )
    return (
        f"<header class=\"site-header\"><h1>Corpus {_html.escape(source)}</h1>"
        f"<p>{_links(doc_id, 4, 100)}</p></header>"
        f"<nav id=\"main-nav\"><ul>{nav_items}</ul></nav>"
        f"<div class=\"ad-banner\"><p>{_links(doc_id, 6, 200)}</p></div>"
        "<script>var t = 42; console.log(t);</script>"
        "<style>.x { color: red }</style>"
    )


def _related(doc_id: int) -> str:
    """Planted inter-page permalinks (spec.REL_* — the extracted link
    graph's edges). Inside <footer>, so content extraction never sees
    them; linkgraph.page_anchors does."""
    parts = []
    for j, hub in enumerate(spec.rel_hubs_of(doc_id)):
        w1 = _word(doc_id, spec.REL_SALT + 2 * j)
        w2 = _word(doc_id, spec.REL_SALT + 2 * j + 1)
        parts.append(f'<a class="rel" href="/doc/d{hub:07d}">{w1} {w2}</a>')
    return " &middot; ".join(parts)


def _boilerplate_bottom(doc_id: int) -> str:
    return (
        f"<aside class=\"sidebar\"><ul><li>{_links(doc_id, 8, 300)}</li></ul></aside>"
        f"<footer><p>{_links(doc_id, 5, 400)}</p>"
        f"<p>related: {_related(doc_id)}</p>"
        f"<p>&copy; corpus.example</p></footer>"
    )


def _head(doc_id: int, source: str) -> str:
    return (
        "<!DOCTYPE html>\n<html><head><meta charset=\"utf-8\">"
        f"<title>{_html.escape(source)} d{doc_id}</title>"
        "<link rel=\"stylesheet\" href=\"/s.css\"></head><body>"
    )


def _article_body(doc_id: int, text: str, source: str) -> str:
    """Main-content markup for the spec's ground-truth blocks."""
    k = spec.kind_of(doc_id)
    inner: list[str] = []
    if spec.has_meta(doc_id):
        inner.append(f"<p>{_html.escape(spec.meta_line(doc_id, source))}</p>")
    if spec.has_phrase(doc_id):
        inner.append(f"<p>{_html.escape(spec.PHRASE)}</p>")

    def paras() -> str:
        ps = spec.pieces(text, spec.HTML_PIECE_W) * spec.rep_html(doc_id)
        return "".join(f"<p>{_html.escape(p)}</p>" for p in ps)

    if k in ("html_plain", "html_divsoup", "oversize"):
        inner.append(paras())
    elif k == "html_heading":
        inner.append(f"<h1>{_html.escape(spec.heading_text(doc_id, source))}</h1>")
        inner.append(paras())
    elif k == "html_list":
        ps = spec.pieces(text, spec.HTML_PIECE_W) * spec.rep_html(doc_id)
        inner.append("<ul>" + "".join(f"<li>{_html.escape(p)}</li>" for p in ps) + "</ul>")
    elif k == "html_table":
        inner.append(paras())
        rows = "".join(
            f"<tr><td>r{r}</td><td>v{doc_id * r}</td></tr>"
            for r in range(1, spec.n_table_rows(doc_id) + 1)
        )
        inner.append(f"<table class=\"data\">{rows}</table>")
    elif k == "html_tiny":
        inner.append(f"<p>{_html.escape(text[:80])}</p>")
    elif k == "html_emptybody":
        pass
    else:
        raise ValueError(f"not an HTML kind: {k}")
    return "".join(inner)


def build_html(doc_id: int, text: str, source: str) -> bytes:
    """Full page bytes for any HTML kind of the spec."""
    k = spec.kind_of(doc_id)
    body = _article_body(doc_id, text, source)
    if k == "html_divsoup":
        # no semantic root: the extractor's density scoring must find the
        # content div among link-soup siblings with neutral class names
        page = (
            _head(doc_id, source)
            + f"<div id=\"page\"><div class=\"b1\"><p>{_links(doc_id, 7, 500)}</p></div>"
            + f"<div class=\"b2\">{body}</div>"
            + f"<div class=\"b3\"><p>{_links(doc_id, 7, 600)}</p></div></div>"
            + "</body></html>"
        )
    else:
        page = (
            _head(doc_id, source)
            + _boilerplate_top(doc_id, source)
            + f"<div class=\"content-wrap\"><article>{body}</article>"
            + _boilerplate_bottom(doc_id)
            + "</div></body></html>"
        )
    if k == "oversize":
        page += "<!-- " + "x" * spec.OVERSIZE_PAD + " -->"
    return page.encode("utf-8")
