"""Main-content extraction from HTML: a readability/trafilatura-style
boilerplate stripper built only on ``html.parser``.

This is the HTML analog of the reference's local structure-extraction stage
(reference: app/services/opendataloader_extractor.py:83-201, which shells out
to OpenDataLoader for PDFs): it produces extracted main text, block spans,
and the (element_count, heading_count, tables) inputs the quality scorer
(quality.py) needs for routing.

Heuristics (all deterministic, document order, no floats in text decisions):

1. drop junk by tag (script/style/nav/header/footer/aside/form/...)
2. drop junk by class/id token (nav|menu|footer|sidebar|ad|banner|...)
3. content root = first <article>, else first <main> / ``role="main"``,
   else the container whose kept-block text is longest (density scoring)
4. within the root, emit block elements in document order; a block whose
   link density exceeds ``link_density_max`` (default 0.5) is boilerplate
   and dropped (FIXTURES.md F3 ``html_link_density_edge``: 49% kept,
   51% dropped)
5. blocks join with a blank line (``\\n\\n``); whitespace inside a block's
   own text is preserved byte-for-byte (no collapsing), which keeps
   extraction lossless over synthesized corpora — the basis of the
   byte-identical-per-url invariant.

Spans record ``(start, end, kind, page=0)`` character offsets into the final
text, kind in {title, heading, paragraph, list_item, table}.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from html.parser import HTMLParser

# ---------------------------------------------------------------------------
# DOM
# ---------------------------------------------------------------------------

_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

# removed wholesale, with all descendants
_STRIP_TAGS = {
    "script", "style", "noscript", "template", "head", "title",
    "nav", "header", "footer", "aside", "form", "button", "select",
    "option", "label", "iframe", "svg", "canvas", "object", "video",
    "audio", "map",
}

_JUNK_ATTR_RE = re.compile(
    r"(?:^|[-_ ])(nav|menu|footer|header|head|sidebar|side|advert|ads?|banner|"
    r"promo|share|social|comment|comments|cookie|breadcrumb|breadcrumbs|"
    r"related|widget|popup|modal|subscribe|masthead|byline|meta)(?:$|[-_ 0-9])",
    re.IGNORECASE,
)

_BLOCK_TAGS = {
    "h1", "h2", "h3", "h4", "h5", "h6", "p", "li", "dt", "dd",
    "pre", "blockquote", "figcaption", "caption", "tr",
}

_CONTAINER_TAGS = {
    "html", "body", "div", "article", "main", "section", "ul", "ol", "dl",
    "table", "thead", "tbody", "tfoot", "figure", "details",
}

_INLINE_TAGS = {
    "a", "b", "i", "em", "strong", "span", "code", "small", "sub", "sup",
    "u", "s", "abbr", "cite", "q", "mark", "time", "var", "kbd", "samp",
    "big", "tt", "font", "ins", "del",
}

# starting one of these implicitly closes an open <p>
_P_CLOSERS = (_BLOCK_TAGS | _CONTAINER_TAGS) - {"html", "body"}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None,
                 parent: "Node | None" = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list[object] = []  # Node or str (text)
        self.parent = parent

    def append(self, child: object) -> None:
        if isinstance(child, Node):
            child.parent = self
        self.children.append(child)


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack: list[Node] = [self.root]

    def _top(self) -> Node:
        return self.stack[-1]

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        tag = tag.lower()
        # implicit closes for common malformed nesting
        if tag in _P_CLOSERS and self._top().tag == "p":
            self.stack.pop()
        if tag == "li" and self._top().tag == "li":
            self.stack.pop()
        if tag in ("td", "th") and self._top().tag in ("td", "th"):
            self.stack.pop()
        if tag == "tr":
            while self._top().tag in ("td", "th", "tr"):
                self.stack.pop()
        node = Node(tag, {k.lower(): (v or "") for k, v in attrs})
        self._top().append(node)
        if tag not in _VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        node = Node(tag.lower(), {k.lower(): (v or "") for k, v in attrs})
        self._top().append(node)

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        if tag in _VOID_TAGS:
            return
        # pop to the matching open tag; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if data:
            self._top().append(data)


def parse_html(payload: bytes | str) -> Node:
    """Parse HTML bytes/str into a lightweight DOM tree (lenient)."""
    if isinstance(payload, bytes):
        payload = payload.decode("utf-8", errors="replace")
    b = _TreeBuilder()
    b.feed(payload)
    b.close()
    return b.root


# ---------------------------------------------------------------------------
# Extraction
# ---------------------------------------------------------------------------


@dataclass
class Span:
    start: int
    end: int
    kind: str
    page: int = 0


@dataclass
class HtmlExtract:
    text: str
    spans: list[Span]
    element_count: int
    heading_count: int
    table_row_counts: list[int]  # emitted rows per table (quality's `tables`)


def _is_junk(node: Node) -> bool:
    if node.tag in _STRIP_TAGS:
        return True
    blob = (node.attrs.get("class", "") + " " + node.attrs.get("id", "")).strip()
    if blob and _JUNK_ATTR_RE.search(blob):
        return True
    if "hidden" in node.attrs:
        return True
    if node.attrs.get("role", "") in (
            "navigation", "banner", "contentinfo", "complementary", "search"):
        return True
    return False


def _inline_text(node: Node, in_link: bool = False) -> tuple[str, int]:
    """Assemble a block's text: returns ``(text, link_chars)``.

    Text-node whitespace is preserved verbatim; <br> becomes \\n; a nested
    block/container contributes its text preceded by \\n when the buffer is
    non-empty; table cells separate with tabs.
    """
    parts: list[str] = []
    link_chars = 0

    def walk(n: Node, linked: bool) -> None:
        nonlocal link_chars
        for ch in n.children:
            if isinstance(ch, str):
                parts.append(ch)
                if linked:
                    link_chars += len(ch)
                continue
            if _is_junk(ch):
                continue
            if ch.tag == "br":
                parts.append("\n")
            elif ch.tag in ("td", "th"):
                if parts and not parts[-1].endswith("\t"):
                    parts.append("\t")
                walk(ch, linked)
            elif ch.tag in _BLOCK_TAGS or ch.tag in _CONTAINER_TAGS:
                if parts:
                    parts.append("\n")
                walk(ch, linked)
            else:
                walk(ch, linked or ch.tag == "a")

    walk(node, in_link)
    return "".join(parts), link_chars


def _row_text(tr: Node) -> tuple[str, int]:
    """A table row: cells joined by tabs."""
    cells: list[str] = []
    link_chars = 0
    for ch in tr.children:
        if isinstance(ch, Node) and ch.tag in ("td", "th") and not _is_junk(ch):
            t, lc = _inline_text(ch)
            cells.append(t)
            link_chars += lc
    return "\t".join(cells), link_chars


def _has_block_descendant(node: Node) -> bool:
    for ch in node.children:
        if isinstance(ch, Node):
            if ch.tag in _BLOCK_TAGS or ch.tag in _CONTAINER_TAGS:
                return True
            if _has_block_descendant(ch):
                return True
    return False


_KIND_BY_TAG = {
    "h1": "title",
    "h2": "heading", "h3": "heading", "h4": "heading",
    "h5": "heading", "h6": "heading",
    "li": "list_item", "dt": "list_item", "dd": "list_item",
    "tr": "table",
}


def _iter_nodes(node: Node):
    for ch in node.children:
        if isinstance(ch, Node):
            yield ch
            yield from _iter_nodes(ch)


def _collect_block_nodes(node: Node, out: list[Node]) -> None:
    """DFS in document order collecting block-level element nodes."""
    for ch in node.children:
        if isinstance(ch, str):
            continue
        if _is_junk(ch):
            continue
        tag = ch.tag
        if tag in _BLOCK_TAGS:
            out.append(ch)
        elif tag in ("div", "section") and not _has_block_descendant(ch):
            out.append(ch)  # leaf div: inline-only content acts as a paragraph
        elif tag in _CONTAINER_TAGS or (tag not in _INLINE_TAGS and tag not in _VOID_TAGS):
            _collect_block_nodes(ch, out)
        # inline tags at container level are ignored (menus of bare links etc.)


def _resolve_block(el: Node) -> tuple[str, str, int, Node | None]:
    """-> (kind, text, link_chars, owning_table_or_None)."""
    if el.tag == "tr":
        text, link_chars = _row_text(el)
        owner = el.parent
        while owner is not None and owner.tag != "table":
            owner = owner.parent
        return "table", text, link_chars, owner
    text, link_chars = _inline_text(el)
    return _KIND_BY_TAG.get(el.tag, "paragraph"), text, link_chars, None


def _kept_blocks(node: Node, link_density_max: float,
                 semantic: bool) -> tuple[list[tuple[str, str]], list[int]]:
    """Blocks under ``node`` that survive the boilerplate filters.

    Returns (blocks, table_row_counts). Empty blocks survive only under a
    semantic root (lossless round-trip for <p></p>); whitespace-only blocks
    are formatting noise and always drop.
    """
    nodes: list[Node] = []
    _collect_block_nodes(node, nodes)
    blocks: list[tuple[str, str]] = []
    trow_counts: dict[int, int] = {}
    table_order: list[int] = []
    for el in nodes:
        kind, text, link_chars, table = _resolve_block(el)
        if text:
            if link_chars / len(text) > link_density_max:
                continue  # link-dominated: boilerplate
            if not text.strip():
                continue  # whitespace-only: formatting noise
        elif not semantic:
            continue
        if table is not None:
            key = id(table)
            if key not in trow_counts:
                table_order.append(key)
            trow_counts[key] = trow_counts.get(key, 0) + 1
        blocks.append((kind, text))
    return blocks, [trow_counts[k] for k in table_order]


def _find_content_root(root: Node, link_density_max: float) -> Node:
    for n in _iter_nodes(root):
        if n.tag == "article" and not _is_junk(n):
            return n
    for n in _iter_nodes(root):
        if not _is_junk(n) and (n.tag == "main" or n.attrs.get("role") == "main"):
            return n
    best: Node | None = None
    best_score = 0
    for n in _iter_nodes(root):
        if _is_junk(n) or n.tag not in ("div", "section", "td"):
            continue
        blocks, _ = _kept_blocks(n, link_density_max, semantic=False)
        score = sum(len(t) for _, t in blocks)
        if score > best_score:
            best, best_score = n, score
    if best is not None:
        return best
    for n in _iter_nodes(root):
        if n.tag == "body":
            return n
    return root


def extract_html(payload: bytes | str,
                 link_density_max: float = 0.5) -> HtmlExtract:
    """Extract main content text + spans from an HTML payload."""
    root = parse_html(payload)
    content = _find_content_root(root, link_density_max)
    semantic = content.tag in ("article", "main") or content.attrs.get("role") == "main"
    blocks, table_row_counts = _kept_blocks(content, link_density_max, semantic)

    parts: list[str] = []
    spans: list[Span] = []
    pos = 0
    for i, (kind, text) in enumerate(blocks):
        if i > 0:
            pos += 2  # len("\n\n")
        spans.append(Span(pos, pos + len(text), kind, 0))
        parts.append(text)
        pos += len(text)

    heading_count = sum(1 for k, _ in blocks if k in ("title", "heading"))
    return HtmlExtract(
        text="\n\n".join(parts),
        spans=spans,
        element_count=len(blocks),
        heading_count=heading_count,
        table_row_counts=table_row_counts,
    )
