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
from typing import NamedTuple

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


_ATTR_RE = re.compile(
    r"""([a-zA-Z][-a-zA-Z0-9_:.]*)\s*(?:=\s*("[^"]*"|'[^']*'|[^\s>]*))?""")

_EMPTY_ATTRS: dict[str, str] = {}


class Node:
    __slots__ = ("tag", "children", "parent", "_raw_attrs", "_attrs")

    def __init__(self, tag: str, raw_attrs: str = "",
                 parent: "Node | None" = None):
        self.tag = tag
        self.children: list[object] = []  # Node or str (text)
        self.parent = parent
        self._raw_attrs = raw_attrs  # parsed lazily: most elements never need it
        self._attrs: dict[str, str] | None = None

    @property
    def attrs(self) -> dict[str, str]:
        if self._attrs is None:
            if not self._raw_attrs:
                self._attrs = _EMPTY_ATTRS
            else:
                d: dict[str, str] = {}
                for m in _ATTR_RE.finditer(self._raw_attrs):
                    v = m.group(2) or ""
                    if v[:1] in "\"'":
                        v = v[1:-1]
                    d[m.group(1).lower()] = _unescape(v) if "&" in v else v
                self._attrs = d
        return self._attrs

    def append(self, child: object) -> None:
        if isinstance(child, Node):
            child.parent = self
        self.children.append(child)


from html import unescape as _unescape  # noqa: E402

# one pass over the markup: text runs, comments, doctype, and tags with a
# raw (lazily parsed) attribute blob
_TOKEN_RE = re.compile(
    r"<(?:"
    # tag branch FIRST: branches are disjoint (a token starts with a
    # letter/'/' XOR '!'/'?'), so alternation order is purely a speed
    # choice — tags outnumber comments ~100:1
    r"(/?)\s*([a-zA-Z][-a-zA-Z0-9:]*)"       # open/close tag name
    r"((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>"    # raw attributes
    r"|!--.*?(?:-->|$)"                      # comment
    r"|!(?:[^>]*)>"                          # doctype / CDATA-ish
    r"|\?[^>]*>"                             # processing instruction
    r")",
    re.S)

# raw-text elements: content is skipped to the matching close tag
_RAWTEXT_CLOSE = {
    "script": re.compile(r"</script\s*>", re.I),
    "style": re.compile(r"</style\s*>", re.I),
    "textarea": re.compile(r"</textarea\s*>", re.I),
    "title": re.compile(r"</title\s*>", re.I),
}


def parse_html(payload: bytes | str, deadline: float | None = None,
               prune_boilerplate: bool = True) -> Node:
    """Parse HTML bytes/str into a lightweight DOM tree (lenient).

    A single-regex scanner (3-4x faster and far lighter on allocation than
    ``html.parser``): entity references resolve with ``html.unescape`` on
    text runs, attribute blobs parse lazily, raw-text elements
    (script/style/...) skip straight to their close tag. ``deadline``
    (monotonic seconds) is the cooperative per-document timeout.

    ``prune_boilerplate=True`` (the content-extraction default) skips
    whole ``_STRIP_TAGS`` subtrees (header/nav/aside/footer/...) without
    building nodes — the extractor would discard them anyway. Pass
    ``False`` when those regions ARE the payload (link extraction walks
    nav/footer anchors: pipelines/linkgraph.py); raw-text elements
    (script/style/title) stay content-free either way.
    """
    if isinstance(payload, bytes):
        payload = payload.decode("utf-8", errors="replace")
    root = Node("#root")
    stack: list[Node] = [root]
    top = root            # stack[-1], tracked to skip the index per token
    pos = 0
    n = len(payload)
    probe = 0
    # hot-loop local bindings (measured ~15% of scan time was global /
    # attribute lookups per token)
    search = _TOKEN_RE.search
    unescape = _unescape
    void_tags = _VOID_TAGS
    strip_tags = _STRIP_TAGS
    rawtext_close = _RAWTEXT_CLOSE
    p_closers = _P_CLOSERS
    if deadline is not None:
        from time import monotonic
    while pos < n:
        if deadline is not None:
            probe += 1
            if not probe & 2047:
                if monotonic() > deadline:
                    from .retry_policy import DocumentTimeout
                    raise DocumentTimeout("html parse over budget")
        m = search(payload, pos)
        if m is None:
            text = payload[pos:]
            if text:
                top.children.append(unescape(text) if "&" in text else text)
            break
        start, end = m.span()
        if start > pos:
            text = payload[pos:start]
            top.children.append(unescape(text) if "&" in text else text)
        pos = end
        closer, tag, raw_attrs = m.group(1, 2, 3)
        if tag is None:
            continue  # comment / doctype / PI
        if not tag.islower():  # avoid the lower() allocation per token
            tag = tag.lower()
        if closer:  # close tag
            if tag in void_tags:
                continue
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    top = stack[-1]
                    break
            continue
        # open tag — implicit closes for common malformed nesting
        if tag in p_closers and top.tag == "p":
            stack.pop()
            top = stack[-1]
        if tag == "li" and top.tag == "li":
            stack.pop()
            top = stack[-1]
        elif tag in ("td", "th") and top.tag in ("td", "th"):
            stack.pop()
            top = stack[-1]
        elif tag == "tr":
            while top.tag in ("td", "th", "tr"):
                stack.pop()
                top = stack[-1]
        if raw_attrs:
            stripped = raw_attrs.rstrip()
            self_closing = stripped.endswith("/")
            keep_attrs = raw_attrs if stripped else ""
        else:
            self_closing = False
            keep_attrs = ""
        if tag in rawtext_close and not self_closing:
            node = Node(tag, keep_attrs)
            node.parent = top
            top.children.append(node)
            cm = rawtext_close[tag].search(payload, pos)
            # raw content is intentionally dropped for script/style/title
            # (they are _STRIP_TAGS); for textarea it would be re-added
            # here. Metadata extraction (prune_boilerplate=False) keeps
            # TITLE text — the most-used head field in webtext pipelines
            # (pipelines/linkgraph.page_metadata).
            if not prune_boilerplate and tag == "title":
                text = payload[pos:cm.start()] if cm else payload[pos:]
                if text:
                    node.children.append(
                        unescape(text) if "&" in text else text)
            pos = cm.end() if cm else n
            continue
        if tag in strip_tags and not self_closing and prune_boilerplate:
            # tag-level boilerplate: skip the whole subtree without
            # building nodes (the extractor would prune it anyway)
            depth = 1
            while depth and pos < n:
                sm = search(payload, pos)
                if sm is None:
                    pos = n
                    break
                pos = sm.end()
                scloser, stag, sraw = sm.group(1, 2, 3)
                if stag is None:
                    continue
                if not stag.islower():
                    stag = stag.lower()
                sraw = sraw or ""
                if scloser:
                    if stag not in void_tags:
                        depth -= 1
                elif stag in rawtext_close and not sraw.rstrip().endswith("/"):
                    cm = rawtext_close[stag].search(payload, pos)
                    pos = cm.end() if cm else n
                elif stag not in void_tags and not sraw.rstrip().endswith("/"):
                    depth += 1
            node = Node(tag, "")  # pruned placeholder
            node.parent = top
            top.children.append(node)
            continue
        node = Node(tag, keep_attrs)
        node.parent = top
        top.children.append(node)
        if tag not in void_tags and not self_closing:
            stack.append(node)
            top = node
    return root


# ---------------------------------------------------------------------------
# Extraction
# ---------------------------------------------------------------------------


class Span(NamedTuple):
    # NamedTuple (not dataclass): one Span is built per extracted line —
    # C-speed construction matters at corpus scale
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
    raw = node._raw_attrs
    if not raw:
        return False
    # fast path: only class/id/hidden/role attributes can make a node
    # junk — if none of those byte sequences appear in the raw attribute
    # blob, skip the attribute parse entirely (false positives like
    # href="/video" merely fall through to the exact check). Case-folded:
    # attribute NAMES are case-insensitive in HTML (<div CLASS=...>), and
    # the exact check below lowercases names too.
    raw_l = raw if raw.islower() else raw.lower()
    if ("class" not in raw_l and "id" not in raw_l and "hidden" not in raw_l
            and "role" not in raw_l):
        return False
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
    # iterative pre-order DFS: a recursive `yield from` chain costs
    # O(depth) per yielded node on nested boilerplate-heavy pages
    stack = [iter(node.children)]
    push = stack.append
    pop = stack.pop
    while stack:
        for ch in stack[-1]:
            if ch.__class__ is Node:
                yield ch
                push(iter(ch.children))
                break
        else:
            pop()


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
    # ONE fused traversal for the semantic roots: the first non-junk
    # <article> in document order wins immediately (nothing later can
    # beat it); the first non-junk <main>/[role=main] is remembered for
    # the no-article case. Junk/attr checks run only on candidate tags
    # (the old second pass parsed attrs for every non-junk node).
    first_main: Node | None = None
    for n in _iter_nodes(root):
        tag = n.tag
        if tag == "article":
            if not _is_junk(n):
                return n
        elif first_main is None and (
                tag == "main"
                # substring prefilter on the raw blob; "&" keeps
                # entity-escaped values (role="ma&#105;n") on the exact
                # path, which unescapes during the attrs parse
                or (("main" in n._raw_attrs or "&" in n._raw_attrs)
                    and n.attrs.get("role") == "main")):
            if not _is_junk(n):
                first_main = n
    if first_main is not None:
        return first_main
    # density scoring in ONE pass: collect blocks globally, credit each
    # kept block's text length to its strict ancestors. (Per-candidate
    # ``_kept_blocks`` calls re-walked every subtree — O(nodes x depth)
    # on deeply nested boilerplate-heavy pages.) Equivalence with the
    # per-candidate form: a candidate's kept blocks are exactly the kept
    # blocks strictly below it (junk subtrees are skipped identically in
    # both traversals, and a leaf-div candidate never counts itself in
    # either form).
    blocks: list[Node] = []
    _collect_block_nodes(root, blocks)
    scores: dict[int, int] = {}
    for el in blocks:
        _kind, text, link_chars, _tbl = _resolve_block(el)
        if not text or not text.strip():
            continue
        if link_chars / len(text) > link_density_max:
            continue
        ln = len(text)
        anc = el.parent
        while anc is not None:
            key = id(anc)
            scores[key] = scores.get(key, 0) + ln
            anc = anc.parent
    best: Node | None = None
    best_score = 0
    for n in _iter_nodes(root):
        if _is_junk(n) or n.tag not in ("div", "section", "td"):
            continue
        score = scores.get(id(n), 0)
        if score > best_score:
            best, best_score = n, score
    if best is not None:
        return best
    for n in _iter_nodes(root):
        if n.tag == "body":
            return n
    return root


def extract_html(payload: bytes | str,
                 link_density_max: float = 0.5,
                 deadline: float | None = None) -> HtmlExtract:
    """Extract main content text + spans from an HTML payload."""
    root = parse_html(payload, deadline)
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
