"""XML sitemap parsing (sitemaps.org protocol) — the crawl-DISCOVERY
side of the frontier family (functions/robots.py is the access side).

A real, namespace-agnostic parser over stdlib ElementTree: handles
``<sitemapindex>`` (recursive sitemap trees) and ``<urlset>`` documents,
tolerates comments, unknown elements, missing optional fields and
malformed XML (crawl inputs are hostile — a broken sitemap yields zero
urls, never an exception). ``resolve_sitemap_entries`` walks an index
tree breadth-first through a caller-supplied fetch with bounded depth
and document count, so a looping or adversarially deep tree cannot
wedge a worker.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections import deque
from typing import Callable


def _local(tag: object) -> str:
    """Namespace-stripped lower-case local name of an element tag.

    Comments/PIs give non-string tags — map those to '' so loops
    skip them."""
    if not isinstance(tag, str):
        return ""
    return tag.rsplit("}", 1)[-1].lower()


def _child_text(el: ET.Element, name: str) -> str | None:
    for c in el:
        if _local(c.tag) == name:
            return c.text
    return None


def parse_sitemap(xml_text: str) -> tuple[str, list]:
    """Parse ONE sitemap document.

    Returns ``('index', [child_loc, ...])`` for a ``<sitemapindex>``,
    ``('urlset', [(loc, lastmod, priority), ...])`` for a ``<urlset>``
    (missing lastmod/priority come back as ''); malformed XML or an
    unknown root yields ``('urlset', [])``.
    """
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return ("urlset", [])
    kind = _local(root.tag)
    if kind == "sitemapindex":
        locs: list[str] = []
        for child in root:
            if _local(child.tag) != "sitemap":
                continue
            loc = _child_text(child, "loc")
            if loc and loc.strip():
                locs.append(loc.strip())
        return ("index", locs)
    if kind != "urlset":
        return ("urlset", [])
    entries: list[tuple[str, str, str]] = []
    for child in root:
        if _local(child.tag) != "url":
            continue
        loc = _child_text(child, "loc")
        if not loc or not loc.strip():
            continue
        entries.append((loc.strip(),
                        (_child_text(child, "lastmod") or "").strip(),
                        (_child_text(child, "priority") or "").strip()))
    return ("urlset", entries)


def resolve_sitemap_entries(fetch: Callable[[str], str], start_loc: str,
                            max_depth: int = 3,
                            max_docs: int = 64) -> list[tuple[str, str, str]]:
    """Walk a sitemap tree breadth-first through ``fetch(loc) -> xml``.

    Index documents expand into their children (visited-set dedup by
    loc; bounded by ``max_depth`` levels and ``max_docs`` fetched
    documents total), urlset documents accumulate entries. Returns the
    concatenated ``(loc, lastmod, priority)`` entries in BFS order.
    """
    seen = {start_loc}
    q: deque[tuple[str, int]] = deque([(start_loc, 0)])
    out: list[tuple[str, str, str]] = []
    ndocs = 0
    while q and ndocs < max_docs:
        loc, depth = q.popleft()
        ndocs += 1
        kind, items = parse_sitemap(fetch(loc))
        if kind == "index":
            if depth + 1 > max_depth:
                continue
            for child in items:
                if child not in seen:
                    seen.add(child)
                    q.append((child, depth + 1))
        else:
            out.extend(items)
    return out
