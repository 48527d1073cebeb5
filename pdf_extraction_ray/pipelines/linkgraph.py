"""Link-graph analytics over the pages corpus — WAT-style anchor
extraction, an anchor-text index, the extracted page->page edge table,
and PageRank over those REAL edges.

CommonCrawl publishes exactly this family next to its WARC/WET payloads:
the WAT metadata sidecar (every <a href> with its anchor text), and a
host-level web graph ranked by centrality. Here the chain is built from
the engine's own primitives: the flagship pipeline's sniff gate feeds
the REAL HTML tokenizer (functions/html_extract.parse_html — the same
tree the content extractor walks), anchors stream out as a light edge
table, and every downstream exchange moves ids + short strings only,
never payload bytes.

Scale shapes:
* anchor extraction is map-side over sniffed pages (parse cost is the
  compute; the corpus' html bytes never shuffle);
* duplicate-url pages (the corpus' planted ~2% re-crawls) are dropped
  AFTER extraction by one hash-partition distinct over the edge table —
  deduping first would shuffle payloads, deduping the light edges is
  the bounded exchange;
* PageRank rounds are one hash_join (scores x edges) + one groupby(dst)
  sum each — the "real edge TABLE" variant of analytics.pagerank_docs'
  planted-edge emit, as that docstring promises.

Oracles: the corpus is a pure function of ``documents`` (sources/spec.py),
so every operator here has an exact DuckDB value-hash oracle deriving the
expected anchors analytically (the gen_html._word formula re-expressed in
SQL). Integer PageRank uses the same floor-division update as
analytics.pagerank_docs, making the unrolled-CTE oracle bit-exact.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..config import PipelineConfig
from ..functions.html_extract import Node, parse_html
from ..functions.sniff import CT_HTML
from ..sources import corpus as corpus_mod
from ..sources import spec
from ..stages.joins import hash_join

_CFG = PipelineConfig(max_bytes=spec.CORPUS_MAX_BYTES,
                      split_page_threshold=spec.CORPUS_SPLIT_PAGE_THRESHOLD)


# ---------------------------------------------------------------------------
# anchor extraction


_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:")


def resolve_href(base_url: str, href: str) -> str:
    """Minimal RFC-3986-style reference resolution for http(s) pages:
    absolute (any scheme — mailto:/javascript:/data: included, RFC 3986
    §4.2: a first segment containing ':' is a scheme, never a relative
    path) / protocol-relative / path-absolute / path-relative forms,
    fragment stripped. Query strings are kept verbatim."""
    href = href.split("#", 1)[0]
    m = _SCHEME_RE.match(href)
    if m and "/" not in href[:m.end()]:
        return href
    scheme, rest = base_url.split("://", 1)
    if href.startswith("//"):
        return f"{scheme}:{href}"
    host, _, path = rest.partition("/")
    origin = f"{scheme}://{host}"
    if href.startswith("/"):
        return origin + href
    if not href:
        return origin + "/" + path
    base_dir = ("/" + path).rsplit("/", 1)[0]
    segs = (base_dir + "/" + href).split("/")
    out: list[str] = []
    for s in segs:
        if s == "..":
            if len(out) > 1:
                out.pop()
        elif s != ".":
            out.append(s)
    return origin + "/".join(out)


def _anchor_text(node: Node) -> str:
    """All descendant text of an <a>, whitespace preserved verbatim
    (generator anchors are single text runs; nesting handled anyway).
    Text runs arrive already entity-decoded by the tokenizer — do NOT
    unescape again (a second pass over-decodes '&amp;amp;')."""
    parts: list[str] = []

    def walk(n: Node) -> None:
        for c in n.children:
            if isinstance(c, str):
                parts.append(c)
            else:
                walk(c)

    walk(node)
    return "".join(parts)


def _hash_partition_distinct(ds: rd.Dataset, keys: list[str],
                             part_col: str,
                             num_partitions: int = 32,
                             order: list[str] | None = None) -> rd.Dataset:
    """ONE hash-partition shuffle + per-partition vectorized
    first-of-group — the shared distinct used by every linkgraph op
    (anchors, edges, nodes, metadata): only the light derived rows ride
    the all-to-all, never page payloads. ``part_col`` must be int64 and
    functionally determined by ``keys`` (rows of one key group land in
    one partition); ``num_partitions`` must be a power of two (bit
    mask). ``order`` breaks ties within a key group (first-wins by the
    minimal order tuple — e.g. earliest warc_ts)."""
    if num_partitions & (num_partitions - 1):
        raise ValueError("num_partitions must be a power of two")

    def add_part(batch: pa.Table) -> pa.Table:
        p = pc.cast(pc.bit_wise_and(batch[part_col], num_partitions - 1),
                    pa.int64())
        return batch.append_column("__p", p)

    def distinct(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(keys + (order or []), kind="mergesort")
        return g[~g[keys].duplicated()].drop(columns="__p")

    return (ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("__p").map_groups(distinct, batch_format="pandas"))


def anchors_of_html(payload: bytes | str, base_url: str,
                    deadline: float | None = None) -> list[dict]:
    """Every <a href> in document order — including inside junk
    (nav/footer/aside) containers: link extraction wants ALL links, the
    opposite selection from content extraction. ``deadline`` is the
    cooperative per-document timeout (monotonic seconds), same contract
    as the extraction path."""
    root = parse_html(payload, prune_boilerplate=False, deadline=deadline)
    out: list[dict] = []

    def walk(n: Node) -> None:
        if n.tag == "a":
            href = n.attrs.get("href")
            if href is not None:
                out.append({
                    "link_i": len(out),
                    "href": resolve_href(base_url, href),
                    "anchor": _anchor_text(n),
                })
        for c in n.children:
            if isinstance(c, Node):
                walk(c)

    walk(root)
    return out


def _doc_id_of_url(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized page-url -> doc_id (spec.url_of embeds a 7-digit id)."""
    ex = pc.extract_regex(urls, pattern=r"/d(?P<id>\d{7})(?:-memo|-qp)?$")
    if isinstance(ex, pa.ChunkedArray):
        ex = ex.combine_chunks()
    return pc.struct_field(ex, "id").cast(pa.int64())


def page_anchors(pages: "str | rd.Dataset", cfg: PipelineConfig = _CFG,
                 num_partitions: int = 32,
                 doc_id_mod: int | None = None) -> rd.Dataset:
    """(url, src_doc_id, link_i, href, anchor) for every anchor of every
    DISTINCT valid HTML page.

    Pipeline: the flagship sniff gate (size cap + magic-byte dispatch,
    stages/extract.sniff_validate_batch) -> per-row parse with the real
    tokenizer -> flat anchor rows -> ONE hash-partition distinct on
    (url, link_i) dropping re-crawled duplicate pages (identical bytes,
    so any row of a (url, link_i) group carries identical values — the
    exact_dedup_by_hash partition shape, edges-only through the
    shuffle).

    ``doc_id_mod``: keep only pages with doc_id % mod == 0, applied
    BEFORE parsing (the id derives from the url alone) — samplers must
    not pay full-corpus parse cost for a 1/mod slice. Per-row parse
    failures/timeouts (cfg.doc_timeout_s) drop that page's anchors,
    never the task (row isolation, the extract-stage rule)."""
    from .extraction import sniffed_pages
    from ..stages.extract import _deadline

    sniffed = sniffed_pages(pages, cfg)

    def extract(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(batch["status"], "completed"),
                       pc.equal(batch["content_type"], CT_HTML))
        batch = batch.filter(keep)
        if doc_id_mod is not None:
            ids = _doc_id_of_url(batch["url"]).to_numpy(zero_copy_only=False)
            batch = batch.filter(pa.array(ids % doc_id_mod == 0))
        urls = batch["url"].to_pylist()
        payloads = batch["html"].to_pylist()
        rows: list[dict] = []
        for url, payload in zip(urls, payloads):
            try:
                page_rows = anchors_of_html(payload, url,
                                            deadline=_deadline(cfg))
            except Exception:  # noqa: BLE001 — row isolation
                continue
            for a in page_rows:
                a["url"] = url
                rows.append(a)
        return pa.Table.from_pylist(rows, schema=pa.schema([
            ("url", pa.string()),
            ("link_i", pa.int64()),
            ("href", pa.string()),
            ("anchor", pa.string()),
        ]))

    anchors = sniffed.map_batches(extract, batch_format="pyarrow")

    def add_id(batch: pa.Table) -> pa.Table:
        return batch.append_column("src_doc_id",
                                   _doc_id_of_url(batch["url"]))

    return _hash_partition_distinct(
        anchors.map_batches(add_id, batch_format="pyarrow"),
        ["url", "link_i"], "src_doc_id", num_partitions)


# ---------------------------------------------------------------------------
# sf-dir operator surface (driver queries)


def _corpus_pages(sf_dir: str) -> str:
    return corpus_mod.ensure_pages_corpus(sf_dir)


_edges_cache: dict[tuple[str, str], rd.Dataset] = {}


def _cached_edges(sf_dir: str) -> rd.Dataset:
    """The distinct page->page edge table, derived ONCE per corpus
    digest and DISK-cached (sources/corpus.derived_parquet): every
    sf-dir link-graph query — pagerank, HITS, k-core, LPA, triangles,
    co-citation, BFS, components, random walks — otherwise re-parses
    the corpus' HTML anchors per call. The table is ids-only (two
    int64 columns, bounded by link volume), so the in-session
    materialized pin is edge-sized, never corpus-sized; a fresh
    process re-reads the parquet."""
    key = (sf_dir, corpus_mod._input_digest(sf_dir))
    if key not in _edges_cache:
        disk = corpus_mod.derived_parquet(
            sf_dir, "linkedges",
            lambda: link_graph_pages(_corpus_pages(sf_dir)))
        _edges_cache[key] = disk.materialize()
    return _edges_cache[key]


def anchor_text_index(sf_dir: str) -> rd.Dataset:
    """Per-target anchor aggregation — the classic anchor-text relevance
    signal (one row per distinct resolved href): in-link count, distinct
    linking pages, total anchor chars, lexicographically-first anchor.

    One groupby over the already-distinct anchor table; target count is
    tiny (site chrome collapses to a few dozen hrefs), so the aggregate
    output is driver-safe at any corpus scale."""
    anchors = page_anchors(_corpus_pages(sf_dir))

    def widen(batch: pa.Table) -> pa.Table:
        return pa.table({
            "href": batch["href"],
            "src_doc_id": batch["src_doc_id"],
            "anchor_chars": pc.utf8_length(
                batch["anchor"].combine_chunks()).cast(pa.int64()),
            "anchor": batch["anchor"],
        })

    # distinct-count via two chained groupbys (combiner shape): fold to
    # one row per (href, page) first, then count pages / sum partials
    # per href — no count-distinct state on any single node.
    per_page = (anchors.map_batches(widen, batch_format="pyarrow")
                .groupby(["href", "src_doc_id"]).aggregate(
                    Count(alias_name="n"),
                    Sum("anchor_chars", alias_name="chars"),
                    Min("anchor", alias_name="a0"),
                ))
    return per_page.groupby("href").aggregate(
        Sum("n", alias_name="n_links"),
        Count(alias_name="n_pages"),
        Sum("chars", alias_name="sum_anchor_chars"),
        Min("a0", alias_name="first_anchor"),
    )


def page_links_sample(sf_dir: str, mod: int = 17) -> rd.Dataset:
    """Full anchor listing for the doc_id % mod == 0 page sample — the
    row-level WAT rendition, bounded to ~1/mod of pages so the full
    listing is compare-sized at any sf. The mod filter pushes into
    page_anchors AHEAD of parsing (ids derive from urls), so the query
    pays 1/mod of the parse cost, not all of it."""
    anchors = page_anchors(_corpus_pages(sf_dir), doc_id_mod=mod)
    return anchors.map_batches(
        lambda t: t.select(["url", "link_i", "href", "anchor"]),
        batch_format="pyarrow")


def link_graph(sf_dir: str) -> rd.Dataset:
    """sf-dir driver-query wrapper over ``link_graph_pages``."""
    return _cached_edges(sf_dir)


def link_graph_pages(pages_path: str,
                     cfg: PipelineConfig = _CFG) -> rd.Dataset:
    """DISTINCT page->page edge table extracted from a pages corpus:
    /doc/d{id} permalinks parsed back to target doc ids, then dead links
    pruned with a semi hash_join against the corpus' own page ids (a
    no-op on the planted graph — hubs always exist — but load-bearing on
    any real crawl, and on synthetic pages in tests)."""
    pages = rd.read_parquet(pages_path, columns=["url"])
    nodes = pages.map_batches(
        lambda b: pa.table({"node": _doc_id_of_url(b["url"])}),
        batch_format="pyarrow")
    return link_graph_from_anchors(page_anchors(pages_path, cfg), nodes)


def link_graph_from_anchors(anchors: rd.Dataset,
                            nodes: rd.Dataset) -> rd.Dataset:
    """The edge-table core over an ALREADY-EXTRACTED anchor table and a
    (node,) page-id table — callers that land anchors as parquet (the
    run_linkgraph job) reuse them instead of re-parsing the corpus."""
    def to_edges(batch: pa.Table) -> pa.Table:
        ex = pc.extract_regex(batch["href"].combine_chunks(),
                              pattern=r"/doc/d(?P<id>\d{7})$")
        dst = pc.struct_field(ex, "id")
        keep = pc.is_valid(dst)
        return pa.table({
            "src_doc_id": batch["src_doc_id"].combine_chunks().filter(keep),
            "dst_doc_id": dst.filter(keep).cast(pa.int64()),
        })

    edges = anchors.map_batches(to_edges, batch_format="pyarrow")

    # pinned: hash_join probes schema() (executes lineage) and then
    # shuffles — without the pin the whole parse DAG would run twice.
    # Ids-only table, the bounded branch-point cache.
    edges = _hash_partition_distinct(
        edges, ["src_doc_id", "dst_doc_id"], "src_doc_id").materialize()

    # dead-link prune: keep edges whose target exists as a corpus page
    joined = hash_join(edges, nodes, "dst_doc_id", "node",
                       ["src_doc_id"], [], how="semi")
    return joined.select_columns(["src_doc_id", "dst_doc_id"])


@ray.remote
def _pr_one_task(iters: int, damping_pct: int, scale: int,
                 n_node_blocks: int, *blocks: pa.Table) -> pa.Table:
    """All PageRank rounds in one task: vectorized integer update over
    dense-remapped ids (np.add.at keeps the BIGINT sums exact). Only
    dispatched when the edge count is under ``task_pr_limit`` — the
    _cc_one_task lesson (stages/dedup.py): on small graphs each
    distributed round is an all-to-all that dwarfs the actual work."""
    node_tabs = [t for t in blocks[:n_node_blocks] if t.num_rows]
    edge_tabs = [t for t in blocks[n_node_blocks:] if t.num_rows]
    nodes = np.sort(np.unique(np.concatenate(
        [t["node"].to_numpy(zero_copy_only=False) for t in node_tabs])
        if node_tabs else np.array([], np.int64)).astype(np.int64))
    n = len(nodes)
    if edge_tabs:
        et = pa.concat_tables(
            [t.select(["src_doc_id", "dst_doc_id"]) for t in edge_tabs])
        src = et["src_doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = et["dst_doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        src = dst = np.array([], np.int64)
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    deg = np.zeros(n, np.int64)
    np.add.at(deg, si, 1)
    outdeg = deg[si]
    base = (100 - damping_pct) * scale // 100
    r = np.full(n, scale, np.int64)
    for _ in range(iters):
        s = np.zeros(n, np.int64)
        np.add.at(s, di, r[si] // outdeg)
        r = base + damping_pct * s // 100
    return pa.table({"doc_id": pa.array(nodes), "rank": pa.array(r)})


def pagerank_links(sf_dir: str, iters: int = 5, damping_pct: int = 85,
                   scale: int = 1_000_000,
                   task_pr_limit: int = 5_000_000) -> rd.Dataset:
    """sf-dir driver-query wrapper over ``pagerank_from_edges`` —
    rides the digest-keyed edge-table cache like the rest of the
    sf-dir family (review finding: this wrapper re-parsed anchors)."""
    return pagerank_from_edges(
        _cached_edges(sf_dir), page_nodes(_corpus_pages(sf_dir)),
        iters=iters, damping_pct=damping_pct, scale=scale,
        task_pr_limit=task_pr_limit)


def pagerank_links_pages(pages_path: str, iters: int = 5,
                         damping_pct: int = 85, scale: int = 1_000_000,
                         task_pr_limit: int = 5_000_000,
                         cfg: PipelineConfig = _CFG) -> rd.Dataset:
    """Integer PageRank over the EXTRACTED edge table — the promised
    real-edge-table variant of analytics.pagerank_docs (same BIGINT
    floor-division update, bit-exact vs the unrolled-CTE oracle).

    Small graphs (edge count <= ``task_pr_limit``, ~80 MB of int64
    pairs at the default) run every round in ONE Ray task — on a
    verified link graph orders of magnitude smaller than its corpus,
    per-round all-to-alls dwarf the arithmetic (measured: 292 s
    distributed vs <2 s one-task on a 1k-edge graph at 32 CPUs; the
    _cc_one_task precedent). Above the limit the distributed rounds
    engage unchanged: per round ONE hash_join (scores x outdeg-weighted
    edges on src) + ONE groupby(dst) sum, zero-presence rows replacing
    a per-round left join, and a fixed-width repartition so round N's
    block count never compounds into round N+1 (sort-shuffle outputs
    roughly double their input block count — the connected_components
    lesson, stages/dedup.py)."""
    # pinned: joined twice below
    edges = link_graph_pages(pages_path, cfg).materialize()
    nodes = page_nodes(pages_path)
    return pagerank_from_edges(edges, nodes, iters=iters,
                               damping_pct=damping_pct, scale=scale,
                               task_pr_limit=task_pr_limit)


def page_nodes(pages_path: str) -> rd.Dataset:
    """Distinct (node,) doc-id table of a pages corpus (MATERIALIZED —
    it feeds multiple join probes)."""
    pages = rd.read_parquet(pages_path, columns=["url"])

    def page_ids(batch: pa.Table) -> pa.Table:
        ids = _doc_id_of_url(batch["url"])
        return pa.table({"node": ids})

    return _hash_partition_distinct(
        pages.map_batches(page_ids, batch_format="pyarrow"),
        ["node"], "node").materialize()


def pagerank_from_edges(edges: rd.Dataset, nodes: rd.Dataset,
                        iters: int = 5, damping_pct: int = 85,
                        scale: int = 1_000_000,
                        task_pr_limit: int = 5_000_000) -> rd.Dataset:
    """The PageRank core over ALREADY-BUILT (materialized) edge and
    node tables — callers that land intermediate tables (the
    run_linkgraph job) reuse them instead of re-deriving the whole
    parse chain per output."""
    if edges.count() <= task_pr_limit:
        node_refs = nodes.to_arrow_refs()
        edge_refs = edges.to_arrow_refs()
        return rd.from_arrow_refs([_pr_one_task.remote(
            iters, damping_pct, scale, len(node_refs),
            *node_refs, *edge_refs)])

    outdeg = edges.groupby("src_doc_id").aggregate(
        Count(alias_name="outdeg")).materialize()
    edges_w = hash_join(edges, outdeg, "src_doc_id", "src_doc_id",
                        ["dst_doc_id"], ["outdeg"], how="inner").materialize()

    base = (100 - damping_pct) * scale // 100

    def init(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"].combine_chunks().cast(pa.int64()),
            "r": pa.array(np.full(len(t), scale, np.int64))})

    # zero presence rows guarantee every node survives the groupby even
    # with no in-links (the pagerank_docs pattern) — this replaces a
    # per-round LEFT join back onto the node set. Static; pinned once.
    def zero(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"].combine_chunks().cast(pa.int64()),
            "c": pa.array(np.zeros(len(t), np.int64))})

    presence = nodes.map_batches(zero, batch_format="pyarrow").materialize()

    scores = nodes.map_batches(init, batch_format="pyarrow")
    for _ in range(iters):
        contrib = hash_join(edges_w, scores, "src_doc_id", "node",
                            ["dst_doc_id", "outdeg"], ["r"], how="inner")

        def emit(t: pa.Table) -> pa.Table:
            c = pc.divide(t["r"].combine_chunks().cast(pa.int64()),
                          t["outdeg"].combine_chunks().cast(pa.int64()))
            return pa.table({
                "node": t["dst_doc_id"].combine_chunks().cast(pa.int64()),
                "c": c})

        def fold(t: pa.Table) -> pa.Table:
            s = t["s"].combine_chunks().cast(pa.int64())
            r = pc.add(pa.scalar(base, pa.int64()),
                       pc.divide(pc.multiply(
                           pa.scalar(damping_pct, pa.int64()), s),
                           pa.scalar(100, pa.int64())))
            return pa.table({
                "node": t["node"].combine_chunks().cast(pa.int64()),
                "r": r})

        # ONE join + ONE groupby per round; the fixed-width repartition
        # stops shuffle-output block counts compounding round over
        # round, and materialize keeps lineage linear (the CC-loop
        # lessons, stages/dedup.py)
        scores = (contrib.map_batches(emit, batch_format="pyarrow")
                  .union(presence)
                  .groupby("node").aggregate(Sum("c", alias_name="s"))
                  .map_batches(fold, batch_format="pyarrow")
                  .repartition(32)
                  .materialize())

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["node"].combine_chunks(),
                         "rank": t["r"].combine_chunks()})

    return scores.map_batches(finish, batch_format="pyarrow")


def _find_head(root: Node) -> Node | None:
    for c in root.children:
        if isinstance(c, Node):
            if c.tag == "head":
                return c
            found = _find_head(c)
            if found is not None:
                return found
    return None


def head_metadata(payload: bytes | str,
                  deadline: float | None = None) -> dict:
    """<title> text + <meta> inventory from the HEAD — with
    ``page_anchors`` this completes the WAT record trio (Links, Title,
    Head-Metas). Title text is kept by the tokenizer only in
    metadata/link mode (prune_boilerplate=False). The walk is scoped to
    the <head> subtree when one exists (body-level microdata metas and
    inline <svg><title> must not count as head fields); a head-less
    lenient parse falls back to the whole tree."""
    root = parse_html(payload, prune_boilerplate=False, deadline=deadline)
    scope = _find_head(root) or root
    title = ""
    charset = ""
    n_meta = 0

    def walk(n: Node) -> None:
        nonlocal title, charset, n_meta
        if n.tag == "title" and not title:
            title = "".join(c for c in n.children if isinstance(c, str))
        elif n.tag == "meta":
            n_meta += 1
            if not charset and "charset" in n.attrs:
                charset = n.attrs["charset"]
        for c in n.children:
            if isinstance(c, Node):
                walk(c)

    walk(scope)
    return {"title": title, "charset": charset, "n_meta": n_meta}


def page_metadata(pages: "str | rd.Dataset",
                  cfg: PipelineConfig = _CFG) -> rd.Dataset:
    """(url, title, charset, n_meta) for every DISTINCT valid HTML page
    — same sniff gate + hash-partition distinct as ``page_anchors``
    (key = url alone: one metadata row per page)."""
    from .extraction import sniffed_pages

    sniffed = sniffed_pages(pages, cfg)

    from ..stages.extract import _deadline

    def extract(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(batch["status"], "completed"),
                       pc.equal(batch["content_type"], CT_HTML))
        batch = batch.filter(keep)
        rows = []
        for u, p in zip(batch["url"].to_pylist(),
                        batch["html"].to_pylist()):
            try:  # row isolation + cfg.doc_timeout_s, like page_anchors
                rows.append(dict(head_metadata(p, deadline=_deadline(cfg)),
                                 url=u))
            except Exception:  # noqa: BLE001
                continue
        return pa.Table.from_pylist(rows, schema=pa.schema([
            ("title", pa.string()), ("charset", pa.string()),
            ("n_meta", pa.int64()), ("url", pa.string())]))

    meta = sniffed.map_batches(extract, batch_format="pyarrow")

    def add_id(batch: pa.Table) -> pa.Table:
        return batch.append_column("doc_id", _doc_id_of_url(batch["url"]))

    return (_hash_partition_distinct(
                meta.map_batches(add_id, batch_format="pyarrow"),
                ["url"], "doc_id")
            .select_columns(["url", "title", "charset", "n_meta"]))


def page_metadata_sql() -> str:
    """Planted derivation: gen_html._head writes
    ``<title>{source} d{doc_id}</title>`` + one charset meta for every
    HTML kind (div-soup included)."""
    return """
SELECT 'https://corpus.example/' || source || '/d'
         || lpad(CAST(doc_id AS VARCHAR), 7, '0')
         || (CASE WHEN doc_id % 10 = 3 THEN '-memo'
                  WHEN doc_id % 10 = 7 THEN '-qp' ELSE '' END) AS url,
       source || ' d' || CAST(doc_id AS VARCHAR) AS title,
       'utf-8' AS charset,
       CAST(1 AS BIGINT) AS n_meta
FROM documents
WHERE doc_id % 100 <= 69 OR doc_id % 100 IN (90, 91, 94)"""


def crawl_frontier(sf_dir: str, extracted: rd.Dataset, k: int = 100,
                   iters: int = 5, damping_pct: int = 85,
                   scale: int = 1_000_000) -> rd.Dataset:
    """sf-dir driver-query wrapper over ``crawl_frontier_pages``."""
    return crawl_frontier_pages(_corpus_pages(sf_dir), extracted, k=k,
                                iters=iters, damping_pct=damping_pct,
                                scale=scale)


def crawl_frontier_pages(pages_path: str, extracted: rd.Dataset,
                         k: int = 100, iters: int = 5,
                         damping_pct: int = 85,
                         scale: int = 1_000_000) -> rd.Dataset:
    """Re-crawl prioritization — the link family's capstone and the
    actual CommonCrawl use of a host graph: rank pages by link
    centrality x extraction quality, keep the top-k.

    priority = rank * quality_pct (both BIGINT — exact; at scale=1e6
    the product stays inside int64 up to ~9e16 total rank mass, ample
    for any corpus this engine addresses; shrink ``scale`` beyond
    that). Composition is ONE hash_join of the two family outputs
    (ids + url only) + the partial-top-k shape (per-block top-k, then
    one small sort+limit — never a global sort of every row:
    relational.top_orders)."""
    ranks = pagerank_links_pages(pages_path, iters=iters,
                                 damping_pct=damping_pct,
                                 scale=scale).materialize()
    return frontier_from_ranks(ranks, extracted, k=k)


def _priority_table(ranks: rd.Dataset, extracted: rd.Dataset) -> rd.Dataset:
    """(doc_id, url, rank, quality_pct, priority = rank * quality_pct) —
    the shared frontier composition: ONE hash_join of the two family
    outputs with ids + url only riding the exchange."""
    def qual(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": _doc_id_of_url(t["url"]),
            "url": t["url"],
            "quality_pct": t["quality_pct"].combine_chunks().cast(pa.int64()),
        })

    quality = extracted.map_batches(qual, batch_format="pyarrow")
    joined = hash_join(ranks, quality, "doc_id", "doc_id",
                       ["rank"], ["url", "quality_pct"], how="inner")

    def score(t: pa.Table) -> pa.Table:
        pr = pc.multiply(t["rank"].combine_chunks().cast(pa.int64()),
                         t["quality_pct"].combine_chunks().cast(pa.int64()))
        return t.append_column("priority", pr)

    return joined.map_batches(score, batch_format="pyarrow")


def frontier_from_ranks(ranks: rd.Dataset, extracted: rd.Dataset,
                        k: int = 100) -> rd.Dataset:
    """The frontier core over an ALREADY-COMPUTED (materialized) rank
    table — the run_linkgraph job reuses the ranks it just landed."""
    def topk(t: pa.Table) -> pa.Table:
        pri = t["priority"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -pri))[:k]       # per-block partial top-k
        return t.take(pa.array(order))

    return (_priority_table(ranks, extracted)
            .map_batches(topk, batch_format="pyarrow")
            .sort(["priority", "doc_id"], descending=[True, False])
            .limit(k))


def schedule_from_ranks(ranks: rd.Dataset, extracted: rd.Dataset,
                        num_partitions: int = 32) -> rd.Dataset:
    """Politeness-aware fetch schedule over the WHOLE ranked frontier —
    what a crawler actually consumes: fetching at most ONE url per host
    per round gives ``wave = ROW_NUMBER() OVER (PARTITION BY host ORDER
    BY priority DESC, doc_id)``; wave w is the w-th politeness round's
    fetch set. The url's first path section stands in for the host on
    the single-host corpus (the section_quality_stats convention).

    Shape: the shared priority join, then the keyed-window scan shape
    with a STRING key — tag ``_kp = hash(section) & (P-1)``, ONE
    ``groupby(_kp)`` co-locates every host's rows, per-partition body is
    a single vectorized pandas sort + cumcount (never per-host Python).
    Skew bound: one partition holds ~1/P of the hosts; a single
    pathological host is the limit, same as any keyed window. Returns
    (doc_id, url, section, priority, wave)."""
    from ..functions.hashing import stable_hash64

    P = num_partitions
    if P & (P - 1):
        raise ValueError("num_partitions must be a power of two")

    def sect(t: pa.Table) -> pa.Table:
        urls = t["url"].combine_chunks()
        ex = pc.extract_regex(urls, pattern=r"corpus\.example/(?P<s>[^/]+)/")
        # non-matching urls -> '' (one shared pseudo-host), matching the
        # SQL oracle's regexp_extract; a null here would be DROPPED by
        # pandas groupby and int-cast its wave to garbage
        s = pc.fill_null(pc.struct_field(ex, "s"), "")
        cache: dict[str, int] = {}
        kp = np.fromiter(
            (cache.get(x) if x in cache
             else cache.setdefault(x, stable_hash64(x or "") & (P - 1))
             for x in s.to_pylist()), np.int64, len(t))
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks().cast(pa.int64()),
            "url": urls,
            "section": s,
            "priority": t["priority"].combine_chunks().cast(pa.int64()),
            "_kp": pa.array(kp, pa.int64()),
        })

    def waves(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "url": pd.Series([], dtype="object"),
                "section": pd.Series([], dtype="object"),
                "priority": pd.Series([], dtype="int64"),
                "wave": pd.Series([], dtype="int64")})
        g = g.sort_values(["section", "priority", "doc_id"],
                          ascending=[True, False, True], kind="mergesort")
        g["wave"] = (g.groupby("section", sort=False).cumcount()
                     .to_numpy(np.int64) + 1)
        return g.drop(columns=["_kp"])

    return (_priority_table(ranks, extracted)
            .map_batches(sect, batch_format="pyarrow")
            .groupby("_kp").map_groups(waves, batch_format="pandas"))


def frontier_schedule(sf_dir: str, extracted: rd.Dataset, iters: int = 5,
                      damping_pct: int = 85,
                      scale: int = 1_000_000) -> rd.Dataset:
    """sf-dir driver-query wrapper over ``schedule_from_ranks``."""
    ranks = pagerank_from_edges(
        _cached_edges(sf_dir), page_nodes(_corpus_pages(sf_dir)),
        iters=iters, damping_pct=damping_pct, scale=scale).materialize()
    return schedule_from_ranks(ranks, extracted)


# ---------------------------------------------------------------------------
# DuckDB oracles (analytic derivation of the planted anchors)

_WS_SQL = ("['alpha','beta','gamma','delta','epsilon','zeta','eta','theta',"
           "'iota','kappa','lambda','mu','nu','xi','omicron','pi']")


def _word_sql(doc: str, idx: str) -> str:
    """gen_html._word re-expressed: WORDS[(doc_id*31 + i*7) % 16]."""
    return f"ws.w[(({doc}) * 31 + ({idx}) * 7) % 16 + 1]"


def _anchors_cte() -> str:
    """CTE ``anch(doc_id, link_i, href, anchor)``: every anchor of every
    valid-HTML corpus page, in document order, hrefs resolved absolute.

    Layout derivation (gen_html.build_html):
    * standard kinds (sub <= 49, 60-69, 90, 91, 94): header links
      (4 @ salt 100) -> nav (20) -> ad (6 @ 200) -> sidebar (8 @ 300)
      -> footer (5 @ 400) -> related permalinks (3, spec.REL_PARAMS);
    * div-soup (50-59): two link-soup blocks (7 @ 500, 7 @ 600);
    * oversize (99) carries anchors in its bytes but fails the size
      gate; garbage/empty/pdf kinds sniff away.
    """
    origin = "'https://corpus.example'"
    rel_rows = ", ".join(f"({j}, {a}, {b})"
                         for j, (a, b) in enumerate(spec.REL_PARAMS))
    return f"""ws AS (SELECT {_WS_SQL} AS w),
std AS (
  SELECT doc_id FROM documents
  WHERE doc_id % 100 <= 49 OR (doc_id % 100 BETWEEN 60 AND 69)
     OR doc_id % 100 IN (90, 91, 94)
), soup AS (
  SELECT doc_id FROM documents WHERE doc_id % 100 BETWEEN 50 AND 59
), anch AS (
  SELECT d.doc_id, CAST(seg.off + r.range AS BIGINT) AS link_i,
         {origin} || '/x/' || seg.salt || '/' || r.range AS href,
         {_word_sql('d.doc_id', 'seg.salt + 2 * r.range')} || ' ' ||
         {_word_sql('d.doc_id', 'seg.salt + 2 * r.range + 1')} AS anchor
  FROM std d, ws,
       (VALUES (100, 4, 0), (200, 6, 24), (300, 8, 30), (400, 5, 38))
         seg(salt, cnt, off),
       range(0, 8) r
  WHERE r.range < seg.cnt
  UNION ALL
  SELECT d.doc_id, CAST(4 + r.range AS BIGINT),
         {origin} || '/nav/' || r.range,
         {_word_sql('d.doc_id', 'r.range')} || ' ' ||
         {_word_sql('d.doc_id', 'r.range + 1')}
  FROM std d, ws, range(0, 20) r
  UNION ALL
  SELECT d.doc_id, CAST(43 + p.j AS BIGINT),
         {origin} || '/doc/d' ||
           lpad(CAST((d.doc_id * p.a + p.b) % {spec.REL_HUBS} AS VARCHAR),
                7, '0'),
         {_word_sql('d.doc_id', f'{spec.REL_SALT} + 2 * p.j')} || ' ' ||
         {_word_sql('d.doc_id', f'{spec.REL_SALT} + 2 * p.j + 1')}
  FROM std d, ws, (VALUES {rel_rows}) p(j, a, b)
  UNION ALL
  SELECT d.doc_id, CAST(seg.off + r.range AS BIGINT),
         {origin} || '/x/' || seg.salt || '/' || r.range,
         {_word_sql('d.doc_id', 'seg.salt + 2 * r.range')} || ' ' ||
         {_word_sql('d.doc_id', 'seg.salt + 2 * r.range + 1')}
  FROM soup d, ws, (VALUES (500, 7, 0), (600, 7, 7)) seg(salt, cnt, off),
       range(0, 7) r
)"""


def anchor_text_index_sql() -> str:
    return "WITH " + _anchors_cte() + """
SELECT href,
       CAST(count(*) AS BIGINT) AS n_links,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_pages,
       CAST(sum(length(anchor)) AS BIGINT) AS sum_anchor_chars,
       min(anchor) AS first_anchor
FROM anch GROUP BY href"""


def page_links_sample_sql(mod: int = 17) -> str:
    return "WITH " + _anchors_cte() + f"""
SELECT 'https://corpus.example/' || d.source || '/d'
         || lpad(CAST(d.doc_id AS VARCHAR), 7, '0')
         || (CASE WHEN d.doc_id % 10 = 3 THEN '-memo'
                  WHEN d.doc_id % 10 = 7 THEN '-qp' ELSE '' END) AS url,
       a.link_i, a.href, a.anchor
FROM anch a JOIN documents d ON d.doc_id = a.doc_id
WHERE a.doc_id % {mod} = 0"""


def _edges_sql() -> str:
    rel_rows = ", ".join(f"({a}, {b})" for a, b in spec.REL_PARAMS)
    return f"""e AS (
  SELECT DISTINCT d.doc_id AS src_doc_id,
         CAST((d.doc_id * p.a + p.b) % {spec.REL_HUBS} AS BIGINT)
           AS dst_doc_id
  FROM (SELECT doc_id FROM documents
        WHERE doc_id % 100 <= 49 OR (doc_id % 100 BETWEEN 60 AND 69)
           OR doc_id % 100 IN (90, 91, 94)) d,
       (VALUES {rel_rows}) p(a, b)
)"""


def link_graph_sql() -> str:
    return "WITH " + _edges_sql() + """
SELECT src_doc_id, dst_doc_id FROM e"""


def _pagerank_cte_parts(iters: int = 5, damping_pct: int = 85,
                        scale: int = 1_000_000) -> list[str]:
    """Unrolled-round CTEs over the derived edge table (the
    analytics.pagerank_docs_sql pattern with a per-src outdeg join);
    shared by pagerank_links_sql and crawl_frontier_sql."""
    base = (100 - damping_pct) * scale // 100
    parts = [_edges_sql(), f"""ew AS (
  SELECT e.src_doc_id, e.dst_doc_id, o.outdeg
  FROM e JOIN (SELECT src_doc_id, CAST(count(*) AS BIGINT) AS outdeg
               FROM e GROUP BY src_doc_id) o
    ON o.src_doc_id = e.src_doc_id
), r0 AS (
  SELECT doc_id AS node, CAST({scale} AS BIGINT) AS r FROM documents
)"""]
    for t in range(iters):
        parts.append(f"""r{t + 1} AS (
  SELECT d.doc_id AS node,
         CAST({base} + {damping_pct} * coalesce(s.c, 0) // 100
              AS BIGINT) AS r
  FROM documents d LEFT JOIN (
    SELECT ew.dst_doc_id AS node,
           CAST(sum(r.r // ew.outdeg) AS BIGINT) AS c
    FROM ew JOIN r{t} r ON r.node = ew.src_doc_id
    GROUP BY ew.dst_doc_id
  ) s ON s.node = d.doc_id
)""")
    return parts


def pagerank_links_sql(iters: int = 5, damping_pct: int = 85,
                       scale: int = 1_000_000) -> str:
    parts = _pagerank_cte_parts(iters, damping_pct, scale)
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT node AS doc_id, r AS rank FROM r{iters}")


def crawl_frontier_sql(k: int = 100, iters: int = 5) -> str:
    """base_cte (per-url quality) x the PageRank CTEs, top-k by the
    integer priority product."""
    from .. import oracle
    parts = _pagerank_cte_parts(iters)
    return (oracle.base_cte() + ", " + ",\n".join(parts) + f"""
SELECT x.doc_id, x.url, r.r AS rank, x.quality_pct,
       r.r * x.quality_pct AS priority
FROM expected x JOIN r{iters} r ON r.node = x.doc_id
ORDER BY priority DESC, x.doc_id LIMIT {k}""")


def frontier_schedule_sql(iters: int = 5) -> str:
    """The schedule oracle: the same priority join, then the politeness
    window — ROW_NUMBER per url section ordered by (priority DESC,
    doc_id)."""
    from .. import oracle
    parts = _pagerank_cte_parts(iters)
    return (oracle.base_cte() + ", " + ",\n".join(parts) + f""",
sched AS (
  SELECT x.doc_id, x.url,
         regexp_extract(x.url, 'corpus\\.example/([^/]+)/', 1) AS section,
         r.r * x.quality_pct AS priority
  FROM expected x JOIN r{iters} r ON r.node = x.doc_id
)
SELECT doc_id, url, section, priority,
       CAST(row_number() OVER (PARTITION BY section
                               ORDER BY priority DESC, doc_id)
            AS BIGINT) AS wave
FROM sched""")


# ---------------------------------------------------------------------------
# HITS (Kleinberg hubs & authorities) over the extracted edge table


@ray.remote
def _hits_one_task(iters: int, scale: int, n_node_blocks: int,
                   *blocks: pa.Table) -> pa.Table:
    """All HITS rounds in one task (the _pr_one_task small-graph
    dispatch): vectorized integer updates over dense-remapped ids."""
    node_tabs = [t for t in blocks[:n_node_blocks] if t.num_rows]
    edge_tabs = [t for t in blocks[n_node_blocks:] if t.num_rows]
    nodes = np.sort(np.unique(np.concatenate(
        [t["node"].to_numpy(zero_copy_only=False) for t in node_tabs])
        if node_tabs else np.array([], np.int64)).astype(np.int64))
    n = len(nodes)
    if edge_tabs:
        et = pa.concat_tables(
            [t.select(["src_doc_id", "dst_doc_id"]) for t in edge_tabs])
        src = et["src_doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = et["dst_doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        src = dst = np.array([], np.int64)
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    h = np.full(n, scale, np.int64)
    a = np.zeros(n, np.int64)
    for _ in range(iters):
        a_raw = np.zeros(n, np.int64)
        np.add.at(a_raw, di, h[si])
        am = int(a_raw.max(initial=0))
        a = a_raw * scale // am if am else np.zeros(n, np.int64)
        h_raw = np.zeros(n, np.int64)
        np.add.at(h_raw, si, a[di])
        hm = int(h_raw.max(initial=0))
        h = h_raw * scale // hm if hm else np.zeros(n, np.int64)
    return pa.table({"doc_id": pa.array(nodes),
                     "hub": pa.array(h), "authority": pa.array(a)})


def hits_scores(sf_dir: str, iters: int = 5, scale: int = 1_000_000,
                task_limit: int = 5_000_000) -> rd.Dataset:
    """sf-dir driver-query wrapper over ``hits_from_edges``."""
    edges = _cached_edges(sf_dir)
    return hits_from_edges(edges, page_nodes(_corpus_pages(sf_dir)),
                           iters=iters, scale=scale, task_limit=task_limit)


def hits_from_edges(edges: rd.Dataset, nodes: rd.Dataset,
                    iters: int = 5, scale: int = 1_000_000,
                    task_limit: int = 5_000_000) -> rd.Dataset:
    """Kleinberg's HITS over a (materialized) edge table — PageRank's
    companion centrality (authority = linked-to by good hubs, hub =
    links to good authorities; the ranking the anchor-text index feeds
    in classic web search). Returns (doc_id, hub, authority) over every
    corpus node after ``iters`` mutual-reinforcement rounds.

    Exactness design — normalization WITHOUT floats: the textbook L2
    norm is replaced by max-rescale, ``x*scale // max(x)`` (BIGINT
    floor division, rank-order preserving), so every round is
    integer-exact against the unrolled-CTE DuckDB oracle. Bound:
    max_indegree·scale² < 2^63 (shrink ``scale`` for denser graphs —
    documented, like crawl_frontier's priority product).

    Scale shape mirrors ``pagerank_from_edges``: small graphs run all
    rounds in ONE task; above ``task_limit`` each half-round is ONE
    hash_join (edges x scores) + ONE groupby sum + a zero-presence
    union, and the round max is a driver SCALAR (``Dataset.max`` — the
    global-aggregate O(1)-driver-state shape), then a map-side rescale.
    Per-round materialize + fixed-width repartition stop lineage and
    block-count compounding (the CC-loop lessons)."""
    if edges.count() <= task_limit:
        node_refs = nodes.to_arrow_refs()
        edge_refs = edges.to_arrow_refs()
        return rd.from_arrow_refs([_hits_one_task.remote(
            iters, scale, len(node_refs), *node_refs, *edge_refs)])

    def zero(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"].combine_chunks().cast(pa.int64()),
            "c": pa.array(np.zeros(len(t), np.int64))})

    presence = nodes.map_batches(zero, batch_format="pyarrow").materialize()

    def init(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"].combine_chunks().cast(pa.int64()),
            "r": pa.array(np.full(len(t), scale, np.int64))})

    def half_round(scores: rd.Dataset, key: str, out: str) -> rd.Dataset:
        """sum scores over edges grouped by ``out`` side, max-rescale."""
        contrib = hash_join(edges, scores, key, "node",
                            [out], ["r"], how="inner")

        def emit(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": t[out].combine_chunks().cast(pa.int64()),
                "c": t["r"].combine_chunks().cast(pa.int64())})

        raw = (contrib.map_batches(emit, batch_format="pyarrow")
               .union(presence)
               .groupby("node").aggregate(Sum("c", alias_name="s"))
               .repartition(32)
               .materialize())
        m = raw.max("s")
        m = int(m) if m is not None else 0

        def rescale(t: pa.Table) -> pa.Table:
            s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
            r = s * scale // m if m else np.zeros(len(s), np.int64)
            return pa.table({
                "node": t["node"].combine_chunks().cast(pa.int64()),
                "r": pa.array(r)})

        return raw.map_batches(rescale, batch_format="pyarrow").materialize()

    h = nodes.map_batches(init, batch_format="pyarrow").materialize()
    a = None
    for _ in range(iters):
        a = half_round(h, "src_doc_id", "dst_doc_id")   # authorities
        h = half_round(a, "dst_doc_id", "src_doc_id")   # hubs

    def hub_t(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"].combine_chunks(),
                         "hub": t["r"].combine_chunks()})

    def auth_t(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"].combine_chunks(),
                         "authority": t["r"].combine_chunks()})

    both = hash_join(h.map_batches(hub_t, batch_format="pyarrow"),
                     a.map_batches(auth_t, batch_format="pyarrow"),
                     "node", "node", ["hub"], ["authority"], how="inner")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["node"].combine_chunks(),
                         "hub": t["hub"].combine_chunks(),
                         "authority": t["authority"].combine_chunks()})

    return both.map_batches(finish, batch_format="pyarrow")


def hits_scores_sql(iters: int = 5, scale: int = 1_000_000) -> str:
    """Unrolled mutual-reinforcement rounds over the derived edge table;
    HUGEINT intermediates for the rescale product, BIGINT results (the
    engine's int64 bound is documented in hits_from_edges)."""
    # MATERIALIZED is load-bearing: each round references the prior one
    # twice (sum + max), so an un-materialized chain re-inlines 2^rounds
    # times (the ann_ivf_sql lesson)
    parts = [_edges_sql(), f"""h0 AS MATERIALIZED (
  SELECT doc_id AS node, CAST({scale} AS BIGINT) AS r FROM documents
)"""]
    for t in range(iters):
        parts.append(f"""a{t + 1}raw AS MATERIALIZED (
  SELECT d.doc_id AS node, CAST(coalesce(s.c, 0) AS BIGINT) AS raw
  FROM documents d LEFT JOIN (
    SELECT e.dst_doc_id AS node, CAST(sum(h.r) AS BIGINT) AS c
    FROM e JOIN h{t} h ON h.node = e.src_doc_id GROUP BY e.dst_doc_id
  ) s ON s.node = d.doc_id
), a{t + 1} AS MATERIALIZED (
  SELECT node, CAST(coalesce(
    CAST(raw AS HUGEINT) * {scale} // NULLIF((SELECT max(raw)
      FROM a{t + 1}raw), 0), 0) AS BIGINT) AS r
  FROM a{t + 1}raw
), h{t + 1}raw AS MATERIALIZED (
  SELECT d.doc_id AS node, CAST(coalesce(s.c, 0) AS BIGINT) AS raw
  FROM documents d LEFT JOIN (
    SELECT e.src_doc_id AS node, CAST(sum(a.r) AS BIGINT) AS c
    FROM e JOIN a{t + 1} a ON a.node = e.dst_doc_id
    GROUP BY e.src_doc_id
  ) s ON s.node = d.doc_id
), h{t + 1} AS MATERIALIZED (
  SELECT node, CAST(coalesce(
    CAST(raw AS HUGEINT) * {scale} // NULLIF((SELECT max(raw)
      FROM h{t + 1}raw), 0), 0) AS BIGINT) AS r
  FROM h{t + 1}raw
)""")
    return ("WITH " + ",\n".join(parts) + f"""
SELECT h.node AS doc_id, h.r AS hub, a.r AS authority
FROM h{iters} h JOIN a{iters} a ON a.node = h.node""")


def bfs_depth_from_edges(edges: rd.Dataset, nodes: rd.Dataset,
                         seeds: rd.Dataset, rounds: int = 6) -> rd.Dataset:
    """Bounded-radius BFS over a REAL (materialized) edge table — the
    edge-table variant analytics.bfs_depth_docs' docstring promises
    (that one's edges are a function of the node id, so its round is a
    map-side emit; here each round is ONE hash_join(dist x edges on
    src) + ONE groupby(node).Min fold). ``seeds`` is a (node,) table at
    depth 0; returns (doc_id, depth) over every node in ``nodes``,
    -1 = unreached within ``rounds`` hops.

    Per-round materialize + fixed-width repartition stop lineage/block
    compounding (the CC-loop lessons, stages/dedup.py)."""
    BIG = 1 << 62

    def at_zero(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"].combine_chunks().cast(pa.int64()),
            "d": pa.array(np.zeros(len(t), np.int64))})

    dist = seeds.map_batches(at_zero, batch_format="pyarrow").materialize()
    for _ in range(rounds):
        cand = hash_join(edges, dist, "src_doc_id", "node",
                         ["dst_doc_id"], ["d"], how="inner")

        def step(t: pa.Table) -> pa.Table:
            d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "node": t["dst_doc_id"].combine_chunks().cast(pa.int64()),
                "d": pa.array(d + 1)})

        dist = (dist.union(cand.map_batches(step, batch_format="pyarrow"))
                .groupby("node").aggregate(Min("d", alias_name="dm"))
                .map_batches(lambda t: pa.table(
                    {"node": t["node"], "d": t["dm"]}),
                    batch_format="pyarrow")
                .repartition(32)
                .materialize())

    def pres(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"].combine_chunks().cast(pa.int64()),
            "d": pa.array(np.full(len(t), BIG, np.int64))})

    def finish(t: pa.Table) -> pa.Table:
        d = t["dm"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": t["node"].combine_chunks(),
                         "depth": pa.array(np.where(d >= BIG, -1, d))})

    return (dist.union(nodes.map_batches(pres, batch_format="pyarrow"))
            .groupby("node").aggregate(Min("d", alias_name="dm"))
            .map_batches(finish, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# graph stats + components + the discovery capstone


def link_degree_stats(sf_dir: str) -> rd.Dataset:
    """Per-page in/out degree over the extracted edge table — the
    host-graph degree product CommonCrawl ships next to its ranks
    (isolated pages report 0/0). ONE union of three light emits (out
    per edge src, in per edge dst, zero presence per node) + ONE
    groupby(node) sum — no join at all."""
    edges = _cached_edges(sf_dir)
    nodes = page_nodes(_corpus_pages(sf_dir))

    def out_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "node": t["src_doc_id"].combine_chunks().cast(pa.int64()),
            "o": pa.array(np.ones(n, np.int64)),
            "i": pa.array(np.zeros(n, np.int64))})

    def in_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "node": t["dst_doc_id"].combine_chunks().cast(pa.int64()),
            "o": pa.array(np.zeros(n, np.int64)),
            "i": pa.array(np.ones(n, np.int64))})

    def pres(t: pa.Table) -> pa.Table:
        n = t.num_rows
        z = pa.array(np.zeros(n, np.int64))
        return pa.table({
            "node": t["node"].combine_chunks().cast(pa.int64()),
            "o": z, "i": z})

    # edges feed two emits — materialize so the parse chain runs once
    edges = edges.materialize()
    return (edges.map_batches(out_rows, batch_format="pyarrow")
            .union(edges.map_batches(in_rows, batch_format="pyarrow"))
            .union(nodes.map_batches(pres, batch_format="pyarrow"))
            .groupby("node").aggregate(Sum("o", alias_name="outdeg"),
                                       Sum("i", alias_name="indeg"))
            .map_batches(lambda t: pa.table(
                {"doc_id": t["node"], "outdeg": t["outdeg"],
                 "indeg": t["indeg"]}), batch_format="pyarrow"))


def link_degree_stats_sql() -> str:
    return "WITH " + _edges_sql() + """
SELECT d.doc_id,
       CAST(coalesce(o.c, 0) AS BIGINT) AS outdeg,
       CAST(coalesce(i.c, 0) AS BIGINT) AS indeg
FROM documents d
LEFT JOIN (SELECT src_doc_id, count(*) AS c FROM e GROUP BY src_doc_id) o
  ON o.src_doc_id = d.doc_id
LEFT JOIN (SELECT dst_doc_id, count(*) AS c FROM e GROUP BY dst_doc_id) i
  ON i.dst_doc_id = d.doc_id"""


def link_components(sf_dir: str) -> rd.Dataset:
    """Connected components of the extracted link graph — the
    web-graph component census (CommonCrawl reports a giant component
    + a long singleton tail; this corpus reproduces exactly that: the
    permalink-carrying kinds collapse into one hub-bridged component,
    link-free kinds are singletons). component_id = the component's
    minimum doc_id.

    Engine: the verified distributed CC (stages/dedup.py
    connected_components — min-label propagation + pointer jumping,
    one-task dispatch on small graphs), then one groupby-min union
    with a self-label presence row per page so isolated pages come
    back as their own singleton component (never a join)."""
    edges = _cached_edges(sf_dir)
    nodes = page_nodes(_corpus_pages(sf_dir))
    from ..stages.dedup import connected_components

    cc = connected_components(edges, "src_doc_id", "dst_doc_id")

    def lab(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"].combine_chunks().cast(pa.int64()),
            "l": t["label"].combine_chunks().cast(pa.int64())})

    def selfrow(t: pa.Table) -> pa.Table:
        n = t["node"].combine_chunks().cast(pa.int64())
        return pa.table({"node": n, "l": n})

    return (cc.map_batches(lab, batch_format="pyarrow")
            .union(nodes.map_batches(selfrow, batch_format="pyarrow"))
            .groupby("node").aggregate(Min("l", alias_name="lm"))
            .map_batches(lambda t: pa.table(
                {"doc_id": t["node"], "component_id": t["lm"]}),
                batch_format="pyarrow"))


def link_components_sql(rounds: int = 10) -> str:
    """Min-label propagation UNROLLED (structure-agnostic — no planted
    shortcuts): label0 = own id, each round takes the min over
    neighbors; ``rounds`` exceeds the planted graph's eccentricity
    (docs sit one hop from hubs, hubs bridge through shared docs), and
    an unconverged round count fails the value-hash loudly rather than
    passing approximately. MATERIALIZED per round (each round reads
    the prior twice — the ann_ivf lesson)."""
    parts = [_edges_sql(), """ee AS MATERIALIZED (
  SELECT src_doc_id AS a, dst_doc_id AS b FROM e
  UNION ALL
  SELECT dst_doc_id AS a, src_doc_id AS b FROM e
), l0 AS MATERIALIZED (
  SELECT doc_id AS node, doc_id AS label FROM documents
)"""]
    for t in range(rounds):
        parts.append(f"""l{t + 1} AS MATERIALIZED (
  SELECT n.node, least(n.label, coalesce(m.ml, n.label)) AS label
  FROM l{t} n LEFT JOIN (
    SELECT ee.a AS node, min(l.label) AS ml
    FROM ee JOIN l{t} l ON l.node = ee.b GROUP BY ee.a
  ) m ON m.node = n.node
)""")
    return ("WITH " + ",\n".join(parts) + f"""
SELECT node AS doc_id, CAST(label AS BIGINT) AS component_id
FROM l{rounds}""")


DISCOVER_PRI_BASE = 10 ** 15   # sitemap discoveries outrank any recrawl
# priority (rank*quality <= 1e6*100); the crawl-loop convention: fetch
# never-seen content before refreshing known content


def discovery_frontier(sf_dir: str, extracted: rd.Dataset,
                       k: int = 200, iters: int = 5,
                       damping_pct: int = 85,
                       scale: int = 1_000_000) -> rd.Dataset:
    """The crawl loop's unified fetch plan — the capstone that joins
    the two frontier sources: sitemap DISCOVERY (net-new urls the
    corpus has never crawled, analytics.sitemap_urls) and re-crawl
    PRIORITIZATION (link centrality x extraction quality,
    crawl_frontier). Discoveries rank above every recrawl
    (priority = DISCOVER_PRI_BASE + the sitemap priority digit);
    recrawls keep their rank*quality product. Top-k by (priority DESC,
    url ASC) via the partial-top-k shape — per-block top-k, one small
    sort+limit, never a global sort. Returns (url, kind, priority).

    The two sources are url-disjoint by construction (discoveries are
    exactly the not-in-corpus locs), so the union needs no dedup."""
    from .analytics import sitemap_urls

    ranks = pagerank_from_edges(
        _cached_edges(sf_dir), page_nodes(_corpus_pages(sf_dir)),
        iters=iters, damping_pct=damping_pct, scale=scale).materialize()
    recrawl = _priority_table(ranks, extracted)

    def rec_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "url": t["url"],
            "kind": pa.array(["recrawl"] * n, pa.string()),
            "priority": t["priority"].combine_chunks().cast(pa.int64())})

    def disc_rows(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["in_corpus"], False)
        t = t.filter(keep)
        digit = pc.cast(pc.utf8_slice_codeunits(
            t["priority"].combine_chunks(), 2, 3), pa.int64())
        pri = pc.add(pa.scalar(DISCOVER_PRI_BASE, pa.int64()), digit)
        n = t.num_rows
        return pa.table({
            "url": t["url"],
            "kind": pa.array(["discover"] * n, pa.string()),
            "priority": pri})

    plan = (sitemap_urls(sf_dir).map_batches(disc_rows,
                                             batch_format="pyarrow")
            .union(recrawl.map_batches(rec_rows, batch_format="pyarrow")))

    def topk(t: pa.Table) -> pa.Table:
        pri = t["priority"].to_numpy(zero_copy_only=False)
        urls = np.asarray(t["url"].to_pylist(), dtype=object)
        order = np.lexsort((urls, -pri))[:k]
        return t.take(pa.array(order))

    return (plan.map_batches(topk, batch_format="pyarrow")
            .sort(["priority", "url"], descending=[True, False])
            .limit(k))


def discovery_frontier_sql(k: int = 200, iters: int = 5) -> str:
    """The sitemap-discovery derivation UNION the frontier CTEs, global
    top-k."""
    from .. import oracle
    from .analytics import sitemap_urls_sql

    parts = _pagerank_cte_parts(iters)
    disc = sitemap_urls_sql().strip()
    return (oracle.base_cte() + ", " + ",\n".join(parts) + f""",
disc AS ({disc}),
plan AS (
  SELECT url, 'discover' AS kind,
         CAST({DISCOVER_PRI_BASE} + CAST(substr(priority, 3, 1) AS BIGINT)
              AS BIGINT) AS priority
  FROM disc WHERE NOT in_corpus
  UNION ALL
  SELECT x.url, 'recrawl' AS kind,
         CAST(r.r * x.quality_pct AS BIGINT) AS priority
  FROM expected x JOIN r{iters} r ON r.node = x.doc_id
)
SELECT url, kind, priority FROM plan
ORDER BY priority DESC, url LIMIT {k}""")


@ray.remote
def _tri_one_task(*blocks: pa.Table) -> pa.Table:
    """All triangle counting in one task (the _pr_one_task small-graph
    dispatch): degree-oriented wedge scan over packed-int edge arrays,
    np.isin membership probe — same algorithm, zero exchanges."""
    tabs = [t for t in blocks if t.num_rows]
    if not tabs:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_triangles": pa.array([], pa.int64())})
    et = pa.concat_tables([t.select(["a", "b"]) for t in tabs])
    a = et["a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = et["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(a) and max(int(a.max()), int(b.max())) >= (1 << 31):
        raise ValueError("doc ids exceed the 31-bit pair pack")
    packed = np.unique((a << 31) | b)
    deg: dict[int, int] = {}
    for n in np.concatenate([a, b]):
        deg[int(n)] = deg.get(int(n), 0) + 1
    a_first = np.array([(deg[int(x)], int(x)) < (deg[int(y)], int(y))
                        for x, y in zip(a, b)])
    f = np.where(a_first, a, b)
    t_ = np.where(a_first, b, a)
    order = np.argsort(f, kind="stable")
    f, t_ = f[order], t_[order]
    counts: dict[int, int] = {}
    starts = np.searchsorted(f, np.unique(f))
    bounds = np.append(starts, len(f))
    uniq = np.unique(f)
    for ui in range(len(uniq)):
        ns = np.sort(t_[bounds[ui]:bounds[ui + 1]])
        if len(ns) < 2:
            continue
        i, j = np.triu_indices(len(ns), k=1)
        hit = np.isin((ns[i] << 31) | ns[j], packed)
        if not hit.any():
            continue
        node = int(uniq[ui])
        counts[node] = counts.get(node, 0) + int(hit.sum())
        for x in np.concatenate([ns[i][hit], ns[j][hit]]):
            counts[int(x)] = counts.get(int(x), 0) + 1
    ks = sorted(counts)
    return pa.table({"doc_id": pa.array(ks, pa.int64()),
                     "n_triangles": pa.array([counts[k] for k in ks],
                                             pa.int64())})


def triangle_counts(sf_dir: str, task_limit: int = 5_000_000) -> rd.Dataset:
    """Per-page triangle participation over the (undirected) extracted
    link graph — the clustering-coefficient numerator of web-graph
    analytics (a page in many triangles sits in a densely interlinked
    neighborhood; spam farms light this up). Returns (doc_id,
    n_triangles) for pages in at least one triangle.

    Algorithm: degree orientation (the distributed-triangle standard):
    each undirected edge orients from its lower-(degree, id) endpoint,
    bounding every out-list by O(sqrt(edges)) — on this graph the
    low-degree DOCS orient toward their few hubs, so wedge generation
    is ~C(6,2) per doc instead of C(in-degree, 2) per hub. Stages: one
    hash-partition distinct (canonical a<b edges), ONE groupby for
    degrees, two hash_joins to attach them, a keyed-partition wedge
    emit, and ONE semi hash_join of wedges against the edge set on a
    packed (b<<31|c) pair key (doc ids must fit 31 bits — asserted;
    widen the pack for larger id spaces). Per-node credit is one final
    groupby over 3 emits per triangle. The count is
    orientation-invariant, so the SQL oracle verifies with a plain
    ordered triple join."""
    from ray.data.aggregate import Count

    edges = _cached_edges(sf_dir)

    def canon(t: pa.Table) -> pa.Table:
        s = t["src_doc_id"].to_numpy(zero_copy_only=False)
        d = t["dst_doc_id"].to_numpy(zero_copy_only=False)
        keep = s != d                       # self-links form no triangle
        s, d = s[keep], d[keep]
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    ue = _hash_partition_distinct(
        edges.map_batches(canon, batch_format="pyarrow"),
        ["a", "b"], "a").materialize()
    if ue.count() <= task_limit:
        return rd.from_arrow_refs(
            [_tri_one_task.remote(*ue.to_arrow_refs())])

    def ends(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().cast(pa.int64())
        b = t["b"].combine_chunks().cast(pa.int64())
        return pa.table({"n": pa.chunked_array([a, b]).combine_chunks()})

    deg = (ue.map_batches(ends, batch_format="pyarrow")
           .groupby("n").aggregate(Count(alias_name="deg"))).materialize()

    with_da = hash_join(ue, deg, "a", "n", ["b"], ["deg"], how="inner")

    def swap(t: pa.Table) -> pa.Table:
        return pa.table({"b": t["b"].combine_chunks().cast(pa.int64()),
                         "a2": t["a"].combine_chunks().cast(pa.int64()),
                         "deg_a": t["deg"].combine_chunks().cast(pa.int64())})

    # pinned: hash_join probes schema() (executes lineage), so the
    # first join's shuffle must not re-run for the second's probe
    swapped = (with_da.map_batches(swap, batch_format="pyarrow")
               .materialize())
    both = hash_join(swapped, deg, "b", "n",
                     ["a2", "deg_a"], ["deg"], how="inner")

    def orient(t: pa.Table) -> pa.Table:
        a = t["a2"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        da = t["deg_a"].to_numpy(zero_copy_only=False)
        db = t["deg"].to_numpy(zero_copy_only=False)
        if len(a) and max(int(a.max()), int(b.max())) >= (1 << 31):
            raise ValueError("doc ids exceed the 31-bit pair pack")
        a_first = (da < db) | ((da == db) & (a < b))
        f = np.where(a_first, a, b)
        to = np.where(a_first, b, a)
        return pa.table({"f": pa.array(f), "t": pa.array(to),
                         "_kp": pa.array(f & 31)})

    oriented = both.map_batches(orient, batch_format="pyarrow")

    def wedges(g: pd.DataFrame) -> pa.Table:
        a_o, b_o, c_o = [], [], []
        for f, grp in g.groupby("f", sort=False):
            ns = np.sort(grp["t"].to_numpy(np.int64))
            if len(ns) < 2:
                continue
            i, j = np.triu_indices(len(ns), k=1)
            a_o.append(np.full(len(i), f, np.int64))
            b_o.append(ns[i])
            c_o.append(ns[j])
        if a_o:
            a = np.concatenate(a_o)
            b = np.concatenate(b_o)
            c = np.concatenate(c_o)
        else:
            a = b = c = np.array([], np.int64)
        return pa.table({"wa": pa.array(a), "wb": pa.array(b),
                         "wc": pa.array(c),
                         "k": pa.array((b << 31) | c)})

    # pinned: the semi hash_join probes schema() (executes lineage)
    # before shuffling — without the pin the wedge chain runs twice
    w = (oriented.groupby("_kp")
         .map_groups(wedges, batch_format="pandas").materialize())

    def ekey(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array((a << 31) | b)})

    tri = hash_join(w, ue.map_batches(ekey, batch_format="pyarrow"),
                    "k", "k", ["wa", "wb", "wc"], [], how="semi")

    def credit(t: pa.Table) -> pa.Table:
        nodes = np.concatenate([t["wa"].to_numpy(zero_copy_only=False),
                                t["wb"].to_numpy(zero_copy_only=False),
                                t["wc"].to_numpy(zero_copy_only=False)])
        return pa.table({"n": pa.array(nodes)})

    return (tri.map_batches(credit, batch_format="pyarrow")
            .groupby("n").aggregate(Count(alias_name="n_triangles"))
            .map_batches(lambda t: pa.table(
                {"doc_id": t["n"], "n_triangles": t["n_triangles"]}),
                batch_format="pyarrow"))


def triangle_counts_sql() -> str:
    """Orientation-invariant verification: ordered x<y<z triple join
    over the canonical undirected derived edges, 3 credits per
    triangle."""
    return "WITH " + _edges_sql() + """,
ue AS MATERIALIZED (
  SELECT DISTINCT least(src_doc_id, dst_doc_id) AS a,
         greatest(src_doc_id, dst_doc_id) AS b
  FROM e WHERE src_doc_id <> dst_doc_id
), tri AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ue e1
  JOIN ue e2 ON e2.a = e1.b
  JOIN ue e3 ON e3.a = e1.a AND e3.b = e2.b
), picks AS (
  SELECT x AS n FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT n AS doc_id, CAST(count(*) AS BIGINT) AS n_triangles
FROM picks GROUP BY n"""


def cocitation_pairs(sf_dir: str, min_pct: int = 20) -> rd.Dataset:
    """Co-citation "related pages" — the classic link-structure
    similarity (Small 1973; the signal behind "similar pages" in early
    web search): two pages are related when the SAME sources link to
    both. For every page pair a < b with at least one co-citing source:
    n_common = |in(a) ∩ in(b)| (distinct sources linking both) and
    jaccard_pct = 100·n_common // (indeg_a + indeg_b − n_common); pairs
    below ``min_pct`` percent overlap drop. Pure integers throughout.

    Shape: pair generation is the WEDGE emit bounded by the SOURCE
    side's out-degree (the ``triangle_counts`` bound — out-lists here
    are ≤ 3 anchors, and real crawls cap links-per-page, so this never
    explodes the way pairing by in-degree at a hub would): one
    hash-partition distinct over the directed edges, a keyed-partition
    per-src pair emit, ONE groupby(pair) count, in-degrees via ONE
    groupby, two hash_joins to attach them, map-side filter."""
    edges = _cached_edges(sf_dir)

    def sd(t: pa.Table) -> pa.Table:
        return pa.table({
            "s": t["src_doc_id"].combine_chunks().cast(pa.int64()),
            "d": t["dst_doc_id"].combine_chunks().cast(pa.int64())})

    ue = _hash_partition_distinct(
        edges.map_batches(sd, batch_format="pyarrow"),
        ["s", "d"], "s").materialize()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_kp", pc.bit_wise_and(t["s"].combine_chunks(), 31))

    def pairs(g: pd.DataFrame) -> pa.Table:
        a_o, b_o = [], []
        for _, grp in g.groupby("s", sort=False):
            ns = np.sort(grp["d"].to_numpy(np.int64))
            if len(ns) < 2:
                continue
            i, j = np.triu_indices(len(ns), k=1)
            a_o.append(ns[i])
            b_o.append(ns[j])
        a = np.concatenate(a_o) if a_o else np.array([], np.int64)
        b = np.concatenate(b_o) if b_o else np.array([], np.int64)
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    inter = (ue.map_batches(tag, batch_format="pyarrow")
             .groupby("_kp").map_groups(pairs, batch_format="pandas")
             .groupby(["a", "b"]).aggregate(Count(alias_name="n_common"))
             .materialize())
    indeg = (ue.groupby("d").aggregate(Count(alias_name="deg"))
             .materialize())

    j1 = hash_join(inter, indeg, "a", "d",
                   ["a", "b", "n_common"], ["deg"], how="inner")

    def r1(t: pa.Table) -> pa.Table:
        return pa.table({"a": t["a"], "b": t["b"], "n_common": t["n_common"],
                         "deg_a": t["deg"].combine_chunks().cast(pa.int64())})

    # pin: hash_join probes schema() (executes lineage) — without the
    # materialize the first join's shuffle re-runs for the second probe
    j1m = j1.map_batches(r1, batch_format="pyarrow").materialize()
    j2 = hash_join(j1m, indeg, "b", "d",
                   ["a", "b", "n_common", "deg_a"], ["deg"], how="inner")

    def finish(t: pa.Table) -> pa.Table:
        nc = t["n_common"].to_numpy(zero_copy_only=False).astype(np.int64)
        da = t["deg_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        db = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        union = da + db - nc
        keep = 100 * nc >= min_pct * union
        out = pa.table({
            "doc_a": t["a"].combine_chunks().cast(pa.int64()),
            "doc_b": t["b"].combine_chunks().cast(pa.int64()),
            "n_common": pa.array(nc),
            "jaccard_pct": pa.array(100 * nc // union)})
        return out.filter(pa.array(keep))

    return j2.map_batches(finish, batch_format="pyarrow")


def cocitation_pairs_sql(min_pct: int = 20) -> str:
    """Self-join derivation over the planted directed edges — the
    orientation-free ground truth the wedge emit must reproduce."""
    return "WITH " + _edges_sql() + f""",
pairs AS (
  SELECT e1.dst_doc_id AS a, e2.dst_doc_id AS b,
         CAST(count(*) AS BIGINT) AS n_common
  FROM e e1 JOIN e e2
    ON e2.src_doc_id = e1.src_doc_id
   AND e1.dst_doc_id < e2.dst_doc_id
  GROUP BY 1, 2
), ind AS (
  SELECT dst_doc_id AS n, CAST(count(*) AS BIGINT) AS deg
  FROM e GROUP BY 1
)
SELECT p.a AS doc_a, p.b AS doc_b, p.n_common,
       CAST(100 * p.n_common // (ia.deg + ib.deg - p.n_common)
            AS BIGINT) AS jaccard_pct
FROM pairs p
JOIN ind ia ON ia.n = p.a
JOIN ind ib ON ib.n = p.b
WHERE 100 * p.n_common >= {min_pct} * (ia.deg + ib.deg - p.n_common)"""


@ray.remote
def _kcore_one_task(k: int, rounds: int, *blocks: pa.Table) -> pa.Table:
    """All peel rounds in one task (dispatched when the canonical
    undirected edge count is under ``task_limit`` — the _pr_one_task /
    _cc_one_task lesson: on small graphs each distributed round costs
    an all-to-all that dwarfs the arithmetic; kcore paid THREE per
    round). Vectorized: per round one degree fold over dense-remapped
    ids + one sorted-membership mask; an emptied edge set is a fixed
    point, so breaking early equals the oracle's fixed unroll."""
    tabs = [t for t in blocks if t.num_rows]
    if tabs:
        et = pa.concat_tables([t.select(["a", "b"]) for t in tabs])
        a = et["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = et["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        a = b = np.array([], np.int64)
    for _ in range(rounds):
        if not len(a):
            break
        nodes = np.unique(np.concatenate([a, b]))
        deg = np.zeros(len(nodes), np.int64)
        ai = np.searchsorted(nodes, a)
        bi = np.searchsorted(nodes, b)
        np.add.at(deg, ai, 1)
        np.add.at(deg, bi, 1)
        alive = deg >= k
        keep = alive[ai] & alive[bi]
        if keep.all():
            break  # fixed point
        a, b = a[keep], b[keep]
    if not len(a):
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "deg": pa.array([], pa.int64())})
    nodes = np.unique(np.concatenate([a, b]))
    deg = np.zeros(len(nodes), np.int64)
    np.add.at(deg, np.searchsorted(nodes, a), 1)
    np.add.at(deg, np.searchsorted(nodes, b), 1)
    m = deg >= k
    return pa.table({"doc_id": pa.array(nodes[m]),
                     "deg": pa.array(deg[m])})


def kcore_nodes(sf_dir: str, k: int = 3, rounds: int = 6,
                task_limit: int = 5_000_000) -> rd.Dataset:
    """k-core decomposition (membership at a fixed k) — the density
    census web-graph and community pipelines run after the component
    census (``link_components``): iteratively PEEL every node with
    undirected degree < k until a fixed point; what survives is the
    k-core (spam-farm and community-core detection both key on it).
    Returns (doc_id, deg) for members, deg = degree inside the core.

    Engine: small graphs (canonical edge count <= ``task_limit``) run
    every peel round in ONE Ray task (``_kcore_one_task`` — the
    _pr_one_task precedent; the distributed peel paid THREE
    all-to-alls per round, ~50 s at sf0.01 vs ~5 s one-task). Above
    the limit, ``rounds`` distributed peel iterations over the
    canonical undirected edge table — per round ONE ends-union groupby
    for degrees, the alive filter, and TWO semi hash_joins restricting
    edges to alive∧alive (per-round materialize + fixed-width
    repartition: the CC-loop lineage lessons); the forced-distributed
    path stays pytest-pinned value-identical. The planted hub graph converges in ≤ 2
    rounds (docs with a collided hub pair — d ≡ 5 (mod 8) — peel at
    k = 3, hubs never do); convergence at ``rounds`` is pytest-pinned,
    and the oracle unrolls the SAME fixed round count, so an
    unconverged graph fails the value-hash loudly."""
    edges = _cached_edges(sf_dir)

    def canon(t: pa.Table) -> pa.Table:
        s = t["src_doc_id"].to_numpy(zero_copy_only=False)
        d = t["dst_doc_id"].to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"a": pa.array(np.minimum(s, d)),
                         "b": pa.array(np.maximum(s, d))})

    ue = _hash_partition_distinct(
        edges.map_batches(canon, batch_format="pyarrow"),
        ["a", "b"], "a").materialize()
    if ue.count() <= task_limit:
        return rd.from_arrow_refs(
            [_kcore_one_task.remote(k, rounds, *ue.to_arrow_refs())])

    def ends(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().cast(pa.int64())
        b = t["b"].combine_chunks().cast(pa.int64())
        return pa.table({"n": pa.chunked_array([a, b]).combine_chunks()})

    def degrees(es: rd.Dataset) -> rd.Dataset:
        return (es.map_batches(ends, batch_format="pyarrow")
                .groupby("n").aggregate(Count(alias_name="deg")))

    kk = pa.scalar(k, pa.int64())

    def alive_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["deg"], kk)).select(["n"])

    for _ in range(rounds):
        alive = (degrees(ue)
                 .map_batches(alive_only, batch_format="pyarrow")
                 .materialize())
        ue = hash_join(ue, alive, "a", "n", ["a", "b"], [],
                       how="semi").materialize()
        ue = (hash_join(ue, alive, "b", "n", ["a", "b"], [], how="semi")
              .repartition(32).materialize())

    def members(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.greater_equal(t["deg"], kk))
        return pa.table({"doc_id": keep["n"], "deg": keep["deg"]})

    return degrees(ue).map_batches(members, batch_format="pyarrow")


def kcore_nodes_sql(k: int = 3, rounds: int = 6) -> str:
    """The peel UNROLLED: per round degrees → alive → both-ends-alive
    edge restriction; MATERIALIZED per round (each round's edge table
    is read three times — the ann_ivf re-inlining lesson)."""
    parts = [_edges_sql(), """ue0 AS MATERIALIZED (
  SELECT DISTINCT least(src_doc_id, dst_doc_id) AS a,
         greatest(src_doc_id, dst_doc_id) AS b
  FROM e WHERE src_doc_id <> dst_doc_id
)"""]
    for t in range(rounds):
        parts.append(f"""d{t} AS MATERIALIZED (
  SELECT n, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT a AS n FROM ue{t} UNION ALL SELECT b FROM ue{t}
  ) GROUP BY n
), al{t} AS MATERIALIZED (
  SELECT n FROM d{t} WHERE deg >= {k}
), ue{t + 1} AS MATERIALIZED (
  SELECT u.a, u.b FROM ue{t} u
  WHERE EXISTS (SELECT 1 FROM al{t} x WHERE x.n = u.a)
    AND EXISTS (SELECT 1 FROM al{t} y WHERE y.n = u.b)
)""")
    return ("WITH " + ",\n".join(parts) + f"""
SELECT n AS doc_id, deg FROM (
  SELECT n, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT a AS n FROM ue{rounds} UNION ALL SELECT b FROM ue{rounds}
  ) GROUP BY n
) WHERE deg >= {k}""")


# ---------------------------------------------------------------------------
# label-propagation communities (session 7)
# ---------------------------------------------------------------------------

LPA_LABEL_BITS = 33   # labels are doc ids < 2^33; vote counts < 2^30 —
# the composed argmax key (count << 33 | (MASK - label)) is the
# cluster_keep_best pattern and shares its documented bound


def _lpa_one_task(rounds: int, n_node_blocks: int,
                  *blocks: pa.Table) -> pa.Table:
    """All LPA rounds in one task (dispatched when the edge count is
    under ``task_limit`` — the _pr_one_task lesson): synchronous
    majority vote over dense-remapped ids, mode per node via ONE
    lexsort over (node, -count, label) per round."""
    node_tabs = [t for t in blocks[:n_node_blocks] if t.num_rows]
    edge_tabs = [t for t in blocks[n_node_blocks:] if t.num_rows]
    nodes = np.sort(np.unique(np.concatenate(
        [t["node"].to_numpy(zero_copy_only=False) for t in node_tabs])
        if node_tabs else np.array([], np.int64)).astype(np.int64))
    n = len(nodes)
    if edge_tabs:
        et = pa.concat_tables(
            [t.select(["src_doc_id", "dst_doc_id"]) for t in edge_tabs])
        s = et["src_doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = et["dst_doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
    else:
        s = d = np.array([], np.int64)
    # undirected: votes flow both ways
    a = np.concatenate([np.searchsorted(nodes, s),
                        np.searchsorted(nodes, d)])
    b = np.concatenate([np.searchsorted(nodes, d),
                        np.searchsorted(nodes, s)])
    lab = nodes.copy()
    for _ in range(rounds):
        vl = lab[b]                      # neighbor labels voting for a
        # count (a, vl) pairs: composite sort over the pair
        order = np.lexsort((vl, a))
        aa, ll = a[order], vl[order]
        new_pair = np.empty(len(aa), bool)
        if len(aa):
            new_pair[0] = True
            new_pair[1:] = (aa[1:] != aa[:-1]) | (ll[1:] != ll[:-1])
        starts = np.flatnonzero(new_pair)
        cnt = np.diff(np.append(starts, len(aa)))
        pn, pl = aa[starts], ll[starts]
        # mode per node: order by (node, -count, label), take first
        o2 = np.lexsort((pl, -cnt, pn))
        pn, pl = pn[o2], pl[o2]
        first = np.empty(len(pn), bool)
        if len(pn):
            first[0] = True
            first[1:] = pn[1:] != pn[:-1]
        nxt = lab.copy()
        nxt[pn[first]] = pl[first]
        lab = nxt
    return pa.table({"doc_id": pa.array(nodes),
                     "community_id": pa.array(lab)})


def lpa_from_edges(edges: rd.Dataset, nodes: rd.Dataset,
                   rounds: int = 4,
                   task_limit: int = 5_000_000) -> rd.Dataset:
    """Label-propagation communities (Raghavan et al. 2007, the
    synchronous deterministic variant) over an edge table: label0 =
    own id; each round every node adopts the MODE of its undirected
    neighbors' labels (tie → min label; no neighbors → keep). A fixed
    round count makes the algorithm deterministic on both engines
    (synchronous LPA can oscillate on bipartite subgraphs — the fixed
    unroll sidesteps convergence arguments the way link_components'
    oracle does). Unlike connected components (min-label), the
    majority vote splits a connected hub-bridged graph into per-hub
    communities — the community census, not the component census.

    Shape per distributed round: ONE hash_join ships labels to edge
    endpoints, ONE groupby(node, label) counts votes, the mode folds
    via the composed-argmax-key groupby (never per-node Python), and
    a zero-presence union keeps isolated nodes (the pagerank
    pattern). Small graphs run every round in ONE task."""
    if edges.count() <= task_limit:
        node_refs = nodes.to_arrow_refs()
        edge_refs = edges.to_arrow_refs()
        return rd.from_arrow_refs([ray.remote(_lpa_one_task).remote(
            rounds, len(node_refs), *node_refs, *edge_refs)])

    MASK = (1 << LPA_LABEL_BITS) - 1

    def undirected(t: pa.Table) -> pa.Table:
        s = t["src_doc_id"].combine_chunks().cast(pa.int64())
        d = t["dst_doc_id"].combine_chunks().cast(pa.int64())
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table({
            "a": pa.chunked_array([s, d]).combine_chunks(),
            "b": pa.chunked_array([d, s]).combine_chunks()})

    ee = edges.map_batches(undirected, batch_format="pyarrow").materialize()

    def init(t: pa.Table) -> pa.Table:
        n = t["node"].combine_chunks().cast(pa.int64())
        return pa.table({"node": n, "l": n})

    labels = nodes.map_batches(init, batch_format="pyarrow").materialize()

    for _ in range(rounds):
        votes = hash_join(ee, labels, "b", "node", ["a"], ["l"],
                          how="inner")
        cnts = votes.groupby(["a", "l"]).aggregate(Count(alias_name="c"))

        def argkey(t: pa.Table) -> pa.Table:
            c = t["c"].combine_chunks().cast(pa.int64())
            l = t["l"].combine_chunks().cast(pa.int64())
            k = pc.bit_wise_or(
                pc.shift_left(c, pa.scalar(LPA_LABEL_BITS, pa.int64())),
                pc.subtract(pa.scalar(MASK, pa.int64()), l))
            return pa.table({"node": t["a"].combine_chunks().cast(pa.int64()),
                             "k": k})

        modes = (cnts.map_batches(argkey, batch_format="pyarrow")
                 .groupby("node").aggregate(Max("k", alias_name="km")))

        # merge: the mode row (flag 1) wins over the carried old label
        # (flag 0); at most one mode row per node exists, so Max over
        # (flag << LPA_LABEL_BITS | label) decodes exactly
        def mode_row(t: pa.Table) -> pa.Table:
            ml = pc.subtract(
                pa.scalar(MASK, pa.int64()),
                pc.bit_wise_and(t["km"].combine_chunks().cast(pa.int64()),
                                pa.scalar(MASK, pa.int64())))
            f = pc.bit_wise_or(
                pc.shift_left(pa.scalar(1, pa.int64()),
                              pa.scalar(LPA_LABEL_BITS, pa.int64())),
                ml)
            return pa.table({"node": t["node"].combine_chunks(), "f": f})

        def old_row(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": t["node"].combine_chunks().cast(pa.int64()),
                "f": t["l"].combine_chunks().cast(pa.int64())})

        def decode(t: pa.Table) -> pa.Table:
            l = pc.bit_wise_and(t["fm"].combine_chunks().cast(pa.int64()),
                                pa.scalar(MASK, pa.int64()))
            return pa.table({"node": t["node"].combine_chunks(), "l": l})

        labels = (modes.map_batches(mode_row, batch_format="pyarrow")
                  .union(labels.map_batches(old_row, batch_format="pyarrow"))
                  .groupby("node").aggregate(Max("f", alias_name="fm"))
                  .map_batches(decode, batch_format="pyarrow")
                  .repartition(32).materialize())

    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["node"],
                            "community_id": t["l"]}),
        batch_format="pyarrow")


def lpa_communities(sf_dir: str, rounds: int = 4,
                    task_limit: int = 5_000_000) -> rd.Dataset:
    """LPA community census of the extracted link graph — the planted
    hub graph splits into per-hub communities (docs adopt their min
    hub's gravity) rather than link_components' single giant
    component; link-free pages stay their own singleton community."""
    pages = _corpus_pages(sf_dir)
    edges = _cached_edges(sf_dir)
    nodes = page_nodes(pages)
    return lpa_from_edges(edges, nodes, rounds=rounds,
                          task_limit=task_limit)


def lpa_communities_sql(rounds: int = 4) -> str:
    """The synchronous majority vote UNROLLED: per round neighbor
    votes → QUALIFY mode (count DESC, label ASC) → COALESCE keep-own.
    MATERIALIZED per round (the ann_ivf re-inlining lesson)."""
    parts = [_edges_sql(), """ee AS MATERIALIZED (
  SELECT src_doc_id AS a, dst_doc_id AS b FROM e
  WHERE src_doc_id <> dst_doc_id
  UNION ALL
  SELECT dst_doc_id AS a, src_doc_id AS b FROM e
  WHERE src_doc_id <> dst_doc_id
), l0 AS MATERIALIZED (
  SELECT doc_id AS node, doc_id AS label FROM documents
)"""]
    for t in range(rounds):
        parts.append(f"""m{t} AS MATERIALIZED (
  SELECT ee.a AS node, l.label AS ml
  FROM ee JOIN l{t} l ON l.node = ee.b
  GROUP BY ee.a, l.label
  QUALIFY row_number() OVER (PARTITION BY ee.a
                             ORDER BY count(*) DESC, l.label) = 1
), l{t + 1} AS MATERIALIZED (
  SELECT n.node, COALESCE(m.ml, n.label) AS label
  FROM l{t} n LEFT JOIN m{t} m ON m.node = n.node
)""")
    return ("WITH " + ",\n".join(parts) + f"""
SELECT node AS doc_id, CAST(label AS BIGINT) AS community_id
FROM l{rounds}""")


# ---------------------------------------------------------------------------
# in-link titles via the skew-aware join (session 7)
# ---------------------------------------------------------------------------


def inlink_titles(sf_dir: str, hot_threshold: int = 30,
                  stats_out: dict | None = None) -> rd.Dataset:
    """Anchor-context assembly — attach the TARGET page's title to
    every link edge (the WAT-enrichment join behind anchor-text
    search): edges ⋈ page titles on dst. The dst side is the textbook
    skew case — the 16 planted hubs each collect ~N/16 in-links while
    every other page collects ~0 — so the join runs through
    ``stages/joins.skew_join``: hub titles broadcast (16 rows), hub
    edges join map-side with zero shuffle, the cold tail (here:
    empty) takes the ordinary hash_join. Returns (dst_doc_id,
    src_doc_id, title); non-HTML targets drop (inner).

    ``hot_threshold`` defaults LOW because hub in-degree scales with
    the corpus — at test scale ~57, at 100 TB ~10⁸; the threshold is
    a per-key row bound, so one number serves both ends of that range
    poorly and callers at scale should raise it toward the point
    where a single task's share of one key becomes the straggler."""
    from ..stages.joins import skew_join

    pages = _corpus_pages(sf_dir)
    edges = _cached_edges(sf_dir)
    meta = page_metadata(pages)

    def with_id(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": _doc_id_of_url(t["url"]),
                         "title": t["title"]})

    titles = meta.map_batches(with_id, batch_format="pyarrow").materialize()
    return skew_join(edges, titles, "dst_doc_id", "doc_id",
                     ["src_doc_id"], ["title"],
                     hot_threshold=hot_threshold, stats_out=stats_out)


def inlink_titles_sql() -> str:
    return f"""
WITH {_edges_sql()}, ti AS (
  SELECT doc_id, source || ' d' || CAST(doc_id AS VARCHAR) AS title
  FROM documents
  WHERE doc_id % 100 <= 69 OR doc_id % 100 IN (90, 91, 94)
)
SELECT e.dst_doc_id, e.src_doc_id, ti.title
FROM e JOIN ti ON ti.doc_id = e.dst_doc_id"""


# ---------------------------------------------------------------------------
# mutual (reciprocal) links — session 8
# ---------------------------------------------------------------------------


def mutual_links(sf_dir: str) -> rd.Dataset:
    """Reciprocal-link detection over the extracted edge table — the
    web-graph census statistic (mutual links signal navigation
    templates / link exchanges vs organic citation; the directed
    graph's symmetric core): unordered pairs (a, b) with BOTH a→b and
    b→a present.

    Shape: the distinct edge table maps to (packed pair key, direction
    bit) — pack = lo·2³² + hi (doc ids < 2³¹), bit 1 for lo→hi, 2 for
    hi→lo — and ONE groupby(pack) sums the bits; mutual ⟺ sum == 3
    (edges are distinct, so each direction contributes its bit at most
    once). Self-loops excluded. Returns (lo_doc_id, hi_doc_id)."""
    edges = _cached_edges(sf_dir)

    def tag(t: pa.Table) -> pa.Table:
        s = t["src_doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst_doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = s != d
        s, d = s[m], d[m]
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        bit = np.where(s < d, 1, 2).astype(np.int64)
        return pa.table({"pk": pa.array((lo << 32) + hi, pa.int64()),
                         "b": pa.array(bit, pa.int64())})

    def unpack(t: pa.Table) -> pa.Table:
        m = pc.equal(t["s"], 3)
        kept = t.filter(m)
        pk = kept["pk"].to_numpy(zero_copy_only=False)
        return pa.table({
            "lo_doc_id": pa.array(pk >> 32, pa.int64()),
            "hi_doc_id": pa.array(pk & ((1 << 32) - 1), pa.int64())})

    return (edges.map_batches(tag, batch_format="pyarrow")
            .groupby("pk").aggregate(Sum("b", alias_name="s"))
            .map_batches(unpack, batch_format="pyarrow"))


def mutual_links_sql() -> str:
    return "WITH " + _edges_sql() + """
SELECT DISTINCT
       CAST(least(e1.src_doc_id, e1.dst_doc_id) AS BIGINT) AS lo_doc_id,
       CAST(greatest(e1.src_doc_id, e1.dst_doc_id) AS BIGINT) AS hi_doc_id
FROM e e1 JOIN e e2
  ON e1.src_doc_id = e2.dst_doc_id AND e1.dst_doc_id = e2.src_doc_id
WHERE e1.src_doc_id < e1.dst_doc_id"""


# ---------------------------------------------------------------------------
# personalized PageRank (per-seed restart) over the extracted edges
# (session 10) — the "related pages for page X" primitive: one rank
# VECTOR per seed (trustrank_docs restarts at a seed SET and yields one
# global vector; PPR keeps the seeds separate).


PPR_SEEDS = (0, 1, 2)
PPR_ITERS = 4


@ray.remote
def _ppr_one_task(seeds, iters: int, damping_pct: int, scale: int,
                  n_node_blocks: int, *blocks: pa.Table) -> pa.Table:
    """All seeds × all rounds in one task (the _pr_one_task dispatch):
    per seed, the integer restart-gated update
    r' = base·[v==seed] + d·Σ(r_u // outdeg_u) // 100 from
    r0 = scale·[v==seed]."""
    node_tabs = [t for t in blocks[:n_node_blocks] if t.num_rows]
    edge_tabs = [t for t in blocks[n_node_blocks:] if t.num_rows]
    nodes = np.sort(np.unique(np.concatenate(
        [t["node"].to_numpy(zero_copy_only=False) for t in node_tabs])
        if node_tabs else np.array([], np.int64)).astype(np.int64))
    n = len(nodes)
    if edge_tabs:
        et = pa.concat_tables(
            [t.select(["src_doc_id", "dst_doc_id"]) for t in edge_tabs])
        src = et["src_doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = et["dst_doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        src = dst = np.array([], np.int64)
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    deg = np.zeros(n, np.int64)
    np.add.at(deg, si, 1)
    outdeg = deg[si]
    base = (100 - damping_pct) * scale // 100
    outs = []
    for sd in seeds:
        pos = int(np.searchsorted(nodes, sd))
        seeded = pos < n and nodes[pos] == sd
        r = np.zeros(n, np.int64)
        if seeded:
            r[pos] = scale
        for _ in range(iters):
            s = np.zeros(n, np.int64)
            np.add.at(s, di, r[si] // outdeg)
            r = damping_pct * s // 100
            if seeded:
                r[pos] += base
        outs.append(pa.table({
            "seed_id": pa.array(np.full(n, sd, np.int64)),
            "doc_id": pa.array(nodes), "rank": pa.array(r)}))
    return pa.concat_tables(outs)


def ppr_related(sf_dir: str, seeds=PPR_SEEDS, iters: int = PPR_ITERS,
                damping_pct: int = 85, scale: int = 1_000_000,
                task_limit: int = 5_000_000) -> rd.Dataset:
    """Personalized PageRank over the EXTRACTED link graph: for each
    seed page, the restart-at-that-seed random walk (Jeh & Widom 2003
    / the SALSA-era "related pages" query) — trust/relatedness decays
    with link distance from THE seed, spam islands score 0, and each
    seed gets its own vector. Pure-integer law (floor divisions), so
    the unrolled per-seed CTE oracle hash-matches.

    Small graphs run every seed × round in ONE task; above
    ``task_limit`` each seed runs the pagerank_from_edges round shape
    (ONE hash_join + ONE groupby per round, zero-presence rows, fixed
    repartition) — at web scale the seed list is a small whitelist,
    so S sequential distributed vectors is the honest cost. Returns
    (seed_id, doc_id, rank) for every node × seed."""
    pages_path = _corpus_pages(sf_dir)
    edges = _cached_edges(sf_dir)
    nodes = page_nodes(pages_path).materialize()
    if edges.count() <= task_limit:
        node_refs = nodes.to_arrow_refs()
        edge_refs = edges.to_arrow_refs()
        return rd.from_arrow_refs([_ppr_one_task.remote(
            tuple(seeds), iters, damping_pct, scale, len(node_refs),
            *node_refs, *edge_refs)])

    outdeg = edges.groupby("src_doc_id").aggregate(
        Count(alias_name="outdeg")).materialize()
    edges_w = hash_join(edges, outdeg, "src_doc_id", "src_doc_id",
                        ["dst_doc_id"], ["outdeg"], how="inner").materialize()
    base = (100 - damping_pct) * scale // 100

    def zero(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"].combine_chunks().cast(pa.int64()),
            "c": pa.array(np.zeros(len(t), np.int64))})

    presence = nodes.map_batches(zero, batch_format="pyarrow").materialize()
    per_seed = []
    for sd in seeds:
        def init(t: pa.Table, sd=sd) -> pa.Table:
            node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "node": pa.array(node),
                "r": pa.array(np.where(node == sd, scale, 0)
                              .astype(np.int64))})

        scores = nodes.map_batches(init, batch_format="pyarrow")
        for _ in range(iters):
            contrib = hash_join(edges_w, scores, "src_doc_id", "node",
                                ["dst_doc_id", "outdeg"], ["r"],
                                how="inner")

            def emit(t: pa.Table) -> pa.Table:
                c = pc.divide(t["r"].combine_chunks().cast(pa.int64()),
                              t["outdeg"].combine_chunks().cast(pa.int64()))
                return pa.table({
                    "node": t["dst_doc_id"].combine_chunks().cast(
                        pa.int64()),
                    "c": c})

            def fold(t: pa.Table, sd=sd) -> pa.Table:
                node = (t["node"].combine_chunks().cast(pa.int64())
                        .to_numpy())
                s = t["s"].combine_chunks().cast(pa.int64()).to_numpy()
                r = (damping_pct * s // 100
                     + np.where(node == sd, base, 0))
                return pa.table({"node": pa.array(node.astype(np.int64)),
                                 "r": pa.array(r.astype(np.int64))})

            scores = (contrib.map_batches(emit, batch_format="pyarrow")
                      .union(presence)
                      .groupby("node").aggregate(Sum("c", alias_name="s"))
                      .map_batches(fold, batch_format="pyarrow")
                      .repartition(32)
                      .materialize())

        def tag(t: pa.Table, sd=sd) -> pa.Table:
            return pa.table({
                "seed_id": pa.array(np.full(len(t), sd, np.int64)),
                "doc_id": t["node"].combine_chunks().cast(pa.int64()),
                "rank": t["r"].combine_chunks().cast(pa.int64())})

        per_seed.append(scores.map_batches(tag, batch_format="pyarrow"))
    out = per_seed[0]
    for ds in per_seed[1:]:
        out = out.union(ds)
    return out


def ppr_related_sql(seeds=PPR_SEEDS, iters: int = PPR_ITERS,
                    damping_pct: int = 85,
                    scale: int = 1_000_000) -> str:
    """Per-seed unrolled-round CTEs over the shared weighted edge
    table — pagerank_links_sql's law with the restart term gated on
    the one seed."""
    base = (100 - damping_pct) * scale // 100
    parts = [_edges_sql(), """ew AS (
  SELECT e.src_doc_id, e.dst_doc_id, o.outdeg
  FROM e JOIN (SELECT src_doc_id, CAST(count(*) AS BIGINT) AS outdeg
               FROM e GROUP BY src_doc_id) o
    ON o.src_doc_id = e.src_doc_id
)"""]
    finals = []
    for sd in seeds:
        parts.append(f"""p{sd}_0 AS (
  SELECT doc_id AS node,
         CAST(CASE WHEN doc_id = {sd} THEN {scale} ELSE 0 END
              AS BIGINT) AS r
  FROM documents
)""")
        for t in range(iters):
            parts.append(f"""p{sd}_{t + 1} AS (
  SELECT d.doc_id AS node,
         CAST(CASE WHEN d.doc_id = {sd} THEN {base} ELSE 0 END
              + {damping_pct} * coalesce(x.c, 0) // 100 AS BIGINT) AS r
  FROM documents d LEFT JOIN (
    SELECT ew.dst_doc_id AS node,
           CAST(sum(p.r // ew.outdeg) AS BIGINT) AS c
    FROM ew JOIN p{sd}_{t} p ON p.node = ew.src_doc_id
    GROUP BY ew.dst_doc_id
  ) x ON x.node = d.doc_id
)""")
        finals.append(f"SELECT CAST({sd} AS BIGINT) AS seed_id, "
                      f"node AS doc_id, r AS rank FROM p{sd}_{iters}")
    return ("WITH " + ",\n".join(parts) + "\n"
            + "\nUNION ALL\n".join(finals))
