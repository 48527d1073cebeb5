"""Link-graph family (pipelines/linkgraph.py): anchor extraction vs the
analytic derivation, href resolution, dup-page dedup, dead-link pruning,
and the DuckDB value-hash oracles for all four driver queries."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_check import compare


# ---------------------------------------------------------------------------
# serial units (no Ray)


def test_resolve_href_forms():
    from pdf_extraction_ray.pipelines.linkgraph import resolve_href
    base = "https://host.example/a/b"
    assert resolve_href(base, "/z") == "https://host.example/z"
    assert resolve_href(base, "c/d") == "https://host.example/a/c/d"
    assert resolve_href(base, "../up") == "https://host.example/up"
    assert resolve_href(base, "./here") == "https://host.example/a/here"
    assert resolve_href(base, "https://o.y/p#frag") == "https://o.y/p"
    assert resolve_href(base, "//cdn.x/f.js") == "https://cdn.x/f.js"
    assert resolve_href(base, "x?q=1#f") == "https://host.example/a/x?q=1"
    assert resolve_href(base, "") == "https://host.example/a/b"
    # non-hierarchical schemes are absolute URIs, never relative paths
    assert resolve_href(base, "mailto:x@y.z") == "mailto:x@y.z"
    assert resolve_href(base, "javascript:void(0)") == "javascript:void(0)"
    assert resolve_href(base, "tel:+1-555") == "tel:+1-555"
    # but a ':' AFTER a slash is just path data
    assert resolve_href(base, "a/b:c") == "https://host.example/a/a/b:c"


def test_anchors_of_handcrafted_page():
    from pdf_extraction_ray.pipelines.linkgraph import anchors_of_html
    html = (b"<html><body><nav><a href='/n'>in <b>nav</b></a></nav>"
            b"<p><a name='x'>no href</a>"
            b"<a href='/e'>amp &amp; lt</a></p>"
            b"<footer><a href='rel/p'>deep</a></footer></body></html>")
    a = anchors_of_html(html, "https://h.x/dir/page")
    assert [r["href"] for r in a] == [
        "https://h.x/n", "https://h.x/e", "https://h.x/dir/rel/p"]
    assert a[0]["anchor"] == "in nav"          # nested markup flattens
    assert a[1]["anchor"] == "amp & lt"        # entities resolve
    assert [r["link_i"] for r in a] == [0, 1, 2]


def test_anchor_text_unescapes_exactly_once():
    """Tokenizer already decodes entities; anchor assembly must not
    decode a second time ('&amp;amp;' means the literal text '&amp;')."""
    from pdf_extraction_ray.pipelines.linkgraph import anchors_of_html
    a = anchors_of_html(b"<a href='/p'>Tom &amp;amp; Jerry</a>",
                        "https://h.x/")
    assert a[0]["anchor"] == "Tom &amp; Jerry"


def test_page_anchors_row_isolation_on_timeout(ray_session):
    """cfg.doc_timeout_s bounds the per-page parse: a pathological page
    drops ITS anchors, never the task (extract-stage row isolation)."""
    from datetime import datetime

    from pdf_extraction_ray.config import PipelineConfig
    from pdf_extraction_ray.pipelines.linkgraph import page_anchors
    from pdf_extraction_ray.sources import spec

    big = ("<!DOCTYPE html>\n<html><body>"
           + "<p><a href='/x'>t</a></p>" * 3000
           + "</body></html>").encode()
    rows = [{"url": "https://c.x/s/d0000001", "warc_ts": datetime(2020, 1, 1),
             "html": big, "text": "", "lang": "en"},
            {"url": "https://c.x/s/d0000002", "warc_ts": datetime(2020, 1, 1),
             "html": b"<!DOCTYPE html>\n<html><body><p>"
                     b"<a href='/ok'>fine</a></p></body></html>",
             "text": "", "lang": "en"}]
    cfg = PipelineConfig(max_bytes=spec.CORPUS_MAX_BYTES, doc_timeout_s=0.0)
    out = page_anchors(_tiny_pages(rows), cfg).to_pandas()
    # the giant page timed out and contributed nothing; the small page
    # survived (its parse finishes before the first deadline probe)
    assert set(out.anchor) == {"fine"}


def test_anchors_match_sql_derivation():
    """The real tokenizer's anchors == the oracle CTE, row for row, for
    every kind (incl. div-soup's different layout and the related
    permalinks), across a doc_id sample covering all residues."""
    from pdf_extraction_ray.pipelines import linkgraph as lg
    from pdf_extraction_ray.sources import gen_html, spec

    doc_ids = list(range(0, 120)) + [12345, 54321]
    docs = pd.DataFrame({"doc_id": doc_ids,
                         "source": ["History"] * len(doc_ids)})
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.sql(
        "WITH " + lg._anchors_cte()
        + "\nSELECT doc_id, link_i, href, anchor FROM anch"
        " ORDER BY doc_id, link_i").df()
    con.close()

    rows = []
    for did in doc_ids:
        if not spec.kind_of(did).startswith("html_"):
            continue
        url = spec.url_of(did, "History")
        page = gen_html.build_html(did, "text " * 40, "History")
        for a in lg.anchors_of_html(page, url):
            rows.append({"doc_id": did, **a})
    got = (pd.DataFrame(rows)[["doc_id", "link_i", "href", "anchor"]]
           .sort_values(["doc_id", "link_i"]).reset_index(drop=True))
    assert got.equals(want.astype(got.dtypes.to_dict()))


def test_related_links_never_reach_extracted_text():
    """The planted permalinks live in footer boilerplate: content
    extraction must not see them (byte-identity north rule)."""
    from pdf_extraction_ray.functions.html_extract import extract_html
    from pdf_extraction_ray.sources import gen_html

    page = gen_html.build_html(12, "real content here " * 20, "History")
    assert b"/doc/d" in page
    out = extract_html(page)
    assert "related:" not in out.text
    assert "/doc/d" not in out.text


# ---------------------------------------------------------------------------
# Ray dataflow


def _tiny_pages(rows):
    import pyarrow as pa

    import ray.data as rd

    from pdf_extraction_ray.sources.corpus import PAGES_SCHEMA
    return rd.from_arrow(pa.Table.from_pylist(rows, schema=PAGES_SCHEMA))


def test_page_anchors_dedupes_recrawled_pages(ray_session):
    from datetime import datetime, timedelta

    from pdf_extraction_ray.pipelines.linkgraph import page_anchors

    html = (b"<!DOCTYPE html>\n<html><body>"
            b"<p><a href='/t'>one</a><a href='/t'>two</a></p>"
            b"</body></html>")
    row = {"url": "https://c.x/s/d0000005", "warc_ts": datetime(2020, 1, 1),
           "html": html, "text": "", "lang": "en"}
    dup = dict(row, warc_ts=row["warc_ts"] + timedelta(hours=1))
    out = page_anchors(_tiny_pages([row, dup])).to_pandas()
    # two anchors, each once — the re-crawl's identical rows collapse
    assert len(out) == 2
    assert sorted(out.link_i) == [0, 1]
    assert set(out.anchor) == {"one", "two"}


def test_link_graph_prunes_dead_links(ray_session):
    from datetime import datetime

    from pdf_extraction_ray.pipelines import linkgraph as lg

    def page(did, targets):
        body = "".join(f"<a href='/doc/d{t:07d}'>t</a>" for t in targets)
        return {"url": f"https://c.x/s/d{did:07d}",
                "warc_ts": datetime(2020, 1, 1),
                "html": f"<!DOCTYPE html>\n<html><body><p>{body}</p>"
                        f"</body></html>".encode(),
                "text": "", "lang": "en"}

    # page 1 -> 2 (alive), page 1 -> 9999999 (dead), page 2 -> 1
    pages = _tiny_pages([page(1, [2, 9999999]), page(2, [1])])
    import pyarrow as pa
    nodes = _tiny_pages([page(1, []), page(2, [])]).map_batches(
        lambda b: pa.table({"node": lg._doc_id_of_url(b["url"])}),
        batch_format="pyarrow")
    pruned = lg.link_graph_from_anchors(lg.page_anchors(pages),
                                        nodes).to_pandas()
    got = set(zip(pruned.src_doc_id, pruned.dst_doc_id))
    assert got == {(1, 2), (2, 1)}  # the dead 9999999 edge is gone


@pytest.mark.parametrize("name", ["anchor_text_index", "page_links_sample",
                                  "link_graph", "pagerank_links",
                                  "section_quality_stats", "crawl_frontier",
                                  "frontier_schedule"])
def test_linkgraph_queries_match_oracle(ray_session, name):
    import __ray_entry__ as entrymod
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert compare(name, q[name](SF_SMOKE), o[name], SF_SMOKE) == []


def test_pagerank_links_distributed_path_matches(ray_session):
    """task_pr_limit=0 forces the per-round hash_join/groupby path; it
    must be bit-identical to the one-task fast path (and the oracle)."""
    import __ray_entry__ as entrymod

    from pdf_extraction_ray.pipelines.linkgraph import pagerank_links
    out = pagerank_links(SF_SMOKE, task_pr_limit=0)
    assert compare("pagerank_links_dist", out,
                   entrymod.oracle_sql()["pagerank_links"], SF_SMOKE) == []


def test_crawl_frontier_tops_out_at_a_quality_hub(ray_session):
    """The highest re-crawl priority must be a hub page (rank mass) that
    also extracted with nonzero quality — the product semantics."""
    import __ray_entry__ as entrymod

    from pdf_extraction_ray.sources import spec
    out = entrymod.queries()["crawl_frontier"](SF_SMOKE).to_pandas()
    top = out.sort_values(["priority", "doc_id"],
                          ascending=[False, True]).iloc[0]
    assert top.doc_id < spec.REL_HUBS
    assert top.quality_pct > 0
    assert top.priority == top["rank"] * top.quality_pct


def test_frontier_schedule_is_polite(ray_session):
    """Exactly one url per (section, wave); waves are contiguous 1..n
    within each section; priority never increases as waves advance —
    the politeness contract a crawler consumes."""
    import __ray_entry__ as entrymod
    out = entrymod.queries()["frontier_schedule"](SF_SMOKE).to_pandas()
    assert len(out) > 0
    assert (out.groupby(["section", "wave"]).size() == 1).all()
    for _, g in out.groupby("section"):
        g = g.sort_values("wave")
        assert g.wave.tolist() == list(range(1, len(g) + 1))
        assert (g.priority.diff().dropna() <= 0).all()


def test_frontier_schedule_handles_foreign_urls(ray_session):
    """A url without the corpus section pattern schedules under the ''
    pseudo-host (matching the SQL oracle's regexp_extract) — a null
    section would be dropped by the pandas groupby and int-cast its
    wave to garbage."""
    import ray.data as rd

    from pdf_extraction_ray.pipelines.linkgraph import schedule_from_ranks
    ranks = rd.from_items([{"doc_id": i, "rank": 100 - i}
                           for i in range(3)])
    ext = rd.from_items(
        [{"url": f"https://corpus.example/srcA/d{i:07d}",
          "quality_pct": 50} for i in range(2)]
        + [{"url": "https://other.host/path/d0000002", "quality_pct": 50}])
    out = schedule_from_ranks(ranks, ext).to_pandas()
    row = out[out.doc_id == 2]
    assert len(row) == 1
    assert row.section.iloc[0] == ""
    assert row.wave.iloc[0] == 1
    assert (out.wave >= 1).all()


def test_pagerank_links_hubs_rank_highest(ray_session):
    """The planted related-links topology concentrates rank on the 16
    hub pages — the skew the operator exists to surface."""
    from pdf_extraction_ray.pipelines.linkgraph import pagerank_links
    from pdf_extraction_ray.sources import spec

    out = pagerank_links(SF_SMOKE).to_pandas().sort_values(
        "rank", ascending=False)
    top = set(out.head(spec.REL_HUBS).doc_id)
    assert top == set(range(spec.REL_HUBS))


# ---------------------------------------------------------------------------
# robustness (serial, no Ray)

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=4096))
def test_anchors_never_crash_on_garbage(payload):
    from pdf_extraction_ray.pipelines.linkgraph import anchors_of_html
    out = anchors_of_html(payload, "https://h.x/a/b")
    assert [r["link_i"] for r in out] == list(range(len(out)))
    assert all(isinstance(r["href"], str) and isinstance(r["anchor"], str)
               for r in out)


_href_chars = st.text(
    alphabet=st.characters(blacklist_characters="\"'<>&#",
                           min_codepoint=32, max_codepoint=126),
    max_size=24)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(_href_chars, st.text(max_size=16)), max_size=8),
       st.booleans())
def test_anchors_roundtrip_synthetic_markup(links, nest):
    """Anchors written into arbitrary markup come back in order with
    their hrefs resolved and text flattened."""
    import html as _h

    from pdf_extraction_ray.pipelines.linkgraph import (anchors_of_html,
                                                        resolve_href)
    body = "".join(
        (f"<div><a href=\"{h}\"><b>{_h.escape(t)}</b></a></div>" if nest
         else f"<a href=\"{h}\">{_h.escape(t)}</a>")
        for h, t in links)
    out = anchors_of_html(f"<html><body>{body}</body></html>", "https://h.x/p")
    assert len(out) == len(links)
    for r, (h, t) in zip(out, links):
        assert r["href"] == resolve_href("https://h.x/p", h)
        assert r["anchor"] == t


def test_head_metadata_units():
    from pdf_extraction_ray.pipelines.linkgraph import head_metadata
    m = head_metadata(b"<html><head><meta charset='x'>"
                      b"<meta name='a' content='b'>"
                      b"<title>T &amp; t</title></head><body></body></html>")
    assert m == {"title": "T & t", "charset": "x", "n_meta": 2}
    # no head fields at all
    assert head_metadata(b"<p>x</p>") == {"title": "", "charset": "",
                                          "n_meta": 0}
    # body-level microdata metas / inline svg titles are NOT head fields
    m = head_metadata(b"<html><head><title>real</title></head><body>"
                      b"<p itemscope><meta itemprop='x' content='y'></p>"
                      b"<svg><title>shape label</title></svg>"
                      b"</body></html>")
    assert m == {"title": "real", "charset": "", "n_meta": 0}


def test_title_stays_out_of_content_extraction():
    """prune_boilerplate=True (the content path) must still DROP title
    rawtext — the metadata-mode change must not leak into extraction."""
    from pdf_extraction_ray.functions.html_extract import extract_html
    out = extract_html(b"<html><head><title>NOT CONTENT</title></head>"
                       b"<body><p>real body text here</p></body></html>")
    assert "NOT CONTENT" not in out.text


def test_page_metadata_matches_oracle(ray_session):
    import __ray_entry__ as entrymod
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert compare("page_metadata", q["page_metadata"](SF_SMOKE),
                   o["page_metadata"], SF_SMOKE) == []
