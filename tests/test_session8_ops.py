"""Tests for the session-8 operators: search snippets (KWIC) and
incremental materialized-view maintenance."""

from __future__ import annotations

import duckdb

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# search_snippets


def test_search_snippets_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (search_snippets,
                                                        search_snippets_sql)
    from tests.oracle_check import compare

    assert compare("search_snippets", search_snippets(SF_SMOKE),
                   search_snippets_sql(), SF_SMOKE) == []


def test_search_snippets_semantics(ray_session):
    """Every BM25 candidate yields exactly one snippet; the snippet
    contains a query term at the claimed (1-based) position and spans
    at most 2R+1 words."""
    from pdf_extraction_ray.pipelines.analytics import (BM25_QUERIES,
                                                        SNIPPET_RADIUS,
                                                        bm25_topk,
                                                        search_snippets)

    cand = bm25_topk(SF_SMOKE).to_pandas()
    out = search_snippets(SF_SMOKE).to_pandas()
    assert len(out) == len(cand)
    assert (set(zip(out.query_id, out.doc_id, out["rank"]))
            == set(zip(cand.query_id, cand.doc_id, cand["rank"])))
    con = duckdb.connect()
    texts = dict(con.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        f" WHERE doc_id IN ({','.join(str(d) for d in set(out.doc_id))})"
    ).fetchall())
    con.close()
    for r in out.itertuples():
        words = texts[r.doc_id].split(" ")
        terms = BM25_QUERIES[r.query_id]
        # hit_pos is the FIRST occurrence of any query term (1-based)
        firsts = [words.index(t) + 1 for t in terms if t in words]
        assert firsts and r.hit_pos == min(firsts)
        snip = r.snippet.split(" ")
        assert len(snip) <= 2 * SNIPPET_RADIUS + 1
        lo = max(0, r.hit_pos - 1 - SNIPPET_RADIUS)
        assert snip == words[lo:r.hit_pos + SNIPPET_RADIUS]


def test_search_snippets_radius_clamps(ray_session):
    """A hit in the first word clamps the left edge instead of
    wrapping; the window never exceeds the document."""
    from pdf_extraction_ray.pipelines.analytics import search_snippets

    out = search_snippets(SF_SMOKE, radius=10**6).to_pandas()
    # with an absurd radius every snippet is the whole document, so
    # each (query, doc) still yields exactly one bounded row
    assert out.snippet.str.len().gt(0).all()
    assert out.hit_pos.ge(1).all()


# ---------------------------------------------------------------------------
# section_stats_incremental


def test_section_stats_incremental_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (
        section_stats_incremental, section_stats_incremental_sql)
    from tests.oracle_check import compare

    assert compare("section_stats_incremental",
                   section_stats_incremental(SF_SMOKE),
                   section_stats_incremental_sql(), SF_SMOKE) == []


def test_section_stats_incremental_algebra(ray_session):
    """The maintained view equals a from-scratch recompute of snapshot
    B built row-by-row in pandas (the refresh_extraction equality
    discipline), and the delta actually changes the standing stats
    (removal wins over change when both mods hit)."""
    import pandas as pd
    import pyarrow.parquet as pq
    from pdf_extraction_ray.pipelines.analytics import (
        MV_ADDED_MOD, MV_ADDED_RES, MV_CHANGED_MOD, MV_CHANGED_RES,
        MV_REMOVED_MOD, MV_REMOVED_RES, _mv_added_text, _mv_changed_text,
        section_stats_incremental)

    docs = pq.read_table(f"{SF_SMOKE}/documents.parquet",
                         columns=["doc_id", "source", "text"]).to_pandas()
    rows = []
    for r in docs.itertuples():
        if r.doc_id % MV_REMOVED_MOD == MV_REMOVED_RES:
            pass  # removed (wins over changed)
        elif r.doc_id % MV_CHANGED_MOD == MV_CHANGED_RES:
            rows.append((r.source, _mv_changed_text(r.doc_id, r.text)))
        else:
            rows.append((r.source, r.text))
        if r.doc_id % MV_ADDED_MOD == MV_ADDED_RES:
            rows.append((r.source, _mv_added_text(r.doc_id)))
    b = pd.DataFrame(rows, columns=["section", "text"])
    want = (b.assign(n_chars=b.text.str.len(),
                     n_tokens=b.text.str.split(" ").str.len())
            .groupby("section", as_index=False)
            .agg(n_docs=("text", "size"), n_chars=("n_chars", "sum"),
                 n_tokens=("n_tokens", "sum")))
    got = (section_stats_incremental(SF_SMOKE).to_pandas()
           .sort_values("section").reset_index(drop=True))
    want = want.sort_values("section").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["section", "n_docs", "n_chars", "n_tokens"]],
        want[["section", "n_docs", "n_chars", "n_tokens"]],
        check_dtype=False)
    # the delta is non-trivial: standing stats differ from the view
    base = (docs.groupby("source").size().rename("n_docs"))
    merged = got.set_index("section")["n_docs"]
    assert (merged.reindex(base.index) != base).any()
