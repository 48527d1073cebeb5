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
    """A radius past the document edges clamps instead of wrapping
    (lo must floor at 0 — Python negative slicing would silently wrap):
    with an absurd radius, every snippet IS the whole document."""
    from pdf_extraction_ray.pipelines.analytics import search_snippets

    out = search_snippets(SF_SMOKE, radius=10**6).to_pandas()
    con = duckdb.connect()
    texts = dict(con.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        f" WHERE doc_id IN ({','.join(str(d) for d in set(out.doc_id))})"
    ).fetchall())
    con.close()
    assert len(out) > 0
    for r in out.itertuples():
        assert r.snippet == texts[r.doc_id]
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


# ---------------------------------------------------------------------------
# local_supplier_volume (TPC-H Q5)


def test_local_supplier_volume_oracle(ray_session):
    from pdf_extraction_ray.pipelines.relational import (
        local_supplier_volume, local_supplier_volume_sql)
    from tests.oracle_check import compare

    assert compare("local_supplier_volume", local_supplier_volume(SF_SMOKE),
                   local_supplier_volume_sql(), SF_SMOKE) == []


def test_local_supplier_volume_semantics(ray_session):
    """Brute-force pandas replay of the 5-table join: same totals, and
    only region nations appear."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    from pdf_extraction_ray.pipelines.relational import (
        Q5_REGION, Q5_YEAR, local_supplier_volume)

    rd_ = lambda t: pq.read_table(f"{SF_SMOKE}/{t}.parquet").to_pandas()
    reg = rd_("region"); nat = rd_("nation"); cust = rd_("customer")
    sup = rd_("supplier"); orders = rd_("orders"); li = rd_("lineitem")
    rk = set(reg.loc[reg.r_name == Q5_REGION, "r_regionkey"])
    nat = nat[nat.n_regionkey.isin(rk)]
    orders = orders[(orders.o_orderdate >= f"{Q5_YEAR}-01-01")
                    & (orders.o_orderdate < f"{Q5_YEAR + 1}-01-01")]
    j = (li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
         .merge(cust, left_on="o_custkey", right_on="c_custkey")
         .merge(sup, left_on="l_suppkey", right_on="s_suppkey")
         .merge(nat, left_on="s_nationkey", right_on="n_nationkey"))
    j = j[j.c_nationkey == j.s_nationkey]
    j["rev"] = np.round(
        j.l_extendedprice * (1 - j.l_discount) * 10000).astype("int64")
    want = (j.groupby("n_name")["rev"].sum().rename("revenue_e4")
            .reset_index().sort_values("n_name").reset_index(drop=True))
    got = (local_supplier_volume(SF_SMOKE).to_pandas()
           .sort_values("n_name").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert set(got.n_name) <= set(nat.n_name)


# ---------------------------------------------------------------------------
# value_outliers


def test_value_outliers_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (value_outliers,
                                                        value_outliers_sql)
    from tests.oracle_check import compare

    assert compare("value_outliers", value_outliers(SF_SMOKE),
                   value_outliers_sql(), SF_SMOKE) == []


def test_value_outliers_exact_rule(ray_session):
    """Python-bigint replay: flagged == exactly the rows with
    (n·c−S)² > 9·(n·Q−S²); the flagged set is non-empty and every
    flagged |z| (float check) exceeds 3."""
    import numpy as np
    import pyarrow.parquet as pq
    from pdf_extraction_ray.pipelines.analytics import (OUTLIER_MOD,
                                                        OUTLIER_MULT,
                                                        OUTLIER_RES,
                                                        value_outliers)

    ev = pq.read_table(f"{SF_SMOKE}/events.parquet",
                       columns=["event_id", "event_type", "value"]
                       ).to_pandas()
    c = np.round(ev.value * 100).astype("int64")
    c[ev.event_id % OUTLIER_MOD == OUTLIER_RES] *= OUTLIER_MULT
    ev["cents"] = c
    want = set()
    for typ, g in ev.groupby("event_type"):
        n = len(g); s = int(g.cents.sum())
        q = sum(int(x) * int(x) for x in g.cents)
        for eid, cv in zip(g.event_id, g.cents):
            if (n * int(cv) - s) ** 2 > 9 * (n * q - s * s):
                want.add(int(eid))
    got = value_outliers(SF_SMOKE).to_pandas()
    assert set(got.event_id) == want and len(want) > 0
    # float sanity: all flagged z-scores exceed 3 (population std)
    stats = ev.groupby("event_type").cents.agg(["mean", "std", "count"])
    for r in got.itertuples():
        st = stats.loc[r.event_type]
        pop_std = st["std"] * np.sqrt((st["count"] - 1) / st["count"])
        assert abs(r.cents - st["mean"]) / pop_std > 3


# ---------------------------------------------------------------------------
# weighted_sample


def test_weighted_sample_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (weighted_sample,
                                                        weighted_sample_sql)
    from tests.oracle_check import compare

    assert compare("weighted_sample", weighted_sample(SF_SMOKE),
                   weighted_sample_sql(), SF_SMOKE) == []


def test_weighted_sample_semantics(ray_session):
    """Exactly k rows; priorities replay as h//w; selection is
    weight-biased (sampled docs are longer than the corpus average —
    the whole point of weighting by token count)."""
    import numpy as np
    import pyarrow.parquet as pq
    from pdf_extraction_ray.functions.hashing import stable_hash64
    from pdf_extraction_ray.pipelines.analytics import (WS_TOPK,
                                                        weighted_sample)

    out = weighted_sample(SF_SMOKE).to_pandas()
    assert len(out) == WS_TOPK
    assert list(out["rank"]) == list(range(1, WS_TOPK + 1))
    assert out.pri.is_monotonic_increasing
    for r in out.itertuples():
        assert r.pri == stable_hash64(f"ws:{r.doc_id}") // r.n_tokens
    docs = pq.read_table(f"{SF_SMOKE}/documents.parquet",
                         columns=["text"]).to_pandas()
    corpus_mean = docs.text.str.split(" ").str.len().mean()
    assert out.n_tokens.mean() > corpus_mean


# ---------------------------------------------------------------------------
# vocab_drift


def test_vocab_drift_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (vocab_drift,
                                                        vocab_drift_sql)
    from tests.oracle_check import compare

    assert compare("vocab_drift", vocab_drift(SF_SMOKE),
                   vocab_drift_sql(), SF_SMOKE) == []


def test_vocab_drift_semantics(ray_session):
    """The planted delta's own vocabulary dominates the report: the
    'added'/'doc' words (every 41st doc spawns 'added doc N') and the
    delta-marker words surge, and drift signs are right — a word only
    in B has positive drift, and the report is |drift|-sorted."""
    from pdf_extraction_ray.pipelines.analytics import (DRIFT_TOPK,
                                                        vocab_drift)

    out = vocab_drift(SF_SMOKE).to_pandas()
    assert len(out) == DRIFT_TOPK
    byword = out.set_index("word")
    assert "added" in byword.index and byword.loc["added"].drift > 0
    assert byword.loc["added"].ca == 0  # B-only word
    markers = [w for w in byword.index if w.startswith("delta-marker-")]
    assert markers and all(byword.loc[m].drift > 0 for m in markers)
    a = out.drift.abs().to_numpy()
    assert (a[:-1] >= a[1:]).all()


# ---------------------------------------------------------------------------
# wau_daily


def test_wau_daily_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (wau_daily,
                                                        wau_daily_sql)
    from tests.oracle_check import compare

    assert compare("wau_daily", wau_daily(SF_SMOKE),
                   wau_daily_sql(), SF_SMOKE) == []


def test_wau_daily_semantics(ray_session):
    """Pandas replay: every day in the span appears exactly once, wau
    equals the brute-force 7-day distinct count, and WAU >= DAU (the
    window dominates the single day)."""
    import pyarrow.parquet as pq
    from pdf_extraction_ray.pipelines.analytics import DAY_US, wau_daily

    ev = pq.read_table(f"{SF_SMOKE}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    ev["day"] = (ev.ts.astype("int64") // 1000) // (DAY_US // 1000)
    lo, hi = int(ev.day.min()), int(ev.day.max())
    out = wau_daily(SF_SMOKE).to_pandas().sort_values("day")
    assert list(out.day) == list(range(lo, hi + 1))
    for d in range(lo, hi + 1, max(1, (hi - lo) // 13)):
        want = ev.loc[ev.day.between(d - 6, d), "user_id"].nunique()
        dau = ev.loc[ev.day == d, "user_id"].nunique()
        got = int(out.loc[out.day == d, "wau"].iloc[0])
        assert got == want and got >= dau


# ---------------------------------------------------------------------------
# value_quantiles_disc


def test_value_quantiles_disc_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (
        value_quantiles_disc, value_quantiles_disc_sql)
    from tests.oracle_check import compare

    assert compare("value_quantiles_disc", value_quantiles_disc(SF_SMOKE),
                   value_quantiles_disc_sql(), SF_SMOKE) == []


def test_value_quantiles_disc_semantics(ray_session):
    """Each quantile is an ACTUAL element of its group at the exact
    lower-discrete index, and quantiles are monotone in pct."""
    import numpy as np
    import pyarrow.parquet as pq
    from pdf_extraction_ray.pipelines.analytics import (
        QDISC_PCTS, value_quantiles_disc)

    ev = pq.read_table(f"{SF_SMOKE}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    ev["cents"] = np.round(ev.value * 100).astype("int64")
    out = value_quantiles_disc(SF_SMOKE).to_pandas()
    assert len(out) == ev.event_type.nunique() * len(QDISC_PCTS)
    for et, g in out.groupby("event_type"):
        v = np.sort(ev.loc[ev.event_type == et, "cents"].to_numpy())
        n = len(v)
        got = g.set_index("pct")["value_cents"]
        for p in QDISC_PCTS:
            assert got[p] == v[(n - 1) * p // 100]
        assert got[50] <= got[90] <= got[99]


# ---------------------------------------------------------------------------
# trustrank_docs


def test_trustrank_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (trustrank_docs,
                                                        trustrank_docs_sql)
    from tests.oracle_check import compare

    assert compare("trustrank_docs", trustrank_docs(SF_SMOKE),
                   trustrank_docs_sql(), SF_SMOKE) == []


def test_trustrank_semantics(ray_session):
    """Trust concentrates at the seeds (hubs): every seed outranks the
    median non-seed, total trust is far below PageRank's (the restart
    mass only enters at seeds), and trust is non-negative."""
    from pdf_extraction_ray.pipelines.analytics import (_PR_HUBS,
                                                        pagerank_docs,
                                                        trustrank_docs)

    tr = trustrank_docs(SF_SMOKE).to_pandas()
    assert (tr.trust >= 0).all()
    seeds = tr[tr.doc_id < _PR_HUBS].trust
    rest = tr[tr.doc_id >= _PR_HUBS].trust
    assert seeds.min() > rest.median()
    pr = pagerank_docs(SF_SMOKE).to_pandas()
    assert tr.trust.sum() < pr["rank"].sum()


# ---------------------------------------------------------------------------
# cms_term_freq


def test_cms_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (cms_term_freq,
                                                        cms_term_freq_sql)
    from tests.oracle_check import compare

    assert compare("cms_term_freq", cms_term_freq(SF_SMOKE),
                   cms_term_freq_sql(), SF_SMOKE) == []


def test_cms_bounds(ray_session):
    """The sketch invariants: est >= exact count for every probe, and
    est <= exact + (e/WIDTH)·N (the count-min error bound, comfortably
    slack at depth 4)."""
    import duckdb
    from pdf_extraction_ray.pipelines.analytics import (CMS_WIDTH,
                                                        cms_term_freq)

    out = cms_term_freq(SF_SMOKE).to_pandas()
    con = duckdb.connect()
    exact = dict(con.sql(
        f"""SELECT u.w, count(*) FROM
        read_parquet('{SF_SMOKE}/documents.parquet'),
        unnest(string_split(text, ' ')) AS u(w) GROUP BY u.w""").fetchall())
    total = sum(exact.values())
    con.close()
    for r in out.itertuples():
        true = exact.get(r.term, 0)
        assert r.est >= true
        assert r.est <= true + 3 * total // CMS_WIDTH
    # the absent probe exists to exercise the pure-collision path
    assert (out.term == "zzz-absent-term").any()


# ---------------------------------------------------------------------------
# fk_integrity_audit


def test_fk_integrity_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (
        fk_integrity_audit, fk_integrity_audit_sql)
    from tests.oracle_check import compare

    assert compare("fk_integrity_audit", fk_integrity_audit(SF_SMOKE),
                   fk_integrity_audit_sql(), SF_SMOKE) == []


def test_fk_integrity_semantics(ray_session):
    """The generated tables are clean, so every orphan is planted:
    orphan count == children whose parent key hits the planted-missing
    rule, and each relationship reports a nonzero orphan count."""
    import pyarrow.parquet as pq
    from pdf_extraction_ray.pipelines.analytics import (FK_MISSING_MOD,
                                                        FK_MISSING_RES,
                                                        fk_integrity_audit)

    out = fk_integrity_audit(SF_SMOKE).to_pandas().set_index("relationship")
    li = pq.read_table(f"{SF_SMOKE}/lineitem.parquet",
                       columns=["l_orderkey"]).to_pandas()
    od = pq.read_table(f"{SF_SMOKE}/orders.parquet",
                       columns=["o_custkey"]).to_pandas()
    cu = pq.read_table(f"{SF_SMOKE}/customer.parquet",
                       columns=["c_nationkey"]).to_pandas()
    assert (out.loc["lineitem->orders", "n_orphans"]
            == (li.l_orderkey % FK_MISSING_MOD == FK_MISSING_RES).sum())
    assert (out.loc["orders->customer", "n_orphans"]
            == (od.o_custkey % FK_MISSING_MOD == FK_MISSING_RES).sum())
    assert (out.loc["customer->nation", "n_orphans"]
            == (cu.c_nationkey % FK_MISSING_MOD == FK_MISSING_RES).sum())
    assert (out.n_orphans > 0).all()
    assert out.loc["lineitem->orders", "n_children"] == len(li)


# ---------------------------------------------------------------------------
# churned_users


def test_churned_users_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (churned_users,
                                                        churned_users_sql)
    from tests.oracle_check import compare

    assert compare("churned_users", churned_users(SF_SMOKE),
                   churned_users_sql(), SF_SMOKE) == []


def test_churned_users_semantics(ray_session):
    """Pandas replay of the plant + half-split classification; every
    class is non-empty (the plant's whole purpose) and totals match
    the surviving distinct-user count."""
    import pyarrow.parquet as pq
    from pdf_extraction_ray.pipelines.analytics import (
        CHURN_DROP_MOD, CHURN_DROP_RES, CHURN_LATE_MOD, CHURN_LATE_RES,
        DAY_US, churned_users)

    ev = pq.read_table(f"{SF_SMOKE}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    ev["day"] = (ev.ts.astype("int64") // 1000) // (DAY_US // 1000)
    lo, hi = int(ev.day.min()), int(ev.day.max())
    mid = (lo + hi + 1) // 2
    ev["first"] = ev.day < mid
    churny = ev.user_id % CHURN_DROP_MOD == CHURN_DROP_RES
    late = (ev.user_id % CHURN_LATE_MOD == CHURN_LATE_RES) & ~churny
    ev = ev[~((churny & ~ev["first"]) | (late & ev["first"]))]
    a = set(ev.loc[ev["first"], "user_id"])
    b = set(ev.loc[~ev["first"], "user_id"])
    out = (churned_users(SF_SMOKE).to_pandas().set_index("status")
           ["n_users"].reindex(["retained", "churned", "new"])
           .fillna(0).astype(int))
    assert out["retained"] == len(a & b)
    assert out["churned"] == len(a - b)
    assert out["new"] == len(b - a)
    assert (out > 0).all()
    assert out.sum() == ev.user_id.nunique()


# ---------------------------------------------------------------------------
# pareto_docs


def test_pareto_docs_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (pareto_docs,
                                                        pareto_docs_sql)
    from tests.oracle_check import compare

    assert compare("pareto_docs", pareto_docs(SF_SMOKE),
                   pareto_docs_sql(), SF_SMOKE) == []


def test_pareto_docs_dominance(ray_session):
    """Brute-force check: no frontier doc is dominated by ANY corpus
    doc, and every non-frontier doc is dominated by some frontier
    doc (the skyline is exactly the non-dominated set)."""
    import numpy as np
    import pyarrow.parquet as pq
    from pdf_extraction_ray.pipelines.analytics import (PARETO_SCALE,
                                                        pareto_docs)

    docs = pq.read_table(f"{SF_SMOKE}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    w = docs.text.str.split(" ")
    q = (w.map(lambda x: len(set(x))) * PARETO_SCALE // w.str.len()) \
        .to_numpy()
    c = docs.text.str.len().to_numpy()
    out = pareto_docs(SF_SMOKE).to_pandas()
    sky = set(out.doc_id)
    assert len(sky) > 0
    ids = docs.doc_id.to_numpy()
    for r in out.itertuples():
        dom = ((q >= r.uniq_ratio) & (c >= r.n_chars)
               & ((q > r.uniq_ratio) | (c > r.n_chars)))
        assert not dom.any()
    # spot-check some non-frontier docs are dominated by a frontier doc
    sq = out.uniq_ratio.to_numpy(); sc = out.n_chars.to_numpy()
    others = [i for i in range(len(ids)) if int(ids[i]) not in sky][:50]
    for i in others:
        assert (((sq >= q[i]) & (sc >= c[i])
                 & ((sq > q[i]) | (sc > c[i]))).any())


# ---------------------------------------------------------------------------
# mutual_links


def test_mutual_links_oracle(ray_session):
    from pdf_extraction_ray.pipelines.linkgraph import (mutual_links,
                                                        mutual_links_sql)
    from tests.oracle_check import compare

    assert compare("mutual_links", mutual_links(SF_SMOKE),
                   mutual_links_sql(), SF_SMOKE) == []


def test_mutual_links_semantics(ray_session):
    """Brute-force over the edge table: the reported pairs are exactly
    the symmetric edge pairs, ordered lo < hi, and non-empty on the
    planted graph (hubs cross-link)."""
    from pdf_extraction_ray.pipelines.linkgraph import (link_graph,
                                                        mutual_links)

    e = link_graph(SF_SMOKE).to_pandas()
    s = set(zip(e.src_doc_id, e.dst_doc_id))
    want = {(a, b) for (a, b) in s if (b, a) in s and a < b}
    out = mutual_links(SF_SMOKE).to_pandas()
    assert set(zip(out.lo_doc_id, out.hi_doc_id)) == want
    assert (out.lo_doc_id < out.hi_doc_id).all()
    assert len(want) > 0


# ---------------------------------------------------------------------------
# bucketed_order_revenue (storage-partitioned join)


def test_bucketed_order_revenue_oracle(ray_session):
    from pdf_extraction_ray.pipelines.relational import (
        bucketed_order_revenue, bucketed_order_revenue_sql)
    from tests.oracle_check import compare

    assert compare("bucketed_order_revenue", bucketed_order_revenue(SF_SMOKE),
                   bucketed_order_revenue_sql(), SF_SMOKE) == []


def test_bucketed_join_matches_hash_join(ray_session):
    """The storage-partitioned plan is value-identical to the ordinary
    partition-wise hash_join over the same inputs, and the bucket
    layout actually landed on disk (one dir per non-empty bucket)."""
    import os
    import pandas as pd
    from pdf_extraction_ray.pipelines.relational import (
        _read, bucketed_order_revenue)
    from pdf_extraction_ray.stages.joins import hash_join

    got = (bucketed_order_revenue(SF_SMOKE, tmp_root="/tmp/pxr_bj_test")
           .to_pandas().sort_values("o_orderkey").reset_index(drop=True))
    assert os.path.isdir("/tmp/pxr_bj_test/items/bucket=0")
    assert os.path.isdir("/tmp/pxr_bj_test/orders/bucket=0")

    import numpy as np
    import pyarrow.parquet as pq
    li = pq.read_table(f"{SF_SMOKE}/lineitem.parquet",
                       columns=["l_orderkey", "l_extendedprice",
                                "l_discount"]).to_pandas()
    od = pq.read_table(f"{SF_SMOKE}/orders.parquet",
                       columns=["o_orderkey", "o_orderpriority"]).to_pandas()
    li["rev"] = np.round(
        li.l_extendedprice * (1 - li.l_discount) * 10000).astype("int64")
    want = (li.groupby("l_orderkey", as_index=False)["rev"].sum()
            .merge(od, left_on="l_orderkey", right_on="o_orderkey")
            [["o_orderkey", "o_orderpriority", "rev"]]
            .rename(columns={"rev": "revenue_e4"})
            .sort_values("o_orderkey").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_write_bucketed_routes_by_key(ray_session):
    """Every row lands in bucket key % B; buckets partition the
    table."""
    import glob
    import pyarrow.parquet as pq
    import ray.data as rd_
    import pyarrow as pa
    from pdf_extraction_ray.stages.joins import write_bucketed

    ds = rd_.from_arrow(pa.table({
        "k": pa.array(list(range(100)), pa.int64()),
        "v": pa.array([i * 7 for i in range(100)], pa.int64())}))
    out = write_bucketed(ds, "k", "/tmp/pxr_wb_test", num_buckets=8)
    total = 0
    for d in glob.glob(out + "/bucket=*"):
        b = int(d.rsplit("=", 1)[1])
        t = pq.read_table(d)
        ks = t["k"].to_pylist()
        assert all(k % 8 == b for k in ks)
        total += len(ks)
    assert total == 100


# ---------------------------------------------------------------------------
# scd2_history


def test_scd2_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (scd2_history,
                                                        scd2_history_sql)
    from tests.oracle_check import compare

    assert compare("scd2_history", scd2_history(SF_SMOKE),
                   scd2_history_sql(), SF_SMOKE) == []


def test_scd2_invariants(ray_session):
    """SCD2 contract: intervals per doc are contiguous and
    non-overlapping, versions start at 1 and increase, at most one
    open interval per doc, and the 'current' slice (open intervals)
    equals snapshot B's doc set."""
    from pdf_extraction_ray.pipelines.analytics import (
        MV_ADDED_MOD, MV_ADDED_OFF, MV_ADDED_RES, MV_CHANGED_MOD,
        MV_CHANGED_RES, MV_REMOVED_MOD, MV_REMOVED_RES, scd2_history)
    import pyarrow.parquet as pq

    OPEN = 1 << 62
    out = scd2_history(SF_SMOKE).to_pandas()
    for d, g in out.groupby("doc_id"):
        g = g.sort_values("version")
        assert list(g.version) == list(range(1, len(g) + 1))
        assert (g.valid_from < g.valid_to).all()
        assert (g.valid_to == OPEN).sum() <= 1
        # contiguity: next version starts where the previous ended
        ends = g.valid_to.to_numpy()[:-1]
        starts = g.valid_from.to_numpy()[1:]
        assert (ends == starts).all()
    docs = pq.read_table(f"{SF_SMOKE}/documents.parquet",
                         columns=["doc_id"]).to_pandas()
    ids = docs.doc_id
    b_set = set(ids[ids % MV_REMOVED_MOD != MV_REMOVED_RES]) | set(
        ids[ids % MV_ADDED_MOD == MV_ADDED_RES] + MV_ADDED_OFF)
    current = set(out.loc[out.valid_to == OPEN, "doc_id"])
    assert current == b_set


# ---------------------------------------------------------------------------
# wau_daily_hll


def test_wau_daily_hll_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (wau_daily_hll,
                                                        wau_daily_hll_sql)
    from tests.oracle_check import compare

    assert compare("wau_daily_hll", wau_daily_hll(SF_SMOKE),
                   wau_daily_hll_sql(), SF_SMOKE) == []


def test_wau_daily_hll_error_bound(ray_session):
    """The sketch tracks the exact WAU within the HLL error envelope
    (±1.04/sqrt(m) ≈ 3.25% at m=1024; assert 5x slack) on every day,
    and the day spines agree."""
    from pdf_extraction_ray.pipelines.analytics import (wau_daily,
                                                        wau_daily_hll)

    exact = (wau_daily(SF_SMOKE).to_pandas()
             .set_index("day")["wau"].sort_index())
    approx = (wau_daily_hll(SF_SMOKE).to_pandas()
              .set_index("day")["wau_approx"].sort_index())
    assert list(exact.index) == list(approx.index)
    m = 1 << 10
    tol = 5 * 1.04 / (m ** 0.5)
    for d in exact.index:
        e, a = int(exact[d]), int(approx[d])
        assert e == 0 and a == 0 or abs(a - e) <= max(3, tol * e)
