"""Tests for the session-6 operators: cohort retention, bigram lift
collocations, corpus-adaptive stopword pruning, co-citation pairs, and
k-core membership."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# retention_cohorts


def test_retention_cohorts_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (retention_cohorts,
                                                        retention_cohorts_sql)
    from tests.oracle_check import compare

    assert compare("retention_cohorts", retention_cohorts(SF_SMOKE),
                   retention_cohorts_sql(), SF_SMOKE) == []


def test_retention_cohorts_semantics(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (WEEK_US,
                                                        retention_cohorts)

    out = retention_cohorts(SF_SMOKE).to_pandas()
    assert (out.age_weeks >= 0).all()
    assert (out.n_users > 0).all()
    # age-0 cell = cohort size; no later cell can exceed it
    base = out[out.age_weeks == 0].set_index("cohort_week")["n_users"]
    assert set(out.cohort_week) == set(base.index)  # every cohort has age 0
    for _, r in out.iterrows():
        assert r.n_users <= base[r.cohort_week]
    # total cohort sizes == number of distinct users
    ev = pq.read_table(os.path.join(SF_SMOKE, "events.parquet"),
                       columns=["user_id", "ts"]).to_pandas()
    assert int(base.sum()) == ev.user_id.nunique()
    # pandas reference for one cohort cell grid
    w = ev.ts.astype("datetime64[us]").astype("int64") // WEEK_US
    uw = pd.DataFrame({"u": ev.user_id, "w": w}).drop_duplicates()
    cw = uw.groupby("u")["w"].transform("min")
    ref = (pd.DataFrame({"c": cw, "a": uw.w - cw})
           .groupby(["c", "a"]).size())
    got = out.set_index(["cohort_week", "age_weeks"])["n_users"]
    assert got.sort_index().tolist() == ref.sort_index().tolist()


# ---------------------------------------------------------------------------
# bigram_lift


def test_bigram_lift_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (bigram_lift,
                                                        bigram_lift_sql)
    from tests.oracle_check import compare

    assert compare("bigram_lift", bigram_lift(SF_SMOKE),
                   bigram_lift_sql(), SF_SMOKE) == []


def test_bigram_lift_ordering_and_floor(ray_session):
    from pdf_extraction_ray.pipelines.analytics import bigram_lift

    out = bigram_lift(SF_SMOKE, k=20, min_count=5).to_pandas()
    assert len(out) <= 20
    assert (out.n_total >= 5).all()
    # descending lift, bigram ascending inside ties
    key = list(zip(-out.lift_q, out.bigram))
    assert key == sorted(key)
    # lift really is the quantized association ratio for the top row
    docs = pq.read_table(os.path.join(SF_SMOKE, "documents.parquet"),
                         columns=["text"]).to_pylist()
    from collections import Counter
    uni: Counter = Counter()
    big: Counter = Counter()
    for d in docs:
        ws = (d["text"] or "").split(" ")
        uni.update(ws)
        big.update(f"{a} {b}" for a, b in zip(ws, ws[1:]))
    n = sum(uni.values())
    top = out.iloc[0]
    w1, w2 = top.bigram.split(" ", 1)
    assert top.n_total == big[top.bigram]
    assert top.lift_q == (big[top.bigram] * n * 1000) // (uni[w1] * uni[w2])


# ---------------------------------------------------------------------------
# stopword_prune


def test_stopword_prune_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (stopword_prune,
                                                        stopword_prune_sql)
    from tests.oracle_check import compare

    assert compare("stopword_prune", stopword_prune(SF_SMOKE),
                   stopword_prune_sql(), SF_SMOKE) == []


def test_stopword_prune_semantics(ray_session):
    from pdf_extraction_ray.pipelines.analytics import stopword_prune

    docs = pq.read_table(os.path.join(SF_SMOKE, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    n = len(docs)
    df_counts: dict[str, int] = {}
    for t in docs.text:
        for w in set((t or "").split(" ")):
            df_counts[w] = df_counts.get(w, 0) + 1
    stop = {w for w, c in df_counts.items() if c * 100 >= 50 * n}
    assert stop, "corpus should have at least one >=50%-DF word"

    out = (stopword_prune(SF_SMOKE).to_pandas()
           .set_index("doc_id"))
    assert len(out) == n
    for _, row in docs.iterrows():
        got = out.loc[row.doc_id]
        ws = (row.text or "").split(" ")
        kept = [w for w in ws if w not in stop]
        assert got.text_pruned == " ".join(kept)
        assert got.n_removed == len(ws) - len(kept)


# ---------------------------------------------------------------------------
# cocitation_pairs


def test_cocitation_pairs_oracle(ray_session):
    from pdf_extraction_ray.pipelines.linkgraph import (cocitation_pairs,
                                                        cocitation_pairs_sql)
    from tests.oracle_check import compare

    assert compare("cocitation_pairs", cocitation_pairs(SF_SMOKE),
                   cocitation_pairs_sql(), SF_SMOKE) == []


def test_cocitation_pairs_brute_force(ray_session):
    from pdf_extraction_ray.pipelines.linkgraph import (_edges_sql,
                                                        cocitation_pairs)
    from tests.oracle_check import duckdb_con

    con = duckdb_con(SF_SMOKE)
    e = con.sql("WITH " + _edges_sql()
                + " SELECT src_doc_id s, dst_doc_id d FROM e").df()
    con.close()
    inl: dict[int, set] = {}
    for s, d in zip(e.s, e.d):
        inl.setdefault(int(d), set()).add(int(s))
    want = {}
    nodes = sorted(inl)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            inter = len(inl[a] & inl[b])
            union = len(inl[a] | inl[b])
            if inter and 100 * inter >= 20 * union:
                want[(a, b)] = (inter, 100 * inter // union)
    out = cocitation_pairs(SF_SMOKE).to_pandas()
    got = {(int(r.doc_a), int(r.doc_b)): (int(r.n_common),
                                          int(r.jaccard_pct))
           for _, r in out.iterrows()}
    assert got == want
    assert want, "planted graph should produce co-cited hub pairs"


# ---------------------------------------------------------------------------
# kcore_nodes


def test_kcore_oracle(ray_session):
    from pdf_extraction_ray.pipelines.linkgraph import (kcore_nodes,
                                                        kcore_nodes_sql)
    from tests.oracle_check import compare

    assert compare("kcore_nodes", kcore_nodes(SF_SMOKE),
                   kcore_nodes_sql(), SF_SMOKE) == []


def test_kcore_distributed_path_matches_one_task(ray_session):
    """task_limit=0 forces the per-round degrees/semi-join peel; it
    must be value-identical to the one-task fast path the small graph
    normally takes (the hits/triangles forced-path convention)."""
    from pdf_extraction_ray.pipelines.linkgraph import kcore_nodes

    fast = (kcore_nodes(SF_SMOKE).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    dist = (kcore_nodes(SF_SMOKE, task_limit=0).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert fast.equals(dist)


def test_kcore_fixpoint_and_brute_force(ray_session):
    from pdf_extraction_ray.pipelines.linkgraph import (_edges_sql,
                                                        kcore_nodes)
    from tests.oracle_check import duckdb_con

    out = kcore_nodes(SF_SMOKE, k=3, rounds=6).to_pandas()
    assert (out.deg >= 3).all()

    # brute-force peel to a true fixpoint == the 6-round result
    # (proves 6 rounds CONVERGES on this graph, not just matches SQL)
    con = duckdb_con(SF_SMOKE)
    e = con.sql(
        "WITH " + _edges_sql() + """
        SELECT DISTINCT least(src_doc_id, dst_doc_id) a,
               greatest(src_doc_id, dst_doc_id) b
        FROM e WHERE src_doc_id <> dst_doc_id""").df()
    con.close()
    edges = {(int(a), int(b)) for a, b in zip(e.a, e.b)}
    while True:
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        alive = {n for n, c in deg.items() if c >= 3}
        kept = {(a, b) for a, b in edges if a in alive and b in alive}
        if kept == edges:
            break
        edges = kept
    want = {}
    for a, b in edges:
        want[a] = want.get(a, 0) + 1
        want[b] = want.get(b, 0) + 1
    want = {n: c for n, c in want.items() if c >= 3}
    got = {int(r.doc_id): int(r.deg) for _, r in out.iterrows()}
    assert got == want
    assert want, "hubs must survive the k=3 peel"
    # the collided-hub docs (d = 5 mod 8 -> only 2 distinct out-hubs)
    # really get peeled unless they are themselves linked-to hubs
    peeled = set(np.unique(e[["a", "b"]].to_numpy())) - set(want)
    assert any(d % 8 == 5 for d in peeled)


# ---------------------------------------------------------------------------
# path_trigrams / interarrival_hist


def _events_df():
    ev = pq.read_table(os.path.join(SF_SMOKE, "events.parquet"),
                       columns=["event_id", "user_id", "ts",
                                "event_type"]).to_pandas()
    return ev.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")


def test_path_trigrams_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (path_trigrams,
                                                        path_trigrams_sql)
    from tests.oracle_check import compare

    assert compare("path_trigrams", path_trigrams(SF_SMOKE),
                   path_trigrams_sql(), SF_SMOKE) == []


def test_path_trigrams_replay(ray_session):
    from pdf_extraction_ray.pipelines.analytics import path_trigrams

    ev = _events_df()
    by_u = ev.groupby("user_id", sort=False)["event_type"]
    e2, e3 = by_u.shift(-1), by_u.shift(-2)
    ok = e3.notna()
    ref = (ev.event_type[ok] + ">" + e2[ok] + ">" + e3[ok]).value_counts()

    out = path_trigrams(SF_SMOKE, k=25).to_pandas()
    assert len(out) == min(25, len(ref))
    assert (out.path.str.count(">") == 2).all()
    key = list(zip(-out.n, out.path))
    assert key == sorted(key)
    for _, r in out.iterrows():
        assert ref[r.path] == r.n
    # really the top-k: every omitted path counts <= the kept minimum
    kept = set(out.path)
    omitted_max = max((int(c) for p, c in ref.items() if p not in kept),
                      default=0)
    assert omitted_max <= int(out.n.min())


def test_interarrival_hist_oracle_and_replay(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (interarrival_hist,
                                                        interarrival_hist_sql)
    from tests.oracle_check import compare

    assert compare("interarrival_hist", interarrival_hist(SF_SMOKE),
                   interarrival_hist_sql(), SF_SMOKE) == []

    ev = _events_df()
    us = ev.ts.astype("datetime64[us]").astype("int64")
    prev = us.groupby(ev.user_id).shift(1)
    ok = prev.notna()
    digits = (us[ok] - prev[ok].astype("int64")).astype("int64") \
        .astype(str).str.len()
    ref = (pd.DataFrame({"t": ev.event_type[ok], "d": digits})
           .groupby(["t", "d"]).size())
    out = interarrival_hist(SF_SMOKE).to_pandas()
    got = out.set_index(["event_type", "gap_digits"])["n_gaps"]
    assert got.sort_index().tolist() == ref.sort_index().tolist()
    # gaps exist across multiple magnitudes on this corpus
    assert out.gap_digits.nunique() >= 2


# ---------------------------------------------------------------------------
# search_ranked


def test_search_ranked_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (search_ranked,
                                                        search_ranked_sql)
    from tests.oracle_check import compare

    assert compare("search_ranked", search_ranked(SF_SMOKE),
                   search_ranked_sql(), SF_SMOKE) == []


def test_search_ranked_is_a_rerank(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (RANK_BLEND_SCALE,
                                                        bm25_topk,
                                                        search_ranked)

    cand = bm25_topk(SF_SMOKE).to_pandas()
    out = search_ranked(SF_SMOKE).to_pandas()
    # same candidate sets per query — stage 2 never adds or drops docs
    for qid, grp in out.groupby("query_id"):
        want = set(cand[cand.query_id == qid].doc_id)
        assert set(grp.doc_id) == want
        assert sorted(grp.final_rank) == list(range(1, len(want) + 1))
        # blended order really is (blended DESC, doc_id)
        g = grp.sort_values("final_rank")
        key = list(zip(-g.blended, g.doc_id))
        assert key == sorted(key)
    # centrality boost is >= 1x (hub ranks exceed the scale, so the
    # boost is unbounded above — only the floor is guaranteed)
    assert (out.blended >= out.score).all()
    # the join wired the real pagerank column, not zeros
    assert (out.centrality > 0).any()
    assert (out.blended == (out.score * (RANK_BLEND_SCALE + out.centrality))
            // RANK_BLEND_SCALE).all()
