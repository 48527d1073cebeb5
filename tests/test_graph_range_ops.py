"""Tests for the session-5 operators: broadcast range join, HITS,
bounded-radius BFS, and CCNet perplexity terciles."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# broadcast_range_join (the generic stage)


def _toy_intervals() -> pa.Table:
    # key 'a': [0,10) band0, [10,20) band1, gap [20,30), [30,-1) band3
    # key 'b': single unbounded band starting at 5
    return pa.table({
        "key": pa.array(["a", "a", "a", "b"]),
        "band": pa.array([0, 1, 3, 0], pa.int64()),
        "lo": pa.array([0, 10, 30, 5], pa.int64()),
        "hi": pa.array([10, 20, -1, -1], pa.int64()),
    })


def test_broadcast_range_join_semantics(ray_session):
    import ray.data as rd

    from pdf_extraction_ray.stages.joins import broadcast_range_join

    left = rd.from_items([
        {"id": 0, "k": "a", "v": 0},     # band 0 (lo inclusive)
        {"id": 1, "k": "a", "v": 9},     # band 0
        {"id": 2, "k": "a", "v": 10},    # band 1 (hi exclusive above)
        {"id": 3, "k": "a", "v": 25},    # gap -> drop
        {"id": 4, "k": "a", "v": 30},    # band 3
        {"id": 5, "k": "a", "v": 10**9},  # unbounded band 3
        {"id": 6, "k": "b", "v": 4},     # below b's lo -> drop
        {"id": 7, "k": "b", "v": 5},     # b band 0
        {"id": 8, "k": "c", "v": 7},     # key with no intervals -> drop
    ])
    out = broadcast_range_join(
        left, _toy_intervals(), key_col="k", value_col="v",
        left_cols=["id", "k", "v"], interval_cols=["band", "lo", "hi"],
    ).to_pandas().sort_values("id").reset_index(drop=True)
    assert out.id.tolist() == [0, 1, 2, 4, 5, 7]
    assert out.band.tolist() == [0, 0, 1, 3, 3, 0]
    # containment really holds row by row
    for _, r in out.iterrows():
        assert r.v >= r.lo and (r.hi == -1 or r.v < r.hi)


def test_broadcast_range_join_rejects_bad_intervals(ray_session):
    import ray.data as rd

    from pdf_extraction_ray.stages.joins import broadcast_range_join

    left = rd.from_items([{"id": 0, "k": "a", "v": 1}])
    overlapping = pa.table({
        "key": pa.array(["a", "a"]),
        "band": pa.array([0, 1], pa.int64()),
        "lo": pa.array([0, 5], pa.int64()),
        "hi": pa.array([10, 20], pa.int64()),
    })
    with pytest.raises(ValueError, match="overlap"):
        broadcast_range_join(left, overlapping, "k", "v",
                             ["id"], ["band"])
    # an unbounded interval BELOW another is an overlap too
    unbounded_mid = pa.table({
        "key": pa.array(["a", "a"]),
        "band": pa.array([0, 1], pa.int64()),
        "lo": pa.array([0, 5], pa.int64()),
        "hi": pa.array([-1, 20], pa.int64()),
    })
    with pytest.raises(ValueError, match="overlap"):
        broadcast_range_join(left, unbounded_mid, "k", "v",
                             ["id"], ["band"])
    empty = pa.table({
        "key": pa.array(["a"]),
        "band": pa.array([0], pa.int64()),
        "lo": pa.array([10], pa.int64()),
        "hi": pa.array([10], pa.int64()),
    })
    with pytest.raises(ValueError, match="empty"):
        broadcast_range_join(left, empty, "k", "v", ["id"], ["band"])


def test_value_band_join_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (
        value_band_join, value_band_join_sql)
    assert compare("value_band_join", value_band_join(SF_SMOKE),
                   value_band_join_sql(), SF_SMOKE) == []


def test_value_band_join_coverage_and_drops(ray_session):
    """Inner semantics carry real traffic: sub-500-cent events drop,
    every band 0..3 is populated, and each row's band contains it."""
    from pdf_extraction_ray.pipelines.analytics import value_band_join

    ev = pd.read_parquet(os.path.join(SF_SMOKE, "events.parquet"),
                         columns=["event_id", "event_type", "value"])
    cents = (ev.value * 100).round().astype("int64")
    out = value_band_join(SF_SMOKE).to_pandas()
    assert set(out.band) == {0, 1, 2, 3}
    n_dropped = int((cents < 500).sum())
    assert n_dropped > 0
    assert len(out) == len(ev) - n_dropped
    step = 1000 + 100 * (out.event_type.str.len() % 7)
    j = out.band.to_numpy()
    lo = np.where(j == 0, 500, j * j * step.to_numpy())
    assert (out.band_lo.to_numpy() == lo).all()
    ok_hi = (out.band_hi.to_numpy() == -1) | (
        out.value_cents.to_numpy() < out.band_hi.to_numpy())
    assert ((out.value_cents.to_numpy() >= lo) & ok_hi).all()


# ---------------------------------------------------------------------------
# HITS


def test_hits_scores_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.linkgraph import (
        hits_scores, hits_scores_sql)
    assert compare("hits_scores", hits_scores(SF_SMOKE),
                   hits_scores_sql(), SF_SMOKE) == []


def test_hits_distributed_path_matches_one_task(ray_session):
    """task_limit=0 forces the per-round join/groupby/max path; it must
    be bit-identical to the one-task fast path (and so to the oracle)."""
    from pdf_extraction_ray.pipelines.linkgraph import hits_scores

    fast = (hits_scores(SF_SMOKE).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    dist = (hits_scores(SF_SMOKE, task_limit=0).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, dist)


def test_hits_planted_structure(ray_session):
    """On the planted graph the 16 hub pages collect all in-links:
    every positive authority sits on a hub doc_id (< 16), and pages
    with out-links have positive hub scores (they all point at hubs)."""
    from pdf_extraction_ray.pipelines.linkgraph import hits_scores
    from pdf_extraction_ray.sources import spec

    out = hits_scores(SF_SMOKE).to_pandas()
    pos_auth = out[out.authority > 0]
    assert len(pos_auth) > 0
    assert (pos_auth.doc_id < spec.REL_HUBS).all()
    assert out.hub.max() == 1_000_000  # max-rescale pins the top hub


# ---------------------------------------------------------------------------
# BFS depth


def test_bfs_depth_docs_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (
        bfs_depth_docs, bfs_depth_docs_sql)
    assert compare("bfs_depth_docs", bfs_depth_docs(SF_SMOKE),
                   bfs_depth_docs_sql(), SF_SMOKE) == []


def test_bfs_depth_docs_semantics(ray_session):
    """Seeds sit at depth 0; the expander yields a spread of depths
    (not just 0/1); any non-seed reached depth is >= 1."""
    from pdf_extraction_ray.pipelines.analytics import bfs_depth_docs

    out = bfs_depth_docs(SF_SMOKE).to_pandas()
    seeds = out[out.doc_id % 499 == 0]
    assert (seeds.depth == 0).all() and len(seeds) >= 1
    reached = out[out.depth >= 0]
    assert reached.depth.max() >= 2
    non_seed = reached[reached.doc_id % 499 != 0]
    assert (non_seed.depth >= 1).all()


def test_bfs_depth_from_edges_chain(ray_session):
    """Synthetic multi-hop graph: a 0->1->...->9 chain plus a branch
    and a disconnected island — depths equal hop counts, the island
    reports -1, and the round budget truncates honestly."""
    import ray.data as rd

    from pdf_extraction_ray.pipelines.linkgraph import bfs_depth_from_edges

    chain = [{"src_doc_id": i, "dst_doc_id": i + 1} for i in range(9)]
    chain.append({"src_doc_id": 2, "dst_doc_id": 20})   # branch at 2
    edges = rd.from_items(chain)
    nodes = rd.from_items([{"node": i} for i in
                           list(range(10)) + [20, 99]])  # 99 = island
    seeds = rd.from_items([{"node": 0}])
    out = (bfs_depth_from_edges(edges, nodes, seeds, rounds=6)
           .to_pandas().set_index("doc_id").depth.to_dict())
    for i in range(7):
        assert out[i] == i
    assert out[20] == 3          # via the branch at 2
    # rounds=6 reaches depth <= 6: 7..9 truncate honestly
    assert out[7] == -1 and out[8] == -1 and out[9] == -1
    assert out[99] == -1


# ---------------------------------------------------------------------------
# CCNet buckets


def test_ccnet_buckets_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (
        ccnet_buckets, ccnet_buckets_sql)
    assert compare("ccnet_buckets", ccnet_buckets(SF_SMOKE),
                   ccnet_buckets_sql(), SF_SMOKE) == []


def test_ccnet_buckets_semantics(ray_session):
    """Per lang: all three buckets populated, tercile sizes within the
    tie slack (ties never split — equal scores share a bucket), and the
    bucket boundaries respect score order (every tail score <= every
    middle score <= every head score)."""
    from pdf_extraction_ray.pipelines.analytics import ccnet_buckets

    out = ccnet_buckets(SF_SMOKE).to_pandas()
    assert set(out.bucket) <= {"head", "middle", "tail"}
    for lang, g in out.groupby("lang"):
        per = g.bucket.value_counts().to_dict()
        assert set(per) == {"head", "middle", "tail"}, lang
        # ties share buckets: same norm_score -> same bucket
        assert (g.groupby("norm_score").bucket.nunique() == 1).all()
        assert g[g.bucket == "tail"].norm_score.max() \
            <= g[g.bucket == "middle"].norm_score.min()
        assert g[g.bucket == "middle"].norm_score.max() \
            <= g[g.bucket == "head"].norm_score.min()
        n = len(g)
        # threshold cut is ceil(n/3) up to tie mass: sizes within ties
        assert per["tail"] >= (n + 2) // 3 - 0  # at least the cut


# ---------------------------------------------------------------------------
# degree stats / components / discovery frontier


def test_link_degree_stats_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.linkgraph import (
        link_degree_stats, link_degree_stats_sql)
    assert compare("link_degree_stats", link_degree_stats(SF_SMOKE),
                   link_degree_stats_sql(), SF_SMOKE) == []


def test_link_degree_stats_structure(ray_session):
    """Permalink kinds emit <=3 distinct out-edges; in-links concentrate
    on the 16 hubs; link-free kinds report 0/0."""
    from pdf_extraction_ray.pipelines.linkgraph import link_degree_stats
    from pdf_extraction_ray.sources import spec

    out = link_degree_stats(SF_SMOKE).to_pandas()
    assert (out.outdeg <= 3).all()
    assert (out[out.indeg > 0].doc_id < spec.REL_HUBS).all()
    assert (out.outdeg == 0).any() and (out.outdeg > 0).any()
    # mass balance: total out == total in
    assert out.outdeg.sum() == out.indeg.sum()


def test_link_components_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.linkgraph import (
        link_components, link_components_sql)
    assert compare("link_components", link_components(SF_SMOKE),
                   link_components_sql(), SF_SMOKE) == []


def test_link_components_census(ray_session):
    """The planted graph yields exactly the web-graph shape: ONE giant
    component (all permalink-carrying pages, labeled by its min doc_id)
    plus singletons for every link-free page."""
    from pdf_extraction_ray.pipelines.linkgraph import link_components

    out = link_components(SF_SMOKE).to_pandas()
    sizes = out.component_id.value_counts()
    giant = sizes.index[0]
    assert sizes.iloc[0] > len(out) // 2
    assert (sizes.iloc[1:] == 1).all()
    members = out[out.component_id == giant]
    assert giant == members.doc_id.min()
    singles = out[out.component_id != giant]
    assert (singles.component_id == singles.doc_id).all()


def test_discovery_frontier_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    import __ray_entry__ as entry
    from pdf_extraction_ray.pipelines.linkgraph import discovery_frontier_sql
    assert compare("discovery_frontier",
                   entry.q_discovery_frontier(SF_SMOKE),
                   discovery_frontier_sql(), SF_SMOKE) == []


def test_discovery_frontier_ordering(ray_session):
    """Every discovery outranks every recrawl, priorities are
    non-increasing, and both kinds appear in the plan."""
    import __ray_entry__ as entry
    from pdf_extraction_ray.pipelines.linkgraph import DISCOVER_PRI_BASE

    out = entry.q_discovery_frontier(SF_SMOKE).to_pandas()
    assert set(out.kind) == {"discover", "recrawl"}
    pri = out.priority.to_numpy()
    assert (pri[:-1] >= pri[1:]).all()
    disc = out[out.kind == "discover"]
    rec = out[out.kind == "recrawl"]
    assert disc.priority.min() >= DISCOVER_PRI_BASE
    assert rec.priority.max() < DISCOVER_PRI_BASE
    # discoveries are never-crawled urls: disjoint from recrawl urls
    assert not (set(disc.url) & set(rec.url))


# ---------------------------------------------------------------------------
# positional index phrase search


def test_phrase_search_indexed_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (
        phrase_search_indexed, phrase_search_indexed_sql)
    assert compare("phrase_search_indexed", phrase_search_indexed(SF_SMOKE),
                   phrase_search_indexed_sql(), SF_SMOKE) == []


def test_phrase_search_indexed_equals_python_scan(ray_session):
    """Indexed word-level results == a direct token scan of the raw
    table (count of all starting positions + first 0-based start)."""
    from pdf_extraction_ray.pipelines.analytics import phrase_search_indexed

    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"),
                           columns=["doc_id", "text"])
    words = ["data", "stream"]
    want = {}
    for _, r in docs.iterrows():
        toks = (r.text or "").split(" ")
        ss = [i for i in range(len(toks) - 1)
              if toks[i] == words[0] and toks[i + 1] == words[1]]
        if ss:
            want[r.doc_id] = (len(ss), ss[0])
    out = phrase_search_indexed(SF_SMOKE).to_pandas()
    got = {r.doc_id: (r.n_hits, r.first_tok) for _, r in out.iterrows()}
    assert got == want and len(want) > 0


def test_phrase_search_requires_positions(ray_session, tmp_path):
    import ray.data as rd

    from pdf_extraction_ray.stages import textindex as ti

    ds = rd.from_items([{"doc_id": 0, "text": "a b c"}])
    idx = str(tmp_path / "tfonly")
    ti.build_inverted_index(ds, idx)          # positions=False
    with pytest.raises(ValueError, match="positional"):
        ti.phrase_search_indexed(idx, "a b")
    # and ensure() with positions=True rebuilds rather than answering
    # from the tf-only index
    meta = ti.ensure_inverted_index(ds, idx, positions=True)
    assert meta["positions"] is True
    out = ti.phrase_search_indexed(idx, "a b").to_pandas()
    assert out.n_hits.tolist() == [1] and out.first_tok.tolist() == [0]


def test_phrase_search_append_path_and_duplicate_words(ray_session, tmp_path):
    """A positional index grown by append answers phrases identically
    to a fresh full build; self-overlapping phrases count every start;
    duplicate-word phrases need every slot satisfied."""
    import ray.data as rd

    from pdf_extraction_ray.stages import textindex as ti

    rows = [{"doc_id": 0, "text": "x a b a b a y"},
            {"doc_id": 1, "text": "a a a a"},
            {"doc_id": 2, "text": "b a b"},
            {"doc_id": 3, "text": "no match here"}]
    full = rd.from_items(rows)
    base = rd.from_items(rows[:2])
    delta = rd.from_items(rows[2:])

    idx_full = str(tmp_path / "full")
    ti.build_inverted_index(full, idx_full, positions=True)
    idx_inc = str(tmp_path / "inc")
    ti.build_inverted_index(base, idx_inc, positions=True)
    ti.append_to_index(delta, idx_inc)
    ti.compact_index(idx_inc)

    for phrase in ("a b", "a a", "a b a"):
        a = (ti.phrase_search_indexed(idx_full, phrase).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (ti.phrase_search_indexed(idx_inc, phrase).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)

    aa = ti.phrase_search_indexed(idx_full, "a a").to_pandas()
    assert aa.set_index("doc_id").n_hits.to_dict() == {1: 3}  # overlaps
    aba = ti.phrase_search_indexed(idx_full, "a b a").to_pandas()
    assert aba.set_index("doc_id").n_hits.to_dict() == {0: 2}


# ---------------------------------------------------------------------------
# SQ8 embedding quantization


def test_embedding_quantize_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (
        embedding_quantize, embedding_quantize_sql)
    assert compare("embedding_quantize", embedding_quantize(SF_SMOKE),
                   embedding_quantize_sql(), SF_SMOKE) == []


def test_embedding_quantize_range_and_recall(ray_session):
    """Codes stay in [-127, 127] with the max-magnitude element pinned
    at +/-127; dequantized cosine top-10 keeps >= 0.9 recall vs the
    float top-10 (the SQ8 quality bar)."""
    from pdf_extraction_ray.pipelines.analytics import (
        ann_bruteforce, embedding_quantize)

    out = embedding_quantize(SF_SMOKE).to_pandas()
    C = np.asarray(out.codes.tolist(), dtype=np.int64)
    assert C.min() >= -127 and C.max() <= 127
    assert (np.abs(C).max(axis=1) == 127).all()   # scale element pinned

    emb = pd.read_parquet(os.path.join(SF_SMOKE, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    order = np.argsort(out.vec_id.to_numpy())
    C = C[order]
    s = out.scale.to_numpy()[order]
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    Xq = C * (s[:, None] / 127.0)

    want = ann_bruteforce(SF_SMOKE).to_pandas()
    ids = emb.vec_id.to_numpy()
    nq = Xq / np.maximum(np.linalg.norm(Xq, axis=1, keepdims=True), 1e-12)
    hits = tot = 0
    for qid, grp in want.groupby("query_id"):
        qi = np.searchsorted(ids, qid)
        sims = nq @ nq[qi]
        top = ids[np.lexsort((ids, -sims))[:10]]
        hits += len(set(top) & set(grp.neighbor_id))
        tot += len(grp)
    assert hits / tot >= 0.9


# ---------------------------------------------------------------------------
# triangle counting


def test_triangle_counts_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.linkgraph import (
        triangle_counts, triangle_counts_sql)
    assert compare("triangle_counts", triangle_counts(SF_SMOKE),
                   triangle_counts_sql(), SF_SMOKE) == []


def test_triangle_counts_brute_force(ray_session):
    """Engine counts == a brute-force enumeration over the derived
    planted edge set (independent of both the oracle SQL and the
    degree-orientation algorithm)."""
    from itertools import combinations

    from pdf_extraction_ray.pipelines.linkgraph import (
        link_graph, triangle_counts)

    ue = set()
    for _, r in link_graph(SF_SMOKE).to_pandas().iterrows():
        if r.src_doc_id != r.dst_doc_id:
            ue.add((min(r.src_doc_id, r.dst_doc_id),
                    max(r.src_doc_id, r.dst_doc_id)))
    adj: dict[int, set[int]] = {}
    for a, b in ue:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want: dict[int, int] = {}
    for n, ns in adj.items():
        for u, v in combinations(sorted(ns), 2):
            if (min(u, v), max(u, v)) in ue:
                want[n] = want.get(n, 0) + 1
    # per-node credit counts each triangle once per corner: the wedge
    # scan above visits each triangle exactly once per corner too
    got = (triangle_counts(SF_SMOKE).to_pandas()
           .set_index("doc_id").n_triangles.to_dict())
    assert got == want and len(want) > 0


def test_triangle_counts_distributed_path_matches(ray_session):
    """task_limit=0 forces the full join/wedge/semi-join chain; it must
    equal the one-task fast path exactly."""
    from pdf_extraction_ray.pipelines.linkgraph import triangle_counts

    fast = (triangle_counts(SF_SMOKE).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    dist = (triangle_counts(SF_SMOKE, task_limit=0).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, dist)


# ---------------------------------------------------------------------------
# soft dedup sampling


def test_soft_dedup_sample_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (
        soft_dedup_sample, soft_dedup_sample_sql)
    assert compare("soft_dedup_sample", soft_dedup_sample(SF_SMOKE),
                   soft_dedup_sample_sql(), SF_SMOKE) == []


def test_soft_dedup_sample_semantics(ray_session):
    """Singletons always survive; multi-doc clusters keep ~1 copy in
    expectation; the kept mask is exactly the integer hash rule."""
    from pdf_extraction_ray.functions.hashing import stable_hash64
    from pdf_extraction_ray.pipelines.analytics import (
        dedup_clusters, soft_dedup_sample)

    clusters = dedup_clusters(SF_SMOKE).to_pandas()
    sizes = clusters.cluster_id.value_counts().to_dict()
    out = soft_dedup_sample(SF_SMOKE).to_pandas()
    kept = set(out.doc_id)
    for _, r in clusters.iterrows():
        size = sizes[r.cluster_id]
        h = stable_hash64(f"soft:{r.doc_id}") % (1 << 20)
        assert ((r.doc_id in kept)
                == (h < (1 << 20) // size)), r.doc_id
    singles = clusters[clusters.cluster_id.map(sizes) == 1]
    assert set(singles.doc_id) <= kept
    multi = clusters[clusters.cluster_id.map(sizes) > 1]
    assert len(multi) > 0
    # expected survivors ~ number of multi clusters (loose 4-sigma-ish)
    n_multi_clusters = multi.cluster_id.nunique()
    survivors = len(kept) - len(singles)
    assert survivors <= n_multi_clusters * 3 + 8


# ---------------------------------------------------------------------------
# event funnel


def test_event_funnel_matches_duckdb(ray_session):
    from tests.oracle_check import compare

    from pdf_extraction_ray.pipelines.analytics import (
        event_funnel, event_funnel_sql)
    assert compare("event_funnel", event_funnel(SF_SMOKE),
                   event_funnel_sql(), SF_SMOKE) == []


def test_event_funnel_python_replay(ray_session):
    """Engine output == a direct per-user Python replay of the
    first-completion semantics (independent of both SQL and the
    partitioned pandas implementation)."""
    from pdf_extraction_ray.pipelines.analytics import (
        FUNNEL_STEPS, event_funnel)

    ev = pd.read_parquet(os.path.join(SF_SMOKE, "events.parquet"),
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])
    want = {}
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        cur = None
        steps_done = 0
        t1 = None
        for step in FUNNEL_STEPS:
            cand = g[g.event_type == step]
            if cur is not None:
                after = (cand.ts > cur[0]) | ((cand.ts == cur[0])
                                              & (cand.event_id > cur[1]))
                cand = cand[after]
            if not len(cand):
                break
            r = cand.iloc[0]
            cur = (r.ts, r.event_id)
            if t1 is None:
                t1 = r.ts
            steps_done += 1
        conv = -1
        if steps_done == len(FUNNEL_STEPS):
            conv = int((cur[0] - t1) / pd.Timedelta(microseconds=1))
        want[uid] = (steps_done, conv)
    out = event_funnel(SF_SMOKE).to_pandas()
    got = {r.user_id: (r.steps_completed, r.convert_us)
           for _, r in out.iterrows()}
    assert got == want
    assert any(v[0] == 3 for v in want.values())      # completions exist
    assert all(v[1] > 0 for v in want.values() if v[0] == 3)
