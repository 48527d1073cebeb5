"""Tests for the session-7 operators: NTILE value quartiles, the
out-of-order/watermark audit, the per-type daily-rate EWMA, and
label-propagation communities, and product quantization."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# value_ntiles


def test_value_ntiles_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (value_ntiles,
                                                        value_ntiles_sql)
    from tests.oracle_check import compare

    assert compare("value_ntiles", value_ntiles(SF_SMOKE),
                   value_ntiles_sql(), SF_SMOKE) == []


def test_value_ntiles_fill_rule(ray_session):
    """SQL NTILE semantics: within each type, tile sizes differ by at
    most one, the larger tiles come first, and every row is tiled."""
    from pdf_extraction_ray.pipelines.analytics import value_ntiles

    out = value_ntiles(SF_SMOKE, n=4).to_pandas()
    ev = pq.read_table(os.path.join(SF_SMOKE, "events.parquet"),
                       columns=["event_id"])
    assert len(out) == ev.num_rows
    assert set(out.tile) <= {1, 2, 3, 4}
    for et, g in out.groupby("event_type"):
        sizes = g.groupby("tile").size()
        assert sizes.max() - sizes.min() <= 1
        # larger tiles first (the first count%n tiles get the extra row)
        s = sizes.reindex(range(1, sizes.index.max() + 1)).to_numpy()
        assert (np.diff(s) <= 0).all()
        # tiles are value-ordered: every row in tile t has cents <= the
        # min of tile t+1 (ties broken by event_id inside the order)
        gmax = g.groupby("tile")["cents"].max()
        gmin = g.groupby("tile")["cents"].min()
        for t in range(1, int(sizes.index.max())):
            assert gmax[t] <= gmin[t + 1] or gmax[t] == gmin[t + 1]


# ---------------------------------------------------------------------------
# late_event_audit


def test_late_event_audit_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (late_event_audit,
                                                        late_event_audit_sql)
    from tests.oracle_check import compare

    assert compare("late_event_audit", late_event_audit(SF_SMOKE),
                   late_event_audit_sql(), SF_SMOKE) == []


def test_late_event_audit_semantics(ray_session):
    """The plant creates all three statuses; un-planted events are
    ontime (the raw table is ts-monotone per user); a pandas replay of
    the watermark rule matches."""
    from pdf_extraction_ray.pipelines.analytics import (DISORDER_BASE_S,
                                                        DISORDER_MOD,
                                                        DISORDER_RES,
                                                        DISORDER_STEP_S,
                                                        LATENESS_US,
                                                        late_event_audit)

    out = late_event_audit(SF_SMOKE).to_pandas()
    assert set(out.status) == {"ontime", "reordered", "late"}
    planted = out.event_id % DISORDER_MOD == DISORDER_RES
    assert (out.loc[~planted, "disorder_us"] == 0).all()
    assert (out.loc[~planted, "status"] == "ontime").all()

    ev = pq.read_table(os.path.join(SF_SMOKE, "events.parquet"),
                       columns=["event_id", "user_id", "ts"]).to_pandas()
    ev = ev.sort_values(["user_id", "event_id"], kind="mergesort")
    tus = ev.ts.astype("datetime64[us]").astype("int64").to_numpy()
    eid = ev.event_id.to_numpy()
    shift = np.where(eid % DISORDER_MOD == DISORDER_RES,
                     (DISORDER_BASE_S + (eid % 7) * DISORDER_STEP_S)
                     * 1_000_000, 0)
    tus = tus - shift
    users = ev.user_id.to_numpy()
    wm = (pd.Series(tus).groupby(users).cummax()
          .groupby(users).shift(1).to_numpy())
    disorder = np.where(np.isnan(wm), 0,
                        np.maximum(np.nan_to_num(wm) - tus, 0)
                        ).astype(np.int64)
    ref = pd.Series(disorder, index=eid).sort_index()
    got = out.set_index("event_id")["disorder_us"].sort_index()
    assert got.tolist() == ref.tolist()
    late = out[out.status == "late"]
    assert (late.disorder_us > LATENESS_US).all()


# ---------------------------------------------------------------------------
# ewma_event_rate


def test_ewma_event_rate_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (ewma_event_rate,
                                                        ewma_event_rate_sql)
    from tests.oracle_check import compare

    assert compare("ewma_event_rate", ewma_event_rate(SF_SMOKE),
                   ewma_event_rate_sql(), SF_SMOKE) == []


def test_ewma_event_rate_semantics(ray_session):
    """Zero-filled contiguous spine per type; the recurrence replays;
    EWMA converges toward zero over trailing empty days."""
    from pdf_extraction_ray.pipelines.analytics import (EWMA_SCALE,
                                                        ewma_event_rate)

    out = ewma_event_rate(SF_SMOKE).to_pandas()
    d0, d1 = out.day.min(), out.day.max()
    for et, g in out.groupby("event_type"):
        g = g.sort_values("day")
        assert g.day.tolist() == list(range(d0, d1 + 1))  # contiguous
        # replay the fold
        acc = EWMA_SCALE * int(g.n_events.iloc[0])
        assert int(g.ewma_milli.iloc[0]) == acc
        for n, s in zip(g.n_events.iloc[1:], g.ewma_milli.iloc[1:]):
            acc = (7 * acc + EWMA_SCALE * int(n)) // 8
            assert int(s) == acc
    # total zero-filled cells cover types x span
    assert len(out) == out.event_type.nunique() * (d1 - d0 + 1)


# ---------------------------------------------------------------------------
# lpa_communities


def test_lpa_communities_oracle(ray_session):
    from pdf_extraction_ray.pipelines.linkgraph import (lpa_communities,
                                                        lpa_communities_sql)
    from tests.oracle_check import compare

    assert compare("lpa_communities", lpa_communities(SF_SMOKE),
                   lpa_communities_sql(), SF_SMOKE) == []


def test_lpa_distributed_path_matches(ray_session):
    """The per-round join/groupby path (task_limit=0 forces it) is
    bit-identical to the one-task dispatch."""
    from pdf_extraction_ray.pipelines.linkgraph import lpa_communities

    one = (lpa_communities(SF_SMOKE).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    dist = (lpa_communities(SF_SMOKE, task_limit=0).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert one.equals(dist)


def test_lpa_vs_components_structure(ray_session):
    """LPA refines (or equals) the component census: every community
    sits inside one connected component, never across two; link-free
    pages stay singleton communities."""
    from pdf_extraction_ray.pipelines.linkgraph import (link_components,
                                                        link_graph,
                                                        lpa_communities)

    com = lpa_communities(SF_SMOKE).to_pandas().set_index("doc_id")
    cc = link_components(SF_SMOKE).to_pandas().set_index("doc_id")
    merged = com.join(cc)
    # each community maps to exactly one component
    assert (merged.groupby("community_id")["component_id"]
            .nunique() == 1).all()
    assert merged.community_id.nunique() >= merged.component_id.nunique()
    linked = set()
    eg = link_graph(SF_SMOKE).to_pandas()
    linked.update(eg.src_doc_id)
    linked.update(eg.dst_doc_id)
    iso = merged[~merged.index.isin(linked)]
    assert len(iso) > 0
    assert (iso.community_id == iso.index).all()


# ---------------------------------------------------------------------------
# embedding_pq


def test_embedding_pq_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (embedding_pq,
                                                        embedding_pq_sql)
    from tests.oracle_check import compare

    assert compare("embedding_pq", embedding_pq(SF_SMOKE),
                   embedding_pq_sql(), SF_SMOKE) == []


def test_embedding_pq_quality_and_margin(ray_session):
    """Codes land in [0, k); quantization explains variance (per-code
    reconstruction beats the one-centroid baseline by a wide factor);
    assignment margins dwarf cross-engine float noise; identical
    vectors get identical codes."""
    from pdf_extraction_ray.pipelines.analytics import embedding_pq
    from pdf_extraction_ray.stages.similarity import kmeans_fit
    from pdf_extraction_ray.sources.tables import read_table

    m, k, sub = 4, 16, 16
    codes = embedding_pq(SF_SMOKE, m=m, k=k).to_pandas()
    code_cols = [f"code_{s}" for s in range(m)]
    for c in code_cols:
        assert codes[c].between(0, k - 1).all()
        assert codes[c].nunique() > 1

    emb = read_table(SF_SMOKE, "embeddings",
                     ["vec_id", "embedding"]).materialize()
    X = np.asarray(emb.to_pandas()
                   .sort_values("vec_id").embedding.tolist(), np.float64)
    codes = codes.sort_values("vec_id").reset_index(drop=True)

    # rebuild the codebooks exactly as the operator does
    recon = np.empty_like(X)
    margins = []
    for s in range(m):
        lo = s * sub

        def slice_s(t, lo=lo):
            import pyarrow as pa
            Xs = np.asarray(t["embedding"].to_pylist(),
                            np.float64)[:, lo:lo + sub]
            return pa.table({"vec_id": t["vec_id"],
                             "embedding": pa.array(Xs.tolist(),
                                                   pa.list_(pa.float64()))})

        sliced = emb.map_batches(slice_s,
                                 batch_format="pyarrow").materialize()
        C, _ = kmeans_fit(sliced, k=k, iters=4, init_ids=list(range(k)))
        cs = codes[f"code_{s}"].to_numpy()
        recon[:, lo:lo + sub] = C[cs]
        Xs = X[:, lo:lo + sub]
        d = ((Xs * Xs).sum(axis=1, keepdims=True) - 2.0 * (Xs @ C.T)
             + (C * C).sum(axis=1))
        ds = np.sort(d, axis=1)
        margins.append(float((ds[:, 1] - ds[:, 0]).min()))

    assert min(margins) > 1e-9          # vs ~1e-13 cross-engine noise
    mse_pq = ((X - recon) ** 2).mean()
    mse_one = ((X - X.mean(axis=0)) ** 2).mean()
    assert mse_pq < 0.9 * mse_one
    # identical sub-vectors -> identical codes (vec 0 vs itself is
    # trivially true; check determinism across two runs instead)
    from pdf_extraction_ray.pipelines.analytics import embedding_pq as ep2
    again = (ep2(SF_SMOKE, m=m, k=k).to_pandas()
             .sort_values("vec_id").reset_index(drop=True))
    assert again.equals(codes)


# ---------------------------------------------------------------------------
# er_blocked_pairs


def test_er_blocked_pairs_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (er_blocked_pairs,
                                                        er_blocked_pairs_sql)
    from tests.oracle_check import compare

    assert compare("er_blocked_pairs", er_blocked_pairs(SF_SMOKE),
                   er_blocked_pairs_sql(), SF_SMOKE) == []


def test_er_planted_semantics(ray_session):
    """Planted single copies match iff prepend count <= threshold;
    copy-vs-copy distance is the prepend DIFFERENCE (including the
    exact-dup 0 at doc 66); distances are exact."""
    from pdf_extraction_ray.pipelines.analytics import (ER_MOD_A, ER_MOD_B,
                                                        ER_OFF_A, ER_OFF_B,
                                                        ER_THRESHOLD,
                                                        er_blocked_pairs)

    out = er_blocked_pairs(SF_SMOKE).to_pandas()
    got = {(r.a, r.b): r.dist for r in out.itertuples()}
    n_docs = 500
    for d in range(0, n_docs, ER_MOD_A):
        e = 1 + d % 8
        if e <= ER_THRESHOLD:
            assert got[(d, d + ER_OFF_A)] == e
        else:
            assert (d, d + ER_OFF_A) not in got
    for d in range(0, n_docs, ER_MOD_B):
        ea, eb = 1 + d % 8, 2 + d % 5
        diff = abs(ea - eb)
        if diff <= ER_THRESHOLD:
            assert got[(d + ER_OFF_A, d + ER_OFF_B)] == diff
    assert got[(66 + ER_OFF_A, 66 + ER_OFF_B)] == 0  # exact dup by CRT


def test_lev_against_reference():
    """The vectorized row DP equals the textbook cell DP on random
    byte strings (incl. empty and equal)."""
    import random

    from pdf_extraction_ray.pipelines.analytics import _lev

    def ref(a: bytes, b: bytes) -> int:
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev_diag, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev_diag, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1,
                    prev_diag + (ca != cb))
        return dp[len(b)]

    rng = random.Random(7)
    cases = [(b"", b""), (b"", b"xyz"), (b"abc", b"abc")]
    for _ in range(40):
        n, m = rng.randrange(0, 30), rng.randrange(0, 30)
        cases.append((bytes(rng.randrange(97, 102) for _ in range(n)),
                      bytes(rng.randrange(97, 102) for _ in range(m))))
    for a, b in cases:
        assert _lev(a, b) == ref(a, b), (a, b)


# ---------------------------------------------------------------------------
# mlt_related_docs


def test_mlt_related_docs_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (mlt_related_docs,
                                                        mlt_related_docs_sql)
    from tests.oracle_check import compare

    assert compare("mlt_related_docs", mlt_related_docs(SF_SMOKE),
                   mlt_related_docs_sql(), SF_SMOKE) == []


def test_mlt_semantics(ray_session):
    """Every query doc gets results, the query doc never appears in
    its own results, ranks are contiguous from 1, and scores are
    non-increasing within a query."""
    from pdf_extraction_ray.pipelines.analytics import (MLT_QUERY_MOD,
                                                        MLT_TOPK,
                                                        mlt_related_docs)

    out = mlt_related_docs(SF_SMOKE).to_pandas()
    assert (out.query_id % MLT_QUERY_MOD == 0).all()
    assert (out.query_id != out.doc_id).all()
    for q, g in out.groupby("query_id"):
        g = g.sort_values("rank")
        assert g["rank"].tolist() == list(range(1, len(g) + 1))
        assert len(g) <= MLT_TOPK
        assert (np.diff(g.score.to_numpy()) <= 0).all()
    assert out.query_id.nunique() >= 4   # 500/101 -> 5 query docs


# ---------------------------------------------------------------------------
# shipping_priority (TPC-H Q3 analog)


def test_shipping_priority_oracle(ray_session):
    from pdf_extraction_ray.pipelines.relational import (
        shipping_priority, shipping_priority_sql)
    from tests.oracle_check import compare

    assert compare("shipping_priority", shipping_priority(SF_SMOKE),
                   shipping_priority_sql(), SF_SMOKE) == []


def test_dimension_join_path_no_driver_dict(ray_session, monkeypatch):
    """With the broadcast guard forced to 0 (simulating an oversized
    SF100-class customer dimension), both TPC-H queries switch to the
    distributed hash_join / semi-join plan, stay oracle-green, and
    never ship a large driver-resident dict/set through ray.put
    (r3 verdict weak-at-scale #1 — the custkey→segment dict and the
    segment keep-set scale with SF)."""
    import ray

    from pdf_extraction_ray.pipelines import relational as R
    from tests.oracle_check import compare

    puts = []
    orig = ray.put

    def spy(obj, *a, **k):
        puts.append(obj)
        return orig(obj, *a, **k)

    monkeypatch.setattr(ray, "put", spy)
    assert compare("top_orders_per_segment",
                   R.top_orders_per_segment(SF_SMOKE, broadcast_max_rows=0),
                   R.top_orders_per_segment_sql(), SF_SMOKE) == []
    assert compare("shipping_priority",
                   R.shipping_priority(SF_SMOKE, broadcast_max_rows=0),
                   R.shipping_priority_sql(), SF_SMOKE) == []
    assert not any(isinstance(o, (dict, set, frozenset)) and len(o) > 64
                   for o in puts), "dimension leaked to the driver"


def test_shipping_priority_semantics(ray_session):
    """Pandas replay of the whole Q3 chain equals the engine."""
    from pdf_extraction_ray.pipelines.relational import (
        Q3_CUTOFF, Q3_SEGMENT, Q3_TOPK, shipping_priority)

    out = (shipping_priority(SF_SMOKE).to_pandas()
           .sort_values("rank").reset_index(drop=True))
    assert len(out) == Q3_TOPK
    assert (np.diff(out.revenue_e4.to_numpy()) <= 0).all()

    cust = pq.read_table(os.path.join(SF_SMOKE, "customer.parquet")).to_pandas()
    orders = pq.read_table(os.path.join(SF_SMOKE, "orders.parquet")).to_pandas()
    items = pq.read_table(os.path.join(SF_SMOKE, "lineitem.parquet")).to_pandas()
    cut = pd.Timestamp(Q3_CUTOFF)
    keep = set(cust.loc[cust.c_mktsegment == Q3_SEGMENT, "c_custkey"])
    o = orders[(orders.o_orderdate < cut) & orders.o_custkey.isin(keep)]
    li = items[items.l_shipdate > cut].copy()
    li["rev"] = np.round(li.l_extendedprice.to_numpy()
                         * (1.0 - li.l_discount.to_numpy())
                         * 10000.0).astype(np.int64)
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    agg = (j.groupby("l_orderkey")["rev"].sum()
           .sort_values(ascending=False))
    ref = (agg.reset_index()
           .sort_values(["rev", "l_orderkey"], ascending=[False, True])
           .head(Q3_TOPK))
    assert out.o_orderkey.tolist() == ref.l_orderkey.tolist()
    assert out.revenue_e4.tolist() == ref.rev.tolist()


# ---------------------------------------------------------------------------
# events_profile


def test_events_profile_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (events_profile,
                                                        events_profile_sql)
    from tests.oracle_check import compare

    assert compare("events_profile", events_profile(SF_SMOKE),
                   events_profile_sql(), SF_SMOKE) == []


def test_events_profile_semantics(ray_session):
    """Planted nulls are accounted; distincts are exact; min/max render
    the typed extremes (never lexicographic over digit strings)."""
    from pdf_extraction_ray.pipelines.analytics import (
        PROF_NULL_CENTS_MOD, PROF_NULL_CENTS_RES, events_profile)

    out = events_profile(SF_SMOKE).to_pandas().set_index("col_name")
    ev = pq.read_table(os.path.join(SF_SMOKE, "events.parquet")).to_pandas()
    n = len(ev)
    assert (out.n_rows == n).all()
    exp_null_cents = int((ev.event_id % PROF_NULL_CENTS_MOD
                          == PROF_NULL_CENTS_RES).sum())
    assert out.loc["cents", "n_null"] == exp_null_cents
    assert out.loc["event_id", "n_null"] == 0
    assert out.loc["event_id", "n_distinct"] == n
    assert out.loc["user_id", "n_distinct"] == ev.user_id.nunique()
    assert out.loc["event_type", "n_distinct"] == ev.event_type.nunique()
    assert int(out.loc["event_id", "min_v"]) == int(ev.event_id.min())
    assert int(out.loc["event_id", "max_v"]) == int(ev.event_id.max())
    # typed ordering: max user id rendered as int, not string-max
    assert int(out.loc["user_id", "max_v"]) == int(ev.user_id.max())


# ---------------------------------------------------------------------------
# skew_join + inlink_titles


def test_inlink_titles_oracle(ray_session):
    from pdf_extraction_ray.pipelines.linkgraph import (inlink_titles,
                                                        inlink_titles_sql)
    from tests.oracle_check import compare

    st = {}
    assert compare("inlink_titles", inlink_titles(SF_SMOKE, stats_out=st),
                   inlink_titles_sql(), SF_SMOKE) == []
    assert st["n_hot_keys"] == 16     # the planted hubs ARE the skew
    assert st["n_hot_right_rows"] == 16


def test_skew_join_equals_hash_join(ray_session):
    """Value-identity to the plain hash_join on a mixed input: one hot
    key (with MULTIPLE right rows — the cross product), cold keys, and
    keys missing on either side (inner drops)."""
    import ray.data as rd

    from pdf_extraction_ray.stages.joins import hash_join, skew_join

    import pyarrow as pa
    lds = rd.from_arrow(pa.table({
        "k": pa.array([1] * 50 + [2, 2, 3, 4, 9], pa.int64()),
        "lv": pa.array(range(55), pa.int64())}))
    rds = rd.from_arrow(pa.table({
        "k2": pa.array([1, 1, 2, 3, 5], pa.int64()),
        "rv": pa.array(["a", "b", "c", "d", "e"], pa.string())}))

    def norm(ds):
        return (ds.to_pandas().sort_values(["k", "lv", "rv"])
                .reset_index(drop=True))

    want = norm(hash_join(lds, rds, "k", "k2", ["lv"], ["rv"],
                          how="inner"))
    st = {}
    got = norm(skew_join(lds, rds, "k", "k2", ["lv"], ["rv"],
                         hot_threshold=10, stats_out=st))
    assert st["n_hot_keys"] == 1 and st["n_hot_right_rows"] == 2
    assert got.equals(want)
    # no-hot fall-through is the plain join
    st2 = {}
    got2 = norm(skew_join(lds, rds, "k", "k2", ["lv"], ["rv"],
                          hot_threshold=1000, stats_out=st2))
    assert st2["n_hot_keys"] == 0
    assert got2.equals(want)


def test_skew_join_max_hot_guard(ray_session):
    import pytest
    import ray.data as rd

    from pdf_extraction_ray.stages.joins import skew_join

    import pyarrow as pa
    left = rd.from_arrow(pa.table({
        "k": pa.array(list(range(20)) * 3, pa.int64()),
        "lv": pa.array(range(60), pa.int64())}))
    right = rd.from_arrow(pa.table({
        "k2": pa.array(range(20), pa.int64()),
        "rv": pa.array(range(20), pa.int64())}))
    with pytest.raises(ValueError, match="hot keys exceed"):
        skew_join(left, right, "k", "k2", ["lv"], ["rv"],
                  hot_threshold=2, max_hot=5)
