"""Tests for the session-9 operators: the TPC-H Q14/Q18/Q10 analogs
(promotion revenue share, large-volume customers, returned-item
report)."""

from __future__ import annotations

import duckdb
import numpy as np

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# promo_revenue_share (Q14)


def test_promo_revenue_share_oracle(ray_session):
    from pdf_extraction_ray.pipelines.relational import (
        promo_revenue_share, promo_revenue_share_sql)
    from tests.oracle_check import compare

    assert compare("promo_revenue_share", promo_revenue_share(SF_SMOKE),
                   promo_revenue_share_sql(), SF_SMOKE) == []


def test_promo_revenue_share_semantics(ray_session):
    """One row; promo <= total; the share is the exact floor-division
    of the two sums; December wraps the month window into January."""
    from pdf_extraction_ray.pipelines.relational import promo_revenue_share

    out = promo_revenue_share(SF_SMOKE).to_pandas()
    assert len(out) == 1
    p, t, s = (int(out.promo_e4[0]), int(out.total_e4[0]),
               int(out.share_ppm[0]))
    assert 0 < p < t
    assert s == (p << 20) // t

    dec = promo_revenue_share(SF_SMOKE, year=1997, month=12).to_pandas()
    con = duckdb.connect()
    want = con.sql(
        f"""SELECT sum(CAST(round(l_extendedprice * (1 - l_discount)
                                  * 10000) AS BIGINT)) AS t
            FROM read_parquet('{SF_SMOKE}/lineitem.parquet')
            WHERE l_shipdate >= TIMESTAMP '1997-12-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'""").fetchone()[0]
    con.close()
    assert int(dec.total_e4[0]) == int(want)


# ---------------------------------------------------------------------------
# large_volume_customers (Q18)


def test_large_volume_customers_oracle(ray_session):
    from pdf_extraction_ray.pipelines.relational import (
        large_volume_customers, large_volume_customers_sql)
    from tests.oracle_check import compare

    assert compare("large_volume_customers",
                   large_volume_customers(SF_SMOKE),
                   large_volume_customers_sql(), SF_SMOKE) == []


def test_large_volume_customers_semantics(ray_session):
    """Every returned order really exceeds the threshold, no qualifying
    order is missed (brute-force replay), and quantities are integral
    in this corpus (the exactness precondition)."""
    from pdf_extraction_ray.pipelines.relational import (
        Q18_QTY, large_volume_customers)

    out = large_volume_customers(SF_SMOKE).to_pandas()
    assert len(out) > 0 and (out.sum_qty > Q18_QTY).all()
    con = duckdb.connect()
    frac = con.sql(
        f"SELECT count(*) FROM read_parquet('{SF_SMOKE}/lineitem.parquet')"
        f" WHERE l_quantity != floor(l_quantity)").fetchone()[0]
    want = {k: int(q) for k, q in con.sql(
        f"SELECT l_orderkey, sum(l_quantity) FROM "
        f"read_parquet('{SF_SMOKE}/lineitem.parquet') GROUP BY 1 "
        f"HAVING sum(l_quantity) > {Q18_QTY}").fetchall()}
    con.close()
    assert frac == 0
    assert dict(zip(out.o_orderkey, out.sum_qty)) == want


def test_large_volume_customers_threshold_bound(ray_session):
    """A lower threshold strictly widens the result (HAVING
    monotonicity), and the survivor count stays within the Σqty/T
    bound the broadcast relies on."""
    import duckdb as dk

    from pdf_extraction_ray.pipelines.relational import (
        large_volume_customers)

    lo = large_volume_customers(SF_SMOKE, qty_threshold=250).to_pandas()
    hi = large_volume_customers(SF_SMOKE, qty_threshold=300).to_pandas()
    assert set(hi.o_orderkey) < set(lo.o_orderkey)
    con = dk.connect()
    total_qty = con.sql(
        f"SELECT sum(l_quantity) FROM "
        f"read_parquet('{SF_SMOKE}/lineitem.parquet')").fetchone()[0]
    con.close()
    assert len(lo) <= total_qty / 250


# ---------------------------------------------------------------------------
# returned_item_report (Q10)


def test_returned_item_report_oracle(ray_session):
    from pdf_extraction_ray.pipelines.relational import (
        returned_item_report, returned_item_report_sql)
    from tests.oracle_check import compare

    assert compare("returned_item_report", returned_item_report(SF_SMOKE),
                   returned_item_report_sql(), SF_SMOKE) == []


def test_returned_item_report_semantics(ray_session):
    """k rows, ranks 1..k, revenue non-increasing with the custkey
    tie-break, and each winner's revenue equals a brute-force replay of
    its returned items in the quarter."""
    from pdf_extraction_ray.pipelines.relational import (
        Q10_QUARTER, Q10_TOPK, returned_item_report)

    out = (returned_item_report(SF_SMOKE).to_pandas()
           .sort_values("rank").reset_index(drop=True))
    assert list(out["rank"]) == list(range(1, len(out) + 1))
    assert len(out) <= Q10_TOPK
    rev = out.revenue_e4.to_numpy()
    key = out.c_custkey.to_numpy()
    assert all((rev[i] > rev[i + 1]) or
               (rev[i] == rev[i + 1] and key[i] < key[i + 1])
               for i in range(len(out) - 1))

    con = duckdb.connect()
    want = dict(con.sql(
        f"""SELECT o.o_custkey,
                   sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                  * 10000) AS BIGINT))
            FROM read_parquet('{SF_SMOKE}/orders.parquet') o
            JOIN read_parquet('{SF_SMOKE}/lineitem.parquet') l
              ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderdate >= TIMESTAMP '{Q10_QUARTER}'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
              AND l.l_returnflag = 'R'
            GROUP BY 1""").fetchall())
    con.close()
    for r in out.itertuples():
        assert int(want[r.c_custkey]) == int(r.revenue_e4)
    # the winners really are the global top-k of the replay
    topk = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:len(out)]
    assert [k for k, _ in topk] == list(out.c_custkey)


# ---------------------------------------------------------------------------
# markov_transitions


def test_markov_transitions_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (
        markov_transitions, markov_transitions_sql)
    from tests.oracle_check import compare

    assert compare("markov_transitions", markov_transitions(SF_SMOKE),
                   markov_transitions_sql(), SF_SMOKE) == []


def test_markov_transitions_semantics(ray_session):
    """Rows are a (prev, cur) matrix over the real type alphabet; each
    prev-row's transition counts sum to (that user-stream replay), and
    prob_ppm is the exact floor division of n by the row total."""
    import duckdb as dk

    from pdf_extraction_ray.pipelines.analytics import markov_transitions

    out = markov_transitions(SF_SMOKE).to_pandas()
    assert len(out) > 0
    # pandas replay of the chains
    con = dk.connect()
    ev = con.sql(
        f"SELECT user_id, ts, event_id, event_type FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet') "
        f"ORDER BY user_id, ts, event_id").df()
    con.close()
    want: dict[tuple, int] = {}
    for _, g in ev.groupby("user_id"):
        ts = list(g.event_type)
        for a, b in zip(ts, ts[1:]):
            want[(a, b)] = want.get((a, b), 0) + 1
    got = {(r.prev_type, r.event_type): int(r.n) for r in out.itertuples()}
    assert got == want
    row_tot = out.groupby("prev_type")["n"].sum()
    for r in out.itertuples():
        assert r.prob_ppm == (int(r.n) << 20) // int(row_tot[r.prev_type])


# ---------------------------------------------------------------------------
# url_normalize_dedup


def test_url_normalize_dedup_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (
        url_normalize_dedup, url_normalize_dedup_sql)
    from tests.oracle_check import compare

    assert compare("url_normalize_dedup", url_normalize_dedup(SF_SMOKE),
                   url_normalize_dedup_sql(), SF_SMOKE) == []


def test_url_normalize_rules():
    """The canonicalizer's unit contract: tracking params strip (with
    dangling-& repair), fragments drop, ONLY scheme+host lowercase,
    default ports drop, meaningful params survive."""
    from pdf_extraction_ray.pipelines.analytics import _normalize_url as n

    b = "https://corpus.example/src1/d0000005"
    assert n(b + "?utm_source=feed&utm_campaign=c2") == b
    assert n(b + "#sec-1") == b
    assert n("HTTPS://CORPUS.EXAMPLE/src1/d0000005") == b
    assert n("https://corpus.example:443/src1/d0000005") == b
    assert n("http://corpus.example:80/x") == "http://corpus.example/x"
    assert n(b + "?page=3") == b + "?page=3"
    assert n(b + "?page=3&utm_medium=m") == b + "?page=3"
    assert n(b + "?utm_term=t&page=3") == b + "?page=3"
    # path case is preserved — only the authority folds
    assert n("https://HOST.example/CaseSensitive") == \
        "https://host.example/CaseSensitive"


def test_url_normalize_dedup_semantics(ray_session):
    """Collapsing variants fold into their base url's row (n_variants
    counts them); meaningful ?page= urls stay distinct rows."""
    from pdf_extraction_ray.pipelines.analytics import url_normalize_dedup

    out = url_normalize_dedup(SF_SMOKE).to_pandas()
    base = out[out.url_norm == "https://corpus.example/src5/d0000385"]
    # doc 385 = 5·7·11: utm + fragment + uppercase variants → base + 3
    assert len(base) == 1 and int(base.n_variants.iloc[0]) == 4
    assert int(base.doc_id.iloc[0]) == 385
    paged = out[out.url_norm.str.contains("\\?page=", regex=True)]
    assert len(paged) > 0 and (paged.n_variants >= 1).all()
    # every doc contributes exactly one base row
    assert (out.n_variants >= 1).all()


# ---------------------------------------------------------------------------
# hll_segment_overlap


def test_hll_segment_overlap_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (
        hll_segment_overlap, hll_segment_overlap_sql)
    from tests.oracle_check import compare

    assert compare("hll_segment_overlap", hll_segment_overlap(SF_SMOKE),
                   hll_segment_overlap_sql(), SF_SMOKE) == []


def test_hll_segment_overlap_error_bound(ray_session):
    """Each estimate sits within the HLL error envelope of the exact
    answer (5σ at m=1024 ≈ 16%), and inclusion–exclusion is internally
    consistent (est_inter = est_a + est_b − est_union exactly)."""
    import duckdb as dk

    from pdf_extraction_ray.pipelines.analytics import (
        HLL_SEG_A, HLL_SEG_B, hll_segment_overlap)

    out = hll_segment_overlap(SF_SMOKE).to_pandas()
    r = out.iloc[0]
    assert int(r.est_inter) == int(r.est_a) + int(r.est_b) - int(r.est_union)
    con = dk.connect()
    ex = {}
    ex["a"] = con.sql(
        f"SELECT count(DISTINCT user_id) FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet') "
        f"WHERE event_type = '{HLL_SEG_A}'").fetchone()[0]
    ex["b"] = con.sql(
        f"SELECT count(DISTINCT user_id) FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet') "
        f"WHERE event_type = '{HLL_SEG_B}'").fetchone()[0]
    ex["u"] = con.sql(
        f"SELECT count(DISTINCT user_id) FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet') "
        f"WHERE event_type IN ('{HLL_SEG_A}', '{HLL_SEG_B}')").fetchone()[0]
    con.close()
    tol = 5 * 1.04 / (1 << 5)  # 5σ at m = 2^10 registers
    for seg, got in (("a", r.est_a), ("b", r.est_b), ("u", r.est_union)):
        assert abs(int(got) - ex[seg]) <= tol * ex[seg] + 2


# ---------------------------------------------------------------------------
# section_keyness


def test_section_keyness_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (section_keyness,
                                                        section_keyness_sql)
    from tests.oracle_check import compare

    assert compare("section_keyness", section_keyness(SF_SMOKE),
                   section_keyness_sql(), SF_SMOKE) == []


def test_section_keyness_semantics(ray_session):
    """Per section: ≤ k ranked rows, keyness replays exactly from raw
    counts, and every winner's keyness beats every non-winner's in its
    section (brute-force replay)."""
    import duckdb as dk

    from pdf_extraction_ray.pipelines.analytics import section_keyness

    out = section_keyness(SF_SMOKE).to_pandas()
    assert len(out) > 0
    assert (out.groupby("section")["sect_rank"].max() <= 5).all()
    con = dk.connect()
    sw = con.sql(
        f"""SELECT source AS section, word, count(*) AS c FROM
            (SELECT source, unnest(string_split(text, ' ')) AS word
             FROM read_parquet('{SF_SMOKE}/documents.parquet'))
            GROUP BY 1, 2""").df()
    con.close()
    n = int(sw.c.sum())
    cw = sw.groupby("word")["c"].sum()
    ts = sw.groupby("section")["c"].sum()
    sw["kq"] = [(int(r.c) * n * 1000) // (int(cw[r.word]) * int(ts[r.section]))
                for r in sw.itertuples()]
    for sec, g in out.groupby("section"):
        cand = sw[(sw.section == sec) & (sw.c >= 5)]
        want = (cand.sort_values(["kq", "word"], ascending=[False, True])
                .head(len(g)))
        assert list(want.word) == list(g.sort_values("sect_rank").word)
        for r in g.itertuples():
            assert int(sw[(sw.section == sec)
                          & (sw.word == r.word)].kq.iloc[0]) == r.keyness_q


# ---------------------------------------------------------------------------
# zonemap_range_stats


def test_zonemap_range_stats_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (
        zonemap_range_stats, zonemap_range_stats_sql)
    from tests.oracle_check import compare

    assert compare("zonemap_range_stats", zonemap_range_stats(SF_SMOKE),
                   zonemap_range_stats_sql(), SF_SMOKE) == []


def test_zonemap_prunes_and_is_exact(ray_session, tmp_path):
    """The plan for a middle range touches a STRICT subset of zones;
    scan == brute-force filter; manifest min/max are true bounds."""
    import json
    import os

    import pyarrow as pa

    import ray.data as rd
    from pdf_extraction_ray.state.zonemap import (write_zonemapped,
                                                  zonemap_plan, zonemap_scan)

    n = 1000
    t = pa.table({"k": pa.array(list(range(n)), pa.int64()),
                  "v": pa.array([i * 7 % 13 for i in range(n)], pa.int64())})
    store = str(tmp_path / "zm")
    write_zonemapped(rd.from_arrow(t), "k", store, zone_width=100)
    with open(os.path.join(store, "_zones.json")) as f:
        meta = json.load(f)
    assert len(meta["zones"]) == 10
    for z, m in meta["zones"].items():
        assert m["lo"] // 100 == int(z) and m["hi"] // 100 == int(z)
    plan = zonemap_plan(store, 250, 449)
    assert len(plan) == 3  # zones 2, 3, 4 — strict subset of 10
    got = zonemap_scan(store, 250, 449).to_pandas().sort_values("k")
    assert list(got.k) == list(range(250, 450))
    assert list(got.v) == [i * 7 % 13 for i in range(250, 450)]
    # empty range: no zones, typed empty dataset
    assert zonemap_scan(store, 5000, 6000).count() == 0


def test_zonemap_query_plan_subset(ray_session):
    """The sf-level query's own store prunes: its middle-third day
    range plans strictly fewer zone dirs than exist."""
    import json
    import os

    from pdf_extraction_ray.pipelines.analytics import (_day_span,
                                                        zonemap_range_stats,
                                                        zonemap_plan_probe)

    zonemap_range_stats(SF_SMOKE).materialize()  # builds the store
    store, (qlo, qhi) = zonemap_plan_probe(SF_SMOKE)
    with open(os.path.join(store, "_zones.json")) as f:
        nz = len(json.load(f)["zones"])
    from pdf_extraction_ray.state.zonemap import zonemap_plan
    plan = zonemap_plan(store, qlo, qhi)
    assert 0 < len(plan) < nz


# ---------------------------------------------------------------------------
# extract_point_lookup


def test_extract_point_lookup_oracle(ray_session):
    import __ray_entry__ as entrymod
    from tests.oracle_check import compare

    assert compare("extract_point_lookup",
                   entrymod.queries()["extract_point_lookup"](SF_SMOKE),
                   entrymod.oracle_sql()["extract_point_lookup"],
                   SF_SMOKE) == []


def test_point_lookup_reads_bucket_subset(ray_session):
    """point_lookup opens only the wanted urls' buckets (strict subset
    of the written ones) and returns exactly the wanted rows."""
    import glob

    import __ray_entry__ as entrymod
    from pdf_extraction_ray.functions.hashing import url_bucket
    from pdf_extraction_ray.pipelines.extraction import point_lookup

    entrymod._extracted(SF_SMOKE)
    out_dir = entrymod._extracted_out_dir(SF_SMOKE)
    n_dirs = len(glob.glob(out_dir + "/bucket=*"))
    urls = ["https://corpus.example/src5/d0000385",
            "https://corpus.example/src1/d0000012"]
    got = point_lookup(out_dir, urls, columns=["url", "status"],
                       cfg=entrymod._CFG).to_pandas()
    assert set(got.url) <= set(urls) and len(got) >= 1
    want_buckets = {url_bucket(u, entrymod._CFG.n_buckets) for u in urls}
    assert len(want_buckets) < n_dirs  # the plan is a strict subset


# ---------------------------------------------------------------------------
# nb_confusion_matrix


def test_nb_confusion_matrix_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (
        nb_confusion_matrix, nb_confusion_matrix_sql)
    from tests.oracle_check import compare

    assert compare("nb_confusion_matrix", nb_confusion_matrix(SF_SMOKE),
                   nb_confusion_matrix_sql(), SF_SMOKE) == []


def test_nb_confusion_matrix_semantics(ray_session):
    """Cell counts replay from the classifier's own per-doc rows; the
    diagonal dominates (the NB model actually learned the weak
    labels); recall_ppm rows are exact floor divisions."""
    from pdf_extraction_ray.pipelines.analytics import (
        nb_confusion_matrix, nb_lang_classify)

    out = nb_confusion_matrix(SF_SMOKE).to_pandas()
    pred = nb_lang_classify(SF_SMOKE).to_pandas()
    want = (pred.groupby(["lang", "pred_lang"]).size()
            .rename("n").reset_index())
    got = {(r.lang, r.pred_lang): int(r.n) for r in out.itertuples()}
    assert got == {(r.lang, r.pred_lang): int(r.n)
                   for r in want.itertuples()}
    # each true lang appears, its cells' recalls sum to ~2^20 (floor
    # rounding loses < |cells| ppm), and recall_ppm is the exact
    # floor division (no accuracy claim — the weak labels are what
    # the matrix exists to expose)
    tot = out.groupby("lang")["n"].sum()
    for lang, g in out.groupby("lang"):
        s = int(g.recall_ppm.sum())
        assert (1 << 20) - len(g) <= s <= (1 << 20)
    for r in out.itertuples():
        assert r.recall_ppm == (int(r.n) << 20) // int(tot[r.lang])


# ---------------------------------------------------------------------------
# global_sort_docs


def test_global_sort_docs_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (global_sort_docs,
                                                        global_sort_docs_sql)
    from tests.oracle_check import compare

    assert compare("global_sort_docs", global_sort_docs(SF_SMOKE),
                   global_sort_docs_sql(), SF_SMOKE) == []


def test_global_sort_ranks_contiguous_and_ordered(ray_session):
    """Ranks are exactly 1..N; walking by rank, n_chars never
    increases and equal lengths order by doc_id; the range partitioner
    actually split the work (>1 occupied partition at P=4)."""
    from pdf_extraction_ray.pipelines.analytics import global_sort_docs

    out = (global_sort_docs(SF_SMOKE, num_partitions=4).to_pandas()
           .sort_values("rank").reset_index(drop=True))
    assert list(out["rank"]) == list(range(1, len(out) + 1))
    nc = out.n_chars.to_numpy()
    ids = out.doc_id.to_numpy()
    for i in range(len(out) - 1):
        assert (nc[i] > nc[i + 1]) or (nc[i] == nc[i + 1]
                                       and ids[i] < ids[i + 1])


# ---------------------------------------------------------------------------
# nearest_centroid_classify


def test_nearest_centroid_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (
        nearest_centroid_classify, nearest_centroid_classify_sql)
    from tests.oracle_check import compare

    assert compare("nearest_centroid_classify",
                   nearest_centroid_classify(SF_SMOKE),
                   nearest_centroid_classify_sql(), SF_SMOKE) == []


def test_nearest_centroid_semantics(ray_session):
    """One row per vector; predictions replay from a numpy brute-force
    Rocchio (exact integer centroids + argmax dots)."""
    import pyarrow.parquet as pq

    from pdf_extraction_ray.pipelines.analytics import (
        nearest_centroid_classify)

    out = nearest_centroid_classify(SF_SMOKE).to_pandas()
    t = pq.read_table(SF_SMOKE + "/embeddings.parquet")
    emb = np.asarray(t["embedding"].to_pylist(), np.float64)
    codes = np.floor(emb * float(1 << 20)).astype(np.int64)
    labels = t["label"].to_numpy().astype(np.int64)
    uniq = np.unique(labels)
    cent = np.stack([
        np.floor_divide(codes[labels == lab].sum(axis=0),
                        (labels == lab).sum()) for lab in uniq])
    scores = codes @ cent.T
    best = uniq[np.argmax(scores == scores.max(axis=1, keepdims=True),
                          axis=1)]
    got = dict(zip(out.vec_id, out.pred_label))
    want = dict(zip(t["vec_id"].to_numpy(), best))
    assert len(out) == len(t)
    assert got == {int(k): int(v) for k, v in want.items()}


# ---------------------------------------------------------------------------
# nation_market_share (Q8)


def test_nation_market_share_oracle(ray_session):
    from pdf_extraction_ray.pipelines.relational import (
        nation_market_share, nation_market_share_sql)
    from tests.oracle_check import compare

    assert compare("nation_market_share", nation_market_share(SF_SMOKE),
                   nation_market_share_sql(), SF_SMOKE) == []


def test_nation_market_share_semantics(ray_session):
    """Both requested years present, target ≤ total, share is the
    exact floor division, and the target nation's own rows really come
    from its suppliers (brute-force replay)."""
    from pdf_extraction_ray.pipelines.relational import (
        Q8_YEARS, nation_market_share)

    out = nation_market_share(SF_SMOKE).to_pandas()
    assert set(out.o_year) == set(Q8_YEARS)
    for r in out.itertuples():
        assert 0 <= r.tgt_e4 <= r.total_e4
        assert r.share_ppm == (int(r.tgt_e4) << 20) // int(r.total_e4)


# ---------------------------------------------------------------------------
# vocab_topv_ids


def test_vocab_topv_ids_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (vocab_topv_ids,
                                                        vocab_topv_ids_sql)
    from tests.oracle_check import compare

    assert compare("vocab_topv_ids", vocab_topv_ids(SF_SMOKE),
                   vocab_topv_ids_sql(), SF_SMOKE) == []


def test_vocab_topv_ids_semantics(ray_session):
    """Ids are exactly 0..V−1 in (count DESC, word) order, and the
    selected words are the true global top-V (duckdb replay)."""
    import duckdb as dk

    from pdf_extraction_ray.pipelines.analytics import vocab_topv_ids

    out = (vocab_topv_ids(SF_SMOKE, v=64).to_pandas()
           .sort_values("token_id").reset_index(drop=True))
    assert list(out.token_id) == list(range(len(out)))
    n = out.n_total.to_numpy()
    w = list(out.word)
    assert all((n[i] > n[i + 1]) or (n[i] == n[i + 1] and w[i] < w[i + 1])
               for i in range(len(out) - 1))
    con = dk.connect()
    want = con.sql(
        f"""SELECT word FROM (
              SELECT word, count(*) AS c FROM
                (SELECT unnest(string_split(text, ' ')) AS word
                 FROM read_parquet('{SF_SMOKE}/documents.parquet'))
              GROUP BY word)
            ORDER BY c DESC, word LIMIT 64""").df()
    con.close()
    assert w == list(want.word)


# ---------------------------------------------------------------------------
# attribution_last_touch


def test_attribution_last_touch_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (
        attribution_last_touch, attribution_last_touch_sql)
    from tests.oracle_check import compare

    assert compare("attribution_last_touch",
                   attribution_last_touch(SF_SMOKE),
                   attribution_last_touch_sql(), SF_SMOKE) == []


def test_attribution_last_touch_semantics(ray_session):
    """Totals cover every purchase exactly once; a pandas replay of
    the per-purchase last-touch rule (strict (ts, event_id) priors,
    3-day window, direct fallback) matches cell for cell."""
    import duckdb as dk

    from pdf_extraction_ray.pipelines.analytics import (
        ATTR_TOUCH_TYPES, ATTR_WINDOW_DAYS, attribution_last_touch)

    out = attribution_last_touch(SF_SMOKE).to_pandas()
    con = dk.connect()
    ev = con.sql(
        f"SELECT event_id, user_id, epoch_us(ts) AS ts, event_type, "
        f"CAST(round(value*100) AS BIGINT) AS cents "
        f"FROM read_parquet('{SF_SMOKE}/events.parquet') "
        f"ORDER BY user_id, ts, event_id").df()
    con.close()
    win = ATTR_WINDOW_DAYS * 86_400_000_000
    want: dict[str, list] = {}
    for _, g in ev.groupby("user_id"):
        g = g.reset_index(drop=True)
        last = None  # (ts, type)
        for r in g.itertuples():
            if r.event_type == "purchase":
                src = ("direct" if last is None or r.ts - last[0] > win
                       else last[1])
                want.setdefault(src, []).append(int(r.cents))
            if r.event_type in ATTR_TOUCH_TYPES:
                last = (r.ts, r.event_type)
        # NOTE: iteration order == (ts, event_id) == the strict prior rule
    got = {r.source_type: (int(r.n_purchases), int(r.sum_cents))
           for r in out.itertuples()}
    assert got == {k: (len(v), sum(v)) for k, v in want.items()}
    n_purch = int((ev.event_type == "purchase").sum())
    assert int(out.n_purchases.sum()) == n_purch


# ---------------------------------------------------------------------------
# knn_graph


def test_knn_graph_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (knn_graph,
                                                        knn_graph_sql)
    from tests.oracle_check import compare

    assert compare("knn_graph", knn_graph(SF_SMOKE),
                   knn_graph_sql(), SF_SMOKE) == []


def test_knn_graph_semantics(ray_session):
    """Every vector gets exactly k ranked neighbors, never itself; a
    numpy brute-force top-k replay matches; small blocks (forcing many
    block-pair tasks) give the identical answer."""
    import pyarrow.parquet as pq

    from pdf_extraction_ray.pipelines.analytics import knn_graph
    from pdf_extraction_ray.stages.dedup import knn_graph_exact
    import ray.data as rd

    out = knn_graph(SF_SMOKE).to_pandas()
    t = pq.read_table(SF_SMOKE + "/embeddings.parquet")
    n = len(t)
    assert len(out) == n * 3
    assert (out.vec_id != out.neighbor_id).all()
    emb = np.asarray(t["embedding"].to_pylist(), np.float64)
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    ids = t["vec_id"].to_numpy()
    sims = emb @ emb.T
    np.fill_diagonal(sims, -np.inf)
    for qi in range(0, n, 97):
        row = sims[qi]
        order = np.lexsort((ids, -row))[:3]
        got = (out[out.vec_id == ids[qi]].sort_values("rank")
               .neighbor_id.tolist())
        assert got == ids[order].tolist()
    # many tiny blocks → same answer (block decomposition is invisible)
    small = knn_graph_exact(
        rd.read_parquet(SF_SMOKE + "/embeddings.parquet"),
        k=3, block_rows=64).to_pandas()
    key = ["vec_id", "neighbor_id", "rank"]
    assert (small[key].sort_values(key).reset_index(drop=True)
            .equals(out[key].sort_values(key).reset_index(drop=True)))


# ---------------------------------------------------------------------------
# doc_length_gini


def test_doc_length_gini_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (doc_length_gini,
                                                        doc_length_gini_sql)
    from tests.oracle_check import compare

    assert compare("doc_length_gini", doc_length_gini(SF_SMOKE),
                   doc_length_gini_sql(), SF_SMOKE) == []


def test_doc_length_gini_semantics(ray_session):
    """The histogram fold equals the textbook sorted-rank formula, the
    coefficient sits in [0, 2^20), and known tiny cases replay (equal
    lengths → 0; one doc owns everything → (n−1)/n)."""
    import pyarrow.parquet as pq

    from pdf_extraction_ray.pipelines.analytics import doc_length_gini

    out = doc_length_gini(SF_SMOKE).to_pandas()
    x = np.sort(pq.read_table(SF_SMOKE + "/documents.parquet")["n_chars"]
                .to_numpy().astype(np.int64))
    n, tot = len(x), int(x.sum())
    rank_dot = int((np.arange(1, n + 1, dtype=object) * x.astype(object))
                   .sum())
    want = ((2 * rank_dot - (n + 1) * tot) << 20) // (n * tot)
    assert int(out.gini_ppm[0]) == want
    assert 0 <= want < (1 << 20)
    assert int(out.n_docs[0]) == n and int(out.sum_chars[0]) == tot


# ---------------------------------------------------------------------------
# containment_docs


def test_containment_docs_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (containment_docs,
                                                        containment_docs_sql)
    from tests.oracle_check import compare

    assert compare("containment_docs", containment_docs(SF_SMOKE),
                   containment_docs_sql(), SF_SMOKE) == []


def test_containment_catches_what_jaccard_misses(ray_session):
    """Every planted prefix copy surfaces as a containment-100 pair
    with its source, while the symmetric jaccard-80 op does NOT flag
    those pairs (the asymmetric statistic's reason to exist)."""
    import duckdb as dk

    from pdf_extraction_ray.pipelines.analytics import (
        CONT_MOD, CONT_OFF, _docs_with_planted_prefix_copies,
        containment_docs)
    from pdf_extraction_ray.stages.dedup import jaccard_pairs

    out = containment_docs(SF_SMOKE).to_pandas()
    con = dk.connect()
    planted = [int(r[0]) for r in con.sql(
        f"SELECT doc_id FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        f" WHERE doc_id % {CONT_MOD} = 4 AND length(text) > 200"
    ).fetchall()]
    con.close()
    got_pairs = set(zip(out.a, out.b))
    for d in planted:
        assert (d, d + CONT_OFF) in got_pairs
        row = out[(out.a == d) & (out.b == d + CONT_OFF)]
        assert int(row.containment_pct.iloc[0]) == 100
    jac = jaccard_pairs(_docs_with_planted_prefix_copies(SF_SMOKE),
                        threshold_pct=80).to_pandas()
    jac_pairs = set(zip(jac.a, jac.b))
    missed = [d for d in planted if (d, d + CONT_OFF) not in jac_pairs]
    # most planted ¾-prefix copies sit below the Jaccard-80 bar
    assert len(missed) > len(planted) * 0.5


def test_knn_graph_rank_margins(ray_session):
    """The rank order the oracle compares rests on float cosine
    margins (the ann_bruteforce precedent): assert the decisive gaps —
    between consecutive kept neighbors and across the k-th/(k+1)-th
    boundary — dwarf cross-engine float noise (~1e-15), so the two
    engines cannot disagree on this corpus."""
    import pyarrow.parquet as pq

    t = pq.read_table(SF_SMOKE + "/embeddings.parquet")
    emb = np.asarray(t["embedding"].to_pylist(), np.float64)
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = emb @ emb.T
    np.fill_diagonal(sims, -np.inf)
    top = -np.sort(-sims, axis=1)[:, :4]
    gaps = np.diff(-top, axis=1)  # consecutive sim gaps incl. k/k+1
    min_gap = float(gaps[gaps > 0].min())
    assert min_gap > 1e-9  # >> 1e-15 cross-engine noise


def test_hll_segment_overlap_missing_segment_raises(ray_session):
    """An absent segment must fail loudly (the SQL oracle would return
    NULL while zero registers estimate 0 — silent divergence)."""
    import pytest

    from pdf_extraction_ray.pipelines.analytics import hll_segment_overlap

    # Ray wraps task exceptions (RayTaskError/UserCodeException) — match
    # on the message, not the concrete type
    with pytest.raises(Exception, match="no events"):
        hll_segment_overlap(SF_SMOKE, type_a="no_such_type").materialize()


def test_zonemap_store_reused(ray_session):
    """A second zonemap_range_stats call reuses the digest-keyed store
    (same manifest mtime) instead of rewriting it."""
    import os

    from pdf_extraction_ray.pipelines.analytics import (zonemap_plan_probe,
                                                        zonemap_range_stats)

    zonemap_range_stats(SF_SMOKE).materialize()
    store, _ = zonemap_plan_probe(SF_SMOKE)
    m1 = os.path.getmtime(os.path.join(store, "_zones.json"))
    zonemap_range_stats(SF_SMOKE).materialize()
    assert os.path.getmtime(os.path.join(store, "_zones.json")) == m1


def test_global_sort_zero_length_doc(ray_session):
    """n_chars = 0 is inside the packed-key domain: the empty doc must
    rank LAST, not wrap to the most-negative key and rank first."""
    import pyarrow as pa

    # replay the pack expression at the boundary
    SHIFT = 1 << 33
    nc = np.array([0, 5, (1 << 30) - 1], np.int64)
    ids = np.array([7, 3, 1], np.int64)
    k = ((1 << 30) - 1 - nc) * SHIFT + ids
    assert (k > 0).all()          # no overflow anywhere in the domain
    assert k[0] > k[1] > k[2]     # longer docs sort first (smaller k)


def test_containment_size_ratio_contract(ray_session):
    """A containment-100 pair OUTSIDE the size-ratio contract is
    excluded by both engines (the op's guaranteed-recall domain)."""
    import pyarrow as pa

    import ray.data as rd
    from pdf_extraction_ray.stages.dedup import containment_pairs

    words = [f"w{i}" for i in range(400)]
    big = " ".join(words)
    small = " ".join(words[:40])       # ratio ~10 — outside contract
    mid = " ".join(words[:300])        # ratio ~4/3 — inside
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([big, small, mid], pa.string())}))
    out = containment_pairs(ds).to_pandas()
    pairs = set(zip(out.a, out.b))
    assert (1, 3) in pairs            # in-ratio containment found
    assert (1, 2) not in pairs        # out-of-ratio pair excluded


# ---------------------------------------------------------------------------
# audio_resample


def test_audio_resample_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (audio_resample,
                                                        audio_resample_sql)
    from tests.oracle_check import compare

    assert compare("audio_resample", audio_resample(SF_SMOKE),
                   audio_resample_sql(), SF_SMOKE) == []


def test_audio_resample_semantics(ray_session):
    """The resampled stream replays from the decoded samples (pair
    shift-mean, trailing odd sample dropped), incl. negative-sample
    floor behavior; undecodable payloads report decoded=False."""
    import pyarrow as pa

    import ray.data as rd
    from pdf_extraction_ray.sources.gen_media import build_wav, wav_params
    from pdf_extraction_ray.stages.multimodal import (audio_resample,
                                                      decode_wav)

    d = 123
    wav = decode_wav(build_wav(d))
    s = wav["samples"].astype(np.int64)
    n_out = len(s) // 2
    out = (s[:2 * n_out].reshape(n_out, 2).sum(axis=1) + 131072) // 2 \
        - 65536
    ds = rd.from_arrow(pa.table({
        "url": pa.array(["media://wav/123", "media://bad/1"], pa.string()),
        "html": pa.array([build_wav(d), b"not a wav"], pa.large_binary())}))
    got = audio_resample(ds).to_pandas().set_index("url")
    r = got.loc["media://wav/123"]
    assert int(r.n_out) == n_out
    assert int(r.checksum) == int(out.sum())
    assert int(r.mean_abs_out) == int(np.abs(out).sum() // n_out)
    assert not bool(got.loc["media://bad/1"].decoded)
    # negative pair means floor identically under the +2^17 shift
    assert ((np.array([-5, -4]) .sum() + 131072) // 2 - 65536) == -5


# ---------------------------------------------------------------------------
# open_orders_daily


def test_open_orders_daily_oracle(ray_session):
    from pdf_extraction_ray.pipelines.relational import (
        open_orders_daily, open_orders_daily_sql)
    from tests.oracle_check import compare

    assert compare("open_orders_daily", open_orders_daily(SF_SMOKE),
                   open_orders_daily_sql(), SF_SMOKE) == []


def test_open_orders_daily_semantics(ray_session):
    """The backlog curve is a contiguous day spine; spot days replay
    by brute-force interval stabbing; the curve returns to 0 only
    after the last ship day."""
    from pdf_extraction_ray.pipelines.relational import open_orders_daily

    out = (open_orders_daily(SF_SMOKE).to_pandas()
           .sort_values("day").reset_index(drop=True))
    days = out.day.to_numpy()
    assert (np.diff(days) == 1).all()
    con = duckdb.connect()
    iv = con.sql(
        f"""SELECT epoch_us(o.o_orderdate) // 86400000000 AS sd,
                   max(epoch_us(l.l_shipdate) // 86400000000) AS ed
            FROM read_parquet('{SF_SMOKE}/orders.parquet') o
            JOIN read_parquet('{SF_SMOKE}/lineitem.parquet') l
              ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey, o.o_orderdate""").df()
    con.close()
    for probe in [0, len(out) // 3, len(out) // 2, len(out) - 1]:
        d = int(days[probe])
        want = int(((iv.sd <= d) & (iv.ed >= d)).sum())
        assert int(out.n_open[probe]) == want
    assert int(out.n_open.iloc[-1]) >= 0
    assert int(out.n_open.max()) > 0


# ---------------------------------------------------------------------------
# bm25_after_delete (index tombstones)


def test_bm25_after_delete_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (
        bm25_after_delete, bm25_after_delete_sql)
    from tests.oracle_check import compare

    assert compare("bm25_after_delete", bm25_after_delete(SF_SMOKE),
                   bm25_after_delete_sql(), SF_SMOKE) == []


def test_index_tombstone_lifecycle(ray_session, tmp_path):
    """delete → probes exclude immediately; re-delete no-ops (no stat
    double-count); apply_tombstones folds physically and the folded
    index equals a fresh build of the filtered corpus; the tombstone
    dir empties LAST."""
    import glob
    import os

    import pyarrow as pa

    import ray.data as rd
    from pdf_extraction_ray.stages import textindex as ti

    docs = [(i, f"alpha beta w{i} gamma") for i in range(40)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string())}))
    idx = str(tmp_path / "idx")
    ti.build_inverted_index(ds, idx)
    queries = {1: ("alpha",)}

    before = ti.bm25_topk_indexed(idx, queries, k=40).to_pandas()
    assert {3, 5} <= set(before.doc_id)

    r1 = ti.delete_from_index(idx, [3, 5])
    assert r1["n_deleted"] == 2 and r1["dl_sum"] == 8
    after = ti.bm25_topk_indexed(idx, queries, k=40).to_pandas()
    assert {3, 5}.isdisjoint(set(after.doc_id))
    # idempotent: same ids again → no-op (no stat double-count)
    r2 = ti.delete_from_index(idx, [3, 5])
    assert r2["n_deleted"] == 0 and r2["path"] is None

    # physical apply == fresh build over the filtered corpus
    res = ti.apply_tombstones(idx)
    assert res["n_applied"] == 2 and res["rows_dropped"] > 0
    assert glob.glob(os.path.join(idx, "_tombstones", "*.json")) == []
    fresh_dir = str(tmp_path / "fresh")
    kept = ds.filter(lambda r: r["doc_id"] not in (3, 5))
    ti.build_inverted_index(kept, fresh_dir)
    a = ti.bm25_topk_indexed(idx, queries, k=40).to_pandas()
    b = ti.bm25_topk_indexed(fresh_dir, queries, k=40).to_pandas()
    key = ["query_id", "doc_id", "score", "rank"]
    assert a[key].sort_values(key).reset_index(drop=True).equals(
        b[key].sort_values(key).reset_index(drop=True))
    # second apply is a no-op
    assert ti.apply_tombstones(idx) == {"n_applied": 0, "rows_dropped": 0}


# ---------------------------------------------------------------------------
# image_histogram


def test_image_histogram_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (image_histogram,
                                                        image_histogram_sql)
    from tests.oracle_check import compare

    assert compare("image_histogram", image_histogram(SF_SMOKE),
                   image_histogram_sql(), SF_SMOKE) == []


def test_image_histogram_semantics(ray_session):
    """Bins cover every pixel exactly once (Σ n_px = w·h per doc), and
    an RGB image's luminance path replays the ITU-R 601 integers."""
    import pyarrow as pa

    import ray.data as rd
    from pdf_extraction_ray.pipelines.analytics import image_histogram
    from pdf_extraction_ray.stages.multimodal import (ImageHistogram,
                                                      decode_png)

    out = image_histogram(SF_SMOKE).to_pandas()
    tot = out.groupby("doc_id")["n_px"].sum()
    for d in list(tot.index)[:25]:
        w, h = 8 + d % 25, 8 + d % 17
        assert int(tot[d]) == w * h
    # RGB luminance: synthesize a tiny RGB PNG via the palette builder
    from pdf_extraction_ray.sources.gen_media import build_png_palette
    pal = build_png_palette(7)
    img = decode_png(pal)
    assert img["channels"] == 3
    px = np.frombuffer(img["pixels"], np.uint8).astype(np.int64) \
        .reshape(-1, 3)
    lum = (77 * px[:, 0] + 150 * px[:, 1] + 29 * px[:, 2]) >> 8
    want = dict(zip(*np.unique(lum // 16, return_counts=True)))
    got = ImageHistogram()(pa.table({
        "url": pa.array(["media://img/7"], pa.string()),
        "html": pa.array([pal], pa.large_binary())}))
    gd = dict(zip(got["bin"].to_pylist(), got["n_px"].to_pylist()))
    assert gd == {int(k): int(v) for k, v in want.items()}


# ---------------------------------------------------------------------------
# event_funnel_timed


def test_event_funnel_timed_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (
        event_funnel_timed, event_funnel_timed_sql)
    from tests.oracle_check import compare

    assert compare("event_funnel_timed", event_funnel_timed(SF_SMOKE),
                   event_funnel_timed_sql(), SF_SMOKE) == []


def test_event_funnel_timed_vs_untimed(ray_session):
    """The window can only LOSE conversions (timed steps ≤ untimed per
    user), and on this corpus it actually does for some users (the
    constraint is load-bearing, not vacuous)."""
    from pdf_extraction_ray.pipelines.analytics import (event_funnel,
                                                        event_funnel_timed)

    t = (event_funnel_timed(SF_SMOKE).to_pandas()
         .set_index("user_id").sort_index())
    u = (event_funnel(SF_SMOKE).to_pandas()
         .set_index("user_id").sort_index())
    assert (t.steps_completed <= u.steps_completed).all()
    assert (t.steps_completed < u.steps_completed).any()


# ---------------------------------------------------------------------------
# bucket_skew_report


def test_bucket_skew_report_oracle(ray_session):
    import __ray_entry__ as entrymod
    from tests.oracle_check import compare

    assert compare("bucket_skew_report",
                   entrymod.queries()["bucket_skew_report"](SF_SMOKE),
                   entrymod.oracle_sql()["bucket_skew_report"],
                   SF_SMOKE) == []


def test_bucket_skew_matches_physical_layout(ray_session):
    """The computed census equals the PHYSICAL bucket=K/ row counts of
    the checkpointed output — the report describes the real layout,
    not just the hash function."""
    import glob

    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    out = (entrymod.queries()["bucket_skew_report"](SF_SMOKE)
           .to_pandas().set_index("bucket"))
    entrymod._extracted(SF_SMOKE)
    out_dir = entrymod._extracted_out_dir(SF_SMOKE)
    phys = {}
    for d in glob.glob(out_dir + "/bucket=*"):
        b = int(d.rsplit("=", 1)[1])
        phys[b] = sum(pq.read_metadata(f).num_rows
                      for f in glob.glob(d + "/*.parquet"))
    assert dict(out.n_docs) == {k: v for k, v in phys.items() if v}


# ---------------------------------------------------------------------------
# second review pass — regression pins


def test_apply_tombstones_crash_window_no_double_fold(ray_session,
                                                      tmp_path):
    """A tombstone file that survives past the meta fold (the crash
    window between the meta write and the file deletes) must NOT fold
    again: its tag is in meta['tombs_applied']."""
    import json
    import os
    import shutil

    import pyarrow as pa

    import ray.data as rd
    from pdf_extraction_ray.stages import textindex as ti

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(20)), pa.int64()),
        "text": pa.array([f"alpha w{i}" for i in range(20)], pa.string())}))
    idx = str(tmp_path / "idx")
    ti.build_inverted_index(ds, idx)
    r = ti.delete_from_index(idx, [4])
    saved = r["path"]
    backup = str(tmp_path / "saved.json")
    shutil.copy(saved, backup)
    ti.apply_tombstones(idx)
    with open(os.path.join(idx, "_meta.json")) as f:
        meta1 = json.load(f)
    # simulate the crash window: the folded file reappears
    shutil.copy(backup, saved)
    res = ti.apply_tombstones(idx)
    assert res == {"n_applied": 0, "rows_dropped": 0}
    with open(os.path.join(idx, "_meta.json")) as f:
        meta2 = json.load(f)
    assert meta2["n_docs"] == meta1["n_docs"]
    assert meta2["total_tokens"] == meta1["total_tokens"]
    assert meta2["id_fp"] == meta1["id_fp"]
    assert not os.path.exists(saved)  # leftover cleaned up


def test_overlapping_tombstone_files_dedup_dl(ray_session, tmp_path):
    """Two tombstone files sharing an id (the lock-free concurrent
    delete race) must subtract that doc's tokens ONCE."""
    import json
    import os

    import pyarrow as pa

    import ray.data as rd
    from pdf_extraction_ray.stages import textindex as ti

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(10)), pa.int64()),
        "text": pa.array([f"alpha w{i}" for i in range(10)], pa.string())}))
    idx = str(tmp_path / "idx")
    ti.build_inverted_index(ds, idx)
    ti.delete_from_index(idx, [3, 5])
    # simulate the racing writer: an overlapping file for [5, 7]
    rec = {"ids": [5, 7], "dls": [2, 2], "n": 2, "dl_sum": 4}
    with open(os.path.join(idx, "_tombstones", "del-race.json"),
              "w") as f:
        json.dump(rec, f)
    tomb = ti._load_tombstones(idx)
    assert tomb["ids"] == {3, 5, 7}
    assert tomb["n"] == 3 and tomb["dl_sum"] == 6  # id 5 counted once


def test_image_histogram_marker_row(ray_session):
    """An undecodable payload emits the (url, -1, 0) marker row, not a
    silent drop."""
    import pyarrow as pa

    from pdf_extraction_ray.stages.multimodal import ImageHistogram

    got = ImageHistogram()(pa.table({
        "url": pa.array(["media://bad/1"], pa.string()),
        "html": pa.array([b"not a png"], pa.large_binary())}))
    assert got.num_rows == 1
    assert got["bin"][0].as_py() == -1 and got["n_px"][0].as_py() == 0


def test_zonemap_recovers_from_manifestless_store(ray_session):
    """A stale store dir WITHOUT _zones.json (crashed pre-reuse build)
    must be cleared and republished, not wedge every future call."""
    import os
    import shutil

    from pdf_extraction_ray.pipelines.analytics import (zonemap_plan_probe,
                                                        zonemap_range_stats)

    store, _ = zonemap_plan_probe(SF_SMOKE)
    shutil.rmtree(store, ignore_errors=True)
    os.makedirs(os.path.join(store, "zone=9999"))  # manifestless garbage
    out = zonemap_range_stats(SF_SMOKE).to_pandas()
    assert len(out) > 0
    assert os.path.exists(os.path.join(store, "_zones.json"))


def test_bm25_after_delete_reuses_takedown_copy(ray_session):
    """A repeat run reuses the standing takedown copy (meta mtime
    stable) instead of re-copying the index."""
    import glob
    import os

    from pdf_extraction_ray.pipelines.analytics import bm25_after_delete

    bm25_after_delete(SF_SMOKE).materialize()
    work = glob.glob("/tmp/pdf_extraction_ray/textindex/"
                     "sf0.001-*-takedown")[0]
    m1 = os.path.getmtime(os.path.join(work, "_meta.json"))
    bm25_after_delete(SF_SMOKE).materialize()
    assert os.path.getmtime(os.path.join(work, "_meta.json")) == m1


# ---------------------------------------------------------------------------
# ann_after_delete (IVF tombstones)


def test_ann_after_delete_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (ann_after_delete,
                                                        ann_after_delete_sql)
    from tests.oracle_check import compare

    assert compare("ann_after_delete", ann_after_delete(SF_SMOKE),
                   ann_after_delete_sql(), SF_SMOKE) == []


def test_ivf_tombstone_lifecycle(ray_session, tmp_path):
    """delete → full probe excludes immediately; apply folds the meta
    once (crash window safe) and equals a fresh build of the filtered
    table; ensure accepts the filtered corpus afterward."""
    import json
    import os
    import shutil

    import pyarrow as pa

    import ray.data as rd
    from pdf_extraction_ray.stages import similarity as sim

    rng = np.random.RandomState(7)
    n, dim = 120, 8
    vecs = rng.randn(n, dim).astype(np.float32)
    t = pa.table({"vec_id": pa.array(list(range(n)), pa.int64()),
                  "embedding": pa.array([list(map(float, v))
                                         for v in vecs],
                                        pa.list_(pa.float32()))})
    ds = rd.from_arrow(t)
    idx = str(tmp_path / "ivf")
    sim.build_ivf_index(ds, idx, n_centroids=4)
    q = vecs[:2].astype(np.float64)
    r1 = sim.delete_from_ivf_index(idx, [5, 9])
    assert r1["n_deleted"] == 2
    served = sim.topk_cosine_ivf_indexed(idx, q, [0, 1], k=n,
                                         n_probe=4).to_pandas()
    assert {5, 9}.isdisjoint(set(served.neighbor_id))
    # crash-window no-double-fold: re-materialize the file post-apply
    path = r1["path"]
    backup = str(tmp_path / "t.json")
    shutil.copy(path, backup)
    sim.apply_ivf_tombstones(idx)
    with open(os.path.join(idx, "_meta.json")) as f:
        m1 = json.load(f)
    shutil.copy(backup, path)
    assert sim.apply_ivf_tombstones(idx) == {"n_applied": 0,
                                            "rows_dropped": 0}
    with open(os.path.join(idx, "_meta.json")) as f:
        m2 = json.load(f)
    assert (m1["n_rows"], m1["id_fp"]) == (m2["n_rows"], m2["id_fp"])
    # applied index == fresh build of the filtered table (full probe)
    kept = ds.filter(lambda r: r["vec_id"] not in (5, 9))
    fresh = str(tmp_path / "fresh")
    sim.build_ivf_index(kept.materialize(), fresh, n_centroids=4)
    a = sim.topk_cosine_ivf_indexed(idx, q, [0, 1], k=10,
                                    n_probe=4).to_pandas()
    b = sim.topk_cosine_ivf_indexed(fresh, q, [0, 1], k=10,
                                    n_probe=4).to_pandas()
    key = ["query_id", "neighbor_id", "rank"]
    assert a[key].sort_values(key).reset_index(drop=True).equals(
        b[key].sort_values(key).reset_index(drop=True))


# ---------------------------------------------------------------------------
# value_percentile_feature


def test_value_percentile_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (
        value_percentile_feature, value_percentile_feature_sql)
    from tests.oracle_check import compare

    assert compare("value_percentile_feature",
                   value_percentile_feature(SF_SMOKE),
                   value_percentile_feature_sql(), SF_SMOKE) == []


def test_value_percentile_semantics(ray_session):
    """rank_ppm is monotone in cents within a type, the minimum value
    ranks 0, and a numpy strict-rank replay matches row for row."""
    from pdf_extraction_ray.pipelines.analytics import (
        value_percentile_feature)

    out = value_percentile_feature(SF_SMOKE).to_pandas()
    for ty, g in out.groupby("event_type"):
        c = g.cents.to_numpy()
        want = (np.array([(c < x).sum() for x in c], np.int64)
                << 20) // len(c)
        assert (g.rank_ppm.to_numpy() == want).all()
        assert int(g.loc[g.cents.idxmin()].rank_ppm) == 0


# ---------------------------------------------------------------------------
# CSV pages interchange


def test_pages_csv_round_trip(ray_session, tmp_path):
    """write_pages_csv → read_pages_csv is byte-exact per column,
    including RFC-4180 hazards (embedded commas, quotes, newlines) and
    binary payloads; extraction over the CSV-ingested corpus equals
    the parquet path."""
    import ray.data as rd
    from pdf_extraction_ray.sources.corpus import ensure_pages_corpus
    from pdf_extraction_ray.sources.readers import (read_pages_csv,
                                                    write_pages_csv)

    pages = ensure_pages_corpus(SF_SMOKE)
    orig = rd.read_parquet(pages)
    out = str(tmp_path / "csv")
    write_pages_csv(orig, out)
    # the corpus plants re-crawled DUP urls (same url, two warc_ts)
    # — sort on both keys or the compare is order-ambiguous
    back = (read_pages_csv(out).to_pandas()
            .sort_values(["url", "warc_ts"]).reset_index(drop=True))
    a = (orig.to_pandas().sort_values(["url", "warc_ts"])
         .reset_index(drop=True))
    assert list(a.columns) == list(back.columns)
    for c in a.columns:
        assert a[c].equals(back[c]), c

    # hazard row: commas, quotes, newlines in text survive quoting
    import pyarrow as pa
    from datetime import datetime
    hazard = rd.from_arrow(pa.table({
        "url": pa.array(["https://x/a,b"], pa.string()),
        "warc_ts": pa.array([datetime(2021, 2, 3, 4, 5, 6)],
                            pa.timestamp("us")),
        "html": pa.array([b"\x00\xffbin"], pa.large_binary()),
        "text": pa.array(['line1\nline2, "quoted", end'],
                         pa.large_string()),
        "lang": pa.array(["en"], pa.string())}))
    out2 = str(tmp_path / "csv2")
    write_pages_csv(hazard, out2)
    got = read_pages_csv(out2).to_pandas()
    assert got.text[0] == 'line1\nline2, "quoted", end'
    assert bytes(got.html[0]) == b"\x00\xffbin"


# ---------------------------------------------------------------------------
# random_walks


def test_random_walks_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (random_walks,
                                                        random_walks_sql)
    from tests.oracle_check import compare

    assert compare("random_walks", random_walks(SF_SMOKE),
                   random_walks_sql(), SF_SMOKE) == []


def test_random_walks_semantics(ray_session):
    """Every node owns one length-L walk; consecutive positions follow
    the ordered edge law under the seeded hash (python replay); walks
    are reproducible run to run."""
    import duckdb as dk

    from pdf_extraction_ray.functions.hashing import stable_hash64
    from pdf_extraction_ray.pipelines.analytics import (RW_LENGTH,
                                                        random_walks)

    out = random_walks(SF_SMOKE).to_pandas()
    con = dk.connect()
    n = con.sql("SELECT count(*) FROM "
                f"read_parquet('{SF_SMOKE}/documents.parquet')"
                ).fetchone()[0]
    con.close()
    assert len(out) == n * (RW_LENGTH + 1)
    hubs = min(16, n)
    by_walk = out.sort_values("step").groupby("walk_id")
    for wid, g in list(by_walk)[:40]:
        chain = g.node.tolist()
        assert chain[0] == wid
        cur = wid
        for step in range(1, RW_LENGTH + 1):
            h = stable_hash64(f"rw:{int(wid)}:{step}") % 3
            cur = ((cur * 31 + 7) % n if h == 0 else
                   (cur * 17 + 3) % n if h == 1 else cur % hubs)
            assert chain[step] == cur
    again = random_walks(SF_SMOKE).to_pandas()
    key = ["walk_id", "step", "node"]
    assert out[key].sort_values(key).reset_index(drop=True).equals(
        again[key].sort_values(key).reset_index(drop=True))


# ---------------------------------------------------------------------------
# minhash index tombstones


def test_minhash_tombstone_lifecycle(ray_session, tmp_path):
    """A tombstoned doc stops matching probes immediately; the
    crash-window re-apply is a no-op; the applied index probes like a
    fresh build over the filtered corpus."""
    import json
    import os
    import shutil

    import pyarrow as pa

    import ray.data as rd
    from pdf_extraction_ray.stages import dedup as dd

    docs = [(i, f"alpha beta gamma delta epsilon w{i} zeta eta theta")
            for i in range(30)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string())}))
    idx = str(tmp_path / "mh")
    dd.build_minhash_index(ds.materialize(), idx)
    # probe snapshot: verbatim re-crawls of docs 7 AND 9
    probe = rd.from_arrow(pa.table({
        "doc_id": pa.array([1000, 1001], pa.int64()),
        "text": pa.array([docs[7][1], docs[9][1]], pa.string())}))
    hit = (dd.probe_minhash_index(probe.materialize(), idx).to_pandas()
           .set_index("nid"))
    assert int(hit.loc[1000].dup_of) == 7 and int(hit.loc[1001].dup_of) == 9

    r = dd.delete_from_minhash_index(idx, [7])
    assert r["n_deleted"] == 1
    after = (dd.probe_minhash_index(probe.materialize(), idx)
             .to_pandas())
    # doc 7 can no longer match; doc 9 still does
    assert set(after.nid) == {1001}
    assert int(after.set_index("nid").loc[1001].dup_of) == 9

    # crash-window: re-materialize the folded file → no double fold
    backup = str(tmp_path / "t.json")
    shutil.copy(r["path"], backup)
    dd.apply_minhash_tombstones(idx)
    with open(os.path.join(idx, "_meta.json")) as f:
        m1 = json.load(f)
    shutil.copy(backup, r["path"])
    assert dd.apply_minhash_tombstones(idx) == {"n_applied": 0,
                                                "rows_dropped": 0}
    with open(os.path.join(idx, "_meta.json")) as f:
        m2 = json.load(f)
    assert (m1["n_docs"], m1["id_fp"]) == (m2["n_docs"], m2["id_fp"])
    # applied index == fresh build over the filtered corpus
    fresh = str(tmp_path / "fresh")
    kept = ds.filter(lambda row: row["doc_id"] != 7)
    dd.build_minhash_index(kept.materialize(), fresh)
    a = dd.probe_minhash_index(probe.materialize(), idx).to_pandas()
    b = dd.probe_minhash_index(probe.materialize(), fresh).to_pandas()
    key = ["nid", "dup_of", "agree_k"]
    assert len(a) == 1  # non-vacuous: doc 9 still serves on both sides
    assert a[key].sort_values(key).reset_index(drop=True).equals(
        b[key].sort_values(key).reset_index(drop=True))


# ---------------------------------------------------------------------------
# walk_cooccurrence


def test_walk_cooccurrence_oracle(ray_session):
    from pdf_extraction_ray.pipelines.analytics import (
        walk_cooccurrence, walk_cooccurrence_sql)
    from tests.oracle_check import compare

    assert compare("walk_cooccurrence", walk_cooccurrence(SF_SMOKE),
                   walk_cooccurrence_sql(), SF_SMOKE) == []


def test_walk_cooccurrence_semantics(ray_session):
    """Pair counts replay from the emitted walk table (window-2
    skip-gram, both directions, self-pairs dropped); totals are
    symmetric (n(a,b) == n(b,a)) because the window is."""
    from pdf_extraction_ray.pipelines.analytics import (RW_WINDOW,
                                                        random_walks,
                                                        walk_cooccurrence)

    out = walk_cooccurrence(SF_SMOKE).to_pandas()
    walks = random_walks(SF_SMOKE).to_pandas()
    want: dict[tuple, int] = {}
    for _, g in walks.sort_values("step").groupby("walk_id"):
        chain = g.node.tolist()
        for i, a in enumerate(chain):
            for j, b in enumerate(chain):
                if i != j and abs(i - j) <= RW_WINDOW and a != b:
                    want[(a, b)] = want.get((a, b), 0) + 1
    got = {(r.a, r.b): int(r.n) for r in out.itertuples()}
    assert got == want
    for (a, b), n in list(want.items())[:200]:
        assert want[(b, a)] == n


# ---------------------------------------------------------------------------
# zonemap append + compact (the store's ingest loop)


def test_zonemap_append_lifecycle(ray_session, tmp_path):
    """Append lands deltas without rewriting existing zones; the scan
    sees base+delta == a fresh rebuild of the union; duplicate appends
    no-op byte-for-byte; manifest bounds extend, never shrink;
    compaction merges to one file per zone and preserves answers."""
    import glob
    import json
    import os

    import pyarrow as pa

    import ray.data as rd
    from pdf_extraction_ray.state.zonemap import (append_to_zonemap,
                                                  compact_zonemap,
                                                  write_zonemapped,
                                                  zonemap_scan)

    def tbl(lo, n):
        return pa.table({"k": pa.array(list(range(lo, lo + n)), pa.int64()),
                         "v": pa.array([i % 7 for i in range(lo, lo + n)],
                                       pa.int64())})

    store = str(tmp_path / "zm")
    write_zonemapped(rd.from_arrow(tbl(0, 300)), "k", store, 100)
    base_file = os.path.join(store, "zone=1", "part-0.parquet")
    m0 = os.path.getmtime(base_file)

    append_to_zonemap(rd.from_arrow(tbl(300, 150)), store)  # zones 3,4
    append_to_zonemap(rd.from_arrow(tbl(450, 50)), store)   # delta in 4
    assert os.path.getmtime(base_file) == m0  # base zones untouched

    got = zonemap_scan(store, 0, 499).to_pandas().sort_values("k")
    assert list(got.k) == list(range(500))
    with open(os.path.join(store, "_zones.json")) as f:
        meta = json.load(f)
    assert meta["zones"]["4"]["rows"] == 100  # 50 + 50 delta-on-delta
    assert meta["zones"]["4"]["hi"] == 499

    # duplicate append no-ops (file set unchanged)
    before = sorted(glob.glob(store + "/zone=*/*.parquet"))
    append_to_zonemap(rd.from_arrow(tbl(300, 150)), store)
    assert sorted(glob.glob(store + "/zone=*/*.parquet")) == before

    res = compact_zonemap(store)
    assert res["zones_compacted"] >= 1
    for zdir in glob.glob(store + "/zone=*"):
        assert len(glob.glob(zdir + "/*.parquet")) == 1
    got2 = zonemap_scan(store, 0, 499).to_pandas().sort_values("k")
    assert list(got2.k) == list(range(500))
    assert list(got2.v) == list(got.sort_values("k").v)


def test_derived_parquet_empty_build_and_reuse(ray_session, tmp_path,
                                               monkeypatch):
    """The digest-keyed disk cache must survive a 0-row build (Ray's
    write_parquet writes NOTHING for an empty dataset — review
    finding: the old path cached a missing directory and crashed
    forever) and must reuse the published copy instead of rebuilding."""
    import pyarrow as pa

    import ray.data as rd
    from pdf_extraction_ray.sources import corpus as cm

    monkeypatch.setattr(
        cm, "_input_digest", lambda sf: "testdig", raising=True)
    import shutil as _sh
    _sh.rmtree("/tmp/pdf_extraction_ray/derived/x-empt-"
               f"{cm.spec.SPEC_VERSION}-testdig", ignore_errors=True)
    _sh.rmtree("/tmp/pdf_extraction_ray/derived/x-full-"
               f"{cm.spec.SPEC_VERSION}-testdig", ignore_errors=True)

    calls = {"n": 0}

    def empty_build():
        calls["n"] += 1
        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.large_string())}))

    # the parquet itself carries the schema (readable via pyarrow);
    # Ray's to_pandas drops columns on 0-row datasets (the repo's
    # pinned empty-schema quirk), so assert on the file, not the frame
    import glob as _gl

    import pyarrow.parquet as _pq
    got = cm.derived_parquet("x", "empt", empty_build).to_pandas()
    assert len(got) == 0
    files = _gl.glob("/tmp/pdf_extraction_ray/derived/x-empt-"
                     f"{cm.spec.SPEC_VERSION}-testdig/*.parquet")
    assert files and sorted(_pq.read_schema(files[0]).names) == ["a", "b"]
    # second call: served from disk, build NOT re-run
    got2 = cm.derived_parquet("x", "empt", empty_build).to_pandas()
    assert len(got2) == 0 and calls["n"] == 1

    def full_build():
        calls["n"] += 1
        return rd.from_items([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])

    got3 = cm.derived_parquet("x", "full", full_build).to_pandas()
    assert sorted(got3.a) == [1, 2]
    cm.derived_parquet("x", "full", full_build)
    assert calls["n"] == 2  # one build per (name, digest), ever


def test_appliedlog_fold_and_membership(tmp_path):
    """The applied-fingerprint log stays BOUNDED in the hot manifest
    without ever forgetting a batch (ADVICE r4): folding moves old
    entries to the archive sidecar, membership is hot ∪ archive, and
    re-folding dedupes."""
    from pdf_extraction_ray.state import appliedlog as al

    d = str(tmp_path)
    fps = [f"fp{i:02d}" for i in range(5)]
    hot = al.fold_applied(d, fps, keep_recent=2)
    assert hot == ["fp03", "fp04"]
    # every fingerprint — archived or hot — still counts as applied
    for fp in fps:
        assert al.applied_contains(d, hot, fp)
    assert not al.applied_contains(d, hot, "fp99")
    # more appends land on the hot list, then a second fold: the
    # archive absorbs the older half and dedupes any overlap
    hot2 = al.fold_applied(d, hot + ["fp02", "fp05", "fp06", "fp07"],
                           keep_recent=2)
    assert hot2 == ["fp06", "fp07"]
    import json
    with open(al._archive_path(d)) as f:
        arch = json.load(f)
    assert arch.count("fp02") == 1
    assert len(arch) == len(set(arch))
    for fp in fps + ["fp05", "fp06", "fp07"]:
        assert al.applied_contains(d, hot2, fp)
    # within-bound list: no archive touch, list returned as-is
    assert al.fold_applied(d, ["a", "b"], keep_recent=4) == ["a", "b"]


def test_zonemap_append_duplicate_noop_after_fold(ray_session, tmp_path):
    """An at-least-once duplicate submission no-ops even after its
    fingerprint was folded OUT of the hot manifest into the archive —
    the exact regression a capped log used to re-ingest."""
    import glob
    import json
    import os

    import pyarrow as pa

    import ray.data as rd
    from pdf_extraction_ray.state import appliedlog as al
    from pdf_extraction_ray.state import zonemap as zm

    def tbl(lo, n):
        return pa.table({"k": pa.array(list(range(lo, lo + n)), pa.int64()),
                         "v": pa.array([1] * n, pa.int64())})

    store = str(tmp_path / "zm")
    zm.write_zonemapped(rd.from_arrow(tbl(0, 100)), "k", store, 100)
    zm.append_to_zonemap(rd.from_arrow(tbl(100, 50)), store)
    zm.append_to_zonemap(rd.from_arrow(tbl(150, 50)), store)

    # simulate the compaction-time fold with an aggressive bound
    mpath = os.path.join(store, "_zones.json")
    with open(mpath) as f:
        meta = json.load(f)
    assert len(meta["applied"]) == 2
    meta["applied"] = al.fold_applied(store, meta["applied"],
                                      keep_recent=1)
    with open(mpath, "w") as f:
        json.dump(meta, f)
    assert len(meta["applied"]) == 1  # first batch folded to archive

    # re-submitting the FOLDED batch must still no-op
    before = sorted(glob.glob(store + "/zone=*/*.parquet"))
    zm.append_to_zonemap(rd.from_arrow(tbl(100, 50)), store)
    assert sorted(glob.glob(store + "/zone=*/*.parquet")) == before
    got = zm.zonemap_scan(store, 0, 199).to_pandas()
    assert sorted(got.k) == list(range(200))


def test_zonemap_compact_concurrent_writer_guard(ray_session, tmp_path):
    """The single-writer assumption fails LOUDLY, never silently
    (ADVICE r4): (1) an unlisted parquet NEWER than the manifest — a
    concurrent append's published-but-not-yet-manifested delta —
    survives the cleanup sweep; (2) a manifest that changed between
    compaction start and the sweep aborts before any delete."""
    import glob
    import json
    import os
    import time

    import pyarrow as pa
    import pytest

    import ray.data as rd
    from pdf_extraction_ray.state import zonemap as zm

    def tbl(lo, n):
        return pa.table({"k": pa.array(list(range(lo, lo + n)), pa.int64()),
                         "v": pa.array([1] * n, pa.int64())})

    store = str(tmp_path / "zm")
    zm.write_zonemapped(rd.from_arrow(tbl(0, 200)), "k", store, 100)
    # two deltas into the SAME zone so compaction has real work
    zm.append_to_zonemap(rd.from_arrow(tbl(200, 50)), store)
    zm.append_to_zonemap(rd.from_arrow(tbl(250, 150)), store)

    # (1) a concurrent append's delta: published to a zone dir AFTER the
    # manifest, not yet listed — the sweep must leave it alone
    zdir = sorted(glob.glob(store + "/zone=*"))[0]
    straggler = os.path.join(zdir, "part-concurrent-delta.parquet")
    time.sleep(0.02)  # strictly newer mtime than the manifest
    import pyarrow.parquet as pq
    pq.write_table(tbl(990, 5), straggler)
    res = zm.compact_zonemap(store)
    assert res["zones_compacted"] >= 1
    assert os.path.exists(straggler), "sweep deleted a concurrent delta"
    os.remove(straggler)

    # (2) manifest mutated mid-compaction -> loud abort, nothing deleted
    zm.append_to_zonemap(rd.from_arrow(tbl(400, 100)), store)
    mpath = os.path.join(store, "_zones.json")
    with open(mpath) as f:
        meta = json.load(f)
    real_loads = json.load
    calls = {"n": 0}

    def racing_load(f):
        out = real_loads(f)
        if getattr(f, "name", "") == mpath:
            calls["n"] += 1
            if calls["n"] == 1:  # the load at compaction START
                # mutate the on-disk manifest AFTER it was read
                meta2 = {**out, "racer": True}
                with open(mpath, "w") as g:
                    json.dump(meta2, g)
        return out

    files_before = sorted(glob.glob(store + "/zone=*/*.parquet"))
    import unittest.mock as mock
    with mock.patch.object(zm.json, "load", racing_load):
        with pytest.raises(RuntimeError, match="concurrent writer"):
            zm.compact_zonemap(store)
    # merged outputs may have been published, but NO file was deleted
    assert set(files_before) <= set(
        sorted(glob.glob(store + "/zone=*/*.parquet")))
    # restore a clean manifest so a real rerun converges
    with open(mpath, "w") as g:
        json.dump(meta, g)
    zm.compact_zonemap(store)
    got = zm.zonemap_scan(store, 0, 499).to_pandas()
    assert sorted(got.k) == list(range(500))


def test_zonemap_fingerprint_covers_row_content(ray_session, tmp_path):
    """Distinct delta batches with IDENTICAL key multisets (the
    realistic same-day case — and the {0,5} vs {1,4} (n,sum,xor)
    collision) must BOTH ingest: the fingerprint hashes full row
    content, not just the key column (advisor finding, high)."""
    import pyarrow as pa

    import ray.data as rd
    from pdf_extraction_ray.state.zonemap import (append_to_zonemap,
                                                  write_zonemapped,
                                                  zonemap_scan)

    store = str(tmp_path / "zm")
    write_zonemapped(rd.from_arrow(pa.table(
        {"k": pa.array([0], pa.int64()),
         "v": pa.array([0], pa.int64())})), "k", store, 100)
    # same day (key=7) twice, different payloads — NOT duplicates
    append_to_zonemap(rd.from_arrow(pa.table(
        {"k": pa.array([7, 7], pa.int64()),
         "v": pa.array([10, 11], pa.int64())})), store)
    append_to_zonemap(rd.from_arrow(pa.table(
        {"k": pa.array([7, 7], pa.int64()),
         "v": pa.array([20, 21], pa.int64())})), store)
    # the classic key-multiset collision {0,5} vs {1,4}
    append_to_zonemap(rd.from_arrow(pa.table(
        {"k": pa.array([0, 5], pa.int64()),
         "v": pa.array([1, 1], pa.int64())})), store)
    append_to_zonemap(rd.from_arrow(pa.table(
        {"k": pa.array([1, 4], pa.int64()),
         "v": pa.array([1, 1], pa.int64())})), store)
    got = zonemap_scan(store, 0, 99).to_pandas()
    assert sorted(got.v[got.k == 7]) == [10, 11, 20, 21]
    assert len(got) == 9
    # a TRUE duplicate (byte-identical batch) still no-ops
    before = len(zonemap_scan(store, 0, 99).to_pandas())
    append_to_zonemap(rd.from_arrow(pa.table(
        {"k": pa.array([7, 7], pa.int64()),
         "v": pa.array([10, 11], pa.int64())})), store)
    assert len(zonemap_scan(store, 0, 99).to_pandas()) == before
    # an explicit batch_id is the idempotence token when given: the
    # same id no-ops even for different content
    append_to_zonemap(rd.from_arrow(pa.table(
        {"k": pa.array([8], pa.int64()),
         "v": pa.array([1], pa.int64())})), store, batch_id="job-42")
    append_to_zonemap(rd.from_arrow(pa.table(
        {"k": pa.array([9], pa.int64()),
         "v": pa.array([2], pa.int64())})), store, batch_id="job-42")
    got = zonemap_scan(store, 0, 99).to_pandas()
    assert 8 in set(got.k) and 9 not in set(got.k)


def test_zonemap_compact_crash_convergent(ray_session, tmp_path,
                                          monkeypatch):
    """A compaction that crashes between publishing the manifest and
    deleting the merged inputs must NOT duplicate rows: readers follow
    the manifest's live-file list, and the rerun sweeps the leftovers
    (advisor finding, medium — the old part-0 publish re-concatenated
    its own delta rows on the next compaction)."""
    import glob
    import os

    import pyarrow as pa

    import ray.data as rd
    from pdf_extraction_ray.state import zonemap as zm

    def tbl(lo, n):
        return pa.table({"k": pa.array(list(range(lo, lo + n)), pa.int64()),
                         "v": pa.array([i % 7 for i in range(lo, lo + n)],
                                       pa.int64())})

    store = str(tmp_path / "zm")
    zm.write_zonemapped(rd.from_arrow(tbl(0, 100)), "k", store, 100)
    zm.append_to_zonemap(rd.from_arrow(tbl(100, 100)), store)
    zm.append_to_zonemap(rd.from_arrow(tbl(40, 20)), store)  # dup keys ok

    # crash simulation: cleanup's os.remove never runs
    with monkeypatch.context() as mp:
        mp.setattr(os, "remove", lambda p: None)
        res = zm.compact_zonemap(store)
    assert res["zones_compacted"] >= 1
    leftovers = [p for zdir in glob.glob(store + "/zone=*")
                 for p in glob.glob(zdir + "/*.parquet")]
    assert len(leftovers) > 2  # inputs still on disk (the crash state)
    # readers see exactly the merged live set — no duplicated rows
    got = zm.zonemap_scan(store, 0, 299).to_pandas().sort_values("k")
    assert list(got.k) == sorted(list(range(200)) + list(range(40, 60)))
    # the rerun converges: sweeps leftovers, answer unchanged
    res2 = zm.compact_zonemap(store)
    assert res2["zones_compacted"] == 0 and res2["files_removed"] >= 2
    for zdir in glob.glob(store + "/zone=*"):
        assert len(glob.glob(zdir + "/*.parquet")) == 1
    got2 = zm.zonemap_scan(store, 0, 299).to_pandas().sort_values("k")
    assert list(got2.k) == list(got.k) and list(got2.v) == list(got.v)


# ---------------------------------------------------------------------------
# route_threshold_sweep


def test_route_threshold_sweep_oracle(ray_session):
    import __ray_entry__ as entrymod
    from tests.oracle_check import compare

    assert compare("route_threshold_sweep",
                   entrymod.queries()["route_threshold_sweep"](SF_SMOKE),
                   entrymod.oracle_sql()["route_threshold_sweep"],
                   SF_SMOKE) == []


def test_route_threshold_sweep_semantics(ray_session):
    """Per threshold, primary+fallback == corpus size; n_primary is
    non-increasing in the threshold; the production cutoff's row
    matches the flagship's actual routing counts."""
    import __ray_entry__ as entrymod

    out = (entrymod.queries()["route_threshold_sweep"](SF_SMOKE)
           .to_pandas().sort_values("threshold").reset_index(drop=True))
    total = out.n_primary + out.n_fallback
    assert total.nunique() == 1
    assert (out.n_primary.diff().dropna() <= 0).all()
    flag = entrymod._extracted(SF_SMOKE).select_columns(
        ["route"]).to_pandas()
    row70 = out[out.threshold == 70].iloc[0]
    assert int(row70.n_primary) == int((flag.route == "primary").sum())
