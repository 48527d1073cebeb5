"""Tests for the session-10 operators: the TPC-H completion set
(Q6/Q4/Q13/Q22/Q17/Q19/Q7 analogs) and the content-defined-chunking
dedup census."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE


def _oracle(name: str, fn, sql: str):
    from tests.oracle_check import compare

    assert compare(name, fn(SF_SMOKE), sql, SF_SMOKE) == []


# ---------------------------------------------------------------------------
# forecast_revenue (Q6)


def test_forecast_revenue_oracle(ray_session):
    from pdf_extraction_ray.pipelines import relational as R

    _oracle("forecast_revenue", R.forecast_revenue,
            R.forecast_revenue_sql())


def test_forecast_revenue_semantics(ray_session):
    """One row; the pandas replay of the filter+sum equals the engine."""
    import os

    from pdf_extraction_ray.pipelines import relational as R

    out = R.forecast_revenue(SF_SMOKE).to_pandas()
    assert len(out) == 1
    li = pd.read_parquet(os.path.join(SF_SMOKE, "lineitem.parquet"))
    d100 = np.round(li.l_discount.to_numpy() * 100).astype(np.int64)
    m = ((li.l_shipdate >= R.Q6_SHIP_LO) & (li.l_shipdate < R.Q6_SHIP_HI)
         & (d100 >= 5) & (d100 <= 7) & (li.l_quantity < 24))
    want = np.round(li.l_extendedprice[m].to_numpy()
                    * li.l_discount[m].to_numpy() * 10000).astype(np.int64)
    assert int(out.revenue_e4.iloc[0]) == int(want.sum())
    assert int(out.n_items.iloc[0]) == int(m.sum())


# ---------------------------------------------------------------------------
# late_order_priority_counts (Q4)


def test_late_order_priority_oracle(ray_session):
    from pdf_extraction_ray.pipelines import relational as R

    _oracle("late_order_priority_counts", R.late_order_priority_counts,
            R.late_order_priority_counts_sql())


def test_late_order_priority_gap_monotone(ray_session):
    """A larger lateness gap can only shrink every priority's count;
    a huge gap empties the report."""
    from pdf_extraction_ray.pipelines import relational as R

    base = (R.late_order_priority_counts(SF_SMOKE).to_pandas()
            .set_index("o_orderpriority").n_late_orders)
    tight = (R.late_order_priority_counts(SF_SMOKE, gap_days=730)
             .to_pandas().set_index("o_orderpriority").n_late_orders)
    for p, n in tight.items():
        assert n <= base[p]
    assert R.late_order_priority_counts(SF_SMOKE,
                                        gap_days=10_000).count() == 0


# ---------------------------------------------------------------------------
# customer_order_counts_hist (Q13)


def test_customer_order_counts_hist_oracle(ray_session):
    from pdf_extraction_ray.pipelines import relational as R

    _oracle("customer_order_counts_hist", R.customer_order_counts_hist,
            R.customer_order_counts_hist_sql())


def test_customer_order_counts_hist_total(ray_session):
    """Histogram masses sum to the customer count (zero bucket
    included), and weighted counts sum to the qualifying order count."""
    import os

    from pdf_extraction_ray.pipelines import relational as R

    out = R.customer_order_counts_hist(SF_SMOKE).to_pandas()
    cust = pd.read_parquet(os.path.join(SF_SMOKE, "customer.parquet"))
    orders = pd.read_parquet(os.path.join(SF_SMOKE, "orders.parquet"))
    assert int(out.n_customers.sum()) == len(cust)
    assert int((out.n_orders * out.n_customers).sum()) == int(
        (orders.o_orderstatus != "P").sum())


# ---------------------------------------------------------------------------
# idle_customer_balance (Q22)


def test_idle_customer_balance_oracle(ray_session):
    from pdf_extraction_ray.pipelines import relational as R

    _oracle("idle_customer_balance", R.idle_customer_balance,
            R.idle_customer_balance_sql())


def test_idle_customer_balance_semantics(ray_session):
    """Pandas replay: integer cross-multiplied above-average predicate
    + no order on/after the cutoff."""
    import os

    from pdf_extraction_ray.pipelines import relational as R

    out = (R.idle_customer_balance(SF_SMOKE).to_pandas()
           .set_index("c_nationkey"))
    cust = pd.read_parquet(os.path.join(SF_SMOKE, "customer.parquet"))
    orders = pd.read_parquet(os.path.join(SF_SMOKE, "orders.parquet"))
    cents = np.round(cust.c_acctbal.to_numpy() * 100).astype(np.int64)
    pos = cents[cents > 0]
    recent = set(orders.loc[orders.o_orderdate >= R.Q22_CUTOFF,
                            "o_custkey"])
    keep = (cents * len(pos) > pos.sum()) & ~cust.c_custkey.isin(recent)
    want = (pd.DataFrame({"nk": cust.c_nationkey[keep],
                          "bal": cents[keep]})
            .groupby("nk").agg(n=("bal", "size"), s=("bal", "sum")))
    assert int(out.n_customers.sum()) == int(keep.sum())
    for nk, row in want.iterrows():
        assert int(out.loc[nk, "n_customers"]) == int(row.n)
        assert int(out.loc[nk, "sum_bal_cents"]) == int(row.s)


# ---------------------------------------------------------------------------
# small_quantity_revenue (Q17)


def test_small_quantity_revenue_oracle(ray_session):
    from pdf_extraction_ray.pipelines import relational as R

    _oracle("small_quantity_revenue", R.small_quantity_revenue,
            R.small_quantity_revenue_sql())


def test_small_quantity_revenue_threshold_exact(ray_session):
    """The kept items are exactly those with 5*qty*n < sum_qty within
    their (brand-filtered) part — pandas replay."""
    import os

    from pdf_extraction_ray.pipelines import relational as R

    out = R.small_quantity_revenue(SF_SMOKE).to_pandas()
    part = pd.read_parquet(os.path.join(SF_SMOKE, "part.parquet"))
    li = pd.read_parquet(os.path.join(SF_SMOKE, "lineitem.parquet"))
    keys = set(part.loc[part.p_brand == R.Q17_BRAND, "p_partkey"])
    sub = li[li.l_partkey.isin(keys)].copy()
    sub["qty"] = np.round(sub.l_quantity).astype(np.int64)
    st = sub.groupby("l_partkey").qty.agg(["sum", "size"])
    sq = st["sum"].reindex(sub.l_partkey).to_numpy()
    nl = st["size"].reindex(sub.l_partkey).to_numpy()
    m = 5 * sub.qty.to_numpy() * nl < sq
    cents = np.round(sub.l_extendedprice.to_numpy() * 100).astype(np.int64)
    assert int(out.revenue_e2.iloc[0]) == int(cents[m].sum())
    assert int(out.n_items.iloc[0]) == int(m.sum())
    assert int(out.weekly_revenue_e2.iloc[0]) == int(cents[m].sum()) // 7


# ---------------------------------------------------------------------------
# disjunctive_revenue (Q19)


def test_disjunctive_revenue_oracle(ray_session):
    from pdf_extraction_ray.pipelines import relational as R

    _oracle("disjunctive_revenue", R.disjunctive_revenue,
            R.disjunctive_revenue_sql())


# ---------------------------------------------------------------------------
# nation_pair_volume (Q7)


def test_nation_pair_volume_oracle(ray_session):
    from pdf_extraction_ray.pipelines import relational as R

    _oracle("nation_pair_volume", R.nation_pair_volume,
            R.nation_pair_volume_sql())


def test_nation_pair_volume_semantics(ray_session):
    """No same-nation rows; every (pair, year) revenue is positive;
    pair totals are symmetric only by data, never by construction —
    both directions may appear independently."""
    from pdf_extraction_ray.pipelines import relational as R

    out = R.nation_pair_volume(SF_SMOKE).to_pandas()
    assert (out.supp_nation != out.cust_nation).all()
    assert (out.revenue_e4 > 0).all()
    assert not out.duplicated(["supp_nation", "cust_nation",
                               "year"]).any()


def test_nation_pair_volume_pack_overflow_raises(ray_session, tmp_path):
    """The (5,5,12)-bit key pack fails LOUDLY on out-of-range keys
    instead of silently merging unrelated groups (ADVICE r4): a corpus
    with nationkey >= 32 must raise, not return corrupt aggregates."""
    import shutil

    import pandas as pd
    import pytest

    from pdf_extraction_ray.pipelines import relational as R

    sf = str(tmp_path / "sfbad")
    shutil.copytree(SF_SMOKE, sf)
    supp = pd.read_parquet(f"{sf}/supplier.parquet")
    supp["s_nationkey"] = 40  # out of the 5-bit pack range
    supp.to_parquet(f"{sf}/supplier.parquet", index=False)
    with pytest.raises(Exception, match="pack overflow"):
        R.nation_pair_volume(sf).to_pandas()


# ---------------------------------------------------------------------------
# cdc_chunk_stats


def test_cdc_chunk_stats_oracle(ray_session):
    from pdf_extraction_ray.pipelines import analytics as A

    _oracle("cdc_chunk_stats", A.cdc_chunk_stats,
            A.cdc_chunk_stats_sql())


def test_cdc_boundaries_edit_local(ray_session):
    """The CDC property: inserting text mid-document only re-chunks
    the edited neighborhood — boundaries before the edit are
    unchanged, boundaries after it shift by exactly the insert length
    (fixed-size blocks would shift EVERY later block's content)."""
    from pdf_extraction_ray.functions.hashing import cdc_boundaries

    base = "".join(chr(97 + (i * 7 + i // 13) % 26) for i in range(3000))
    edit = base[:1500] + "INSERTED-PASSAGE" + base[1500:]
    b0 = cdc_boundaries(base)
    b1 = cdc_boundaries(edit)
    pre0 = [b for b in b0 if b <= 1500 - 16]
    pre1 = [b for b in b1 if b <= 1500 - 16]
    assert pre0 == pre1  # prefix boundaries untouched
    d = len("INSERTED-PASSAGE")
    post0 = {b + d for b in b0 if b > 1500 + 16}
    post1 = {b for b in b1 if b > 1500 + 16 + d}
    # suffix boundaries re-align once past the edit window
    assert post0 & post1
    assert len(post0 & post1) >= max(1, len(post0) - 3)


def test_cdc_chunks_cover_text(ray_session):
    """Chunk lengths per doc sum to the doc length, every doc chunks,
    and planted exact near-copies share almost all chunk content."""
    from pdf_extraction_ray.functions.hashing import cdc_boundaries
    from pdf_extraction_ray.pipelines import analytics as A

    out = A.cdc_chunk_stats(SF_SMOKE).to_pandas()
    docs = A._docs(SF_SMOKE, ["doc_id", "text"]).to_pandas()
    lens = docs.set_index("doc_id").text.str.len()
    merged = out.set_index("doc_id")
    assert len(merged) == len(docs)
    # spot-check coverage on 20 docs: n_chunks == len(boundaries)
    for _, r in docs.head(20).iterrows():
        assert merged.loc[r.doc_id, "n_chunks"] == len(
            cdc_boundaries(r.text))
    assert (merged.n_dup_chunks <= merged.n_chunks).all()
    assert (merged.dup_chars <= lens.reindex(merged.index)).all()


# ---------------------------------------------------------------------------
# extract_upsert (incremental re-crawl MERGE INTO the checkpoint store)


def test_extract_upsert_oracle(ray_session):
    """base-minus-class + insert-upsert + replace-upsert == the
    flagship full-run oracle (insert/replace/don't-touch value-gated)."""
    import __ray_entry__ as entrymod
    from tests.oracle_check import compare

    assert compare("extract_upsert",
                   entrymod.queries()["extract_upsert"](SF_SMOKE),
                   entrymod.oracle_sql()["extract_upsert"],
                   SF_SMOKE) == []


def test_upsert_physical_semantics(ray_session, tmp_path):
    """The merge path's physical contract: inserted urls appear
    byte-exact, a re-crawled row REPLACES its url's row (new warc_ts,
    no duplicate), and buckets the delta does not touch keep their
    bytes (mtime-stable)."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd
    from pdf_extraction_ray.config import PipelineConfig
    from pdf_extraction_ray.functions.hashing import url_bucket
    from pdf_extraction_ray.pipelines import extraction as E
    from pdf_extraction_ray.sources import corpus, spec

    cfg = PipelineConfig(max_bytes=spec.CORPUS_MAX_BYTES)
    pages_path = corpus.ensure_pages_corpus(SF_SMOKE)
    pages = rd.read_parquet(pages_path)
    all_urls = sorted(set(pages.select_columns(["url"]).to_pandas().url))
    delta_urls = set(all_urls[:20])

    def split(keep_delta: bool):
        def f(t: pa.Table) -> pa.Table:
            mask = [(u in delta_urls) == keep_delta
                    for u in t["url"].to_pylist()]
            return t.filter(pa.array(mask, pa.bool_()))
        return pages.map_batches(f, batch_format="pyarrow")

    store = str(tmp_path / "store")
    E.run_extraction(split(False), cfg, out_dir=store)
    mtimes = {p: os.path.getmtime(p)
              for p in glob.glob(store + "/bucket=*/part-0.parquet")}
    delta_buckets = {url_bucket(u, cfg.n_buckets) for u in delta_urls}

    # INSERT: the held-out urls enter through the merge
    E.upsert_extraction(split(True), cfg, store)
    out = rd.read_parquet(store).to_pandas()
    docs = pq.read_table(
        os.path.join(SF_SMOKE, "documents.parquet")).to_pylist()
    exp = {spec.url_of(d["doc_id"], d["source"]):
           spec.expected_final_text(d["doc_id"], d["text"], d["source"])
           for d in docs}
    for u in sorted(delta_urls)[:10]:
        row = out[out.url == u]
        assert len(row) == 1
        assert row.extracted_text.iloc[0] == exp[u]  # byte-exact
    # untouched buckets byte-stable
    for p, m in mtimes.items():
        b = int(p.split("bucket=")[1].split("/")[0])
        if b not in delta_buckets:
            assert os.path.getmtime(p) == m, p

    # REPLACE: re-crawl 5 delta urls with a LATER warc_ts
    recrawl_urls = set(sorted(delta_urls)[:5])

    def bump(t: pa.Table) -> pa.Table:
        mask = [u in recrawl_urls for u in t["url"].to_pylist()]
        kept = t.filter(pa.array(mask, pa.bool_()))
        ts = kept["warc_ts"].combine_chunks().cast(pa.timestamp("us"))
        bumped = pa.Array.from_pandas(
            ts.cast(pa.int64()).to_pandas() + 3_600_000_000).cast(
            pa.timestamp("us"))
        return kept.set_column(kept.schema.get_field_index("warc_ts"),
                               "warc_ts", bumped)

    E.upsert_extraction(pages.map_batches(bump, batch_format="pyarrow"),
                        cfg, store)
    out2 = rd.read_parquet(store).to_pandas()
    for u in recrawl_urls:
        rows = out2[out2.url == u]
        assert len(rows) == 1  # replaced, never duplicated
        old = out[out.url == u].warc_ts.iloc[0]
        assert rows.warc_ts.iloc[0] == old + pd.Timedelta(hours=1)


# ---------------------------------------------------------------------------
# ppr_related (personalized PageRank per seed)


def test_ppr_related_oracle(ray_session):
    from pdf_extraction_ray.pipelines import linkgraph as lg

    _oracle("ppr_related", lg.ppr_related, lg.ppr_related_sql())


def test_ppr_distributed_path_matches_one_task(ray_session):
    """task_limit=0 forces the per-seed hash_join/groupby rounds; they
    must be value-identical to the one-task fast path."""
    from pdf_extraction_ray.pipelines import linkgraph as lg

    fast = (lg.ppr_related(SF_SMOKE).to_pandas()
            .sort_values(["seed_id", "doc_id"]).reset_index(drop=True))
    dist = (lg.ppr_related(SF_SMOKE, task_limit=0).to_pandas()
            .sort_values(["seed_id", "doc_id"]).reset_index(drop=True))
    assert fast.equals(dist)


def test_ppr_vectors_are_personalized(ray_session):
    """Each seed keeps restart mass at itself, vectors differ across
    seeds, and total mass stays under the restart budget (floor
    divisions only ever lose mass)."""
    from pdf_extraction_ray.pipelines import linkgraph as lg

    out = lg.ppr_related(SF_SMOKE).to_pandas()
    vecs = {s: g.set_index("doc_id")["rank"]
            for s, g in out.groupby("seed_id")}
    assert len(vecs) == len(lg.PPR_SEEDS)
    for s, v in vecs.items():
        assert v.loc[s] > 0            # the seed never loses its mass
        assert v.sum() <= 2_000_000    # bounded by restart + initial
    a, b = (vecs[s] for s in list(vecs)[:2])
    assert not a.equals(b)


# ---------------------------------------------------------------------------
# checkpoint vacuum


def test_checkpoint_vacuum(ray_session, tmp_path):
    """vacuum_store sweeps tmp files, stale claims, orphan bucket data
    and dead manifests — and the store reads back identically after."""
    import os

    import ray.data as rd
    from pdf_extraction_ray.config import PipelineConfig
    from pdf_extraction_ray.pipelines import extraction as E
    from pdf_extraction_ray.sources import corpus, spec
    from pdf_extraction_ray.state import checkpoint as ckpt

    cfg = PipelineConfig(max_bytes=spec.CORPUS_MAX_BYTES)
    pages = corpus.ensure_pages_corpus(SF_SMOKE)
    store = str(tmp_path / "store")
    E.run_extraction(pages, cfg, out_dir=store)
    before = (rd.read_parquet(store).to_pandas()
              .sort_values(["url", "warc_ts"]).reset_index(drop=True))

    # plant crash leftovers
    bdirs = sorted(p for p in os.listdir(store) if p.startswith("bucket="))
    with open(os.path.join(store, bdirs[0], "part-0.parquet.tmp"),
              "w") as f:
        f.write("torn")
    mdir = os.path.join(store, ckpt.MANIFEST_DIR)
    with open(os.path.join(mdir, ".claim-999"), "w") as f:
        f.write("9")
    orphan_dir = os.path.join(store, "bucket=9999")
    os.makedirs(orphan_dir)
    import shutil
    shutil.copy(os.path.join(store, bdirs[0], "part-0.parquet"),
                os.path.join(orphan_dir, "part-0.parquet"))
    # dead manifest: points at a data file that no longer exists
    import json
    with open(os.path.join(mdir, "bucket-9998.json"), "w") as f:
        json.dump({"bucket": 9998, "path": store + "/bucket=9998/x.parquet",
                   "n_rows": 0}, f)

    removed = ckpt.vacuum_store(store)
    assert removed["tmp"] == 1
    assert removed["claims"] == 1
    assert removed["orphan_data"] == 1
    assert removed["dead_manifests"] == 1
    after = (rd.read_parquet(store).to_pandas()
             .sort_values(["url", "warc_ts"]).reset_index(drop=True))
    assert after.equals(before)
    # idempotent
    assert all(v == 0 for v in ckpt.vacuum_store(store).values())


def test_vacuum_survives_path_spelling_changes(ray_session, tmp_path):
    """A vacuum invoked through a DIFFERENT spelling of the store path
    (symlink / relative-vs-absolute — manifests record the writer's
    spelling) must remove nothing: liveness is store-relative
    (bucket, basename), never raw path-string equality."""
    import os

    import ray.data as rd
    from pdf_extraction_ray.config import PipelineConfig
    from pdf_extraction_ray.pipelines import extraction as E
    from pdf_extraction_ray.sources import corpus, spec
    from pdf_extraction_ray.state import checkpoint as ckpt

    cfg = PipelineConfig(max_bytes=spec.CORPUS_MAX_BYTES)
    pages = corpus.ensure_pages_corpus(SF_SMOKE)
    store = str(tmp_path / "store")
    E.run_extraction(pages, cfg, out_dir=store)
    n = rd.read_parquet(store).count()

    alias = str(tmp_path / "alias")
    os.symlink(store, alias)
    removed = ckpt.vacuum_store(alias)
    assert all(v == 0 for v in removed.values()), removed
    assert rd.read_parquet(store).count() == n
    # load_manifests follows the alias spelling too (moved store)
    assert len(ckpt.load_manifests(alias)) == len(
        ckpt.load_manifests(store))


def test_upsert_honors_hash_takedown(ray_session, tmp_path):
    """Banned CONTENT re-entering the delta under a NEW url is swept
    by the upsert's hash re-resolve (a url-only exclusion would
    re-insert it for good)."""
    import pyarrow as pa

    import ray.data as rd
    from pdf_extraction_ray.config import PipelineConfig
    from pdf_extraction_ray.pipelines import extraction as E
    from pdf_extraction_ray.sources import corpus, spec

    cfg = PipelineConfig(max_bytes=spec.CORPUS_MAX_BYTES)
    pages_path = corpus.ensure_pages_corpus(SF_SMOKE)
    store = str(tmp_path / "store")
    E.run_extraction(pages_path, cfg, out_dir=store)
    out = rd.read_parquet(store).to_pandas()
    victim = out[(out.status == "completed")
                 & (out.text_sha256 != "")].iloc[0]
    E.takedown(store, cfg, text_sha256=[victim.text_sha256])
    out1 = rd.read_parquet(store).to_pandas()
    assert victim.text_sha256 not in set(out1.text_sha256)

    # delta: the banned content under a DIFFERENT url — splice the
    # victim's html into another url's page row
    pages = rd.read_parquet(pages_path).to_pandas()
    vrow = pages[pages.url == victim.url].iloc[0]
    other_url = out1.url.iloc[0]
    host = pages[pages.url == other_url].iloc[[0]].copy()
    host["html"] = [vrow.html]
    delta = str(tmp_path / "delta.parquet")
    import pyarrow.parquet as pq
    pq.write_table(pa.Table.from_pandas(host, preserve_index=False),
                   delta)
    E.upsert_extraction(delta, cfg, store)
    out2 = rd.read_parquet(store).to_pandas()
    assert victim.text_sha256 not in set(out2.text_sha256)
