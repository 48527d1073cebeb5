"""Tests: anti-join, ordered per-key lag, top-k per group, near-dup pair
ops, and the JSONL / file-directory sources."""

import json
import os

import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


def test_customers_without_orders_matches_duckdb(ray_session):
    import duckdb
    from pdf_extraction_ray.pipelines.relational import customers_without_orders
    got = customers_without_orders(SF_SMOKE).to_pandas().sort_values(
        "c_custkey").reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW customer AS SELECT * FROM read_parquet('{SF_SMOKE}/customer.parquet')")
    con.sql(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF_SMOKE}/orders.parquet')")
    want = con.sql("""SELECT c_custkey, c_nationkey FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > 400000)
        ORDER BY c_custkey""").df()
    con.close()
    assert len(got) > 0  # threshold chosen so some customers qualify
    assert got.c_custkey.tolist() == want.c_custkey.tolist()


def test_customers_without_orders_bloom_matches_exact(ray_session):
    """The bloom-path query is value-identical to the exact anti-join."""
    from pdf_extraction_ray.pipelines.relational import (
        customers_without_orders, customers_without_orders_bloom)
    exact = customers_without_orders(SF_SMOKE).to_pandas().sort_values(
        "c_custkey").reset_index(drop=True)
    bloom = customers_without_orders_bloom(SF_SMOKE).to_pandas().sort_values(
        "c_custkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(exact, bloom)


def test_prev_value_by_type_lag_semantics(ray_session):
    import ray.data as rd
    from pdf_extraction_ray.pipelines.relational import prev_value_by_type
    out = prev_value_by_type(SF_SMOKE).to_pandas()
    events = pd.read_parquet(os.path.join(SF_SMOKE, "events.parquet"))
    g = events.sort_values(["ts", "event_id"]).groupby("event_type")
    want = events.assign(prev_value=g["value"].shift(1) if False else None)
    # recompute expected with explicit per-type ordering
    expected = {}
    for etype, grp in events.groupby("event_type"):
        grp = grp.sort_values(["ts", "event_id"])
        prev = grp["value"].shift(1)
        for eid, pv in zip(grp.event_id, prev):
            expected[eid] = pv
    for _, r in out.iterrows():
        e = expected[r.event_id]
        if pd.isna(e):
            assert pd.isna(r.prev_value)
        else:
            assert r.prev_value == e


def test_top_orders_per_segment(ray_session):
    from pdf_extraction_ray.pipelines.relational import top_orders_per_segment
    out = top_orders_per_segment(SF_SMOKE).to_pandas()
    orders = pd.read_parquet(os.path.join(SF_SMOKE, "orders.parquet"))
    cust = pd.read_parquet(os.path.join(SF_SMOKE, "customer.parquet"))
    joined = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    for seg, grp in joined.groupby("c_mktsegment"):
        want = grp.sort_values(["o_totalprice", "o_orderkey"],
                               ascending=[False, True]).head(3)
        got = out[out.c_mktsegment == seg].sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True])
        assert got.o_orderkey.tolist() == want.o_orderkey.tolist(), seg


def test_jaccard_pairs_find_planted(ray_session):
    from pdf_extraction_ray.pipelines.analytics import jaccard_pairs
    out = jaccard_pairs(SF_SMOKE).to_pandas()
    planted = out[(out.b - out.a) == 1_000_000]
    assert len(planted) >= 90  # ~100 planted near-copies at sf0.001
    assert (planted.jaccard_pct >= 80).all()


def test_jaccard_pairs_no_driver_broadcast(ray_session, monkeypatch):
    """Pass 2 attaches shingle sets via distributed hash joins: the
    driver never ray.put()s a per-candidate payload (the round-2 version
    broadcast a dict of every candidate's full shingle set)."""
    import ray
    from pdf_extraction_ray.pipelines.analytics import jaccard_pairs
    puts: list = []
    real_put = ray.put
    monkeypatch.setattr(ray, "put",
                        lambda obj, **kw: (puts.append(obj),
                                           real_put(obj, **kw))[1])
    out = jaccard_pairs(SF_SMOKE).to_pandas()
    assert len(out) > 0
    assert not any(isinstance(p, (dict, set, frozenset)) for p in puts)


def test_bloom_build_never_hashes_keys_on_driver(ray_session, monkeypatch):
    """The bloom bit array is OR-merged from per-block partials built in
    tasks; the driver never calls BloomFilter.add (the round-2 build
    hashed every right key on the driver, single-threaded)."""
    import ray.data as rd
    from pdf_extraction_ray.stages import dedup as dd

    def boom(self, key):
        raise AssertionError("driver-side BloomFilter.add during build")

    monkeypatch.setattr(dd.BloomFilter, "add", boom)
    left = rd.from_items([{"k": f"u{i}", "v": i} for i in range(60)])
    right = rd.from_items([{"k": f"u{i}"} for i in range(0, 60, 2)])
    out = dd.bloom_anti_join(left, right, "k").to_pandas()
    assert sorted(out.v.tolist()) == [i for i in range(60) if i % 2 == 1]


def test_embedding_dup_pairs_exact(ray_session):
    from pdf_extraction_ray.pipelines.analytics import embedding_dup_pairs
    out = embedding_dup_pairs(SF_SMOKE).to_pandas()
    # exactly the planted copies: (v, v+100000) for v % 10 == 0
    assert ((out.b - out.a) == 100_000).all()
    assert (out.a % 10 == 0).all()
    emb = pd.read_parquet(os.path.join(SF_SMOKE, "embeddings.parquet"))
    assert len(out) == (emb.vec_id % 10 == 0).sum()


def test_jsonl_roundtrip(ray_session, pages_corpus, tmp_path):
    import ray.data as rd
    from pdf_extraction_ray.sources.readers import (read_pages_jsonl,
                                                    write_pages_jsonl)
    # materialize: limit(50) re-executes per consumer and block order is not
    # deterministic under the streaming executor, so pin the sampled rows once
    src = rd.read_parquet(pages_corpus).limit(50).materialize()
    jdir = str(tmp_path / "jsonl")
    write_pages_jsonl(src, jdir)
    # the corpus plants duplicate urls (dedup fixtures), so url alone is
    # not a total order — include warc_ts to make the comparison stable
    back = read_pages_jsonl(jdir).to_pandas().sort_values(
        ["url", "warc_ts"]).reset_index(drop=True)
    orig = src.to_pandas().sort_values(
        ["url", "warc_ts"]).reset_index(drop=True)
    assert back.url.tolist() == orig.url.tolist()
    assert (back.html == orig.html).all()
    assert back.warc_ts.tolist() == orig.warc_ts.tolist()


def test_file_directory_source(ray_session, tmp_path):
    from pdf_extraction_ray.sources.readers import read_pages_files
    d = tmp_path / "docs"
    d.mkdir()
    (d / "a.html").write_bytes(b"<html><body><article><p>doc a</p></article></body></html>")
    (d / "b.html").write_bytes(b"<html><body><article><p>doc b</p></article></body></html>")
    pages = read_pages_files(str(d)).to_pandas().sort_values("url")
    assert pages.url.tolist() == ["file://a.html", "file://b.html"]
    from pdf_extraction_ray.functions.html_extract import extract_html
    assert extract_html(pages.html.iloc[0]).text == "doc a"


def test_bloom_filter_membership():
    from pdf_extraction_ray.stages.dedup import BloomFilter
    bf = BloomFilter.sized_for(1000, fp_rate=0.01)
    for i in range(1000):
        bf.add(f"key-{i}")
    assert all(f"key-{i}" in bf for i in range(1000))  # no false negatives
    fp = sum(1 for i in range(1000, 11000) if f"key-{i}" in bf)
    assert fp / 10000 < 0.05  # false-positive rate near the design point


def test_bloom_anti_join_matches_exact(ray_session):
    import ray.data as rd
    from pdf_extraction_ray.stages.dedup import bloom_anti_join
    left = rd.from_items([{"k": f"u{i}", "v": i} for i in range(200)])
    right = rd.from_items([{"k": f"u{i}"} for i in range(0, 200, 3)])
    out = bloom_anti_join(left, right, "k").to_pandas()
    assert sorted(out.v.tolist()) == [i for i in range(200) if i % 3 != 0]


def test_bloom_anti_join_broadcast_stays_small(ray_session):
    """The wide pass ships only the bloom (~10 bits/key) plus the overlap
    set — never the full right key strings (the round-1 defect)."""
    import ray.data as rd
    from pdf_extraction_ray.stages.dedup import bloom_anti_join
    n = 5000
    overlap = 50
    left = rd.from_items(
        [{"k": f"left-key-with-a-long-suffix-{i:06d}", "v": i}
         for i in range(n)]
        + [{"k": f"right-key-with-a-long-suffix-{i:06d}", "v": n + i}
           for i in range(overlap)])
    right = rd.from_items(
        [{"k": f"right-key-with-a-long-suffix-{i:06d}"} for i in range(n)])
    stats: dict = {}
    out = bloom_anti_join(left, right, "k", stats=stats).to_pandas()
    assert len(out) == n  # the 50 overlap rows are dropped, exactly
    key_bytes = n * len("right-key-with-a-long-suffix-000000")
    assert stats["bloom_bytes"] < key_bytes / 10
    assert stats["n_present"] == overlap
    # maybe-set = true overlap + false positives near the design rate
    assert stats["n_maybe"] <= overlap + int(0.05 * n)


def test_warc_roundtrip(ray_session, pages_corpus, tmp_path):
    import ray.data as rd
    from pdf_extraction_ray.sources.readers import (read_pages_warc,
                                                    write_pages_warc)
    src = rd.read_parquet(pages_corpus).limit(50).materialize()
    wdir = str(tmp_path / "warc")
    n_files = write_pages_warc(src, wdir)
    assert n_files >= 1
    back = read_pages_warc(wdir).to_pandas().sort_values(
        ["url", "warc_ts"]).reset_index(drop=True)
    orig = src.to_pandas().sort_values(
        ["url", "warc_ts"]).reset_index(drop=True)
    assert back.url.tolist() == orig.url.tolist()
    assert (back.html == orig.html).all()
    assert back.warc_ts.tolist() == orig.warc_ts.tolist()
    assert back.lang.tolist() == orig.lang.tolist()
    # fallback text rides the paired WARC conversion record (WET-style)
    assert back.text.tolist() == orig.text.tolist()


def test_warc_framing_survives_crlf_payload(ray_session, tmp_path):
    """Content-Length framing, not delimiter scanning: a payload
    containing CRLFCRLF (and WARC-looking bytes) must parse intact."""
    from datetime import datetime

    import ray.data as rd
    from pdf_extraction_ray.sources.readers import (read_pages_warc,
                                                    write_pages_warc)
    evil = b"a\r\n\r\nWARC/1.0\r\nContent-Length: 9\r\n\r\nb"
    src = rd.from_items([{
        "url": "http://x.test/evil", "warc_ts": datetime(2020, 1, 2, 3, 4, 5),
        "html": evil, "text": "", "lang": "en"}])
    wdir = str(tmp_path / "warc2")
    write_pages_warc(src, wdir)
    back = read_pages_warc(wdir).to_pandas()
    assert len(back) == 1
    assert back.html[0] == evil
    assert back.lang[0] == "en"


def test_warc_source_feeds_extraction(ray_session, pages_corpus, tmp_path):
    """The WARC source composes with the flagship pipeline: extraction
    over WARC-ingested pages is byte-identical to extraction over the
    same pages read from parquet."""
    import ray.data as rd
    from pdf_extraction_ray.config import PipelineConfig
    from pdf_extraction_ray.pipelines.extraction import run_extraction
    from pdf_extraction_ray.sources import spec
    from pdf_extraction_ray.sources.readers import (read_pages_warc,
                                                    write_pages_warc)
    src = rd.read_parquet(pages_corpus).limit(60).materialize()
    wdir = str(tmp_path / "warc3")
    write_pages_warc(src, wdir)
    cfg = PipelineConfig(max_bytes=spec.CORPUS_MAX_BYTES)
    via_warc = run_extraction(read_pages_warc(wdir), cfg).to_pandas()
    via_pq = run_extraction(src, cfg).to_pandas()
    a = via_warc.sort_values("url").reset_index(drop=True)
    b = via_pq.sort_values("url").reset_index(drop=True)
    assert a.url.tolist() == b.url.tolist()
    assert (a.extracted_text == b.extracted_text).all()
    assert (a.status == b.status).all()


def test_warc_gz_roundtrip(ray_session, pages_corpus, tmp_path):
    """.warc.gz shards (per-record gzip members, the CommonCrawl
    convention) round-trip identically to plain .warc."""
    import ray.data as rd
    from pdf_extraction_ray.sources.readers import (read_pages_warc,
                                                    write_pages_warc)
    src = rd.read_parquet(pages_corpus).limit(40).materialize()
    wdir = str(tmp_path / "warcgz")
    write_pages_warc(src, wdir, compress=True)
    import glob as g
    assert all(p.endswith(".warc.gz") for p in g.glob(wdir + "/*"))
    back = read_pages_warc(wdir).to_pandas().sort_values(
        ["url", "warc_ts"]).reset_index(drop=True)
    orig = src.to_pandas().sort_values(
        ["url", "warc_ts"]).reset_index(drop=True)
    assert back.url.tolist() == orig.url.tolist()
    assert (back.html == orig.html).all()
    assert back.text.tolist() == orig.text.tolist()


def test_warc_foreign_records_and_orphan_conversion(ray_session, tmp_path):
    """Foreign shards parse safely: warcinfo/request records are
    skipped, and an orphan conversion record at the START of a shard
    never overwrites the previous shard's last page text."""
    from datetime import datetime

    import ray.data as rd
    from pdf_extraction_ray.sources.readers import (_warc_record,
                                                    read_pages_warc,
                                                    write_pages_warc)
    wdir = tmp_path / "warc_foreign"
    wdir.mkdir()
    ts = datetime(2020, 1, 2, 3, 4, 5)
    # shard A: a normal response+conversion pair (via the real writer)
    src = rd.from_items([{
        "url": "http://a.test/1", "warc_ts": ts,
        "html": b"payload-a", "text": "text-a", "lang": "en"}])
    write_pages_warc(src, str(wdir))
    # shard B: warcinfo (no Target-URI), an ORPHAN conversion, a request,
    # then one genuine response — hand-built foreign shard
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            b"Content-Length: 4\r\n\r\ninfo\r\n\r\n")
    orphan = _warc_record("conversion", "http://b.test/x", ts,
                          b"SHOULD-NOT-LAND-ANYWHERE", "xx")
    req = (b"WARC/1.0\r\nWARC-Type: request\r\n"
           b"WARC-Target-URI: http://b.test/2\r\n"
           b"WARC-Date: 2020-01-02T03:04:05.000000Z\r\n"
           b"Content-Length: 3\r\n\r\nGET\r\n\r\n")
    resp = _warc_record("response", "http://b.test/2", ts, b"payload-b", "de")
    (wdir / "zz-foreign.warc").write_bytes(info + orphan + req + resp)
    out = read_pages_warc(str(wdir)).to_pandas().set_index("url")
    assert len(out) == 2
    assert out.loc["http://a.test/1"].text == "text-a"   # not clobbered
    assert out.loc["http://b.test/2"].html == b"payload-b"
    assert out.loc["http://b.test/2"].text == ""          # orphan dropped
    assert out.loc["http://b.test/2"].lang == "de"


def test_warc_subsecond_timestamp_roundtrip(ray_session, tmp_path):
    """timestamp[us] values with sub-second components survive the
    WARC-Date header (WARC/1.1 fractional form)."""
    from datetime import datetime

    import ray.data as rd
    from pdf_extraction_ray.sources.readers import (read_pages_warc,
                                                    write_pages_warc)
    ts = datetime(2020, 1, 2, 3, 4, 5, 678901)
    src = rd.from_items([{
        "url": "http://s.test/1", "warc_ts": ts,
        "html": b"x", "text": "t", "lang": "en"}])
    wdir = str(tmp_path / "warc_us")
    write_pages_warc(src, wdir)
    back = read_pages_warc(wdir).to_pandas()
    assert back.warc_ts[0].to_pydatetime() == ts


@pytest.mark.parametrize("compress", [False, True])
def test_warc_cdx_point_fetch(ray_session, pages_corpus, tmp_path, compress):
    """The .cdx sidecar's (path, offset, length) coordinates fetch any
    single page unit byte-identically to the full shard read — for both
    plain and per-member-gzip shards."""
    import ray.data as rd
    from pdf_extraction_ray.sources.readers import (fetch_warc_record,
                                                    read_pages_warc,
                                                    warc_cdx_index,
                                                    write_pages_warc)
    src = rd.read_parquet(pages_corpus).limit(30).materialize()
    wdir = str(tmp_path / f"warc_cdx_{compress}")
    write_pages_warc(src, wdir, compress=compress, cdx=True)
    idx = warc_cdx_index(wdir).to_pandas()
    full = read_pages_warc(wdir).to_pandas().set_index(["url", "warc_ts"])
    assert len(idx) == len(full) == 30
    # point-fetch every 7th entry and compare against the scan read
    for _, e in idx.iloc[::7].iterrows():
        row = fetch_warc_record(e.path, int(e.offset), int(e.length))
        want = full.loc[(e.url, e.warc_ts)]
        assert row["url"] == e.url
        assert row["html"] == want.html
        assert row["text"] == want.text
        assert row["lang"] == want.lang


@pytest.mark.parametrize("compress", [False, True])
def test_warc_select_bulk_fetch(ray_session, pages_corpus, tmp_path,
                                compress):
    """read_pages_warc_select reads ONLY the requested urls' byte ranges
    (one task per touched shard) and matches the full-scan read
    byte-for-byte; urls absent from the corpus are silently skipped."""
    import ray.data as rd
    from pdf_extraction_ray.sources.readers import (read_pages_warc,
                                                    read_pages_warc_select,
                                                    write_pages_warc)
    src = rd.read_parquet(pages_corpus).limit(40).materialize()
    wdir = str(tmp_path / f"warc_sel_{compress}")
    write_pages_warc(src, wdir, compress=compress, cdx=True)
    full = read_pages_warc(wdir).to_pandas()
    want_urls = sorted(full.url)[::3] + ["http://nowhere.test/ghost"]
    got = (read_pages_warc_select(wdir, want_urls)
           .to_pandas().sort_values("url").reset_index(drop=True))
    exp = (full[full.url.isin(want_urls)]
           .sort_values("url").reset_index(drop=True))
    assert list(got.url) == list(exp.url) and len(got) == len(full) // 3 + (
        1 if len(full) % 3 else 0)
    for c in ("warc_ts", "html", "text", "lang"):
        assert (got[c] == exp[c]).all(), c
