"""Checkpoint/resume tests (FIXTURES.md F4): kill-and-rerun must not
recompute finished buckets and must produce byte-identical final output."""

import json
import os
import shutil

import pytest

from pdf_extraction_ray.config import PipelineConfig
from pdf_extraction_ray.sources import spec
from pdf_extraction_ray.state import checkpoint as ckpt

CFG = PipelineConfig(max_bytes=spec.CORPUS_MAX_BYTES, n_buckets=16,
                     extract_concurrency=(1, 2),
                     split_page_threshold=spec.CORPUS_SPLIT_PAGE_THRESHOLD)


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "out")


def _run(pages, out_dir):
    from pdf_extraction_ray.pipelines.extraction import run_extraction
    ds = run_extraction(pages, CFG, out_dir=out_dir)
    return ds.to_pandas().sort_values("url").reset_index(drop=True)


def test_checkpointed_run_writes_manifests(ray_session, pages_corpus, out_dir):
    df = _run(pages_corpus, out_dir)
    manifests = ckpt.load_manifests(out_dir)
    assert len(manifests) == CFG.n_buckets
    assert sum(m["n_rows"] for m in manifests.values()) == len(df)
    summary = json.load(open(os.path.join(out_dir, "_manifests", "_run.json")))
    assert summary["n_rows"] == len(df)
    assert summary["docs_per_s"] > 0


def test_resume_skips_finished_buckets(ray_session, pages_corpus, out_dir):
    df1 = _run(pages_corpus, out_dir)
    manifests = ckpt.load_manifests(out_dir)
    victims = sorted(manifests)[:4]
    survivors = {b: manifests[b]["fingerprint"] for b in manifests if b not in victims}
    survivor_mtimes = {b: os.path.getmtime(ckpt.manifest_path(out_dir, b))
                       for b in survivors}
    for b in victims:
        os.remove(ckpt.manifest_path(out_dir, b))
        shutil.rmtree(ckpt.bucket_dir(out_dir, b))

    df2 = _run(pages_corpus, out_dir)
    assert df1.equals(df2)
    m2 = ckpt.load_manifests(out_dir)
    assert set(m2) == set(manifests)
    for b, fp in survivors.items():
        assert m2[b]["fingerprint"] == fp
        # untouched buckets were not rewritten at all
        assert os.path.getmtime(ckpt.manifest_path(out_dir, b)) == survivor_mtimes[b]


def test_verify_resume_invalidates_changed_input(ray_session, tmp_path, out_dir):
    """Changed input must not silently keep stale bucket outputs when the
    caller opts into fingerprint verification (resume otherwise assumes
    byte-identical input)."""
    from datetime import datetime, timedelta

    import pandas as pd

    from pdf_extraction_ray.pipelines.extraction import run_extraction

    def write_pages(dirname, flip):
        rows = []
        for i in range(30):
            body = f"document {i} body {'CHANGED' if flip and i == 0 else 'text'}"
            rows.append({
                "url": f"https://v.example/d{i}",
                "warc_ts": datetime(2021, 1, 1) + timedelta(seconds=i),
                "html": body.encode(), "text": body, "lang": "en",
            })
        path = str(tmp_path / dirname)
        os.makedirs(path)
        pd.DataFrame(rows).to_parquet(os.path.join(path, "p.parquet"))
        return path

    cfg = PipelineConfig(n_buckets=4, extract_concurrency=(1, 2))
    pages_a = write_pages("pages_a", flip=False)
    pages_b = write_pages("pages_b", flip=True)  # same urls/ts, one text change

    run_extraction(pages_a, cfg, out_dir=out_dir)
    before = ckpt.load_manifests(out_dir)
    assert len(before) == 4

    # text-only change leaves the (url, ts) fingerprint identical — the
    # documented limit of the cheap metadata check
    exp_same = ckpt.expected_fingerprints(pages_b, cfg.n_buckets)
    assert all(exp_same[b] == int(m["fingerprint"]) for b, m in before.items())

    # a timestamp change flips its bucket's fingerprint and only that
    # bucket is recomputed on a verify_resume rerun
    df = pd.read_parquet(os.path.join(pages_b, "p.parquet"))
    df.loc[0, "warc_ts"] = df.loc[0, "warc_ts"] + pd.Timedelta(seconds=999)
    df.to_parquet(os.path.join(pages_b, "p.parquet"))
    from pdf_extraction_ray.functions.hashing import url_bucket
    changed_bucket = url_bucket("https://v.example/d0", cfg.n_buckets)

    done = ckpt.load_manifests(out_dir)
    stale = ckpt.invalidate_stale(
        out_dir, done, ckpt.expected_fingerprints(pages_b, cfg.n_buckets))
    assert stale == {changed_bucket}
    assert changed_bucket not in ckpt.load_manifests(out_dir)

    out = run_extraction(pages_b, cfg, out_dir=out_dir,
                         verify_resume=True).to_pandas()
    after = ckpt.load_manifests(out_dir)
    assert len(after) == 4
    row = out[out.url == "https://v.example/d0"].iloc[0]
    assert row.warc_ts == df.loc[0, "warc_ts"]


def test_manifest_without_data_file_is_invalid(ray_session, pages_corpus, out_dir):
    _run(pages_corpus, out_dir)
    manifests = ckpt.load_manifests(out_dir)
    b = sorted(manifests)[0]
    os.remove(manifests[b]["path"])  # data vanished; manifest must not count
    assert b not in ckpt.load_manifests(out_dir)


def test_resume_hash_mode_clears_stale_claims(ray_session, pages_corpus,
                                              out_dir):
    """Kill-and-rerun in hash-shuffle mode: stale straddle-guard claims
    for unfinished buckets must not block re-extraction, finished
    buckets stay untouched, output equals a clean run."""
    import pandas as pd
    from pdf_extraction_ray.pipelines.extraction import run_extraction

    hcfg = PipelineConfig(max_bytes=spec.CORPUS_MAX_BYTES, n_buckets=16,
                          split_page_threshold=spec.CORPUS_SPLIT_PAGE_THRESHOLD,
                          finalize_shuffle="hash", finalize_num_partitions=4)

    def run():
        return (run_extraction(pages_corpus, hcfg, out_dir=out_dir)
                .to_pandas().sort_values("url").reset_index(drop=True))

    df1 = run()
    manifests = ckpt.load_manifests(out_dir)
    assert len(manifests) == hcfg.n_buckets
    victims = sorted(manifests)[:3]
    for b in victims:
        os.remove(ckpt.manifest_path(out_dir, b))
        shutil.rmtree(ckpt.bucket_dir(out_dir, b))
        # the claim file survives the simulated kill — resume must drop it
        assert os.path.exists(os.path.join(out_dir, ckpt.MANIFEST_DIR,
                                           f".claim-{b:05d}"))
    df2 = run()
    assert df1.drop(columns=["spans", "elements"]).equals(
        df2.drop(columns=["spans", "elements"]))
    assert set(ckpt.load_manifests(out_dir)) == set(manifests)


def test_verify_resume_dedup_false_keeps_buckets(ray_session, pages_corpus,
                                                 out_dir):
    """A dedup=False run writes every row; the verify_resume audit must
    fingerprint every row too, or it would invalidate all buckets of a
    valid run forever."""
    from pdf_extraction_ray.pipelines.extraction import run_extraction
    run_extraction(pages_corpus, CFG, out_dir=out_dir, dedup=False)
    m1 = ckpt.load_manifests(out_dir)
    mtimes = {b: os.path.getmtime(ckpt.manifest_path(out_dir, b)) for b in m1}
    run_extraction(pages_corpus, CFG, out_dir=out_dir, dedup=False,
                   verify_resume=True)
    m2 = ckpt.load_manifests(out_dir)
    assert set(m2) == set(m1)
    for b in m1:  # nothing invalidated, nothing rewritten
        assert os.path.getmtime(ckpt.manifest_path(out_dir, b)) == mtimes[b]


def test_backfill_lineage_targeted_update(ray_session, pages_corpus, out_dir):
    """J5 analog: a re-submission's (url, source_ref) mapping backfills
    the missing lineage column on completed rows — touching ONLY the
    buckets containing referenced urls, never re-extracting, and never
    overwriting an already-set ref (idempotence)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    df = _run(pages_corpus, out_dir)
    urls = sorted(df["url"])[:6] + ["https://nowhere.example/missing"]
    refs = rd.from_items([{"url": u, "source_ref": f"scrape-{i:03d}"}
                          for i, u in enumerate(urls)])
    mtimes = {b: os.path.getmtime(
        os.path.join(ckpt.bucket_dir(out_dir, b), "part-0.parquet"))
        for b in ckpt.load_manifests(out_dir)}

    out = ckpt.backfill_lineage(out_dir, refs, CFG.n_buckets)
    assert out["updated"] == 6
    assert out["unknown_url"] == 1
    assert out["already_set"] == 0

    from pdf_extraction_ray.functions.hashing import url_bucket
    touched = {url_bucket(u, CFG.n_buckets) for u in urls[:6]}
    assert out["buckets_touched"] == len(touched)
    for b, old in mtimes.items():  # only affected buckets rewritten
        now = os.path.getmtime(
            os.path.join(ckpt.bucket_dir(out_dir, b), "part-0.parquet"))
        assert (now != old) == (b in touched)

    # values landed; untouched rows carry null
    got = {}
    for b in touched:
        t = pq.read_table(os.path.join(ckpt.bucket_dir(out_dir, b),
                                       "part-0.parquet"))
        for u, r in zip(t["url"].to_pylist(), t["source_ref"].to_pylist()):
            got[u] = r
    for i, u in enumerate(urls[:6]):
        assert got[u] == f"scrape-{i:03d}"
    assert sum(1 for r in got.values() if r is None) > 0

    # fingerprints untouched: a verify_resume pass keeps every bucket
    m2 = ckpt.load_manifests(out_dir)
    exp = ckpt.expected_fingerprints(pages_corpus, CFG.n_buckets)
    assert ckpt.invalidate_stale(out_dir, m2, exp) == set()

    # second application is a no-op (already_set, no rewrite)
    mtimes2 = {b: os.path.getmtime(
        os.path.join(ckpt.bucket_dir(out_dir, b), "part-0.parquet"))
        for b in touched}
    out2 = ckpt.backfill_lineage(out_dir, refs, CFG.n_buckets)
    assert out2["updated"] == 0 and out2["already_set"] == 6
    for b in touched:
        assert os.path.getmtime(
            os.path.join(ckpt.bucket_dir(out_dir, b),
                         "part-0.parquet")) == mtimes2[b]

    # whole-output read survives the schema divergence: untouched
    # buckets lack source_ref on disk, read_output pads typed nulls so
    # the column is never dropped or mistyped
    full = ckpt.read_output(out_dir).to_pandas()
    assert "source_ref" in full.columns
    assert len(full) == len(df)
    by_url = full.set_index("url")["source_ref"]
    for i, u in enumerate(urls[:6]):
        assert by_url[u] == f"scrape-{i:03d}"
    assert by_url.isna().sum() == len(full) - 6


def test_run_completion_notification(ray_session, pages_corpus, out_dir):
    """cfg.notify_url set -> one signed run-completion envelope lands in
    the outbox with the run summary as payload (SURVEY S10 analog)."""
    import dataclasses
    import hashlib
    import hmac as hmac_mod

    from pdf_extraction_ray.pipelines.extraction import run_extraction

    cfg = dataclasses.replace(CFG, notify_url="https://example.com/done",
                              notify_key="runkey")
    run_extraction(pages_corpus, cfg, out_dir=out_dir)
    outbox = os.path.join(out_dir, "_outbox")
    files = [f for f in os.listdir(outbox) if f.endswith(".json")]
    assert len(files) == 1
    env = json.load(open(os.path.join(outbox, files[0])))
    assert env["status"] == "delivered"
    assert env["payload"]["run"] == "extract"
    assert env["payload"]["n_rows"] > 0
    canon = json.dumps(env["payload"], sort_keys=True,
                       separators=(",", ":"))
    want = hmac_mod.new(b"runkey", canon.encode(),
                        hashlib.sha256).hexdigest()
    assert env["signature"] == want


from tests.conftest import SF_SMOKE  # noqa: E402


def test_refresh_extraction_matches_clean_run(ray_session, pages_corpus,
                                              tmp_path):
    """Incremental snapshot refresh: drop removed/changed urls,
    re-extract added/changed from the new snapshot only — final output
    must equal a from-scratch extraction of the new snapshot."""
    import pandas as pd

    import ray.data as rd

    from pdf_extraction_ray.config import PipelineConfig
    from pdf_extraction_ray.pipelines.analytics import snapshot_b_pages
    from pdf_extraction_ray.pipelines.extraction import (refresh_extraction,
                                                         run_extraction)
    from pdf_extraction_ray.sources import spec

    cfg = PipelineConfig(max_bytes=spec.CORPUS_MAX_BYTES,
                         split_page_threshold=spec.CORPUS_SPLIT_PAGE_THRESHOLD)
    out = str(tmp_path / "out")
    run_extraction(pages_corpus, cfg, out_dir=out)

    bdir = str(tmp_path / "snapB")
    snapshot_b_pages(SF_SMOKE).write_parquet(bdir)

    summary = refresh_extraction(pages_corpus, bdir, out, cfg)
    assert summary["n_deferred"] == 0
    for k in ("n_added", "n_removed", "n_changed", "n_unchanged"):
        assert summary[k] > 0, summary
    assert summary["n_dropped"] >= summary["n_removed"]
    assert summary["n_reextracted"] >= summary["n_added"]

    clean = str(tmp_path / "clean")
    run_extraction(bdir, cfg, out_dir=clean)

    def frame(path):
        df = rd.read_parquet(path).to_pandas()
        cols = sorted(c for c in df.columns
                      if not df[c].map(lambda v: isinstance(v, (list,)))
                                   .any())
        return (df[cols].sort_values("url").reset_index(drop=True))

    got, want = frame(out), frame(clean)
    pd.testing.assert_frame_equal(got, want)


def test_refresh_extraction_idempotent(ray_session, pages_corpus, tmp_path):
    """A second refresh over the same snapshot pair is a no-op on the
    output (crash-retry safety)."""
    import ray.data as rd

    from pdf_extraction_ray.config import PipelineConfig
    from pdf_extraction_ray.pipelines.analytics import snapshot_b_pages
    from pdf_extraction_ray.pipelines.extraction import (refresh_extraction,
                                                         run_extraction)
    from pdf_extraction_ray.sources import spec

    cfg = PipelineConfig(max_bytes=spec.CORPUS_MAX_BYTES,
                         split_page_threshold=spec.CORPUS_SPLIT_PAGE_THRESHOLD)
    out = str(tmp_path / "out")
    run_extraction(pages_corpus, cfg, out_dir=out)
    bdir = str(tmp_path / "snapB")
    snapshot_b_pages(SF_SMOKE).write_parquet(bdir)

    refresh_extraction(pages_corpus, bdir, out, cfg)
    before = (rd.read_parquet(out).to_pandas()[["url", "status", "n_chars"]]
              .sort_values("url").reset_index(drop=True))
    s2 = refresh_extraction(pages_corpus, bdir, out, cfg)
    after = (rd.read_parquet(out).to_pandas()[["url", "status", "n_chars"]]
             .sort_values("url").reset_index(drop=True))
    assert before.equals(after)
    # second pass: removed urls are already gone, so only the changed
    # urls (still present, now with their new content) re-drop before
    # re-merging identical rows
    assert s2["n_dropped"] == s2["n_changed"]


def test_pages_delta_tables_random_snapshots(ray_session):
    """The generic two-table delta core vs a pure-Python reference over
    randomized (seeded) snapshot pairs: arbitrary adds/removes/edits and
    re-crawl dup rows on both sides."""
    import random
    from datetime import datetime, timedelta

    import pyarrow as pa

    import ray.data as rd

    from pdf_extraction_ray.pipelines.analytics import pages_delta_tables
    from pdf_extraction_ray.sources.corpus import PAGES_SCHEMA

    rng = random.Random(1234)
    base = datetime(2021, 1, 1)

    def row(i, payload, text, bump=0):
        return {"url": f"https://t.x/p/{i}", "warc_ts": base + timedelta(
                    seconds=bump), "html": payload, "text": text,
                "lang": "en"}

    for trial in range(5):
        urls = list(range(40))
        a_rows, b_rows, expect = [], [], {}
        for i in urls:
            pay = f"payload-{trial}-{i}".encode()
            txt = f"text-{i}"
            in_a = rng.random() < 0.85
            in_b = rng.random() < 0.85
            edit = rng.random() < 0.4
            if in_a:
                a_rows.append(row(i, pay, txt))
                if rng.random() < 0.2:      # re-crawl dup in A
                    a_rows.append(row(i, pay, txt, bump=3600))
            if in_b:
                if edit and rng.random() < 0.5:
                    b_rows.append(row(i, pay + b"!", txt))       # byte edit
                elif edit:
                    b_rows.append(row(i, pay, txt + " v2"))      # text edit
                else:
                    b_rows.append(row(i, pay, txt))
            if in_a and in_b:
                expect[f"https://t.x/p/{i}"] = ("changed" if edit
                                                else "unchanged")
            elif in_a:
                expect[f"https://t.x/p/{i}"] = "removed"
            elif in_b:
                expect[f"https://t.x/p/{i}"] = "added"

        a = rd.from_arrow(pa.Table.from_pylist(a_rows, schema=PAGES_SCHEMA))
        b = rd.from_arrow(pa.Table.from_pylist(b_rows, schema=PAGES_SCHEMA))
        df = pages_delta_tables(a, b).to_pandas()
        got = dict(zip(df.url, df.status))
        assert got == expect, (trial, {k: (got.get(k), v)
                                       for k, v in expect.items()
                                       if got.get(k) != v})


# ---------------------------------------------------------------------------
# takedown (compliance removal) — drop + registry + resurrection guards


def test_takedown_by_url_is_durable_and_idempotent(ray_session,
                                                   pages_corpus, out_dir):
    """takedown drops the urls' rows, registers the request, and NO
    later pass resurrects them: plain resume, bucket-invalidating
    verify_resume, and a re-applied identical request all keep the
    output equal to the clean run minus the removed urls."""
    from pdf_extraction_ray.pipelines.extraction import (run_extraction,
                                                         takedown)
    clean = _run(pages_corpus, out_dir)
    victims = sorted(clean.url)[::97][:5]
    assert len(victims) == 5

    s1 = takedown(out_dir, CFG, urls=victims, reason="gdpr-erasure")
    assert s1["n_requested"] == 5 and s1["n_dropped"] == 5
    assert os.path.exists(s1["registry_path"])
    after = _run(pages_corpus, out_dir)        # plain resume
    assert set(after.url) == set(clean.url) - set(victims)

    # identical re-request: byte-identical registry file, zero drops
    s2 = takedown(out_dir, CFG, urls=victims, reason="gdpr-erasure")
    assert s2["n_dropped"] == 0
    assert s2["registry_path"] == s1["registry_path"]

    # verify_resume: the takedown-aware expectation keeps the touched
    # buckets valid (no recompute, no resurrection) ...
    df3 = run_extraction(pages_corpus, CFG, out_dir=out_dir,
                         verify_resume=True).to_pandas()
    assert set(df3.url) == set(clean.url) - set(victims)
    # ... and even a FORCED invalidation (delete the victim buckets'
    # manifests so they recompute from the raw input) re-extracts the
    # bucket WITHOUT the banned urls
    from pdf_extraction_ray.functions.hashing import url_bucket
    for b in {url_bucket(u, CFG.n_buckets) for u in victims}:
        os.remove(ckpt.manifest_path(out_dir, b))
    df4 = run_extraction(pages_corpus, CFG, out_dir=out_dir).to_pandas()
    assert set(df4.url) == set(clean.url) - set(victims)


def test_takedown_by_content_hash(ray_session, pages_corpus, out_dir):
    """A hash-identified notice removes EVERY row carrying the hash."""
    from pdf_extraction_ray.pipelines.extraction import takedown
    clean = _run(pages_corpus, out_dir)
    nonempty = clean[clean.text_sha256 != ""]
    h = nonempty.text_sha256.mode().iloc[0]
    n_with = int((clean.text_sha256 == h).sum())
    s = takedown(out_dir, CFG, text_sha256=[h], reason="dmca")
    assert s["n_dropped"] == n_with >= 1
    after = _run(pages_corpus, out_dir)
    assert (after.text_sha256 != h).all()
    assert len(after) == len(clean) - n_with


def test_takedown_survives_snapshot_refresh(ray_session, pages_corpus,
                                            out_dir, tmp_path):
    """A taken-down url whose content CHANGES in the next crawl snapshot
    stays out: the refresh drops its stale row (a no-op) and must NOT
    re-extract it from the new snapshot."""
    import pyarrow.parquet as pq

    from pdf_extraction_ray.pipelines.extraction import (refresh_extraction,
                                                         takedown)
    clean = _run(pages_corpus, out_dir)
    victim = sorted(clean.url)[7]
    takedown(out_dir, CFG, urls=[victim], reason="optout")

    # snapshot B: the victim's bytes change (prepend keeps tiny-HTML
    # kinds visible), everything else identical
    old = pq.read_table(pages_corpus)
    rows = old.to_pylist()
    for r in rows:
        if r["url"] == victim:
            r["html"] = b"<!-- recrawled -->" + (r["html"] or b"")
    import pyarrow as pa
    bdir = str(tmp_path / "snapB")
    pq.write_table(pa.Table.from_pylist(rows, schema=old.schema),
                   os.path.join(os.makedirs(bdir, exist_ok=True) or bdir,
                                "pages.parquet"))

    summary = refresh_extraction(pages_corpus, bdir, out_dir, CFG)
    assert summary["n_changed"] == 1 and summary["n_reextracted"] == 0
    import ray.data as rd
    assert victim not in set(rd.read_parquet(out_dir).to_pandas().url)


def test_takedown_crash_window_heals_on_plain_resume(ray_session,
                                                     pages_corpus, out_dir):
    """A takedown killed between its registry write and its drops (the
    crash window) self-heals on the next PLAIN resume: completed buckets
    are re-checked against the registry up front, not skipped."""
    clean = _run(pages_corpus, out_dir)
    victims = sorted(clean.url)[10:13]
    # simulate the crash: registry lands, drops never ran — the victim
    # rows are still physically present in their (completed) buckets
    ckpt.record_takedown(out_dir, victims, "crash-sim")
    import ray.data as rd
    assert set(victims) <= set(rd.read_parquet(out_dir).to_pandas().url)
    after = _run(pages_corpus, out_dir)      # plain resume, no verify
    assert set(after.url) == set(clean.url) - set(victims)


def test_takedown_registry_corruption_fails_loud(ray_session,
                                                 pages_corpus, out_dir):
    """A corrupt registry file raises instead of being silently skipped
    (ignoring it would resurrect legally removed rows)."""
    import pytest as _pytest

    from pdf_extraction_ray.pipelines.extraction import takedown
    clean = _run(pages_corpus, out_dir)
    s = takedown(out_dir, CFG, urls=[sorted(clean.url)[0]])
    with open(s["registry_path"], "w") as f:
        f.write("{ not json")
    with _pytest.raises(ValueError, match="corrupt takedown registry"):
        ckpt.load_takedowns(out_dir)
    with _pytest.raises(ValueError, match="corrupt takedown registry"):
        _run(pages_corpus, out_dir)


def test_takedown_hash_blocks_reentry_under_new_url(ray_session,
                                                    pages_corpus, out_dir,
                                                    tmp_path):
    """A hash-identified takedown persists the HASH: when a snapshot
    refresh admits a NEW url whose extracted text carries the banned
    hash, the pass-end sweep removes it before the refresh reports
    complete."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from pdf_extraction_ray.pipelines.extraction import (refresh_extraction,
                                                         takedown)
    clean = _run(pages_corpus, out_dir)
    donor = clean[clean.text_sha256 != ""].iloc[3]
    s = takedown(out_dir, CFG, text_sha256=[donor.text_sha256],
                 reason="dmca")
    assert s["n_dropped"] >= 1

    # snapshot B = A + one NEW url whose bytes are the donor's payload
    # (same extracted text -> same banned text_sha256)
    old = pq.read_table(pages_corpus)
    rows = old.to_pylist()
    donor_row = next(r for r in rows if r["url"] == donor.url)
    mirror = dict(donor_row,
                  url="https://corpus.example/mirror/stolen-copy",
                  warc_ts=donor_row["warc_ts"])
    bdir = str(tmp_path / "snapB")
    os.makedirs(bdir, exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows + [mirror], schema=old.schema),
                   os.path.join(bdir, "pages.parquet"))

    summary = refresh_extraction(pages_corpus, bdir, out_dir, CFG)
    assert summary["n_added"] == 1 and summary["n_hash_swept"] == 1
    out = rd.read_parquet(out_dir).to_pandas()
    assert "https://corpus.example/mirror/stolen-copy" not in set(out.url)
    assert (out.text_sha256 != donor.text_sha256).all()


def test_takedown_derives_bucket_count_from_run_stamp(ray_session,
                                                      pages_corpus,
                                                      out_dir):
    """cfg=None: takedown reads n_buckets from the run's _run.json stamp
    (CFG here uses a NON-default 16, so a DEFAULT_CONFIG fallback would
    open the wrong buckets and drop nothing)."""
    import json as _json

    from pdf_extraction_ray.config import DEFAULT_CONFIG
    from pdf_extraction_ray.pipelines.extraction import takedown
    assert CFG.n_buckets != DEFAULT_CONFIG.n_buckets
    clean = _run(pages_corpus, out_dir)
    stamp = _json.load(open(os.path.join(out_dir, "_manifests",
                                         "_run.json")))
    assert stamp["n_buckets"] == CFG.n_buckets
    victims = sorted(clean.url)[5:8]
    s = takedown(out_dir, urls=victims)        # no cfg passed
    assert s["n_dropped"] == 3
