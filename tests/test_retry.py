"""Semantic retry + quarantine tests (reference analog: tests/test_retry.py
of the reference — retry matrix with cap 5 → review queue; here the cap
sends rows to the _quarantine partition).

A flaky extractor is injected through the EXTRACTOR_REGISTRY extension
surface (SURVEY.md §2.11): text payloads fail until a deterministic
attempt threshold; payloads with "poison" in the url never succeed.
"""

import os
from datetime import datetime, timedelta

import pandas as pd
import pytest

import ray.data as rd

from pdf_extraction_ray.config import PipelineConfig
from pdf_extraction_ray.functions.finalize import Primary
from pdf_extraction_ray.pipelines.extraction import run_extraction, run_retry
from pdf_extraction_ray.stages import extract as ex


def _make_flaky():
    # nested so cloudpickle serializes it BY VALUE (test modules are not
    # importable inside Ray worker processes)
    def flaky_text_extractor(payload: bytes, cfg, attempts: int) -> Primary:
        """Transient failure until attempt 2; 'poison' fails permanently."""
        text = payload.decode()
        if "poison" in text:
            raise ValueError("deterministically broken document")  # permanent
        if attempts < 2:
            raise OSError("transient environment failure")  # retryable
        return Primary(text=text, spans=[], element_count=1,
                       heading_count=0, table_row_counts=[], n_pages=1)
    return flaky_text_extractor


FLAKY_CFG = PipelineConfig(
    n_buckets=4, extract_concurrency=(1, 2),
    extractor_overrides={ex.CT_TEXT: _make_flaky()})


def _pages(tmp_path) -> str:
    rows = []
    for i in range(20):
        marker = "poison" if i % 10 == 9 else "ok"
        body = f"document {i} {marker} body text"
        rows.append({
            "url": f"https://t.example/{marker}/d{i}",
            "warc_ts": datetime(2021, 1, 1) + timedelta(seconds=i),
            "html": body.encode(),
            "text": body,
            "lang": "en",
        })
    path = str(tmp_path / "pages")
    os.makedirs(path)
    pd.DataFrame(rows).to_parquet(os.path.join(path, "p.parquet"))
    return path


CFG = PipelineConfig(n_buckets=4, extract_concurrency=(1, 2))


def test_retry_recovers_transients_and_quarantines_poison(
        ray_session, tmp_path):
    pages = _pages(tmp_path)
    out = str(tmp_path / "out")
    CFG = FLAKY_CFG
    df = run_extraction(pages, CFG, out_dir=out).to_pandas()
    assert (df.status == "partial").all()  # first attempt always fails
    assert (df.attempts == 1).all()

    s1 = run_retry(pages, out, CFG, max_attempts=3)
    # permanent (poison) errors are never retried (reference fails 4xx
    # fast); transient ones get another attempt
    assert s1["n_retried"] == 18
    assert s1["n_quarantined"] == 2
    df2 = rd.read_parquet(out).to_pandas()
    ok = df2[~df2.url.str.contains("poison")]
    bad = df2[df2.url.str.contains("poison")]
    assert (ok.status == "completed").all()
    assert (ok.attempts == 2).all()
    assert (ok.extracted_text.str.contains("body text")).all()
    assert (bad.status == "partial").all()
    assert bad.error.str.startswith("permanent:").all()

    q = pd.read_parquet(os.path.join(out, "_quarantine"))
    assert len(q) == 2
    assert q.url.str.contains("poison").all()

    # nothing left to retry
    s2 = run_retry(pages, out, CFG, max_attempts=3)
    assert s2["n_retried"] == 0 and s2["n_quarantined"] == 2

    # review-queue surface: quarantine rows joined with bucket context
    # (reference: review_queue ⋈ extractions, app/db/review_queue.py)
    from pdf_extraction_ray.pipelines.extraction import load_review_queue
    rq = load_review_queue(out).to_pandas()
    assert len(rq) == 2
    assert rq.url.str.contains("poison").all()
    assert (rq.bucket_n_rows > 0).all()
    assert (rq.bucket_n_partial >= 1).all()


def test_review_queue_empty_on_clean_run(ray_session, tmp_path):
    from pdf_extraction_ray.pipelines.extraction import (load_review_queue,
                                                         run_extraction)
    pages = _pages(tmp_path)
    out = str(tmp_path / "out")
    run_extraction(pages, CFG, out_dir=out)
    assert load_review_queue(out).count() == 0


def test_retry_read_is_targeted(ray_session, tmp_path):
    """The retry pass must not re-read the whole corpus: the url predicate
    is pushed into the parquet scan, so only retried rows surface."""
    from pdf_extraction_ray.pipelines.extraction import sniffed_pages
    pages = _pages(tmp_path)
    wanted = ["https://t.example/ok/d0", "https://t.example/ok/d1"]
    ds = sniffed_pages(pages, CFG, url_filter=wanted)
    got = sorted(ds.to_pandas().url)
    assert got == sorted(wanted)


def test_retry_noop_on_clean_run(ray_session, tmp_path):
    pages = _pages(tmp_path)  # without flaky registry, text path succeeds
    out = str(tmp_path / "out")
    run_extraction(pages, CFG, out_dir=out)
    s = run_retry(pages, out, CFG)
    assert s == {"n_partial": 0, "n_retried": 0,
                 "n_quarantined": 0, "n_recovered": 0, "n_deferred": 0}


def test_resolve_review_queue_roundtrip(ray_session, tmp_path):
    """Quarantine → resolve('retry') → re-extract converges to the same
    user-visible rows as a never-quarantined clean run; resolve('accept')
    flips rows to completed in place (reference: review_queue update
    path, app/db/review_queue.py)."""
    from pdf_extraction_ray.pipelines.extraction import (
        load_review_queue, resolve_review_queue)

    pages = _pages(tmp_path)
    # clean reference run (default extractor, no flakiness)
    clean_out = str(tmp_path / "clean")
    clean = (run_extraction(pages, CFG, out_dir=clean_out).to_pandas()
             .sort_values("url").reset_index(drop=True))

    # flaky run with cap 1: every transient row exhausts immediately
    out = str(tmp_path / "out")
    run_extraction(pages, FLAKY_CFG, out_dir=out)
    s = run_retry(pages, out, FLAKY_CFG, max_attempts=1)
    assert s["n_retried"] == 0 and s["n_quarantined"] == 20

    # resolve the transient 18 for retry; accept the 2 poison rows
    rq = load_review_queue(out).to_pandas()
    transient = sorted(rq[~rq.url.str.contains("poison")].url)
    poison = sorted(rq[rq.url.str.contains("poison")].url)
    r1 = resolve_review_queue(out, transient, resolution="retry")
    assert r1 == {"n_resolved": 18, "n_remaining": 2}
    r2 = resolve_review_queue(out, poison, resolution="accept")
    assert r2 == {"n_resolved": 2, "n_remaining": 0}
    assert load_review_queue(out).count() == 0

    # attempts were reset, so the retry pass re-extracts the 18
    # (twice: the flaky extractor succeeds from attempt 2 on)
    s2 = run_retry(pages, out, FLAKY_CFG, max_attempts=3)
    assert s2["n_retried"] == 18
    s3 = run_retry(pages, out, FLAKY_CFG, max_attempts=3)
    assert s3["n_recovered"] == 18
    got = (rd.read_parquet(out).to_pandas()
           .sort_values("url").reset_index(drop=True))
    ok = got[~got.url.str.contains("poison")].reset_index(drop=True)
    ref = clean[~clean.url.str.contains("poison")].reset_index(drop=True)
    # user-visible content identical to the never-quarantined run
    # (attempts differ by design: the flaky path needed extra tries)
    for col in ("url", "status", "extracted_text", "n_chars"):
        assert ok[col].tolist() == ref[col].tolist()
    accepted = got[got.url.str.contains("poison")]
    assert (accepted.status == "completed").all()
    assert accepted.error.str.startswith("resolved:").all()

    # idempotent: resolving the same urls again no-ops
    r3 = resolve_review_queue(out, transient + poison)
    assert r3 == {"n_resolved": 0, "n_remaining": 0}


def test_retry_capped_driver_state_defers_overflow(ray_session, tmp_path):
    """Poison-heavy corpus (100% partial after pass 1): the retry fold
    keeps at most ``retry_batch_limit`` (url, attempts) pairs on the
    driver, defers the rest, and repeated invocations drain the backlog
    to the same end state as one uncapped pass."""
    pages = _pages(tmp_path)
    out = str(tmp_path / "out")
    cfg = FLAKY_CFG
    df = run_extraction(pages, cfg, out_dir=out).to_pandas()
    assert (df.status == "partial").all()  # every row needs a retry

    s1 = run_retry(pages, out, cfg, max_attempts=3, retry_batch_limit=5)
    assert s1["n_retried"] == 5
    assert s1["n_deferred"] == 13  # 18 eligible (2 poison are permanent)
    # deferred rows are NOT quarantined (attempts below cap, not permanent)
    assert s1["n_quarantined"] == 2

    seen = s1["n_retried"]
    for _ in range(5):
        s = run_retry(pages, out, cfg, max_attempts=3, retry_batch_limit=5)
        seen += s["n_retried"]
        if s["n_deferred"] == 0 and s["n_retried"] == 0:
            break
    df2 = rd.read_parquet(out).to_pandas()
    ok = df2[~df2.url.str.contains("poison")]
    assert (ok.status == "completed").all()
    assert seen == 18


def test_doc_timeout_guard(ray_session):
    """Pathological documents hit the cooperative parse deadline and become
    transient partial rows (SURVEY.md §4 per-row wall-clock guard)."""
    import time
    from pdf_extraction_ray.functions.html_extract import extract_html
    from pdf_extraction_ray.functions.retry_policy import (DocumentTimeout,
                                                           is_retryable)
    big = ("<div>" + "<p>" + "word " * 50 + "</p>") * 20000
    with pytest.raises(DocumentTimeout):
        extract_html(big.encode(), deadline=time.monotonic() + 0.01)
    assert is_retryable(DocumentTimeout("x"))

    from pdf_extraction_ray.functions import pdf_extract
    from pdf_extraction_ray.sources.gen_pdf import build_pdf
    pdf = build_pdf([f"line {i}" for i in range(20000)], lines_per_page=5000)
    with pytest.raises(DocumentTimeout):
        pdf_extract.extract_pdf(pdf, deadline=time.monotonic() + 0.001)


def test_error_classification():
    from pdf_extraction_ray.functions.retry_policy import error_label, is_retryable
    assert not is_retryable(ValueError("bad bytes"))
    assert is_retryable(OSError("disk hiccup"))
    assert is_retryable(RuntimeError("unknown"))
    assert error_label(ValueError("x")).startswith("permanent:ValueError")
    assert error_label(OSError("y")).startswith("transient:OSError")


def test_malformed_oversized_pdf_never_vanishes(ray_session):
    """A PDF whose /Count routes it to the shard path but whose streams
    don't parse must fall through to the whole-doc path and surface as a
    row (partial or completed), never disappear from the output."""
    import pyarrow as pa
    from pdf_extraction_ray.config import PipelineConfig
    from pdf_extraction_ray.sources import corpus, spec
    from pdf_extraction_ray.stages.extract import (ExtractOrSplit,
                                                   ParseFragments,
                                                   finalize_bucket,
                                                   sniff_validate_batch)

    cfg = PipelineConfig(max_bytes=spec.CORPUS_MAX_BYTES,
                         split_page_threshold=3)
    # claims 40 pages, contains no parseable page/stream objects
    bogus = b"%PDF-1.4\n<< /Type /Pages /Count 40 >>\ntrailer garbage"
    batch = pa.Table.from_pylist([{
        "url": "u://bogus", "warc_ts": spec.warc_ts_of(1),
        "html": bogus, "text": "fallback text body", "lang": "en",
    }], schema=corpus.PAGES_SCHEMA)
    work = ParseFragments(cfg)(ExtractOrSplit(cfg)(sniff_validate_batch(batch, cfg)))
    out = finalize_bucket(work, cfg, True)
    assert len(out) == 1
    assert out["url"][0].as_py() == "u://bogus"
    assert out["status"][0].as_py() in ("partial", "completed")


def test_fragment_timeout_poisons_document(ray_session, documents_rows):
    """A page-range shard that times out turns its DOCUMENT into a
    partial row (reassembly poisoning), never a failed task or a
    half-document."""
    import pyarrow as pa
    from pdf_extraction_ray.config import PipelineConfig
    from pdf_extraction_ray.sources import corpus, spec
    from pdf_extraction_ray.stages.extract import (ExtractOrSplit,
                                                   ParseFragments,
                                                   finalize_bucket,
                                                   sniff_validate_batch)

    big = [d for d in documents_rows
           if spec.kind_of(d["doc_id"]) == "pdf_big"][:1]
    assert big
    d = big[0]
    rows = [corpus.build_page_row(d["doc_id"], d["text"], d["source"],
                                  d["lang"])]
    batch = pa.Table.from_pylist(rows, schema=corpus.PAGES_SCHEMA)
    cfg = PipelineConfig(max_bytes=spec.CORPUS_MAX_BYTES,
                         split_page_threshold=spec.CORPUS_SPLIT_PAGE_THRESHOLD)
    work = ExtractOrSplit(cfg)(sniff_validate_batch(batch, cfg))
    assert "frag_raw" in work["row_kind"].to_pylist()
    # expired deadline: every fragment parse times out cooperatively
    tcfg = PipelineConfig(max_bytes=spec.CORPUS_MAX_BYTES,
                          split_page_threshold=spec.CORPUS_SPLIT_PAGE_THRESHOLD,
                          doc_timeout_s=-1.0)
    out = finalize_bucket(ParseFragments(tcfg)(work), tcfg, True)
    assert len(out) == 1
    assert out["status"][0].as_py() == "partial"
    assert out["error"][0].as_py().startswith("transient:")
