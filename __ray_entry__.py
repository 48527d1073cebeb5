"""Driver contract for the graft builder (Ray Data target).

The driver initializes Ray itself before importing this module; nothing
here (or in ``pdf_extraction_ray``) calls ``ray.init``/``ray.shutdown``.

``queries()`` exposes one entry per implemented operator/pipeline from
SURVEY.md §2 (plus the beyond-reference training-data operators); each
callable takes an sf dir and returns a Dataset / DataFrame / pyarrow
Table. ``oracle_sql()`` provides the DuckDB-equivalent SQL; the pages
corpus is a pure function of ``documents`` (pdf_extraction_ray/sources/
spec.py), so even the extraction pipeline itself has a value-hash oracle.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import ray.data as rd

from pdf_extraction_ray import oracle
from pdf_extraction_ray.config import PipelineConfig, tune_data_context
from pdf_extraction_ray.pipelines import (analytics, extraction, linkgraph,
                                          relational)
from pdf_extraction_ray.sources import corpus, spec

_CFG = PipelineConfig(max_bytes=spec.CORPUS_MAX_BYTES,
                      split_page_threshold=spec.CORPUS_SPLIT_PAGE_THRESHOLD)

EXTRACT_COLUMNS = [
    "url", "warc_ts", "lang", "content_type", "status", "error", "route",
    "quality_pct", "doc_kind", "doc_conf_pct", "doc_method",
    "extracted_text", "n_chars",
]

_extracted_cache: dict[tuple[str, str], rd.Dataset] = {}


def _extracted(sf_dir: str) -> rd.Dataset:
    """Flagship pipeline output for an sf dir.

    Runs the CHECKPOINTED pipeline once into a spec-versioned scratch
    directory and hands queries a dataset that streams back from the
    partitioned parquet — the scale shape (round 1 pinned a
    ``materialize()`` of the whole output in the object store); a rerun
    in a fresh process resumes from the manifests instead of recomputing.
    """
    tune_data_context()
    # digest-keyed like the out dir itself (ADVICE r4): a regenerated
    # corpus under the same sf path gets a fresh run, never stale rows
    key = (sf_dir, corpus._input_digest(sf_dir))
    if key not in _extracted_cache:
        pages = corpus.ensure_pages_corpus(sf_dir)
        _extracted_cache[key] = extraction.run_extraction(
            pages, _CFG, out_dir=_extracted_out_dir(sf_dir))
    return _extracted_cache[key]


def _extracted_out_dir(sf_dir: str, suffix: str = "") -> str:
    """A query checkpoint's scratch directory for an sf dir
    (spec-versioned + input-digested, the corpus-cache convention);
    ``suffix`` names sibling stores (e.g. the upsert store) so the
    path law lives in ONE place."""
    from pathlib import Path

    return ("/tmp/pdf_extraction_ray/query_out/"
            f"{Path(sf_dir).name or 'sf'}{suffix}-{spec.SPEC_VERSION}"
            f"-{corpus._input_digest(sf_dir)}")


# ---------------------------------------------------------------------------
# extraction family
# ---------------------------------------------------------------------------


def q_extract_pipeline(sf_dir: str) -> rd.Dataset:
    """SURVEY.md §2 M1-M17 end-to-end (the north-rule pipeline)."""
    return _extracted(sf_dir).select_columns(EXTRACT_COLUMNS)


POINT_LOOKUP_MOD = 83  # wanted urls: docs with doc_id % 83 == 2


def q_extract_point_lookup(sf_dir: str) -> rd.Dataset:
    """Targeted url serving from the checkpointed output: the wanted
    urls (a planted doc_id % 83 == 2 class) map driver-side to their
    url-hash buckets and ONLY those bucket dirs are read
    (pipelines/extraction.point_lookup — the storage layout's
    read-path payoff; the plan is pytest-pinned to a strict subset of
    the buckets)."""
    from pdf_extraction_ray.sources.tables import read_table

    _extracted(sf_dir)  # ensure the checkpoint exists
    tbl = (read_table(sf_dir, "documents", ["doc_id", "source"])
           .to_pandas())
    sel = tbl[tbl.doc_id % POINT_LOOKUP_MOD == 2]
    urls = [spec.url_of(int(d), str(s))
            for d, s in zip(sel.doc_id, sel.source)]
    # cfg=None: resolve the bucket count from the checkpoint's own
    # _run.json (an explicit cfg would WIN in _output_n_buckets and
    # defeat the stale-config protection — review finding)
    return extraction.point_lookup(
        _extracted_out_dir(sf_dir), urls,
        columns=["url", "status", "quality_pct", "n_chars",
                 "extracted_text"])


UPSERT_MOD = 5  # urls with stable_hash64('upsert:'+url) % 5 == 0 = delta


def _upsert_out_dir(sf_dir: str) -> str:
    return _extracted_out_dir(sf_dir, suffix="-upsert")


def q_extract_upsert(sf_dir: str) -> rd.Dataset:
    """Incremental re-crawl ingest end-to-end (the MERGE INTO path,
    pipelines/extraction.upsert_extraction): a base store is built
    WITHOUT one url-hash class, that class is then upsert-INSERTED,
    and an already-present class is re-sent (upsert-REPLACE, identical
    recompute). The merged store must equal a from-scratch full run —
    it shares extract_pipeline's value-hash oracle, so insert,
    replace, and don't-touch semantics are all value-gated. Only
    buckets containing delta urls are rewritten (pytest pins untouched
    buckets byte-stable)."""
    return _upsert_result(sf_dir).select_columns(EXTRACT_COLUMNS)


def _upsert_split(pages: rd.Dataset, residues: "set[int]") -> rd.Dataset:
    """Pages whose url-hash class is in ``residues`` — split on the URL
    (both copies of a planted re-crawl dup co-travel, so first-wins
    dedup sees the same candidates as a full run)."""
    from pdf_extraction_ray.functions.hashing import stable_hash64

    import pyarrow as pa

    def f(t: pa.Table) -> pa.Table:
        mask = [stable_hash64(f"upsert:{u}") % UPSERT_MOD in residues
                for u in t["url"].to_pylist()]
        return t.filter(pa.array(mask, pa.bool_()))

    return pages.map_batches(f, batch_format="pyarrow")


_upsert_cache: dict[tuple[str, str], rd.Dataset] = {}


def _upsert_result(sf_dir: str) -> rd.Dataset:
    # keyed on (sf_dir, input digest) so a corpus regenerated under the
    # same path within a session can never be served a stale merged
    # store (ADVICE r4 — the _extracted_out_dir convention)
    tune_data_context()
    key = (sf_dir, corpus._input_digest(sf_dir))
    if key not in _upsert_cache:
        pages_path = corpus.ensure_pages_corpus(sf_dir)
        out = _upsert_out_dir(sf_dir)
        pages = rd.read_parquet(pages_path)
        base = _upsert_split(pages, set(range(1, UPSERT_MOD)))
        extraction.run_extraction(base, _CFG, out_dir=out)
        # INSERT: the held-out class enters through the merge path
        extraction.upsert_extraction(_upsert_split(pages, {0}), _CFG, out)
        # REPLACE: re-send an already-present class — same-url rows are
        # superseded by the (identical) recompute, value-stable
        _upsert_cache[key] = extraction.upsert_extraction(
            _upsert_split(pages, {1}), _CFG, out)
    return _upsert_cache[key]


ROUTE_SWEEP_THRESHOLDS = (50, 60, 70, 80, 90)


def q_route_threshold_sweep(sf_dir: str) -> rd.Dataset:
    """Quality-router tuning curve — for each candidate threshold, how
    many docs WOULD route primary vs fallback (the sweep an operator
    reads before moving the M7 cutoff; the production router's 70 sits
    in the middle of the grid): one pass over the flagship output,
    per-block counts against all thresholds (a ≤2·|grid|-row partial),
    ONE tiny groupby. Returns (threshold, n_primary, n_fallback)."""
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Sum

    grid = ROUTE_SWEEP_THRESHOLDS

    def fold(t: pa.Table) -> pa.Table:
        q = t["quality_pct"].to_numpy(zero_copy_only=False)
        ths, np_, nf = [], [], []
        for th in grid:
            ths.append(th)
            np_.append(int((q >= th).sum()))
            nf.append(int((q < th).sum()))
        return pa.table({"threshold": pa.array(ths, pa.int64()),
                         "p": pa.array(np_, pa.int64()),
                         "f": pa.array(nf, pa.int64())})

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"threshold": t["threshold"],
                         "n_primary": t["sum(p)"],
                         "n_fallback": t["sum(f)"]})

    return (_extracted(sf_dir).select_columns(["quality_pct"])
            .map_batches(fold, batch_format="pyarrow")
            .groupby("threshold").aggregate(Sum("p"), Sum("f"))
            .map_batches(rename, batch_format="pyarrow"))


def q_bucket_skew_report(sf_dir: str) -> rd.Dataset:
    """Partitioner balance census — rows/chars per url-hash bucket of
    the checkpointed output, externally verifying the engine's ONE
    partitioning key itself (the oracle re-derives every url's bucket
    from sha256 in SQL): a skewed row would mean the url partitioner
    and the SQL replica disagree, or the layout drifted from the hash.
    Map-side bucket recompute + ONE ≤n_buckets-row groupby; a pytest
    pins the computed census against the physical bucket=K/ row
    counts."""
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from pdf_extraction_ray.functions.hashing import url_bucket

    nb = _CFG.n_buckets

    def fold(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        b = np.fromiter((url_bucket(u, nb) for u in urls), np.int64,
                        len(urls))
        nc = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(b, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        s = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, nc)
        return pa.table({"bucket": pa.array(uniq, pa.int64()),
                         "n": pa.array(n, pa.int64()),
                         "s": pa.array(s, pa.int64())})

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"bucket": t["bucket"],
                         "n_docs": t["sum(n)"],
                         "sum_chars": t["sum(s)"]})

    return (_extracted(sf_dir).select_columns(["url", "n_chars"])
            .map_batches(fold, batch_format="pyarrow")
            .groupby("bucket").aggregate(Sum("n"), Sum("s"))
            .map_batches(rename, batch_format="pyarrow"))


def q_extract_routing_stats(sf_dir: str) -> rd.Dataset:
    """Routing/batch counters (reference: app/routers/stats.py:116-278,
    app/db/batch_jobs.py:86-183 → SURVEY.md A1/A3/A4)."""
    from ray.data.aggregate import Count, Sum
    return _extracted(sf_dir).groupby(["content_type", "status", "route"]).aggregate(
        Count(alias_name="n_docs"),
        Sum("quality_pct", alias_name="sum_quality"),
        Sum("n_chars", alias_name="sum_chars"),
    )


def q_sniff_counts(sf_dir: str) -> rd.Dataset:
    """Content-type sniffing distribution (SURVEY.md M2)."""
    from ray.data.aggregate import Count
    return _extracted(sf_dir).groupby("content_type").aggregate(
        Count(alias_name="n_docs"))


def q_classify_counts(sf_dir: str) -> rd.Dataset:
    """Classifier cascade distribution (SURVEY.md M8-M10)."""
    from ray.data.aggregate import Count, Sum
    return _extracted(sf_dir).groupby(["doc_kind", "doc_method"]).aggregate(
        Count(alias_name="n_docs"),
        Sum("doc_conf_pct", alias_name="sum_conf"),
    )


def q_span_kind_counts(sf_dir: str) -> rd.Dataset:
    """Span totals by kind — exercises char-span machinery end-to-end."""
    import pyarrow as pa
    from ray.data.aggregate import Count

    def explode(batch: pa.Table) -> pa.Table:
        col = batch["spans"].combine_chunks()
        flat = col.flatten()
        return pa.table({"kind": flat.field("kind")})

    return (_extracted(sf_dir)
            .map_batches(explode, batch_format="pyarrow")
            .groupby("kind").aggregate(Count(alias_name="n_spans")))


def q_canonical_names(sf_dir: str) -> rd.Dataset:
    """Canonical output naming from REAL metadata extraction: the
    subject/grade/session/year fields are parsed back out of the
    extracted text's metadata header (reference:
    FullExamPaper.build_canonical_filename + document-parsed fields,
    app/models/extraction.py:110-161); the suffix comes from the
    classifier's doc_kind; the id is sha256(extracted_text)[:12]."""
    import re

    import pyarrow as pa

    from pdf_extraction_ray.functions.slug import canonical_name

    meta_re = re.compile(
        r"^Subject: (?P<subject>[^|]*?) \| Grade: (?P<grade>\d+)"
        r" \| Session: (?P<session>[^|]*?) \| Year: (?P<year>\d{4})")

    def build(batch: pa.Table) -> pa.Table:
        urls, names = [], []
        texts = batch["extracted_text"].to_pylist()
        shas = batch["text_sha256"].to_pylist()
        kinds = batch["doc_kind"].to_pylist()
        for url, text, sha, kind in zip(batch["url"].to_pylist(), texts,
                                        shas, kinds):
            m = meta_re.match(text)
            if m is None:
                continue  # no parseable metadata header (junk/tiny/scanned)
            names.append(canonical_name(
                sha[:12], m["subject"], m["grade"], m["session"],
                int(m["year"]), "mg" if kind == "memo" else "qp"))
            urls.append(url)
        return pa.table({"url": pa.array(urls, pa.string()),
                         "canonical_name": pa.array(names, pa.string())})

    return _extracted(sf_dir).map_batches(build, batch_format="pyarrow")


def q_pdf_elements(sf_dir: str) -> rd.Dataset:
    """Layout elements with bounding boxes per PDF document (SURVEY.md
    §1.2 elements column; reference: BoundingBox per element,
    app/models/extraction.py:169-181)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(batch: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(batch["content_type"], "pdf"),
                       pc.equal(batch["route"], "primary"))
        sub = batch.filter(mask)
        urls = sub["url"].to_pylist()
        elements = sub["elements"].to_pylist()
        n_el, n_tr, x1m, y0m, n_right = [], [], [], [], []
        for els in elements:
            n_el.append(len(els))
            n_tr.append(sum(1 for e in els if e["kind"] == "table"))
            x1m.append(max((e["x1"] for e in els), default=0))
            y0m.append(min((e["y0"] for e in els), default=0))
            # right-band elements of two-column layouts (COL2_X = 320)
            n_right.append(sum(1 for e in els if e["x0"] >= 300))
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "n_elements": pa.array(n_el, pa.int64()),
            "n_table_rows": pa.array(n_tr, pa.int64()),
            "x1_max": pa.array(x1m, pa.int64()),
            "y0_min": pa.array(y0m, pa.int64()),
            "n_rightcol": pa.array(n_right, pa.int64()),
        })

    return _extracted(sf_dir).map_batches(stats, batch_format="pyarrow")


def q_boilerplate_lines(sf_dir: str) -> rd.Dataset:
    """CCNet-style corpus line stats: lines shared across documents
    (template chrome / repeated headers) with occurrence + doc counts —
    the combiner-shaped wordcount over document LINES."""
    from pdf_extraction_ray.stages.linededup import boilerplate_lines
    return boilerplate_lines(_extracted(sf_dir), oracle.LINE_MIN_DOCS)


def q_line_dedup_docs(sf_dir: str) -> rd.Dataset:
    """Line-level boilerplate removal: strip every line that occurs in
    >= LINE_MIN_DOCS documents, reassemble the cleaned text (the CCNet /
    RefinedWeb cleaning step a web-text training pipeline runs)."""
    from pdf_extraction_ray.stages.linededup import drop_boilerplate
    return drop_boilerplate(_extracted(sf_dir), oracle.LINE_MIN_DOCS)


def q_c4_line_filter(sf_dir: str) -> rd.Dataset:
    """C4-style heuristic line cleaning (Raffel et al. 2020 §2.2) over
    the extracted corpus: per-line word-count/blocklist rules + page-
    level ban rules, emitted as a keep-tagged cleaned table (map-side
    only — the rule-based complement of the corpus-frequency
    ``line_dedup_docs``)."""
    from pdf_extraction_ray.stages.linededup import c4_line_filter
    return c4_line_filter(_extracted(sf_dir))


def q_url_parts_stats(sf_dir: str) -> rd.Dataset:
    """Per-(host, section, doc-tag) corpus rollup from vectorized URL
    parsing — pure ``pyarrow.compute`` string kernels (split / list
    element / ends_with), no Python loop; the per-domain statistics a
    web-crawl pipeline groups by."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def parts(batch: pa.Table) -> pa.Table:
        urls = batch["url"]
        segs = pc.split_pattern(urls, "/")
        host = pc.list_element(segs, 2)
        section = pc.list_element(segs, 3)
        tag = pc.if_else(
            pc.ends_with(urls, "-memo"), pa.scalar("memo"),
            pc.if_else(pc.ends_with(urls, "-qp"),
                       pa.scalar("qp"), pa.scalar("plain")))
        return pa.table({"host": host, "section": section, "doc_tag": tag,
                         "n_chars": batch["n_chars"]})

    return (_extracted(sf_dir)
            .select_columns(["url", "n_chars"])
            .map_batches(parts, batch_format="pyarrow")
            .groupby(["host", "section", "doc_tag"])
            .aggregate(Count(alias_name="n_docs"),
                       Sum("n_chars", alias_name="sum_chars")))


def q_section_quality_stats(sf_dir: str) -> rd.Dataset:
    """Per-site-section extraction rollup — the FineWeb-style
    domain-level quality aggregation (the url's first path segment
    stands in for the domain on the single-host corpus): page counts by
    outcome plus quality/char mass, the table domain-level filters and
    crawl budgets are tuned from."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def prep(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t["url"].combine_chunks(),
                              pattern=r"corpus\.example/(?P<s>[^/]+)/")
        return pa.table({
            "section": pc.struct_field(ex, "s"),
            "completed": pc.cast(pc.equal(t["status"], "completed"),
                                 pa.int64()),
            "rejected": pc.cast(pc.equal(t["status"], "rejected"),
                                pa.int64()),
            "quality_pct": t["quality_pct"],
            "n_chars": t["n_chars"],
        })

    return (_extracted(sf_dir).map_batches(prep, batch_format="pyarrow")
            .groupby("section").aggregate(
                Count(alias_name="n_pages"),
                Sum("completed", alias_name="n_completed"),
                Sum("rejected", alias_name="n_rejected"),
                Sum("quality_pct", alias_name="sum_quality"),
                Sum("n_chars", alias_name="sum_chars")))


def q_page_metadata(sf_dir: str) -> rd.Dataset:
    """WAT Head-Metas/Title rendition over the pages corpus
    (pipelines/linkgraph.page_metadata)."""
    from pdf_extraction_ray.pipelines.linkgraph import _corpus_pages
    return linkgraph.page_metadata(_corpus_pages(sf_dir))


def q_crawl_frontier(sf_dir: str) -> rd.Dataset:
    """Link centrality x extraction quality -> top-k re-crawl priority
    (pipelines/linkgraph.crawl_frontier — the link family capstone)."""
    return linkgraph.crawl_frontier(sf_dir, _extracted(sf_dir))


def q_frontier_schedule(sf_dir: str) -> rd.Dataset:
    """Politeness-aware fetch schedule: wave = ROW_NUMBER per url
    section (host stand-in) over the whole ranked frontier
    (pipelines/linkgraph.schedule_from_ranks)."""
    return linkgraph.frontier_schedule(sf_dir, _extracted(sf_dir))


def q_discovery_frontier(sf_dir: str) -> rd.Dataset:
    """Unified crawl plan: sitemap discoveries (never-crawled urls)
    outrank quality-weighted re-crawl priorities; global top-k
    (pipelines/linkgraph.discovery_frontier — the crawl-loop capstone
    joining the sitemap and link-graph families)."""
    return linkgraph.discovery_frontier(sf_dir, _extracted(sf_dir))


def q_url_canonical_dedup(sf_dir: str) -> rd.Dataset:
    """Crawl-frontier URL canonicalization + dedup
    (functions/urlnorm.py): planted messy variants — uppercased host
    with tracking params/fragment/trailing slash for every url whose
    length % 3 == 0, plus a permuted-query pair for length % 5 == 0 —
    must collapse onto their canonical twin. Output is the per-canonical
    count; the DuckDB oracle replicates the planting AND the
    canonicalization string-for-string."""
    import pyarrow as pa
    from ray.data.aggregate import Count

    from pdf_extraction_ray.functions.urlnorm import canonical_url

    def plant_and_canon(batch: pa.Table) -> pa.Table:
        out = []
        for u in batch["url"].to_pylist():
            out.append(u)
            if len(u) % 3 == 0:
                parts = u.split("/")
                out.append(parts[0] + "//" + parts[2].upper() + "/"
                           + "/".join(parts[3:])
                           + "/?utm_source=feed&utm_b=2#frag")
            if len(u) % 5 == 0:
                out.append(u + "?z=1&a=2")
                out.append(u + "?a=2&z=1")
        return pa.table({"canonical_url": pa.array(
            [canonical_url(x) for x in out], pa.string())})

    return (_extracted(sf_dir).select_columns(["url"])
            .map_batches(plant_and_canon, batch_format="pyarrow")
            .groupby("canonical_url")
            .aggregate(Count(alias_name="n_urls")))


def q_repetition_stats(sf_dir: str) -> rd.Dataset:
    """Gopher-style within-document repetition signals over the
    extracted text: duplicate-line counts and the most-frequent-bigram
    share — pure-integer outputs feeding a repetition quality filter
    (Rae et al. 2021 repetition heuristics)."""
    from collections import Counter

    import pyarrow as pa

    def stats(batch: pa.Table) -> pa.Table:
        n_lines, n_dup, n_bi, top_bi = [], [], [], []
        for text in batch["extracted_text"].to_pylist():
            lines = [ln for ln in (text or "").split("\n") if ln]
            lc = Counter(lines)
            n_lines.append(len(lines))
            n_dup.append(sum(c for c in lc.values() if c > 1))
            words = (text or "").split(" ")
            bc = Counter(f"{a} {b}" for a, b in zip(words, words[1:]))
            n_bi.append(sum(bc.values()))
            top_bi.append(max(bc.values(), default=0))
        return pa.table({
            "url": batch["url"],
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_dup_lines": pa.array(n_dup, pa.int64()),
            "n_bigrams": pa.array(n_bi, pa.int64()),
            "top_bigram_n": pa.array(top_bi, pa.int64()),
        })

    return _extracted(sf_dir).select_columns(
        ["url", "extracted_text"]).map_batches(stats, batch_format="pyarrow")


def q_export_markdown(sf_dir: str) -> rd.Dataset:
    """Markdown export rendering (SURVEY.md S9/M18)."""
    from pdf_extraction_ray.pipelines.export import markdown_batch
    return _extracted(sf_dir).map_batches(markdown_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline on sf0.001 (driver smoke check)."""
    return q_extract_pipeline("/root/testdata/sf0.001")


def _tuned(fn: Callable[[str], Any]) -> Callable[[str], Any]:
    def wrapper(sf_dir: str) -> Any:
        tune_data_context()
        return fn(sf_dir)
    wrapper.__name__ = getattr(fn, "__name__", "query")
    wrapper.__doc__ = fn.__doc__
    return wrapper


def queries() -> dict[str, Callable[[str], Any]]:
    # ORDER MATTERS: the driver records CORRECTNESS rows for the first
    # 50 entries only. Round 2 verified the legacy first-50, round 3
    # the next 49, round 4 the rotated WINDOW_R04 (CORRECTNESS_r04:
    # 50/50 green). Round 5 ROTATES again per the r4 verdict: the
    # flagship gate (extract_pipeline) stays at position 1, the 10
    # round-4 additions (TPC-H completion set, cdc_chunk_stats,
    # extract_upsert, ppr_related) lead positions 2..11, and the 39
    # oldest carried backlog entries fill 12..50. The 13 residual
    # carry-overs stay in AWAITING_SLOT. The reorder is data-driven
    # from WINDOW_R05 / AWAITING_SLOT below so it is an auditable diff.
    base = {
        # windowed aggregates (streaming-shaped) — never driver-verified
        "window_tumbling": _tuned(analytics.window_tumbling),
        "window_sliding": _tuned(analytics.window_sliding),
        "rolling_user_value": _tuned(analytics.rolling_user_value),
        "running_user_value": _tuned(analytics.running_user_value),
        "sessions": _tuned(analytics.sessions),
        "sessions_salted": _tuned(analytics.sessions_salted),
        # multi-level aggregation (rollup / pivot)
        "orders_rollup": _tuned(relational.orders_rollup),
        "orders_pivot": _tuned(relational.orders_pivot),
        # temporal join + join family
        "asof_prior_error": _tuned(analytics.asof_prior_error),
        "order_customer_join": _tuned(analytics.order_customer_join),
        "user_activity_full": _tuned(analytics.user_activity_full),
        "customers_with_orders_semi":
            _tuned(analytics.customers_with_orders_semi),
        "event_pairs_within": _tuned(analytics.event_pairs_within),
        "event_pairs_within_salted":
            _tuned(analytics.event_pairs_within_salted),
        # corpus-stats / scoring operators
        "vocab_df": _tuned(analytics.vocab_df),
        "bigram_counts": _tuned(analytics.bigram_counts),
        "dup_ngram_spans": _tuned(analytics.dup_ngram_spans),
        "stratified_sample": _tuned(analytics.stratified_sample),
        "sample_k_per_lang": _tuned(analytics.sample_k_per_lang),
        "heavy_hitter_terms": _tuned(analytics.heavy_hitter_terms),
        "tfidf_top_terms": _tuned(analytics.tfidf_top_terms),
        "lm_doc_scores": _tuned(analytics.lm_doc_scores),
        "quality_percentile_filter": _tuned(analytics.quality_percentile_filter),
        "doc_shuffle": _tuned(analytics.doc_shuffle),
        "normalize_text": _tuned(analytics.normalize_text),
        "doc_passages": _tuned(analytics.doc_passages),
        "bm25_topk": _tuned(analytics.bm25_topk),
        "bm25_topk_indexed": _tuned(analytics.bm25_topk_indexed),
        "value_quantiles_hist": _tuned(analytics.value_quantiles_hist),
        "props_json_stats": _tuned(analytics.props_json_stats),
        # newly oracled in round 3 (were rows-only in r02)
        "text_embed_dups": _tuned(analytics.text_embed_dups),
        "kmeans_clusters": _tuned(analytics.kmeans_clusters),
        "ann_ivf_fullprobe": _tuned(analytics.ann_ivf_fullprobe),
        # continuation wave 2: C4 line cleaning, DSIR selection,
        # quality-aware cluster survivor (need their first driver row;
        # displace sniff_counts / classify_counts / pdf_elements — all
        # green in r02 — past the window)
        "c4_line_filter": _tuned(q_c4_line_filter),
        "dsir_select": _tuned(analytics.dsir_select),
        "cluster_keep_best": _tuned(analytics.cluster_keep_best),
        # continuation wave 3: BPE tokenizer training (displaces
        # dedup_exact — green in r02, and its semantics also run
        # in-window inside curate_pipeline's dedup stage — and
        # extract_routing_stats, whose status/route columns are
        # hash-verified in-window via extract_pipeline itself)
        "bpe_pair_counts": _tuned(analytics.bpe_pair_counts),
        "bpe_train": _tuned(analytics.bpe_train),
        # (and dedup_minhash — green in r02 and oracle-gated in pytest —
        # making room for the BPE encode stage)
        "bpe_token_counts": _tuned(analytics.bpe_token_counts),
        # --- window filler: flagship extraction family (green in r02,
        # kept inside the 50 so the headline pipeline stays externally
        # verified every round) ---
        "extract_pipeline": _tuned(q_extract_pipeline),
        # new in round 3 (need their first driver row; displace
        # line_dedup_docs / dedup_simhash / jaccard_pairs /
        # dedup_clusters / embedding_dup_pairs / dedup_embedding_cells /
        # ann_bruteforce — all green in r02 — past the window)
        "semdedup": _tuned(analytics.semdedup),
        "doc_signals": _tuned(analytics.doc_signals),
        "lang_balance_sample": _tuned(analytics.lang_balance_sample),
        "dup_span_strip": _tuned(analytics.dup_span_strip),
        "dup_span_strip_join": _tuned(analytics.dup_span_strip_join),
        "gopher_filter": _tuned(analytics.gopher_filter),
        "snapshot_ingest_dedup": _tuned(analytics.snapshot_ingest_dedup),
        "revenue_by_nation": _tuned(relational.revenue_by_nation),
        "curate_pipeline": _tuned(analytics.curate_pipeline),
        "url_canonical_dedup": _tuned(q_url_canonical_dedup),
        # --- entry 51+ (green in r02; no new row needed) ---
        "dedup_minhash": _tuned(analytics.dedup_minhash),
        "extract_routing_stats": _tuned(q_extract_routing_stats),
        "dedup_exact": _tuned(analytics.dedup_exact),
        "sniff_counts": _tuned(q_sniff_counts),
        "classify_counts": _tuned(q_classify_counts),
        "pdf_elements": _tuned(q_pdf_elements),
        "span_kind_counts": _tuned(q_span_kind_counts),
        "export_markdown": _tuned(q_export_markdown),
        "canonical_names": _tuned(q_canonical_names),
        "boilerplate_lines": _tuned(q_boilerplate_lines),
        "line_dedup_docs": _tuned(q_line_dedup_docs),
        "dedup_simhash": _tuned(analytics.dedup_simhash),
        "jaccard_pairs": _tuned(analytics.jaccard_pairs),
        "dedup_clusters": _tuned(analytics.dedup_clusters),
        "embedding_dup_pairs": _tuned(analytics.embedding_dup_pairs),
        "dedup_embedding_cells": _tuned(analytics.dedup_embedding_cells),
        "ann_bruteforce": _tuned(analytics.ann_bruteforce),
        "url_parts_stats": _tuned(q_url_parts_stats),
        "repetition_stats": _tuned(q_repetition_stats),
        # relational family (SURVEY.md §2.4-2.7 A1/A3/A5/A6, J3/J4, O1, D3)
        "pricing_summary": _tuned(relational.pricing_summary),
        "customers_per_region": _tuned(relational.customers_per_region),
        "top_orders": _tuned(relational.top_orders),
        "event_value_stats": _tuned(relational.event_value_stats),
        "part_stats": _tuned(relational.part_stats),
        "nations_with_presence": _tuned(relational.nations_with_presence),
        "customers_without_orders": _tuned(relational.customers_without_orders),
        "customers_without_orders_bloom": _tuned(
            relational.customers_without_orders_bloom),
        "prev_value_by_type": _tuned(relational.prev_value_by_type),
        "top_orders_per_segment": _tuned(relational.top_orders_per_segment),
        # scalar-function library as dataset ops (M3/M4/M16)
        "sha256_docs": _tuned(analytics.sha256_docs),
        # text analytics (training-data operators)
        "token_stats": _tuned(analytics.token_stats),
        "quality_filter": _tuned(analytics.quality_filter),
        "lang_id": _tuned(analytics.lang_id),
        "fingerprint_docs": _tuned(analytics.fingerprint_docs),
        "pii_redact": _tuned(analytics.pii_redact),
        "decontam_docs": _tuned(analytics.decontam_docs),
        # multimodal decode (real pure-stdlib PNG decoder, actor pool)
        "media_decode": _tuned(analytics.media_decode),
        "media_phash_dups": _tuned(analytics.media_phash_dups),
        "audio_decode": _tuned(analytics.audio_decode),
        "media_resize": _tuned(analytics.media_resize),
        "video_frames": _tuned(analytics.video_frames),
        # dimension lookup join + training-data split + sketch
        "language_dim_counts": _tuned(analytics.language_dim_counts),
        "train_split": _tuned(analytics.train_split),
        "pack_sequences": _tuned(analytics.pack_sequences),
        "shard_assign": _tuned(analytics.shard_assign),
        "hll_users_per_type": _tuned(analytics.hll_users_per_type),
        # --- AWAITING_SLOT (added after the round-3 window saturated;
        # every one oracled + driver-sim-verified, queued for an r4
        # window slot — see test_entry_contract_keys) ---
        "pagerank_docs": _tuned(analytics.pagerank_docs),
        "anchor_text_index": _tuned(linkgraph.anchor_text_index),
        "page_links_sample": _tuned(linkgraph.page_links_sample),
        "link_graph": _tuned(linkgraph.link_graph),
        "pagerank_links": _tuned(linkgraph.pagerank_links),
        "section_quality_stats": _tuned(q_section_quality_stats),
        "crawl_frontier": _tuned(q_crawl_frontier),
        "page_metadata": _tuned(q_page_metadata),
        # pruned-probe IVF — VALUE-ORACLED since the integer-quantizer
        # rewrite (was the last rows-only entry): the whole index build
        # + probe pipeline replays bit-exactly in SQL
        "ann_ivf": _tuned(analytics.ann_ivf),
        # cross-snapshot url lifecycle diff (content-hash full-outer)
        "pages_delta": _tuned(analytics.pages_delta),
        # RefinedWeb-style URL frontier filter (blocklist + badword score)
        "url_blocklist_filter": _tuned(analytics.url_blocklist_filter),
        # persisted MinHash-LSH index probe: fuzzy cross-snapshot ingest
        "snapshot_neardup_ingest": _tuned(analytics.snapshot_neardup_ingest),
        # IVF ingest loop: build on corpus-minus-holdout, append the
        # holdout incrementally (frozen quantizer, per-cell delta files),
        # full-probe == brute force (shares ann_bruteforce's oracle)
        "ann_ivf_incremental": _tuned(analytics.ann_ivf_incremental),
        # trained Naive-Bayes language classifier (one combiner pass +
        # broadcast integer log-prob matvec; dsir quantization pattern)
        "nb_lang_classify": _tuned(analytics.nb_lang_classify),
        # politeness-aware crawl schedule (one-url-per-host waves over
        # the ranked frontier; keyed-window scan with a string key)
        "frontier_schedule": _tuned(q_frontier_schedule),
        # fuzzy eval-set decontamination: MinHash index over the (small)
        # benchmark side, corpus signed once and probed against it
        "decontam_neardup": _tuned(analytics.decontam_neardup),
        # GROUP BY CUBE — all four grains from the rollup's one pass
        "orders_cube": _tuned(relational.orders_cube),
        # LAG/LEAD shifted windows (keyed_shift; -1 sentinel)
        "user_value_lag": _tuned(analytics.user_value_lag),
        # exact COUNT(DISTINCT) per group — hll_users_per_type's twin
        "users_per_type_exact": _tuned(analytics.users_per_type_exact),
        # robots.txt frontier gate (RFC 9309 parser; planted per-section
        # robots bodies, decisions re-derived analytically in SQL)
        "robots_gate": _tuned(analytics.robots_gate),
        # budgeted training-mix selection: quality-ordered global prefix
        # sum (two keyed shuffles, O(quality-levels) driver state), cut
        # at the token budget
        "token_budget_select": _tuned(analytics.token_budget_select),
        # per-domain document cap (anti-single-source-domination):
        # keyed-window scan with a string key, quality-ordered
        "section_quota_sample": _tuned(analytics.section_quota_sample),
        # temperature-T=2 mixture smoothing over lang (XLM-R-style
        # count^(1/T) shares; fractional-power sampling in pure
        # integers — h^2*c < c_min*2^40)
        "lang_temperature_sample": _tuned(analytics.lang_temperature_sample),
        # distributed grep: literal phrase count + first offset per doc
        # (Arrow count_substring/find_substring kernels)
        "phrase_match_stats": _tuned(analytics.phrase_match_stats),
        # sitemap-driven url discovery (real XML parse incl. recursive
        # sitemapindex trees) LEFT-joined against the crawled corpus
        "sitemap_urls": _tuned(analytics.sitemap_urls),
        # broadcast range (interval) join — events priced into per-type
        # value tiers (the third custom join family after as-of and
        # equality; stages/joins.broadcast_range_join)
        "value_band_join": _tuned(analytics.value_band_join),
        # HITS hubs/authorities over the EXTRACTED link graph (integer
        # max-rescale rounds; PageRank's companion centrality)
        "hits_scores": _tuned(linkgraph.hits_scores),
        # bounded-radius BFS crawl depth from seed pages (-1 unreached)
        "bfs_depth_docs": _tuned(analytics.bfs_depth_docs),
        # CCNet head/middle/tail per-lang perplexity terciles over the
        # integer corpus-LM score (threshold-based, tie-stable)
        "ccnet_buckets": _tuned(analytics.ccnet_buckets),
        # per-page in/out degree over the extracted edges (union+sum,
        # no join; isolated pages report 0/0)
        "link_degree_stats": _tuned(linkgraph.link_degree_stats),
        # web-graph component census (giant component + singleton
        # tail); unrolled label-propagation oracle
        "link_components": _tuned(linkgraph.link_components),
        # unified crawl plan: sitemap discoveries over re-crawl
        # priorities, global top-k (the crawl-loop capstone)
        "discovery_frontier": _tuned(q_discovery_frontier),
        # quoted-phrase search via the persisted POSITIONAL index
        # (reads only the phrase words' partitions; adjacency as one
        # shifted-start groupby — zero per-doc Python)
        "phrase_search_indexed": _tuned(analytics.phrase_search_indexed),
        # SQ8 embedding quantization (per-vector max-abs scale; the 4x
        # ANN storage/network scale path) — identical float64 op chain
        # in both engines, bit-exact
        "embedding_quantize": _tuned(analytics.embedding_quantize),
        # per-page triangle participation (degree-oriented wedges +
        # one semi join; orientation-invariant triple-join oracle)
        "triangle_counts": _tuned(linkgraph.triangle_counts),
        # soft dedup: keep each doc with prob 1/cluster_size (expected
        # one copy per near-dup cluster, diversity-preserving)
        "soft_dedup_sample": _tuned(analytics.soft_dedup_sample),
        # ordered funnel (signup -> click -> purchase): first-completion
        # chain per user, lexicographic (ts, event_id) strictness
        "event_funnel": _tuned(analytics.event_funnel),
        # cohort retention grid (first-event week x weeks-since) — the
        # funnel's companion; keyed-window scan emitting partial cells
        "retention_cohorts": _tuned(analytics.retention_cohorts),
        # collocation mining: top-k bigrams by quantized lift (Python-
        # bigint exact; two combiner folds + two distributed hash joins)
        "bigram_lift": _tuned(analytics.bigram_lift),
        # corpus-adaptive stopword pruning (DF-threshold stoplist
        # broadcast, flattened np.isin rewrite — vocab_df's rewrite half)
        "stopword_prune": _tuned(analytics.stopword_prune),
        # co-citation "related pages": in-link-set overlap via the
        # out-degree-bounded wedge emit (never pairs at a hub)
        "cocitation_pairs": _tuned(linkgraph.cocitation_pairs),
        # k-core membership via bounded peel rounds (unrolled oracle;
        # convergence pytest-pinned)
        "kcore_nodes": _tuned(linkgraph.kcore_nodes),
        # clickstream path mining: top-k event-type trigrams over
        # per-user ordered streams (keyed-window scan, partial counts)
        "path_trigrams": _tuned(analytics.path_trigrams),
        # inter-arrival-time histogram by decimal magnitude (digit
        # count — pure string/integer bucket rule, no float log)
        "interarrival_hist": _tuned(analytics.interarrival_hist),
        # retrieve-then-rerank: BM25 candidates re-ranked by PageRank
        # centrality blend (two oracle families composed)
        "search_ranked": _tuned(analytics.search_ranked),
        # NTILE(4) value quartiles per event type (string-keyed window
        # scan; exact SQL NTILE fill rule, vectorized)
        "value_ntiles": _tuned(analytics.value_ntiles),
        # out-of-order/watermark audit over planted disorder (per-user
        # shifted running-max; ontime/reordered/late statuses)
        "late_event_audit": _tuned(analytics.late_event_audit),
        # per-type daily-rate EWMA (integer alpha=1/8 recurrence on a
        # zero-filled day spine; WITH RECURSIVE oracle)
        "ewma_event_rate": _tuned(analytics.ewma_event_rate),
        # label-propagation community census (synchronous majority
        # vote, fixed unroll; the component census's finer sibling)
        "lpa_communities": _tuned(linkgraph.lpa_communities),
        # product quantization codes (per-subspace unrolled-Lloyd fit;
        # the 64x ANN memory-compression path past SQ8)
        "embedding_pq": _tuned(analytics.embedding_pq),
        # entity resolution: tail-key blocking + exact edit-distance
        # verify over planted edited copies (levenshtein oracle)
        "er_blocked_pairs": _tuned(analytics.er_blocked_pairs),
        # more-like-this: per-doc TF-IDF top terms as a BM25 query,
        # self excluded (two oracle families composed)
        "mlt_related_docs": _tuned(analytics.mlt_related_docs),
        # TPC-H Q3 analog: selective 3-table join chain with map-side
        # filters, per-block revenue combiner, partial top-k
        "shipping_priority": _tuned(relational.shipping_priority),
        # data-quality table profiler (null/distinct/min-max census
        # with planted nulls; chained-combiner exact distincts)
        "events_profile": _tuned(analytics.events_profile),
        # skew-aware hybrid join demo: hub titles broadcast, cold tail
        # hash-joined (stages/joins.skew_join; plan changes, answer
        # doesn't — value-identical to the plain join)
        "inlink_titles": _tuned(linkgraph.inlink_titles),
        # keyword-in-context snippets for the BM25 candidates (the
        # serving half of search; corpus filters map-side to candidate
        # docs only, never re-shuffled)
        "search_snippets": _tuned(analytics.search_snippets),
        # incremental materialized-view maintenance: standing per-
        # section stats + delta corrections, folded with ONE groupby;
        # oracle recomputes snapshot B from scratch
        "section_stats_incremental": _tuned(
            analytics.section_stats_incremental),
        # TPC-H Q5 analog: 5-table join with the same-nation equality
        # applied AFTER the one fact join (dims broadcast, one packed-
        # key combiner groupby + one hash_join)
        "local_supplier_volume": _tuned(relational.local_supplier_volume),
        # exact integer 3-sigma anomaly detection per event type
        # (planted ×50 outliers; isqrt cutoffs broadcast, map-side flag)
        "value_outliers": _tuned(analytics.value_outliers),
        # deterministic weighted sampling without replacement
        # (hash-priority h//w top-k; selection probability ∝ weight)
        "weighted_sample": _tuned(analytics.weighted_sample),
        # cross-snapshot vocabulary drift report (one-pass two-side
        # word fold + sentinel totals row; integer parts-per-2^20
        # rates; top-k movers)
        "vocab_drift": _tuned(analytics.vocab_drift),
        # exact rolling 7-day distinct active users (two packed-key
        # dedupe groupbys + window fan-out; zero-padded day spine)
        "wau_daily": _tuned(analytics.wau_daily),
        # exact discrete quantiles (p50/p90/p99) per event type — the
        # exact twin of value_quantiles_hist
        "value_quantiles_disc": _tuned(analytics.value_quantiles_disc),
        # TrustRank: seed-gated restart random walk (anti-spam ranking;
        # pagerank_docs's pattern with the restart mass on seeds only)
        "trustrank_docs": _tuned(analytics.trustrank_docs),
        # count-min sketch term frequencies (mergeable D×W partials,
        # ONE 4096-row groupby; sketch replayed value-exact in SQL)
        "cms_term_freq": _tuned(analytics.cms_term_freq),
        # referential-integrity audit: orphan counts per FK via ANTI
        # hash_join (big-big) / broadcast set (dimension); planted
        # missing parents (key % 101 == 11)
        "fk_integrity_audit": _tuned(analytics.fk_integrity_audit),
        # period-over-period churn census (retained/churned/new users;
        # ids-only presence fold, ONE groupby(user) Max-fold)
        "churned_users": _tuned(analytics.churned_users),
        # 2-D Pareto frontier over (lexical diversity, length):
        # per-block local skylines merged in one final task
        "pareto_docs": _tuned(analytics.pareto_docs),
        # reciprocal-link census over the extracted edge table (packed
        # pair key + direction bits, ONE groupby)
        "mutual_links": _tuned(linkgraph.mutual_links),
        # storage-partitioned join: both sides written key-hash-
        # bucketed, then joined bucket-by-bucket with ZERO all-to-all
        "bucketed_order_revenue": _tuned(relational.bucketed_order_revenue),
        # SCD type-2 history build over the snapshot pair (validity
        # intervals per version; pure map-side emit)
        "scd2_history": _tuned(analytics.scd2_history),
        # windowed-HLL WAU: day sketches merged across overlapping
        # 7-day windows (register max = sketch union) — wau_daily's
        # constant-per-day scale path
        "wau_daily_hll": _tuned(analytics.wau_daily_hll),
        # TPC-H Q14 analog: promo revenue share (broadcast promo-part
        # set, per-block two-sum combiner, ONE constant-key groupby)
        "promo_revenue_share": _tuned(relational.promo_revenue_share),
        # TPC-H Q18 analog: HAVING over a fact groupby; the survivors
        # are ≤ Σqty/threshold so orders/customer attach map-side
        "large_volume_customers": _tuned(relational.large_volume_customers),
        # TPC-H Q10 analog: returned-item revenue top-k (map-side
        # filters, combiner, ONE hash_join + ONE groupby, partial top-k)
        "returned_item_report": _tuned(relational.returned_item_report),
        # first-order Markov transition matrix over per-user event
        # chains (ONE keyed_shift shuffle + packed-key combiner;
        # integer row-normalized prob_ppm)
        "markov_transitions": _tuned(analytics.markov_transitions),
        # URL canonicalization dedup (frontier stage BEFORE content
        # fetch): planted tracking/fragment/case/port variants collapse,
        # meaningful params survive; ONE groupby over (norm, count)
        "url_normalize_dedup": _tuned(analytics.url_normalize_dedup),
        # HLL set algebra: audience overlap by inclusion–exclusion over
        # three sketches (union = register max — never a re-scan)
        "hll_segment_overlap": _tuned(analytics.hll_segment_overlap),
        # distinctive vocabulary per section (keyness/lift; one
        # (section,word) combiner fold, hash_join word totals with
        # collision verify, per-block partial top-k)
        "section_keyness": _tuned(analytics.section_keyness),
        # zone-map data-skipping scan: day-clustered zone=K/ store with
        # a min/max manifest; the range query reads ONLY overlapping
        # zones (plan pytest-pinned to a strict subset)
        "zonemap_range_stats": _tuned(analytics.zonemap_range_stats),
        # targeted url serving from the checkpointed output: wanted
        # urls map to their url-hash buckets, only those dirs read
        "extract_point_lookup": _tuned(q_extract_point_lookup),
        # confusion matrix + exact recall for the trained NB language
        # classifier (the eval report gating model-in-the-loop stages)
        "nb_confusion_matrix": _tuned(analytics.nb_confusion_matrix),
        # TeraSort-shaped total order: sampled range partitioner, ONE
        # range shuffle, offset-based global ranks (no second exchange)
        "global_sort_docs": _tuned(analytics.global_sort_docs),
        # Rocchio nearest-centroid classifier over labeled embeddings —
        # exact-integer centroids + argmax dots, bit-exact SQL replay
        "nearest_centroid_classify": _tuned(
            analytics.nearest_centroid_classify),
        # TPC-H Q8 analog: ratio-per-group market share (broadcast
        # dims, per-block target/total combiner, ONE hash_join)
        "nation_market_share": _tuned(relational.nation_market_share),
        # contiguous token-id assignment for the top-V vocabulary
        # (partial top-V per block — the vocabulary never globally sorts)
        "vocab_topv_ids": _tuned(analytics.vocab_topv_ids),
        # last-touch attribution: purchases credit the most recent
        # in-window prior click/view (keyed-window scan + cummax)
        "attribution_last_touch": _tuned(analytics.attribution_last_touch),
        # exact cosine k-NN graph (blocked all-pairs partial top-k,
        # object-store blocks, ONE merge groupby — quadratic baseline)
        "knn_graph": _tuned(analytics.knn_graph),
        # exact Gini of the doc-length distribution via the sparse
        # value histogram — no global sort, Python-bigint fold
        "doc_length_gini": _tuned(analytics.doc_length_gini),
        # near-superset detection by exact shingle CONTAINMENT
        # (Broder's asymmetric statistic; default r=1 banding — 64
        # single-row bands, the config the documented recall bound in
        # stages/dedup.py assumes)
        "containment_docs": _tuned(analytics.containment_docs),
        # 2:1 integer PCM downsample (actor-pool decode; shift-exact
        # pair mean replays closed-form from the sample law)
        "audio_resample": _tuned(analytics.audio_resample),
        # sweep-line interval counting: daily open-order backlog via
        # difference-array deltas + O(span) driver running sum
        "open_orders_daily": _tuned(relational.open_orders_daily),
        # index takedown: tombstone delete (serving stops immediately,
        # stats adjust) == from-scratch index of the filtered corpus
        "bm25_after_delete": _tuned(analytics.bm25_after_delete),
        # per-image luminance histogram (real PNG pixel decode in the
        # actor pool; closed-form pixel-law oracle)
        "image_histogram": _tuned(analytics.image_histogram),
        # timed funnel: each step within a 3-day window of the previous
        # (the windowed variant dashboards report; shared kernel)
        "event_funnel_timed": _tuned(analytics.event_funnel_timed),
        # partitioner balance census: rows/chars per url-hash bucket,
        # the bucket function itself re-derived from sha256 in SQL
        "bucket_skew_report": _tuned(q_bucket_skew_report),
        # vector-index takedown (IVF tombstones; full probe over the
        # deleted copy == brute force over the filtered corpus)
        "ann_after_delete": _tuned(analytics.ann_after_delete),
        # percentile-rank feature encoding (sparse value-histogram
        # broadcast + vectorized searchsorted — the corpus never shuffles)
        "value_percentile_feature": _tuned(
            analytics.value_percentile_feature),
        # DeepWalk-style deterministic random-walk corpus (seeded hash
        # hops over the planted expander; ZERO exchanges)
        "random_walks": _tuned(analytics.random_walks),
        # skip-gram (center, context) counts over the walk corpus —
        # the DeepWalk→word2vec training pairs; walks regenerate inside
        # the counting map (zero per-step storage or shuffle)
        "walk_cooccurrence": _tuned(analytics.walk_cooccurrence),
        # quality-router tuning curve (would-be routing counts per
        # candidate threshold; one pass, |grid|-bounded exchange)
        "route_threshold_sweep": _tuned(q_route_threshold_sweep),
        # --- session 10: TPC-H completion set (Q6/Q4/Q13/Q22/Q17/Q19/
        # Q7 analogs — filter-agg, agg-then-join lateness, zero-
        # preserving outer histogram, integer cross-multiplied avg
        # thresholds, anti-join recency, disjunctive predicates, the
        # 3-fact big-big join chain) + content-defined chunking ---
        "forecast_revenue": _tuned(relational.forecast_revenue),
        "late_order_priority_counts":
            _tuned(relational.late_order_priority_counts),
        "customer_order_counts_hist":
            _tuned(relational.customer_order_counts_hist),
        "idle_customer_balance": _tuned(relational.idle_customer_balance),
        "small_quantity_revenue": _tuned(relational.small_quantity_revenue),
        "disjunctive_revenue": _tuned(relational.disjunctive_revenue),
        "nation_pair_volume": _tuned(relational.nation_pair_volume),
        # chunk-level dedup census (FastCDC/rsync principle; boundaries
        # + chunk identity replay exactly in SQL)
        "cdc_chunk_stats": _tuned(analytics.cdc_chunk_stats),
        # incremental re-crawl ingest (MERGE INTO the checkpointed
        # store): insert + replace + don't-touch, all value-gated by
        # the flagship oracle (merged store == from-scratch full run)
        "extract_upsert": _tuned(q_extract_upsert),
        # personalized PageRank over the EXTRACTED link graph — one
        # restart-gated integer vector per seed ("related pages for
        # page X"); one-task fast path, per-seed distributed fallback
        "ppr_related": _tuned(linkgraph.ppr_related),
    }
    rest = [k for k in base if k not in _ROTATED]
    order = [*WINDOW_R05, *rest, *AWAITING_SLOT]
    assert len(order) == len(base), sorted(set(base) ^ set(order))
    return {k: base[k] for k in order}


# The round-5 driver window (the first 50 queries() entries): the
# flagship gate stays in-window every round; positions 2..11 are the
# ten round-4 additions (never externally verified — TPC-H completion
# set, CDC chunking, the MERGE-INTO upsert, personalized PageRank),
# and positions 12..50 are the 39 oldest entries of the carried
# backlog in their original queue order (see VERDICT.md round 4,
# "Next round" items 1 and 7 — zonemap_range_stats and
# extract_point_lookup, the storage-pruned read paths, are inside).
WINDOW_R05 = (
    "extract_pipeline",
    # round-4 additions, first driver slot
    "forecast_revenue",
    "late_order_priority_counts",
    "customer_order_counts_hist",
    "idle_customer_balance",
    "small_quantity_revenue",
    "disjunctive_revenue",
    "nation_pair_volume",
    "cdc_chunk_stats",
    "extract_upsert",
    "ppr_related",
    # oldest 39 of the carried backlog, original queue order
    "embedding_pq",
    "er_blocked_pairs",
    "mlt_related_docs",
    "shipping_priority",
    "events_profile",
    "inlink_titles",
    "search_snippets",
    "section_stats_incremental",
    "local_supplier_volume",
    "value_outliers",
    "weighted_sample",
    "vocab_drift",
    "wau_daily",
    "value_quantiles_disc",
    "trustrank_docs",
    "cms_term_freq",
    "fk_integrity_audit",
    "churned_users",
    "pareto_docs",
    "mutual_links",
    "bucketed_order_revenue",
    "scd2_history",
    "wau_daily_hll",
    "promo_revenue_share",
    "large_volume_customers",
    "returned_item_report",
    "markov_transitions",
    "url_normalize_dedup",
    "hll_segment_overlap",
    "section_keyness",
    "zonemap_range_stats",
    "extract_point_lookup",
    "nb_confusion_matrix",
    "global_sort_docs",
    "nearest_centroid_classify",
    "nation_market_share",
    "vocab_topv_ids",
    "attribution_last_touch",
    "knn_graph",
)


# Queries still waiting for an external driver row after the round-5
# window (the 13 residual carry-overs from round 3's backlog, in queue
# order, plus any added this round): each is fully oracled and locally
# driver-sim-verified (DRIVER_SIM artifacts), and MUST take a window
# slot next round. The contract test derives the window law from the
# recorded CORRECTNESS_r02/r03/r04 artifacts and this list — a query
# can only skip the window by being named here, which is an auditable
# diff, never a silent reorder.
AWAITING_SLOT = (
    "doc_length_gini",
    "containment_docs",
    "audio_resample",
    "open_orders_daily",
    "bm25_after_delete",
    "image_histogram",
    "event_funnel_timed",
    "bucket_skew_report",
    "ann_after_delete",
    "value_percentile_feature",
    "random_walks",
    "walk_cooccurrence",
    "route_threshold_sweep",
)

_ROTATED = frozenset(WINDOW_R05) | frozenset(AWAITING_SLOT)


def oracle_sql() -> dict[str, str]:
    return {
        "extract_pipeline": oracle.extract_pipeline_sql(),
        "extract_routing_stats": oracle.extract_routing_stats_sql(),
        "sniff_counts": oracle.sniff_counts_sql(),
        "classify_counts": oracle.classify_counts_sql(),
        "span_kind_counts": oracle.span_kind_counts_sql(),
        "pdf_elements": oracle.pdf_elements_sql(),
        "export_markdown": oracle.export_markdown_sql(),
        "url_parts_stats": oracle.url_parts_stats_sql(),
        "url_canonical_dedup": oracle.url_canonical_dedup_sql(),
        "semdedup": analytics.semdedup_sql(),
        "lang_balance_sample": analytics.lang_balance_sample_sql(),
        "dup_span_strip": analytics.dup_span_strip_sql(),
        # the join mode shares the oracle: value-identical by contract
        "dup_span_strip_join": analytics.dup_span_strip_sql(),
        # the salted band join shares event_pairs_within's oracle
        "event_pairs_within_salted": analytics.event_pairs_within_sql(),
        "doc_signals": analytics.doc_signals_sql(),
        "revenue_by_nation": relational.revenue_by_nation_sql(),
        "gopher_filter": analytics.gopher_filter_sql(),
        "snapshot_ingest_dedup": analytics.snapshot_ingest_dedup_sql(),
        "curate_pipeline": analytics.curate_pipeline_sql(),
        "boilerplate_lines": oracle.boilerplate_lines_sql(),
        "line_dedup_docs": oracle.line_dedup_docs_sql(),
        "c4_line_filter": oracle.c4_line_filter_sql(),
        "dsir_select": analytics.dsir_select_sql(),
        "cluster_keep_best": analytics.cluster_keep_best_sql(),
        "bpe_pair_counts": analytics.bpe_pair_counts_sql(),
        "bpe_train": analytics.bpe_train_sql(),
        "bpe_token_counts": analytics.bpe_token_counts_sql(),
        "repetition_stats": oracle.repetition_stats_sql(),
        "pricing_summary": relational.pricing_summary_sql(),
        "customers_per_region": relational.customers_per_region_sql(),
        "top_orders": relational.top_orders_sql(),
        "event_value_stats": relational.event_value_stats_sql(),
        "part_stats": relational.part_stats_sql(),
        "nations_with_presence": relational.nations_with_presence_sql(),
        "customers_without_orders": relational.customers_without_orders_sql(),
        # the bloom path is value-identical to the exact anti-join, so it
        # shares its oracle — this surfaces the scale path in the gate
        "customers_without_orders_bloom":
            relational.customers_without_orders_sql(),
        "prev_value_by_type": relational.prev_value_by_type_sql(),
        "top_orders_per_segment": relational.top_orders_per_segment_sql(),
        "sha256_docs": analytics.sha256_docs_sql(),
        "canonical_names": oracle.canonical_names_sql(),
        "token_stats": analytics.token_stats_sql(),
        "quality_filter": analytics.quality_filter_sql(),
        "lang_id": analytics.lang_id_sql(),
        "fingerprint_docs": analytics.fingerprint_docs_sql(),
        "pii_redact": analytics.pii_redact_sql(),
        "decontam_docs": analytics.decontam_docs_sql(),
        "media_decode": analytics.media_decode_sql(),
        "media_phash_dups": analytics.media_phash_dups_sql(),
        "audio_decode": analytics.audio_decode_sql(),
        "media_resize": analytics.media_resize_sql(),
        "video_frames": analytics.video_frames_sql(),
        "language_dim_counts": analytics.language_dim_counts_sql(),
        "train_split": analytics.train_split_sql(),
        "pack_sequences": analytics.pack_sequences_sql(),
        "shard_assign": analytics.shard_assign_sql(),
        "hll_users_per_type": analytics.hll_users_per_type_sql(),
        "dedup_exact": analytics.dedup_exact_sql(),
        # the near-dup family is value-exact in SQL: signatures are pure
        # sha256 + wrapping-uint64 arithmetic DuckDB replicates, minhash
        # band collisions reduce to slice equality, and the simhash
        # chunk LSH is pigeonhole-complete for hamming<=3 so the oracle
        # can verify the predicate over all pairs
        "dedup_minhash": analytics.dedup_minhash_sql(
            num_perm=analytics.NEARDUP_NUM_PERM),
        "dedup_simhash": analytics.dedup_simhash_sql(),
        "jaccard_pairs": analytics.jaccard_pairs_sql(),
        # distributed connected-components clustering vs a DuckDB
        # recursive-CTE transitive closure — the iterative algorithm
        # has an exact value-hash gate
        "dedup_clusters": analytics.dedup_clusters_sql(),
        "embedding_dup_pairs": analytics.embedding_dup_pairs_sql(),
        # the cell-partitioned variant provably finds every exact-copy
        # pair (identical vectors share all assigned cells) and verifies
        # candidates with true cosine, so on this corpus it matches the
        # exact all-pairs oracle bit-for-bit
        "dedup_embedding_cells": analytics.embedding_dup_pairs_sql(),
        "ann_bruteforce": analytics.ann_bruteforce_sql(),
        # full-probe IVF reads every cell of the persisted index, so it
        # is value-identical to brute force and shares its oracle — the
        # gate proves the index + probe plumbing lose nothing
        "ann_ivf_fullprobe": analytics.ann_bruteforce_sql(),
        # build-on-base + incremental append + full probe == brute force
        # over the union — the append/delta path proven lossless
        "ann_ivf_incremental": analytics.ann_bruteforce_sql(),
        # NB training counts + quantized log-probs + argmax replayed in SQL
        "nb_lang_classify": analytics.nb_lang_classify_sql(),
        # priority join + per-section ROW_NUMBER politeness window
        "frontier_schedule": linkgraph.frontier_schedule_sql(),
        # two-side signature replay, roles inverted (bench side indexed)
        "decontam_neardup": analytics.decontam_neardup_sql(),
        "orders_cube": relational.orders_cube_sql(),
        "user_value_lag": analytics.user_value_lag_sql(),
        "users_per_type_exact": analytics.users_per_type_exact_sql(),
        "robots_gate": analytics.robots_gate_sql(),
        "token_budget_select": analytics.token_budget_select_sql(),
        "section_quota_sample": analytics.section_quota_sample_sql(),
        "lang_temperature_sample": analytics.lang_temperature_sample_sql(),
        "phrase_match_stats": analytics.phrase_match_stats_sql(),
        "sitemap_urls": analytics.sitemap_urls_sql(),
        "value_band_join": analytics.value_band_join_sql(),
        "hits_scores": linkgraph.hits_scores_sql(),
        "bfs_depth_docs": analytics.bfs_depth_docs_sql(),
        "ccnet_buckets": analytics.ccnet_buckets_sql(),
        "link_degree_stats": linkgraph.link_degree_stats_sql(),
        "link_components": linkgraph.link_components_sql(),
        "discovery_frontier": linkgraph.discovery_frontier_sql(),
        "phrase_search_indexed": analytics.phrase_search_indexed_sql(),
        "embedding_quantize": analytics.embedding_quantize_sql(),
        "triangle_counts": linkgraph.triangle_counts_sql(),
        "soft_dedup_sample": analytics.soft_dedup_sample_sql(),
        "event_funnel": analytics.event_funnel_sql(),
        "retention_cohorts": analytics.retention_cohorts_sql(),
        "bigram_lift": analytics.bigram_lift_sql(),
        "stopword_prune": analytics.stopword_prune_sql(),
        "cocitation_pairs": linkgraph.cocitation_pairs_sql(),
        "kcore_nodes": linkgraph.kcore_nodes_sql(),
        "path_trigrams": analytics.path_trigrams_sql(),
        "interarrival_hist": analytics.interarrival_hist_sql(),
        "search_ranked": analytics.search_ranked_sql(),
        "value_ntiles": analytics.value_ntiles_sql(),
        "late_event_audit": analytics.late_event_audit_sql(),
        "ewma_event_rate": analytics.ewma_event_rate_sql(),
        "lpa_communities": linkgraph.lpa_communities_sql(),
        "embedding_pq": analytics.embedding_pq_sql(),
        "er_blocked_pairs": analytics.er_blocked_pairs_sql(),
        "mlt_related_docs": analytics.mlt_related_docs_sql(),
        "shipping_priority": relational.shipping_priority_sql(),
        "events_profile": analytics.events_profile_sql(),
        "inlink_titles": linkgraph.inlink_titles_sql(),
        "search_snippets": analytics.search_snippets_sql(),
        "section_stats_incremental":
            analytics.section_stats_incremental_sql(),
        "local_supplier_volume": relational.local_supplier_volume_sql(),
        "value_outliers": analytics.value_outliers_sql(),
        "weighted_sample": analytics.weighted_sample_sql(),
        "vocab_drift": analytics.vocab_drift_sql(),
        "wau_daily": analytics.wau_daily_sql(),
        "value_quantiles_disc": analytics.value_quantiles_disc_sql(),
        "trustrank_docs": analytics.trustrank_docs_sql(),
        "cms_term_freq": analytics.cms_term_freq_sql(),
        "fk_integrity_audit": analytics.fk_integrity_audit_sql(),
        "churned_users": analytics.churned_users_sql(),
        "pareto_docs": analytics.pareto_docs_sql(),
        "mutual_links": linkgraph.mutual_links_sql(),
        "bucketed_order_revenue": relational.bucketed_order_revenue_sql(),
        "scd2_history": analytics.scd2_history_sql(),
        "wau_daily_hll": analytics.wau_daily_hll_sql(),
        "promo_revenue_share": relational.promo_revenue_share_sql(),
        "large_volume_customers": relational.large_volume_customers_sql(),
        "returned_item_report": relational.returned_item_report_sql(),
        "markov_transitions": analytics.markov_transitions_sql(),
        "url_normalize_dedup": analytics.url_normalize_dedup_sql(),
        "hll_segment_overlap": analytics.hll_segment_overlap_sql(),
        "section_keyness": analytics.section_keyness_sql(),
        "zonemap_range_stats": analytics.zonemap_range_stats_sql(),
        "nb_confusion_matrix": analytics.nb_confusion_matrix_sql(),
        "global_sort_docs": analytics.global_sort_docs_sql(),
        "nearest_centroid_classify":
            analytics.nearest_centroid_classify_sql(),
        "nation_market_share": relational.nation_market_share_sql(),
        "vocab_topv_ids": analytics.vocab_topv_ids_sql(),
        "attribution_last_touch": analytics.attribution_last_touch_sql(),
        "knn_graph": analytics.knn_graph_sql(),
        "doc_length_gini": analytics.doc_length_gini_sql(),
        "containment_docs": analytics.containment_docs_sql(),
        "audio_resample": analytics.audio_resample_sql(),
        "open_orders_daily": relational.open_orders_daily_sql(),
        "bm25_after_delete": analytics.bm25_after_delete_sql(),
        "image_histogram": analytics.image_histogram_sql(),
        "event_funnel_timed": analytics.event_funnel_timed_sql(),
        "ann_after_delete": analytics.ann_after_delete_sql(),
        "value_percentile_feature":
            analytics.value_percentile_feature_sql(),
        "random_walks": analytics.random_walks_sql(),
        "walk_cooccurrence": analytics.walk_cooccurrence_sql(),
        "route_threshold_sweep": oracle.base_cte() + f"""
SELECT CAST(th.threshold AS BIGINT) AS threshold,
       CAST(count(*) FILTER (WHERE e.quality_pct >= th.threshold)
            AS BIGINT) AS n_primary,
       CAST(count(*) FILTER (WHERE e.quality_pct < th.threshold)
            AS BIGINT) AS n_fallback
FROM expected e
CROSS JOIN (SELECT unnest({list(ROUTE_SWEEP_THRESHOLDS)}) AS threshold) th
GROUP BY th.threshold""",
        "bucket_skew_report": oracle.base_cte() + f"""
SELECT CAST({analytics._sql_hash64("sha256(url)")} % {_CFG.n_buckets}
            AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM expected GROUP BY 1""",
        "extract_point_lookup": oracle.base_cte() + f"""
SELECT url, status, quality_pct, n_chars, extracted_text
FROM expected
WHERE url IN (
  SELECT 'https://corpus.example/' || source || '/d'
           || lpad(CAST(doc_id AS VARCHAR), 7, '0')
           || (CASE WHEN doc_id % 10 = 3 THEN '-memo'
                    WHEN doc_id % 10 = 7 THEN '-qp' ELSE '' END)
  FROM documents WHERE doc_id % {POINT_LOOKUP_MOD} = 2)""",
        # Lloyd's rounds unrolled in SQL (integer output; see
        # analytics.kmeans_clusters_sql)
        "kmeans_clusters": analytics.kmeans_clusters_sql(),
        "window_tumbling": analytics.window_tumbling_sql(),
        "window_sliding": analytics.window_sliding_sql(),
        "rolling_user_value": analytics.rolling_user_value_sql(),
        "running_user_value": analytics.running_user_value_sql(),
        "sessions": analytics.sessions_sql(),
        # the salted (time-chunk + stub-merge) plan is value-identical,
        # so it shares the oracle — the gate surfaces the skew-safe path
        "sessions_salted": analytics.sessions_sql(),
        "orders_rollup": relational.orders_rollup_sql(),
        "orders_pivot": relational.orders_pivot_sql(),
        "asof_prior_error": analytics.asof_prior_error_sql(),
        "order_customer_join": analytics.order_customer_join_sql(),
        "user_activity_full": analytics.user_activity_full_sql(),
        "customers_with_orders_semi":
            analytics.customers_with_orders_semi_sql(),
        "vocab_df": analytics.vocab_df_sql(),
        "bigram_counts": analytics.bigram_counts_sql(),
        "dup_ngram_spans": analytics.dup_ngram_spans_sql(),
        "stratified_sample": analytics.stratified_sample_sql(),
        "sample_k_per_lang": analytics.sample_k_per_lang_sql(),
        "heavy_hitter_terms": analytics.heavy_hitter_terms_sql(),
        "tfidf_top_terms": analytics.tfidf_top_terms_sql(),
        "lm_doc_scores": analytics.lm_doc_scores_sql(),
        "quality_percentile_filter": analytics.quality_percentile_filter_sql(),
        "doc_shuffle": analytics.doc_shuffle_sql(),
        "normalize_text": analytics.normalize_text_sql(),
        "doc_passages": analytics.doc_passages_sql(),
        "bm25_topk": analytics.bm25_topk_sql(),
        # the index-backed path is value-identical to the scan path
        # (same integer BM25 kernel), so it shares the oracle — the gate
        # proves the persisted index + pruned partition probe lose
        # nothing
        "bm25_topk_indexed": analytics.bm25_topk_sql(),
        "value_quantiles_hist": analytics.value_quantiles_hist_sql(),
        "event_pairs_within": analytics.event_pairs_within_sql(),
        "props_json_stats": analytics.props_json_stats_sql(),
        # the embedder is integer FNV buckets x a sha256-derived
        # projection, so DuckDB recomputes the whole text->embedding->
        # pair pipeline (round-2 had this rows-only)
        "text_embed_dups": analytics.text_embed_dups_sql(),
        # pruned-probe IVF: the integer-exact coarse quantizer makes
        # cell membership + probe sets SQL-derivable, so the LAST
        # rows-only entry is now value-oracled (recall tests remain)
        "ann_ivf": analytics.ann_ivf_sql(),
        # link-graph family (AWAITING_SLOT): planted-derivation oracles
        # over documents (the anchors are pure functions of doc_id —
        # pipelines/linkgraph.py), PageRank rounds unrolled as CTEs
        "pagerank_docs": analytics.pagerank_docs_sql(),
        "anchor_text_index": linkgraph.anchor_text_index_sql(),
        "page_links_sample": linkgraph.page_links_sample_sql(),
        "link_graph": linkgraph.link_graph_sql(),
        "pagerank_links": linkgraph.pagerank_links_sql(),
        "section_quality_stats": oracle.section_quality_stats_sql(),
        "crawl_frontier": linkgraph.crawl_frontier_sql(),
        "page_metadata": linkgraph.page_metadata_sql(),
        "pages_delta": analytics.pages_delta_sql(),
        "url_blocklist_filter": analytics.url_blocklist_filter_sql(),
        "snapshot_neardup_ingest": analytics.snapshot_neardup_ingest_sql(),
        # session-10 TPC-H completion set + CDC chunking
        "forecast_revenue": relational.forecast_revenue_sql(),
        "late_order_priority_counts":
            relational.late_order_priority_counts_sql(),
        "customer_order_counts_hist":
            relational.customer_order_counts_hist_sql(),
        "idle_customer_balance": relational.idle_customer_balance_sql(),
        "small_quantity_revenue": relational.small_quantity_revenue_sql(),
        "disjunctive_revenue": relational.disjunctive_revenue_sql(),
        "nation_pair_volume": relational.nation_pair_volume_sql(),
        "cdc_chunk_stats": analytics.cdc_chunk_stats_sql(),
        # the merged (base + insert-upsert + replace-upsert) store must
        # equal a from-scratch full run, so it shares the flagship's
        # value-hash oracle — insert/replace/don't-touch all gated
        "extract_upsert": oracle.extract_pipeline_sql(),
        # per-seed unrolled restart-gated rounds over the shared
        # weighted edge CTE
        "ppr_related": linkgraph.ppr_related_sql(),
    }
