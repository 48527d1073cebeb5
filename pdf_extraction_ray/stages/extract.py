"""Extraction stages: sniff/validate, direct extraction actor pool,
PDF page-range sharding, fragment extraction, groupby-url reassembly.

Ray Data mapping (SURVEY.md §7.4):

* ``sniff_validate_batch`` — stateless ``map_batches`` task, zero-copy
  Arrow in/out; adds content_type / size / status / page_count / bucket.
* ``ExtractorActor`` — the heavy stage; a callable class for
  ``map_batches(cls, concurrency=(m, n))`` so parser state (config,
  compiled regexes) is built once per actor
  (reference analog: per-process client singletons,
  app/services/gemini_client.py:11-42).
* ``shard_pdf_batch`` — skew splitting: oversized PDFs explode into
  page-range shard rows carrying ONLY their pages' content streams (the
  200 MB source payload does not fan out with the shards).
* ``FragmentExtractor`` + ``reassemble_group`` — shard extraction and
  groupby(url) reassembly with page-ordered concatenation and span
  re-basing (SURVEY.md §7.5 hard parts #1-2).

All output tables share OUT_SCHEMA so the direct and sharded paths union
cleanly.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..functions import pdf_extract
from ..functions.finalize import (Primary, STATUS_COMPLETED, STATUS_PARTIAL,
                                  STATUS_REJECTED, finalize_row)
from ..functions.hashing import url_bucket
from ..functions.html_extract import Span, extract_html
from ..functions.sniff import CT_HTML, CT_PDF, CT_TEXT, sniff_content_type, validate_payload

SPAN_TYPE = pa.list_(pa.struct([
    ("start", pa.int64()), ("end", pa.int64()),
    ("kind", pa.string()), ("page", pa.int32()),
]))

OUT_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("lang", pa.string()),
    ("content_type", pa.string()),
    ("status", pa.string()),
    ("error", pa.string()),
    ("route", pa.string()),
    ("quality_pct", pa.int64()),
    ("doc_kind", pa.string()),
    ("doc_conf_pct", pa.int64()),
    ("doc_method", pa.string()),
    ("extracted_text", pa.large_string()),
    ("n_chars", pa.int64()),
    ("n_blocks", pa.int64()),
    ("n_pages", pa.int64()),
    ("spans", SPAN_TYPE),
    ("text_sha256", pa.string()),
    ("attempts", pa.int64()),
    ("bucket", pa.int64()),
])

SHARD_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("lang", pa.string()),
    ("text", pa.large_string()),
    ("content_type", pa.string()),
    ("bucket", pa.int64()),
    ("first_page", pa.int64()),
    ("n_pages_total", pa.int64()),
    ("n_shards", pa.int64()),
    ("streams", pa.list_(pa.large_binary())),
])

FRAGMENT_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("lang", pa.string()),
    ("text", pa.large_string()),
    ("content_type", pa.string()),
    ("bucket", pa.int64()),
    ("first_page", pa.int64()),
    ("n_pages_total", pa.int64()),
    ("n_shards", pa.int64()),
    ("frag_text", pa.large_string()),
    ("frag_spans", SPAN_TYPE),
    ("frag_lines", pa.int64()),
    ("frag_pages", pa.int64()),
])


def sniff_validate_batch(batch: pa.Table, cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Adds content_type, size, status, error, page_count, bucket columns.

    Row-level rejection instead of request errors
    (reference: app/services/file_validator.py:32-81 → SURVEY.md §2.9).
    """
    payloads = batch["html"]
    urls = batch["url"].to_pylist()
    cts, statuses, errors, page_counts, buckets = [], [], [], [], []
    for i in range(len(batch)):
        payload = payloads[i].as_py() or b""
        ct = sniff_content_type(payload)
        ok, err = validate_payload(payload, ct, cfg.max_bytes)
        cts.append(ct)
        statuses.append(STATUS_COMPLETED if ok else STATUS_REJECTED)
        errors.append(err)
        page_counts.append(pdf_extract.page_count(payload)
                           if ok and ct == CT_PDF else 0)
        buckets.append(url_bucket(urls[i], cfg.n_buckets))
    size = pc.binary_length(payloads).cast(pa.int64())
    return (batch
            .append_column("size", size)
            .append_column("content_type", pa.array(cts, pa.string()))
            .append_column("status", pa.array(statuses, pa.string()))
            .append_column("error", pa.array(errors, pa.string()))
            .append_column("page_count", pa.array(page_counts, pa.int64()))
            .append_column("attempts", pa.array([1] * len(batch), pa.int64()))
            .append_column("bucket", pa.array(buckets, pa.int64())))


def _html_extractor(payload: bytes, cfg: PipelineConfig, attempts: int) -> Primary:
    h = extract_html(payload, cfg.link_density_max)
    return Primary(h.text, h.spans, h.element_count, h.heading_count,
                   h.table_row_counts, n_pages=1)


def _pdf_extractor(payload: bytes, cfg: PipelineConfig, attempts: int) -> Primary:
    p = pdf_extract.extract_pdf(payload, cfg.line_y_tolerance, cfg.column_gap_min)
    return Primary(p.text, p.spans, p.element_count, 0, [], p.n_pages)


def _text_extractor(payload: bytes, cfg: PipelineConfig, attempts: int) -> Primary:
    text = payload.decode("utf-8", errors="replace")
    lines = text.split("\n")
    spans, pos = [], 0
    for i, ln in enumerate(lines):
        if i > 0:
            pos += 1
        spans.append(Span(pos, pos + len(ln), "line", 1))
        pos += len(ln)
    return Primary(text, spans, len(lines), 0, [], 1)


# User-extension surface (SURVEY.md §2.11): content-type → extractor fn
# (payload, cfg, attempts) -> Primary. Register new media handlers here
# (the reference's analog is the doc_type override + service dispatch,
# app/routers/extraction.py:57,90-98).
EXTRACTOR_REGISTRY: dict[str, object] = {
    CT_HTML: _html_extractor,
    CT_PDF: _pdf_extractor,
    CT_TEXT: _text_extractor,
}


def _extract_primary(payload: bytes, ct: str, cfg: PipelineConfig,
                     attempts: int = 1) -> Primary:
    fn = None
    if cfg.extractor_overrides:
        fn = cfg.extractor_overrides.get(ct)
    if fn is None:
        fn = EXTRACTOR_REGISTRY.get(ct)
    if fn is None:
        return Primary()
    return fn(payload, cfg, attempts)


def out_table(records: list[dict]) -> pa.Table:
    """Columnar OUT_SCHEMA construction: plain columns from per-field
    lists, the spans list<struct> from flat arrays + offsets — ~3x faster
    than ``from_pylist`` with nested span dicts on span-heavy batches.
    ``records`` are ``finalize_row`` outputs (spans = list[Span])."""
    cols: dict[str, object] = {}
    for field in OUT_SCHEMA:
        if field.name == "spans":
            continue
        cols[field.name] = pa.array([r[field.name] for r in records],
                                    type=field.type)
    starts: list[int] = []
    ends: list[int] = []
    kinds: list[str] = []
    pages: list[int] = []
    offsets = [0]
    for r in records:
        for s in r["spans"]:
            starts.append(s.start)
            ends.append(s.end)
            kinds.append(s.kind)
            pages.append(s.page)
        offsets.append(len(starts))
    struct = pa.StructArray.from_arrays(
        [pa.array(starts, pa.int64()), pa.array(ends, pa.int64()),
         pa.array(kinds, pa.string()), pa.array(pages, pa.int32())],
        names=["start", "end", "kind", "page"])
    cols["spans"] = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
    return pa.table({f.name: cols[f.name] for f in OUT_SCHEMA})


class ExtractorActor:
    """Heavy per-document extraction — usable both as a plain function
    object for stateless ``map_batches`` tasks (default) and as an
    actor-pool class (``cfg.use_actors``) when per-actor state grows
    beyond compiled module state.

    One failed document becomes a ``status='partial'`` row, never a failed
    block (reference: app/services/pdf_extractor.py:588-618 partial rows;
    app/services/batch_processor.py:105-108 row isolation).
    """

    def __init__(self, cfg: PipelineConfig = DEFAULT_CONFIG):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        urls = batch["url"].to_pylist()
        tss = batch["warc_ts"].to_pylist()
        langs = batch["lang"].to_pylist()
        fallbacks = batch["text"].to_pylist()
        cts = batch["content_type"].to_pylist()
        statuses = batch["status"].to_pylist()
        errors = batch["error"].to_pylist()
        buckets = batch["bucket"].to_pylist()
        attempts = (batch["attempts"].to_pylist()
                    if "attempts" in batch.column_names else [1] * len(batch))
        payloads = batch["html"]
        records: list[dict] = []
        for i in range(len(batch)):
            if statuses[i] == STATUS_REJECTED:
                rec = finalize_row(urls[i], tss[i], langs[i], fallbacks[i] or "",
                                   cts[i], STATUS_REJECTED, errors[i], None,
                                   cfg.quality_threshold_pct, attempts[i])
            else:
                try:
                    primary = _extract_primary(payloads[i].as_py() or b"",
                                               cts[i], cfg, attempts[i])
                    rec = finalize_row(urls[i], tss[i], langs[i], fallbacks[i] or "",
                                       cts[i], STATUS_COMPLETED, "", primary,
                                       cfg.quality_threshold_pct, attempts[i])
                except Exception as e:  # noqa: BLE001 — row-level isolation
                    rec = finalize_row(urls[i], tss[i], langs[i], fallbacks[i] or "",
                                       cts[i], STATUS_PARTIAL,
                                       f"{type(e).__name__}: {e}", None,
                                       cfg.quality_threshold_pct, attempts[i])
            rec["bucket"] = buckets[i]
            records.append(rec)
        return out_table(records)


def shard_pdf_batch(batch: pa.Table, cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Skew splitting: one oversized PDF row → N page-range shard rows.

    The structural scan (object boundaries, page tree) is cheap; the costly
    text tokenization happens downstream per shard, in parallel. Shards
    carry only their own pages' content streams, so bytes shipped scale
    with the range, not the whole document.
    """
    rows = []
    for i in range(len(batch)):
        payload = batch["html"][i].as_py() or b""
        streams = pdf_extract.page_content_streams(payload)
        per = cfg.pages_per_shard
        ranges = [(lo, min(lo + per, len(streams)))
                  for lo in range(0, len(streams), per)] or [(0, 0)]
        for lo, hi in ranges:
            rows.append({
                "url": batch["url"][i].as_py(),
                "warc_ts": batch["warc_ts"][i].as_py(),
                "lang": batch["lang"][i].as_py(),
                "text": batch["text"][i].as_py() or "",
                "content_type": batch["content_type"][i].as_py(),
                "bucket": batch["bucket"][i].as_py(),
                "first_page": lo + 1,
                "n_pages_total": len(streams),
                "n_shards": len(ranges),
                "streams": list(streams[lo:hi]),
            })
    return pa.Table.from_pylist(rows, schema=SHARD_SCHEMA)


class FragmentExtractor:
    """Extract one page-range shard; emits fragment text + local spans."""

    def __init__(self, cfg: PipelineConfig = DEFAULT_CONFIG):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        rows = []
        for i in range(len(batch)):
            streams = [s for s in batch["streams"][i].as_py()]
            first_page = batch["first_page"][i].as_py()
            frag = pdf_extract.extract_pdf_pages(
                streams, first_page, cfg.line_y_tolerance, cfg.column_gap_min)
            rows.append({
                "url": batch["url"][i].as_py(),
                "warc_ts": batch["warc_ts"][i].as_py(),
                "lang": batch["lang"][i].as_py(),
                "text": batch["text"][i].as_py() or "",
                "content_type": batch["content_type"][i].as_py(),
                "bucket": batch["bucket"][i].as_py(),
                "first_page": first_page,
                "n_pages_total": batch["n_pages_total"][i].as_py(),
                "n_shards": batch["n_shards"][i].as_py(),
                "frag_text": frag.text,
                "frag_spans": [
                    {"start": s.start, "end": s.end, "kind": s.kind, "page": s.page}
                    for s in frag.spans
                ],
                "frag_lines": frag.element_count,
                "frag_pages": frag.n_pages,
            })
        return pa.Table.from_pylist(rows, schema=FRAGMENT_SCHEMA)


def reassemble_group(group: pa.Table,
                     cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """groupby(url) reassembly of page-range fragments.

    Deterministic: fragments sort by first_page; texts concatenate with a
    single ``\\n`` between non-empty-line fragments (matching the whole-doc
    parse, which joins all lines with ``\\n``); span offsets re-base onto
    the concatenated text (SURVEY.md §7.5 hard part #2).
    """
    group = group.sort_by("first_page")
    text_parts: list[str] = []
    spans: list[Span] = []
    pos = 0
    total_lines = 0
    for i in range(len(group)):
        frag_lines = group["frag_lines"][i].as_py()
        if frag_lines == 0:
            continue
        if total_lines > 0:
            pos += 1  # "\n" joint between fragments
        frag_text = group["frag_text"][i].as_py()
        for s in group["frag_spans"][i].as_py():
            spans.append(Span(s["start"] + pos, s["end"] + pos, s["kind"], s["page"]))
        text_parts.append(frag_text)
        pos += len(frag_text)
        total_lines += frag_lines

    primary = Primary(
        text="\n".join(text_parts),
        spans=spans,
        element_count=total_lines,
        heading_count=0,
        table_row_counts=[],
        n_pages=group["n_pages_total"][0].as_py(),
    )
    rec = finalize_row(
        group["url"][0].as_py(), group["warc_ts"][0].as_py(),
        group["lang"][0].as_py(), group["text"][0].as_py() or "",
        group["content_type"][0].as_py(), STATUS_COMPLETED, "", primary,
        cfg.quality_threshold_pct)
    rec["bucket"] = group["bucket"][0].as_py()
    return out_table([rec])
