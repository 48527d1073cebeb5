"""Extraction stages of the single-pass pipeline.

Ray Data mapping (SURVEY.md §7.4):

* ``sniff_validate_batch`` — stateless ``map_batches`` task, zero-copy
  Arrow in/out; adds content_type / size / status / page_count / bucket.
* ``ExtractOrSplit`` — the heavy per-document stage: full extraction for
  normal documents; oversized PDFs are structurally split into page-range
  fragment rows carrying ONLY their pages' content streams (a 200 MB
  source payload does not fan out with its shards).
* ``ParseFragments`` — tokenizes fragment rows (block-parallel), passes
  final rows through.
* ``finalize_bucket`` — per-url-hash-bucket finisher: groupby-url
  fragment reassembly with page-ordered concatenation + span re-basing
  (SURVEY.md §7.5 hard parts #1-2) and exact first-wins dedup; runs
  inside the pipeline's single all-to-all (groupby bucket).
* ``ExtractorActor`` — whole-document extraction as one stage; used by
  the semantic-retry pass and available as an actor-pool class
  (reference analog for pinned state: per-process client singletons,
  app/services/gemini_client.py:11-42).

Stages output OUT_SCHEMA / WORK_SCHEMA tables built columnar.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..functions import pdf_extract
from ..functions.finalize import (Primary, STATUS_COMPLETED, STATUS_PARTIAL,
                                  STATUS_REJECTED, finalize_row)
from ..functions.retry_policy import error_label
from ..functions.hashing import url_bucket
from ..functions.html_extract import Span, extract_html
from ..functions.sniff import (CT_HTML, CT_PDF, CT_TEXT,
                               sniff_content_type, validate_meta)

SPAN_TYPE = pa.list_(pa.struct([
    ("start", pa.int64()), ("end", pa.int64()),
    ("kind", pa.string()), ("page", pa.int32()),
]))

# layout elements with bounding boxes (SURVEY.md §1.2; reference:
# BoundingBox per element, app/models/extraction.py:169-181)
ELEMENT_TYPE = pa.list_(pa.struct([
    ("kind", pa.string()), ("page", pa.int32()),
    ("x0", pa.int32()), ("y0", pa.int32()),
    ("x1", pa.int32()), ("y1", pa.int32()),
]))

_ELEMENT_FIELDS = ("kind", "page", "x0", "y0", "x1", "y1")
_ELEMENT_PA_TYPES = (pa.string(), pa.int32(), pa.int32(), pa.int32(),
                     pa.int32(), pa.int32())


def _elements_column(records: list[dict]) -> pa.ListArray:
    """Flat-arrays + offsets construction of the elements column.

    Elements are ``pdf_extract.Element`` NamedTuples (field order ==
    ``_ELEMENT_FIELDS``) — accessed positionally."""
    flat: list[list] = [[] for _ in _ELEMENT_FIELDS]
    offsets = [0]
    for r in records:
        for e in r.get("elements") or ():
            for k in range(6):
                flat[k].append(e[k])
        offsets.append(len(flat[0]))
    struct = pa.StructArray.from_arrays(
        [pa.array(v, t) for v, t in zip(flat, _ELEMENT_PA_TYPES)],
        names=list(_ELEMENT_FIELDS))
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)

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
    ("elements", ELEMENT_TYPE),
    ("text_sha256", pa.string()),
    ("attempts", pa.int64()),
    ("bucket", pa.int64()),
])

# single-pass pipeline working schema: final rows and page-range fragment
# rows share one table (row_kind: 'final' | 'frag_raw' | 'frag');
# frag_raw rows still carry their content streams, frag rows their parsed
# text/spans in the extracted_text/spans columns (local offsets, absolute
# page numbers)
WORK_SCHEMA = pa.schema(
    list(OUT_SCHEMA)
    + [
        ("row_kind", pa.string()),
        ("fallback_text", pa.large_string()),
        ("first_page", pa.int64()),
        ("n_pages_total", pa.int64()),
        ("streams", pa.list_(pa.large_binary())),
    ])


def _spans_column(span_lists) -> pa.ListArray:
    """Flat-arrays + offsets construction of the spans list<struct>
    column (the elements twin of ``_elements_column``); ``span_lists``
    is an iterable of per-row Span sequences."""
    starts: list[int] = []
    ends: list[int] = []
    kinds: list[str] = []
    pages: list[int] = []
    offsets = [0]
    for spans in span_lists:
        for sp in spans:
            starts.append(sp.start)
            ends.append(sp.end)
            kinds.append(sp.kind)
            pages.append(sp.page)
        offsets.append(len(starts))
    struct = pa.StructArray.from_arrays(
        [pa.array(starts, pa.int64()), pa.array(ends, pa.int64()),
         pa.array(kinds, pa.string()), pa.array(pages, pa.int32())],
        names=["start", "end", "kind", "page"])
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)


def work_table(records: list[dict]) -> pa.Table:
    """Columnar WORK_SCHEMA construction (see ``out_table``)."""
    cols: dict[str, object] = {}
    for field in WORK_SCHEMA:
        if field.name in ("spans", "streams", "elements"):
            continue
        cols[field.name] = pa.array([r[field.name] for r in records],
                                    type=field.type)
    cols["elements"] = _elements_column(records)
    cols["spans"] = _spans_column(r["spans"] for r in records)
    cols["streams"] = pa.array([r.get("streams") for r in records],
                               type=pa.list_(pa.large_binary()))
    return pa.table({f.name: cols[f.name] for f in WORK_SCHEMA})


def finalize_table(urls: list, tss: list, langs: list, fallbacks: list,
                   cts: list, statuses: list, errors: list,
                   primaries: list, attempts: list, buckets: list,
                   quality_threshold_pct: int) -> pa.Table:
    """Columnar batch finalize → OUT_SCHEMA table.

    The vectorized twin of ``functions.finalize.finalize_row`` (which the
    low-volume reassembly path still uses): quality, routing, and the
    classifier cascade run as numpy / Arrow C kernels over the whole
    batch instead of per row — the round-1 per-row finalize was ~half the
    extraction stage's non-parse cost. Semantics are pinned identical by
    the golden byte-identity suite and the value-hash oracles.

    ``primaries[i]`` is a Primary or None (rejected / partial rows).
    """
    import numpy as np

    from ..functions.classify import classify_batch
    from ..functions.hashing import sha256_hex
    from ..functions.quality import quality_batch

    n = len(urls)
    scored = np.fromiter((p is not None for p in primaries), bool, n)
    prim_text = [p.text if p is not None else "" for p in primaries]
    text_len = np.fromiter((len(t) for t in prim_text), np.int64, n)
    elem = np.fromiter((p.element_count if p is not None else 0
                        for p in primaries), np.int64, n)
    heads = np.fromiter((p.heading_count if p is not None else 0
                         for p in primaries), np.int64, n)
    has_tbl = np.fromiter((bool(p.table_row_counts) if p is not None
                           else False for p in primaries), bool, n)
    has_valid = np.fromiter(
        (any(r > 3 for r in p.table_row_counts) if p is not None else False
         for p in primaries), bool, n)

    q = np.where(scored,
                 quality_batch(text_len, elem, heads, has_tbl, has_valid), 0)
    salvage = scored & (q < quality_threshold_pct)
    primary_route = scored & ~salvage
    route = np.select([primary_route, salvage],
                      ["primary", "salvage"], "none")

    texts = [prim_text[i] if primary_route[i]
             else ((fallbacks[i] or "") if salvage[i] else "")
             for i in range(n)]
    text_arr = pa.array(texts, pa.large_string())
    n_chars = np.fromiter((len(t) for t in texts), np.int64, n)

    kinds, confs, methods = classify_batch(pa.array(urls, pa.string()),
                                           text_arr)
    kinds = np.where(scored, kinds, "unknown")
    confs = np.where(scored, confs, 0)
    methods = np.where(scored, methods, "none")

    # spans / elements: primary rows keep the parse output; salvage rows
    # carry one whole-document span; rejected/partial rows none
    starts: list[int] = []
    ends: list[int] = []
    span_kinds: list[str] = []
    span_pages: list[int] = []
    offsets = [0]
    el_records: list[dict] = []
    for i in range(n):
        if primary_route[i]:
            for s in primaries[i].spans:
                starts.append(s.start)
                ends.append(s.end)
                span_kinds.append(s.kind)
                span_pages.append(s.page)
            el_records.append({"elements": primaries[i].elements})
        else:
            if salvage[i] and n_chars[i] > 0:
                starts.append(0)
                ends.append(int(n_chars[i]))
                span_kinds.append("document")
                span_pages.append(0)
            el_records.append({"elements": ()})
        offsets.append(len(starts))
    span_struct = pa.StructArray.from_arrays(
        [pa.array(starts, pa.int64()), pa.array(ends, pa.int64()),
         pa.array(span_kinds, pa.string()), pa.array(span_pages, pa.int32())],
        names=["start", "end", "kind", "page"])
    spans_col = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                         span_struct)

    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "lang": pa.array(langs, pa.string()),
        "content_type": pa.array(cts, pa.string()),
        "status": pa.array(statuses, pa.string()),
        "error": pa.array(errors, pa.string()),
        "route": pa.array(route, pa.string()),
        "quality_pct": pa.array(q.astype(np.int64), pa.int64()),
        "doc_kind": pa.array(kinds, pa.string()),
        "doc_conf_pct": pa.array(confs.astype(np.int64), pa.int64()),
        "doc_method": pa.array(methods, pa.string()),
        "extracted_text": text_arr,
        "n_chars": pa.array(n_chars, pa.int64()),
        "n_blocks": pa.array(elem, pa.int64()),
        "n_pages": pa.array([p.n_pages if p is not None else 0
                             for p in primaries], pa.int64()),
        "spans": spans_col,
        "elements": _elements_column(el_records),
        "text_sha256": pa.array([sha256_hex(t) for t in texts], pa.string()),
        "attempts": pa.array(attempts, pa.int64()),
        "bucket": pa.array(buckets, pa.int64()),
    })


def _to_work(out_tbl: pa.Table) -> pa.Table:
    """Append the WORK_SCHEMA carrier columns to finalized rows."""
    n = len(out_tbl)
    return (out_tbl
            .append_column("row_kind", pa.array(["final"] * n, pa.string()))
            .append_column("fallback_text",
                           pa.array([""] * n, pa.large_string()))
            .append_column("first_page", pa.array([0] * n, pa.int64()))
            .append_column("n_pages_total", pa.array([0] * n, pa.int64()))
            .append_column("streams",
                           pa.nulls(n, pa.list_(pa.large_binary()))))


class ExtractOrSplit:
    """The fused per-document stage of the single-pass pipeline.

    Non-oversized documents are fully extracted here (final rows);
    oversized PDFs get a cheap structural split into page-range fragment
    rows (``frag_raw``) that carry only their own content streams — the
    heavy tokenization happens downstream in ``ParseFragments`` so one
    giant document's shards spread across tasks via block splitting.
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
        page_counts = batch["page_count"].to_pylist()
        attempts = (batch["attempts"].to_pylist()
                    if "attempts" in batch.column_names else [1] * len(batch))
        payloads = batch["html"]
        frag_records: list[dict] = []
        keep: list[int] = []
        primaries: list = []
        out_status: list[str] = []
        out_error: list[str] = []
        for i in range(len(batch)):
            big = (cts[i] == CT_PDF and statuses[i] == STATUS_COMPLETED
                   and page_counts[i] > cfg.split_page_threshold)
            if big:
                payload = payloads[i].as_py() or b""
                try:
                    streams = pdf_extract.page_content_streams(payload)
                except Exception:  # noqa: BLE001 — row isolation: a
                    # malformed "oversized" PDF must not fail the task;
                    # the whole-document path below converts the parse
                    # failure into a status='partial' row
                    streams = []
                if not streams:
                    big = False  # fall through to the whole-doc path —
                    # a row must NEVER silently vanish from the output
            if big:
                per = cfg.pages_per_shard
                for lo in range(0, len(streams), per):
                    hi = min(lo + per, len(streams))
                    frag_records.append({
                        "url": urls[i], "warc_ts": tss[i], "lang": langs[i],
                        "content_type": cts[i], "status": "", "error": "",
                        "route": "", "quality_pct": 0, "doc_kind": "",
                        "doc_conf_pct": 0, "doc_method": "",
                        "extracted_text": "", "n_chars": 0, "n_blocks": 0,
                        "n_pages": 0, "spans": [], "elements": [],
                        "text_sha256": "",
                        "attempts": attempts[i], "bucket": buckets[i],
                        "row_kind": "frag_raw",
                        "fallback_text": fallbacks[i] or "",
                        "first_page": lo + 1,
                        "n_pages_total": len(streams),
                        "streams": list(streams[lo:hi]),
                    })
                continue
            keep.append(i)
            if statuses[i] == STATUS_REJECTED:
                primaries.append(None)
                out_status.append(STATUS_REJECTED)
                out_error.append(errors[i])
                continue
            try:
                primaries.append(_extract_primary(payloads[i].as_py() or b"",
                                                  cts[i], cfg, attempts[i]))
                out_status.append(STATUS_COMPLETED)
                out_error.append("")
            except Exception as e:  # noqa: BLE001 — row-level isolation
                primaries.append(None)
                out_status.append(STATUS_PARTIAL)
                out_error.append(error_label(e))
        out = finalize_table(
            [urls[i] for i in keep], [tss[i] for i in keep],
            [langs[i] for i in keep], [fallbacks[i] for i in keep],
            [cts[i] for i in keep], out_status, out_error, primaries,
            [attempts[i] for i in keep], [buckets[i] for i in keep],
            cfg.quality_threshold_pct)
        work = _to_work(out)
        if frag_records:
            work = pa.concat_tables([work, work_table(frag_records)])
        return work


class ParseFragments:
    """Tokenize ``frag_raw`` rows; final rows pass through untouched."""

    def __init__(self, cfg: PipelineConfig = DEFAULT_CONFIG):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["row_kind"].to_pylist()
        if "frag_raw" not in kinds:
            return batch
        cfg = self.cfg
        records: list[dict] = []
        passthrough_mask = []
        for i in range(len(batch)):
            if kinds[i] != "frag_raw":
                passthrough_mask.append(True)
                continue
            passthrough_mask.append(False)
            streams = [s for s in batch["streams"][i].as_py()]
            first_page = batch["first_page"][i].as_py()
            frag_error = ""
            try:
                frag = pdf_extract.extract_pdf_pages(
                    streams, first_page, cfg.line_y_tolerance,
                    cfg.column_gap_min, deadline=_deadline(cfg))
            except Exception as e:  # noqa: BLE001 — row isolation: one
                # bad page-range shard poisons its DOCUMENT (reassembly
                # turns any errored fragment into a partial row), never
                # the task
                from ..functions.pdf_extract import PdfExtract
                frag = PdfExtract("", [], 0, 0, [], [])
                frag_error = error_label(e)
            records.append({
                "url": batch["url"][i].as_py(),
                "warc_ts": batch["warc_ts"][i].as_py(),
                "lang": batch["lang"][i].as_py(),
                "content_type": batch["content_type"][i].as_py(),
                "status": "", "error": frag_error, "route": "",
                "quality_pct": 0,
                "doc_kind": "", "doc_conf_pct": 0, "doc_method": "",
                "extracted_text": frag.text, "n_chars": len(frag.text),
                "n_blocks": frag.element_count, "n_pages": frag.n_pages,
                "spans": frag.spans,
                "elements": frag.elements,
                "text_sha256": "",
                "attempts": batch["attempts"][i].as_py(),
                "bucket": batch["bucket"][i].as_py(),
                "row_kind": "frag",
                "fallback_text": batch["fallback_text"][i].as_py() or "",
                "first_page": first_page,
                "n_pages_total": batch["n_pages_total"][i].as_py(),
                "streams": None,
            })
        kept = batch.filter(pa.array(passthrough_mask, pa.bool_()))
        if not records:
            return kept
        frag_table = work_table(records)
        return pa.concat_tables([kept, frag_table]) if len(kept) else frag_table


def finalize_bucket(group: pa.Table, cfg: PipelineConfig = DEFAULT_CONFIG,
                    dedup: bool = True) -> pa.Table:
    """The bucket-partition finisher: groupby-url fragment reassembly +
    exact first-wins dedup, all local to one url-hash bucket.

    Co-location invariant (documented per north rule): every row of a url
    — duplicates and page-range fragments alike — carries the same
    ``bucket`` (a pure url hash), so reassembly and dedup never need a
    second shuffle.
    """
    rk = group["row_kind"]
    has_frag = bool(pc.any(pc.not_equal(rk, "final")).as_py()) if len(group) else False
    if has_frag:
        final_mask = pc.equal(rk, "final")
        finals = group.filter(final_mask)
        frags = group.filter(pc.invert(final_mask))
    else:
        # common case: no oversized-document fragments in this bucket —
        # skip the two full-table gathers (nested span/element columns
        # make filter/take the dominant finalize cost)
        finals = group
        frags = group.slice(0, 0)

    out_records: list[dict] = []
    frag_tbl: pa.Table | None = None
    if len(frags):
        import numpy as np

        # ONE global (url, warc_ts, first_page) sort + gather of the
        # needed columns, then every per-document group is a zero-copy
        # slice — the previous per-url ``frags.take`` paid a full
        # nested-column gather (and a streams-payload copy) per document
        # and dominated finalize CPU.
        cols = ["url", "warc_ts", "lang", "content_type", "fallback_text",
                "error", "extracted_text", "n_blocks", "n_pages_total",
                "first_page", "attempts", "bucket", "spans", "elements"]
        order = pc.sort_indices(
            frags.select(["url", "warc_ts", "first_page"]),
            sort_keys=[("url", "ascending"), ("warc_ts", "ascending"),
                       ("first_page", "ascending")])
        sf = frags.select(cols).take(order).combine_chunks()
        n_f = len(sf)
        urls_l = sf["url"].to_pylist()
        ts_np = sf["warc_ts"].to_numpy(zero_copy_only=False)
        urls_np = np.asarray(urls_l, dtype=object)
        new_grp = np.empty(n_f, bool)
        new_grp[0] = True
        new_grp[1:] = (urls_np[1:] != urls_np[:-1]) | (ts_np[1:] != ts_np[:-1])
        bounds = np.append(np.flatnonzero(new_grp), n_f)
        # global flat views (all zero-copy): span fields + element structs
        spans_list = sf["spans"].chunks[0]
        sp_offs = spans_list.offsets.to_numpy(zero_copy_only=False)
        sp_offs = sp_offs - sp_offs[0]  # flatten() trims to the list range
        sp_flat = spans_list.flatten()
        g_starts = sp_flat.field("start").to_numpy(zero_copy_only=False)
        g_ends = sp_flat.field("end").to_numpy(zero_copy_only=False)
        g_kinds = sp_flat.field("kind")
        g_pages = sp_flat.field("page")
        el_list = sf["elements"].chunks[0]
        el_offs = el_list.offsets.to_numpy(zero_copy_only=False)
        el_offs = el_offs - el_offs[0]
        el_flat = el_list.flatten()
        texts_l = sf["extracted_text"].to_pylist()
        nb_np = sf["n_blocks"].to_numpy(zero_copy_only=False)
        errors_l = sf["error"].to_pylist()
        langs_l = sf["lang"].to_pylist()
        cts_l = sf["content_type"].to_pylist()
        fallback_l = sf["fallback_text"].to_pylist()
        npt_np = sf["n_pages_total"].to_numpy(zero_copy_only=False)
        att_np = sf["attempts"].to_numpy(zero_copy_only=False)
        bkt_np = sf["bucket"].to_numpy(zero_copy_only=False)
        ts_l = sf["warc_ts"].to_pylist()

        # per-row parts of the reassembled spans / elements columns:
        # route=='primary' rows reference the rebased global flat arrays,
        # salvage rows a synthesized whole-document span, others empty
        sp_start_parts: list = []
        sp_end_parts: list = []
        sp_kind_parts: list = []
        sp_page_parts: list = []
        sp_counts: list[int] = []
        el_parts: list = []
        el_counts: list[int] = []
        for gi in range(len(bounds) - 1):
            a, b = int(bounds[gi]), int(bounds[gi + 1])
            offs: list[int] = []
            text_parts: list[str] = []
            pos = 0
            total_lines = 0
            for r in range(a, b):
                n = int(nb_np[r])
                if n == 0:
                    offs.append(0)
                    continue
                if total_lines > 0:
                    pos += 1  # "\n" joint between fragments
                offs.append(pos)
                text_parts.append(texts_l[r])
                pos += len(texts_l[r])
                total_lines += n
            frag_errs = [e for e in errors_l[a:b] if e]
            if frag_errs:
                # a failed page-range shard means the document could not
                # be fully parsed: emit a partial row (the whole-doc
                # path's row-isolation contract), never a half-document
                rec = finalize_row(
                    urls_l[a], ts_l[a], langs_l[a], fallback_l[a] or "",
                    cts_l[a], STATUS_PARTIAL, frag_errs[0], None,
                    cfg.quality_threshold_pct, int(att_np[a]))
                rec["bucket"] = int(bkt_np[a])
                out_records.append(rec)
                sp_counts.append(0)
                el_counts.append(0)
                continue
            # partitioning assumption (documented): oversized documents
            # carry no cross-shard tables, so reassembled table_row_counts
            # stay empty — per-fragment runs would otherwise need a merge
            primary = Primary(
                text="\n".join(text_parts), spans=[],
                element_count=total_lines, heading_count=0,
                table_row_counts=[],
                n_pages=int(npt_np[a]),
                elements=[])
            rec = finalize_row(
                urls_l[a], ts_l[a], langs_l[a], fallback_l[a] or "",
                cts_l[a], STATUS_COMPLETED, "",
                primary, cfg.quality_threshold_pct, int(att_np[a]))
            rec["bucket"] = int(bkt_np[a])
            out_records.append(rec)
            if rec["route"] == "primary":
                fo, lo = int(sp_offs[a]), int(sp_offs[b])
                counts = np.diff(sp_offs[a:b + 1])
                shift = np.repeat(np.asarray(offs, np.int64), counts)
                sp_start_parts.append(g_starts[fo:lo] + shift)
                sp_end_parts.append(g_ends[fo:lo] + shift)
                sp_kind_parts.append(g_kinds.slice(fo, lo - fo))
                sp_page_parts.append(g_pages.slice(fo, lo - fo))
                sp_counts.append(lo - fo)
                eo, eh = int(el_offs[a]), int(el_offs[b])
                el_parts.append(el_flat.slice(eo, eh - eo))
                el_counts.append(eh - eo)
            else:
                # salvage: finalize_row's whole-document span (or none)
                nc = rec["n_chars"]
                if nc > 0:
                    sp_start_parts.append(np.array([0], np.int64))
                    sp_end_parts.append(np.array([nc], np.int64))
                    sp_kind_parts.append(pa.array(["document"], pa.string()))
                    sp_page_parts.append(pa.array([0], pa.int32()))
                    sp_counts.append(1)
                else:
                    sp_counts.append(0)
                el_counts.append(0)
            rec["spans"] = ()
            rec["elements"] = ()

        frag_tbl = out_table(out_records)
        if sp_start_parts:
            starts_c = np.concatenate(sp_start_parts)
            ends_c = np.concatenate(sp_end_parts)
            kinds_c = pa.concat_arrays([a.combine_chunks()
                                        if isinstance(a, pa.ChunkedArray)
                                        else a for a in sp_kind_parts])
            pages_c = pa.concat_arrays([a.combine_chunks()
                                        if isinstance(a, pa.ChunkedArray)
                                        else a for a in sp_page_parts])
            span_struct = pa.StructArray.from_arrays(
                [pa.array(starts_c, pa.int64()), pa.array(ends_c, pa.int64()),
                 kinds_c.cast(pa.string()), pages_c.cast(pa.int32())],
                names=["start", "end", "kind", "page"])
            spans_col = pa.ListArray.from_arrays(
                pa.array(np.concatenate(([0], np.cumsum(sp_counts))),
                         pa.int32()),
                span_struct).cast(SPAN_TYPE)
            frag_tbl = frag_tbl.set_column(
                frag_tbl.schema.get_field_index("spans"),
                OUT_SCHEMA.field("spans"), spans_col)
        if any(el_counts):
            el_struct = pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                 for a in el_parts])
            el_col = pa.ListArray.from_arrays(
                pa.array(np.concatenate(([0], np.cumsum(el_counts))),
                         pa.int32()),
                el_struct).cast(ELEMENT_TYPE)
            frag_tbl = frag_tbl.set_column(
                frag_tbl.schema.get_field_index("elements"),
                OUT_SCHEMA.field("elements"), el_col)

    out = finals.select([f.name for f in OUT_SCHEMA])
    if frag_tbl is not None:
        out = pa.concat_tables([out, frag_tbl])
    if dedup and len(out):
        # exact first-wins: keep each url's minimum-warc_ts row
        # (reference: unique hash index, migrations/006:13-16).
        # Duplicates are rare, so detect them on the key column and only
        # then pay ONE filter pass over the nested-column table — row
        # order is not part of the output contract (results key on url;
        # manifests fingerprint order-insensitively). All vectorized:
        # sort (url, warc_ts, original-index) indices, keep each url's
        # first sorted occurrence — identical to min-(ts, index) wins.
        n = len(out)
        if pc.count_distinct(out["url"]).as_py() != n:
            import numpy as np

            idx = pa.array(np.arange(n, dtype=np.int64))
            order = pc.sort_indices(
                pa.table({"u": out["url"], "t": out["warc_ts"], "i": idx}),
                sort_keys=[("u", "ascending"), ("t", "ascending"),
                           ("i", "ascending")])
            ord_np = order.to_numpy()
            u_sorted = np.asarray(
                out["url"].take(order).to_numpy(zero_copy_only=False))
            first = np.empty(n, bool)
            first[0] = True
            first[1:] = u_sorted[1:] != u_sorted[:-1]
            keep = np.zeros(n, bool)
            keep[ord_np[first]] = True
            out = out.filter(pa.array(keep))
    return out


def finalize_block_write(block: pa.Table, cfg: PipelineConfig, dedup: bool,
                         out_dir: str) -> pa.Table:
    """Hash-shuffle finalize+write: one whole block of complete url-hash
    buckets → finalize once, then write each bucket's rows atomically.

    Used by the ``finalize_shuffle='hash'`` path, where the single
    all-to-all is a hash-keyed ``repartition(keys=['bucket'])`` instead of
    a range sort — each output block holds whole buckets, so the finisher
    runs per block (fewer, larger vectorized calls) and the per-bucket
    file layout is carved out locally with zero-copy slices.

    Correctness precondition (guarded, not assumed): every bucket must
    arrive WHOLE in one block. Ray's hash shuffle splits a partition
    into multiple blocks once it exceeds the target block size — size
    ``finalize_num_partitions`` so a partition's buckets stay under it.
    An atomic per-bucket claim marker turns a straddled bucket into a
    loud failure instead of silent partial dedup / clobbered files.
    """
    import os

    from ..state import checkpoint as ckpt

    if not len(block):
        return pa.Table.from_pylist([], schema=ckpt.MANIFEST_SCHEMA)
    out = finalize_bucket(block, cfg, dedup)
    tbl = out.sort_by("bucket")
    import numpy as np

    buckets = tbl["bucket"].to_numpy()
    bounds = [0] + (np.flatnonzero(np.diff(buckets)) + 1).tolist() + [len(tbl)]
    manifests = []
    claim_dir = os.path.join(out_dir, ckpt.MANIFEST_DIR)
    os.makedirs(claim_dir, exist_ok=True)
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        b = int(buckets[lo])
        sl = tbl.slice(lo, hi - lo)
        # claim carries this slice's row fingerprint: a Ray task RETRY
        # recomputes the identical slice and passes; a second block
        # carrying the same bucket has different rows and fails loudly
        fp = str(ckpt.rows_fingerprint(sl["url"].to_pylist(),
                                       sl["warc_ts"].to_pylist()))
        claim = os.path.join(claim_dir, f".claim-{b:05d}")
        try:
            fd = os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, fp.encode())
            os.close(fd)
        except FileExistsError:
            with open(claim) as f:
                prev = f.read()
            if prev != fp:
                raise RuntimeError(
                    f"bucket {b} arrived in more than one hash-shuffle "
                    "block (partition exceeded the block size and was "
                    "split) — raise finalize_num_partitions or use "
                    "finalize_shuffle='sort'") from None
        manifests.append(ckpt.write_bucket_group(sl, out_dir))
    return pa.concat_tables(manifests)


def _payload_views(batch: pa.Table):
    """Zero-copy per-row memoryviews of the ``html`` binary column.

    Avoids materializing every payload as Python bytes just to peek at
    magic bytes — at corpus scale that is hundreds of MB of memcpy per
    pass (the memory-bandwidth budget is the 32-core bottleneck)."""
    col = batch["html"].combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0) if col.num_chunks else pa.array([], pa.large_binary())
    import numpy as np
    base = col.offset  # sliced arrays index offsets from their base
    n_offs = base + len(col) + 1
    if pa.types.is_large_binary(col.type):
        offs = np.frombuffer(col.buffers()[1], dtype=np.int64, count=n_offs)
    else:
        offs = np.frombuffer(col.buffers()[1], dtype=np.int32, count=n_offs)
    data = memoryview(col.buffers()[2]) if col.buffers()[2] is not None else memoryview(b"")
    if base:
        offs = offs[base:]
    return offs, data


def sniff_validate_batch(batch: pa.Table, cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Adds content_type, size, status, error, page_count, bucket columns.

    Row-level rejection instead of request errors
    (reference: app/services/file_validator.py:32-81 → SURVEY.md §2.9).
    Sniffing reads payload bytes through zero-copy Arrow buffer views.
    """
    payloads = batch["html"]
    urls = batch["url"].to_pylist()
    offs, data = _payload_views(batch)
    cts, statuses, errors, page_counts, buckets = [], [], [], [], []
    for i in range(len(batch)):
        lo, hi = int(offs[i]), int(offs[i + 1])
        # tiny copy: all sniff probes are bounded to the first 4 KiB
        ct = sniff_content_type(bytes(data[lo:min(lo + 4096, hi)]))
        ok, err = validate_meta(hi - lo, ct, cfg.max_bytes)
        cts.append(ct)
        statuses.append(STATUS_COMPLETED if ok else STATUS_REJECTED)
        errors.append(err)
        if ok and ct == CT_PDF:
            try:
                pc_n = pdf_extract.page_count(data[lo:hi])
            except Exception:  # noqa: BLE001 — row isolation: a malformed
                # PDF must never fail the sniff TASK; page_count 0 routes
                # it down the whole-document path whose per-row try/except
                # turns a parse failure into a status='partial' row
                pc_n = 0
        else:
            pc_n = 0
        page_counts.append(pc_n)
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


def _deadline(cfg: PipelineConfig) -> float | None:
    if cfg.doc_timeout_s is None:
        return None
    import time
    return time.monotonic() + cfg.doc_timeout_s


def _html_extractor(payload: bytes, cfg: PipelineConfig, attempts: int) -> Primary:
    h = extract_html(payload, cfg.link_density_max, deadline=_deadline(cfg))
    return Primary(h.text, h.spans, h.element_count, h.heading_count,
                   h.table_row_counts, n_pages=1)


def _pdf_extractor(payload: bytes, cfg: PipelineConfig, attempts: int) -> Primary:
    p = pdf_extract.extract_pdf(payload, cfg.line_y_tolerance,
                                cfg.column_gap_min, deadline=_deadline(cfg))
    return Primary(p.text, p.spans, p.element_count, 0, p.table_row_counts,
                   p.n_pages, elements=p.elements)


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
        if field.name in ("spans", "elements"):
            continue
        cols[field.name] = pa.array([r[field.name] for r in records],
                                    type=field.type)
    cols["elements"] = _elements_column(records)
    cols["spans"] = _spans_column(r["spans"] for r in records)
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
        primaries: list = []
        out_status: list[str] = []
        out_error: list[str] = []
        for i in range(len(batch)):
            if statuses[i] == STATUS_REJECTED:
                primaries.append(None)
                out_status.append(STATUS_REJECTED)
                out_error.append(errors[i])
                continue
            try:
                primaries.append(_extract_primary(payloads[i].as_py() or b"",
                                                  cts[i], cfg, attempts[i]))
                out_status.append(STATUS_COMPLETED)
                out_error.append("")
            except Exception as e:  # noqa: BLE001 — row-level isolation
                primaries.append(None)
                out_status.append(STATUS_PARTIAL)
                out_error.append(error_label(e))
        return finalize_table(urls, tss, langs, fallbacks, cts, out_status,
                              out_error, primaries, attempts, buckets,
                              cfg.quality_threshold_pct)


