"""Pages-corpus materialization.

Builds the canonical input table ``(url, warc_ts, html, text, lang)``
(BASELINE.json ``input_hint``) deterministically from a test-data
``documents.parquet`` via sources/spec.py, as a Ray Data job:
``read_parquet → map_batches(build) → write_parquet``, cached under /tmp
keyed by (sf dir name, spec version). Duplicate rows (~2%, spec.DUP_MOD)
share a url with a +1 h timestamp to exercise exact first-wins dedup
(reference analog: migrations/006_add_constraints_and_indexes.sql:10-20).

``build_pages_batch`` is pure (no Ray) so tests can synthesize small
corpora serially; the Ray path wraps it unchanged.
"""

from __future__ import annotations

import os
import shutil
from datetime import timedelta
from pathlib import Path

import pyarrow as pa

from . import gen_html, gen_pdf, spec

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.large_binary()),
    ("text", pa.large_string()),
    ("lang", pa.string()),
])


def build_page_row(doc_id: int, text: str, source: str, lang: str) -> dict:
    k = spec.kind_of(doc_id)
    if k.startswith("html_") or k == "oversize":
        payload = gen_html.build_html(doc_id, text, source)
    elif k == "pdf_scanned":
        payload = gen_pdf.build_pdf([], no_text=True, n_empty_pages=2,
                                    variant=spec.pdf_variant(doc_id))
    elif k.startswith("pdf"):
        payload = gen_pdf.build_pdf(spec.pdf_line_specs(doc_id, text, source),
                                    lines_per_page=spec.LINES_PER_PAGE,
                                    two_column=spec.pdf_twocol(doc_id),
                                    variant=spec.pdf_variant(doc_id),
                                    text_style=spec.pdf_text_style(doc_id))
    elif k == "garbage":
        payload = spec.garbage_bytes(doc_id)
    elif k == "empty":
        payload = b""
    else:
        raise ValueError(k)
    return {
        "url": spec.url_of(doc_id, source),
        "warc_ts": spec.warc_ts_of(doc_id),
        "html": payload,
        "text": spec.fallback_text(doc_id, text, source),
        "lang": lang,
    }


AMPLIFY_STRIDE = 100_000  # replica r shifts doc_id by r*stride; stride % 100
                          # == 0 keeps every kind/url-suffix distribution


def build_pages_batch(batch: pa.Table, amplify: int = 1) -> pa.Table:
    """documents rows → pages rows (1 row per replica, plus a duplicate
    every DUP_MOD). ``amplify`` replicates each document with shifted
    doc_ids so benchmark corpora are arbitrarily heavier while keeping the
    exact kind mix (FIXTURES.md: bench sized so steady-state dominates)."""
    rows: list[dict] = []
    for doc_id, text, source, lang in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist(),
            batch["source"].to_pylist(), batch["lang"].to_pylist()):
        for r in range(amplify):
            rid = doc_id + r * AMPLIFY_STRIDE
            row = build_page_row(rid, text, source, lang)
            rows.append(row)
            if spec.is_dup(rid):
                dup = dict(row)
                dup["warc_ts"] = row["warc_ts"] + timedelta(seconds=spec.DUP_OFFSET_S)
                rows.append(dup)
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def derived_parquet(sf_dir: str, name: str, build):
    """Digest-keyed DISK cache for a small derived table (signatures,
    cluster assignments, link edges): ``build()`` returns the dataset
    to persist; any process over the same corpus — a later battery
    chunk, a rerun — re-reads the parquet instead of re-deriving the
    chain. Publish is the ensure_pages_corpus discipline (write .tmp →
    atomic rename → _SUCCESS marker); a concurrent builder losing the
    rename race discards its copy and reads the winner's. Returns a
    ray.data Dataset backed by the published parquet."""
    import glob as _glob

    import ray.data as rd

    out = Path("/tmp/pdf_extraction_ray/derived") / (
        f"{Path(sf_dir).name or 'sf'}-{name}-{spec.SPEC_VERSION}-"
        f"{_input_digest(sf_dir)}")
    marker = out / "_SUCCESS"
    if not marker.exists():
        # sweep orphaned tmp dirs of CRASHED builders only: the suffix
        # is the owning pid, and a tmp whose builder is still ALIVE
        # must not be touched — deleting a live builder's in-progress
        # dir could publish a truncated table under _SUCCESS (review
        # finding); /proc/<pid> existence is the liveness check
        for stale in _glob.glob(f"{out}.tmp-*"):
            pid = stale.rsplit("-", 1)[-1]
            if pid.isdigit() and os.path.exists(f"/proc/{pid}"):
                continue  # live concurrent builder — leave it alone
            shutil.rmtree(stale, ignore_errors=True)
        tmp = Path(f"{out}.tmp-{os.getpid()}")
        if tmp.exists():
            shutil.rmtree(tmp)
        tmp.parent.mkdir(parents=True, exist_ok=True)
        # materialize BEFORE writing: the empty-build branch below
        # needs ds.schema(), which on a lazy lineage would re-execute
        # the whole build a second time (review finding); the derived
        # tables are small by contract, so the pin is bounded
        ds = build().materialize()
        ds.write_parquet(str(tmp))
        if not tmp.exists():
            # Ray writes NOTHING for a 0-row dataset (verified on
            # 2.49): persist an explicit empty file with the build's
            # schema so readers get a typed empty table instead of a
            # forever-crashing missing path (review finding)
            import pyarrow.parquet as _pq

            sch = ds.schema()
            base = getattr(sch, "base_schema", None)
            if not isinstance(base, pa.Schema):
                raise RuntimeError(
                    f"derived_parquet({name}): empty build result with "
                    "no Arrow schema — cannot persist a typed empty "
                    "table")
            tmp.mkdir(parents=True)
            _pq.write_table(base.empty_table(),
                            tmp / "part-empty.parquet")
        try:
            tmp.rename(out)
        except OSError:
            if out.exists():  # lost the publish race to another builder
                shutil.rmtree(tmp, ignore_errors=True)
            else:  # a REAL failure (EACCES, ...) must not masquerade
                raise
        marker.touch()
    return rd.read_parquet(str(out))


def corpus_cache_dir(sf_dir: str, root: str = "/tmp/pdf_extraction_ray/corpus",
                     amplify: int = 1) -> Path:
    name = Path(sf_dir).name or "sf"
    # -rg tag: row-group layout is part of the cache identity (finer row
    # groups let read_parquet split files into wave-sized blocks)
    suffix = (f"-x{amplify}" if amplify > 1 else "") + "-rg256"
    # the cache key carries an input identity digest (resolved path +
    # documents.parquet size/mtime): basename alone let two different
    # inputs named alike — or an in-place regenerated table — silently
    # share a cached corpus
    digest = _input_digest(sf_dir)
    return Path(root) / f"{name}-{spec.SPEC_VERSION}-{digest}{suffix}"


def _input_digest(sf_dir: str) -> str:
    import hashlib

    doc = Path(sf_dir) / "documents.parquet"
    try:
        st = doc.stat()
        key = f"{doc.resolve()}:{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        key = str(doc.resolve())
    return hashlib.sha256(key.encode()).hexdigest()[:8]


def ensure_pages_corpus(sf_dir: str,
                        root: str = "/tmp/pdf_extraction_ray/corpus",
                        amplify: int = 1) -> str:
    """Materialize (once) and return the pages-corpus parquet directory.

    Ray must already be initialized by the caller (driver contract).
    """
    out = corpus_cache_dir(sf_dir, root, amplify)
    marker = out / "_SUCCESS"
    if marker.exists():
        return str(out)
    from .tables import read_table

    # shared reader strips the pandas schema metadata that makes
    # pa.Schema unhashable in Ray's shuffle schema dedup (warning noise)
    docs = read_table(sf_dir, "documents")
    pages = docs.map_batches(
        lambda b, a=amplify: build_pages_batch(b, a),
        batch_format="pyarrow", batch_size=64)

    # Interleave rows by url hash so every output file carries a uniform
    # mix of payload kinds — doc_id-ordered files concentrate the heavy
    # oversized PDFs into a few files, which become straggler read blocks
    # at high parallelism (deterministic: pure function of url).
    def add_order(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import stable_hash64
        h = [stable_hash64("order:" + u) for u in batch["url"].to_pylist()]
        return batch.append_column("_order", pa.array(h, pa.uint64()))

    pages = (pages.map_batches(add_order, batch_format="pyarrow")
             .sort("_order")
             .map_batches(lambda b: b.drop_columns(["_order"]),
                          batch_format="pyarrow"))
    tmp = Path(str(out) + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.parent.mkdir(parents=True, exist_ok=True)
    # small files: Ray's parquet read can COALESCE files into read
    # tasks but never SPLIT one file across tasks, so ~CPU-count files
    # capped the extract stage at file-count tasks (a 2-wave straggler
    # tail on 32 CPUs). ~256-row files let _read_num_blocks
    # (pipelines/extraction.py) bundle them into wave-sized tasks at
    # any session width.
    pages.write_parquet(str(tmp), num_rows_per_file=256,
                        row_group_size=256)
    # atomic publish: rename, then marker (a killed builder leaves either
    # nothing or a complete marked directory, never a partial one)
    if out.exists():
        shutil.rmtree(out)
    tmp.rename(out)
    marker.touch()
    return str(out)
