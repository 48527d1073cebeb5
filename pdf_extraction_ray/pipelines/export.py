"""Export sinks: markdown rendering + file export, run-metrics rollup.

Markdown export mirrors the reference's DB-rows → human-readable .md
exporter (reference: scripts/export_extractions_md.py:142-200 — canonical
filenames, front-matter-ish header, body). Run metrics mirror the
``_batch_summary.json`` + stats endpoints
(reference: app/services/batch_processor.py:188-206,
app/routers/stats.py:116-278) computed from per-partition manifests.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd

from ..state import checkpoint as ckpt


def markdown_batch(batch: pa.Table) -> pa.Table:
    """Render extracted rows as markdown documents (deterministic)."""
    mds = []
    for i in range(len(batch)):
        url = batch["url"][i].as_py()
        md = (
            f"# {url}\n\n"
            f"- content_type: {batch['content_type'][i].as_py()}\n"
            f"- status: {batch['status'][i].as_py()}\n"
            f"- route: {batch['route'][i].as_py()}\n"
            f"- quality_pct: {batch['quality_pct'][i].as_py()}\n"
            f"- doc_kind: {batch['doc_kind'][i].as_py()}\n\n"
            f"{batch['extracted_text'][i].as_py()}\n"
        )
        mds.append(md)
    return pa.table({"url": batch["url"],
                     "md": pa.array(mds, pa.large_string())})


def markdown_sql_projection() -> str:
    """DuckDB expression mirroring ``markdown_batch`` over the expected
    CTE columns (oracle for the export query)."""
    return ("'# ' || url || chr(10) || chr(10)"
            " || '- content_type: ' || content_type || chr(10)"
            " || '- status: ' || status || chr(10)"
            " || '- route: ' || route || chr(10)"
            " || '- quality_pct: ' || CAST(quality_pct AS VARCHAR) || chr(10)"
            " || '- doc_kind: ' || doc_kind || chr(10) || chr(10)"
            " || extracted_text || chr(10) AS md")


def export_markdown_files(extracted: rd.Dataset, out_dir: str) -> int:
    """Write one .md file per completed document, named by url-hash
    (reference analog: canonical-filename .md files). Returns file count.
    Runs as a distributed map_batches sink; files land under
    ``out_dir/<sha-prefix>.md``."""
    os.makedirs(out_dir, exist_ok=True)

    def write_files(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import sha256_hex
        md_batch = markdown_batch(batch)
        n = 0
        for i in range(len(md_batch)):
            url = md_batch["url"][i].as_py()
            name = sha256_hex(url)[:16] + ".md"
            tmp = os.path.join(out_dir, name + ".tmp")
            with open(tmp, "w") as f:
                f.write(md_batch["md"][i].as_py())
            os.replace(tmp, os.path.join(out_dir, name))
            n += 1
        return pa.table({"n_written": pa.array([n], pa.int64())})

    counts = extracted.map_batches(write_files, batch_format="pyarrow")
    return sum(sum(b["n_written"].to_pylist())
               for b in counts.iter_batches(batch_format="pyarrow"))


def run_metrics(out_dir: str) -> dict:
    """Metrics rollup from per-bucket manifests (FIXTURES.md F5): counts
    by status/route, totals, derived throughput — no re-scan of data."""
    ms = list(ckpt.load_manifests(out_dir).values())
    out = ckpt.summarize_manifests(ms)
    out["sum_elapsed_s"] = round(sum(m["elapsed_s"] for m in ms), 6)
    return out
