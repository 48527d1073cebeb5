"""Pruned readers for the pages corpus in multiple formats.

The reference ingests via directory glob + HTTP multipart
(reference: app/services/batch_processor.py:128-208,
app/routers/batch.py:44-361); the engine's batch equivalents are format
readers that land on the same pages schema: parquet (canonical), JSONL
(interchange; binary payload base64-encoded), and a directory of raw
payload files (glob source, one document per file).
"""

from __future__ import annotations

import base64
import os
from datetime import datetime

import pyarrow as pa

import ray.data as rd

from .corpus import PAGES_SCHEMA


def read_pages_parquet(path: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(path, columns=columns)


def read_pages_jsonl(path: str) -> rd.Dataset:
    """JSONL pages: {url, warc_ts: iso8601, html_b64, text, lang}."""
    raw = rd.read_json(path)

    def decode(batch: pa.Table) -> pa.Table:
        payloads = [base64.b64decode(s) if s else b""
                    for s in batch["html_b64"].to_pylist()]
        ts_col = batch["warc_ts"]
        if pa.types.is_timestamp(ts_col.type):
            ts = ts_col.cast(pa.timestamp("us"))
        else:  # ISO strings (arrow's JSON reader usually infers timestamps)
            ts = pa.array([datetime.fromisoformat(s)
                           for s in ts_col.to_pylist()], pa.timestamp("us"))
        return pa.table({
            "url": batch["url"].cast(pa.string()),
            "warc_ts": ts,
            "html": pa.array(payloads, pa.large_binary()),
            "text": batch["text"].cast(pa.large_string()),
            "lang": batch["lang"].cast(pa.string()),
        })

    return raw.map_batches(decode, batch_format="pyarrow")


def read_pages_files(dir_path: str, url_prefix: str = "file://") -> rd.Dataset:
    """Directory-glob source: each file is one document payload
    (reference: ``process_directory`` sorted glob,
    app/services/batch_processor.py:147). url = prefix + filename;
    warc_ts is a deterministic epoch (file mtimes are not reproducible)."""
    files = rd.read_binary_files(dir_path, include_paths=True)

    def to_pages(batch: pa.Table) -> pa.Table:
        paths = batch["path"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        epoch = datetime(2020, 1, 1)
        return pa.table({
            "url": pa.array([url_prefix + os.path.basename(p) for p in paths],
                            pa.string()),
            "warc_ts": pa.array([epoch] * len(paths), pa.timestamp("us")),
            "html": pa.array(payloads, pa.large_binary()),
            "text": pa.array([""] * len(paths), pa.large_string()),
            "lang": pa.array([""] * len(paths), pa.string()),
        })

    return files.map_batches(to_pages, batch_format="pyarrow")


def write_pages_jsonl(ds: rd.Dataset, out_dir: str) -> None:
    """Inverse of ``read_pages_jsonl`` (JSON interchange sink)."""
    def encode(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch["url"],
            "warc_ts": pa.array([t.isoformat() for t in
                                 batch["warc_ts"].to_pylist()], pa.string()),
            "html_b64": pa.array(
                [base64.b64encode(b or b"").decode()
                 for b in batch["html"].to_pylist()], pa.string()),
            "text": batch["text"],
            "lang": batch["lang"],
        })

    ds.map_batches(encode, batch_format="pyarrow").write_json(out_dir)
