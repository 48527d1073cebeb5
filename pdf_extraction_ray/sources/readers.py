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


def pages_parquet_datasource(units: list[dict]):
    """Row-group-planned parquet source: one ReadTask per wave-sized
    row-group range, each a straight ``pq.read_row_groups`` — measured
    ~2-3x less read-stage CPU than Ray's generic parquet datasource on
    the pages corpus (the generic path pays per-batch iteration + block
    re-building a direct row-group read skips).

    A REAL ``ray.data.Datasource`` because the naive variant
    (``from_items(units) -> map_batches(read)``) collapsed: Ray bundles
    map inputs by INPUT row count, so the fused chain inherited
    downstream batch_size as its bundling floor and 100+ one-row unit
    blocks ran as ~3 tasks. ReadTasks ARE the block sources — bundling
    never applies (ROUND3_NOTES, 'custom reader' negative result).
    Factory function (not a subclass at module level) so the
    ray.data.datasource import stays lazy.

    Plan with :func:`plan_pages_read_units`; fall back to
    ``rd.read_parquet`` when planning returns None (non-local or mixed
    layout, too many files for a driver-side metadata pass)."""
    from ray.data.block import BlockMetadata
    from ray.data.datasource import Datasource, ReadTask

    class _PagesParquetDatasource(Datasource):
        def __init__(self, units):
            self._units = units
            self._size = sum(u["n_bytes"] for u in units)

        def estimate_inmemory_data_size(self):
            return self._size

        def get_name(self):
            return "PagesParquet"

        def get_read_tasks(self, parallelism):
            tasks = []
            for u in self._units:
                path, a, b = u["path"], u["rg0"], u["rg1"]

                def fn(path=path, a=a, b=b):
                    import pyarrow.parquet as pq
                    return [pq.ParquetFile(path)
                            .read_row_groups(list(range(a, b + 1)))]

                tasks.append(ReadTask(fn, BlockMetadata(
                    num_rows=u["n_rows"], size_bytes=u["n_bytes"],
                    exec_stats=None, input_files=[path])))
            return tasks

    return _PagesParquetDatasource(units)


def plan_pages_read_units(path: str, target_blocks: int,
                          max_files: int = 10_000) -> list[dict] | None:
    """Plan (file, row-group range) read units totalling ~target_blocks:
    greedily fold consecutive row groups up to total_rows/target (a unit
    never splits a row group, so a block overshoots by at most one
    row group of the writer's row_group_size). Returns None when the
    path isn't a local parquet file/dir, has no rows, or has more files
    than a driver-side metadata pass should touch (at that scale Ray's
    reader plans metadata distributed — the right trade)."""
    import glob as _glob

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        # decline MIXED layouts: rd.read_parquet discovers nested files
        # recursively, so planning only the top level would silently
        # drop the subdirectories' rows — any subdir means fall back
        entries = list(os.scandir(path))
        if any(e.is_dir() for e in entries):
            return None
        files = sorted(e.path for e in entries
                       if e.name.endswith(".parquet"))
    elif os.path.isfile(path):
        files = [path]
    else:
        return None
    if not files or len(files) > max_files:
        return None
    metas: list[tuple[str, list[tuple[int, int]]]] = []
    total = 0
    try:
        for f in files:
            md = pq.ParquetFile(f).metadata
            rgs = [(md.row_group(i).num_rows,
                    md.row_group(i).total_byte_size)
                   for i in range(md.num_row_groups)]
            metas.append((f, rgs))
            total += sum(n for n, _ in rgs)
    except Exception:  # noqa: BLE001 — any planning failure -> Ray reader
        return None
    if total == 0:
        return None
    per_block = max(1, total // max(target_blocks, 1))
    units: list[dict] = []
    for f, rgs in metas:
        start, acc_n, acc_b = 0, 0, 0
        for i, (n, nb) in enumerate(rgs):
            acc_n += n
            acc_b += nb
            if acc_n >= per_block:
                units.append({"path": f, "rg0": start, "rg1": i,
                              "n_rows": acc_n, "n_bytes": acc_b})
                start, acc_n, acc_b = i + 1, 0, 0
        if start < len(rgs):
            units.append({"path": f, "rg0": start, "rg1": len(rgs) - 1,
                          "n_rows": acc_n, "n_bytes": acc_b})
    return units


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


# --- WARC interchange (the web-crawl wire format) -------------------------
# Minimal WARC/1.0 records: the format crawl corpora arrive in (one
# ~1 GB .warc per shard at CommonCrawl scale; here one file per output
# block). Each page is a ``response`` record (raw payload) paired with
# a ``conversion`` record (the WARC type for extracted-text renditions,
# i.e. WET practice) carrying the pages table's fallback ``text`` —
# that column feeds the quality router's salvage path (SURVEY M12), so
# a faithful round-trip must keep it. lang rides the real
# WARC-Identified-Content-Language header.

# WARC/1.1 fractional-second form — the schema's timestamp[us] column
# round-trips losslessly (%SZ alone would silently truncate sub-second
# values and reorder first-wins dedup downstream)
_WARC_TS_FMT = "%Y-%m-%dT%H:%M:%S.%fZ"


def _parse_warc_date(s: str) -> "datetime":
    fmt = _WARC_TS_FMT if "." in s else "%Y-%m-%dT%H:%M:%SZ"
    return datetime.strptime(s, fmt)


def _warc_record(rec_type: str, url: str, ts: "datetime", payload: bytes,
                 lang: str) -> bytes:
    import hashlib
    if any(c in url for c in "\r\n") or any(c in lang for c in "\r\n"):
        # a CR/LF inside a header value would corrupt the framing of
        # every later record in the shard — fail loud at the sink
        raise ValueError(f"CR/LF in WARC header value: url={url!r}")
    rid = hashlib.sha256(rec_type.encode() + url.encode()
                         + payload).hexdigest()
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {rec_type}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts.strftime(_WARC_TS_FMT)}\r\n"
        f"WARC-Record-ID: <urn:sha256:{rid}>\r\n"
        f"WARC-Identified-Content-Language: {lang}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n").encode()
    return head + payload + b"\r\n\r\n"


def write_pages_warc(ds: rd.Dataset, out_dir: str,
                     compress: bool = False,
                     cdx: bool = False) -> int:
    """WARC sink: one ``.warc`` file per block, written task-side with
    the atomic temp+rename convention (state/checkpoint.py) and named
    by content hash — idempotent re-runs land identical files, and two
    byte-identical blocks COALESCE into one file (content-addressed
    semantics: only fully duplicate blocks collapse, never distinct
    pages). With ``cdx``, each shard gets a ``.cdx`` JSONL sidecar
    (url, ts, offset, length per page unit — the crawl-index practice)
    enabling :func:`fetch_warc_record` point reads without scanning the
    shard. Returns the number of distinct shard files on disk."""
    import hashlib
    import json

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        meta = list(zip(batch["url"].to_pylist(),
                        batch["warc_ts"].to_pylist()))
        records = [
            _warc_record("response", u, t, p or b"", l)
            + _warc_record("conversion", u, t, (x or "").encode(), l)
            for (u, t), p, l, x in zip(meta,
                                       batch["html"].to_pylist(),
                                       batch["lang"].to_pylist(),
                                       batch["text"].to_pylist())]
        if compress:
            # one gzip MEMBER per page unit (the .warc.gz shard
            # convention: members concatenate and each unit stays
            # independently addressable); mtime=0 keeps the file a pure
            # function of content, preserving the idempotent naming
            import gzip
            import io
            units = []
            for rec in records:
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                    gz.write(rec)
                units.append(buf.getvalue())
            ext = ".warc.gz"
        else:
            units = records
            ext = ".warc"
        body = b"".join(units)   # one join, not O(n^2) += copies
        name = hashlib.sha256(body).hexdigest()[:24]
        path = os.path.join(out_dir, name + ext)
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(body)
        os.replace(tmp, path)
        if cdx:
            off, lines = 0, []
            for (u, t), unit in zip(meta, units):
                lines.append(json.dumps({
                    "url": u, "ts": t.strftime(_WARC_TS_FMT),
                    "offset": off, "length": len(unit)}))
                off += len(unit)
            ctmp = path + f".cdx.tmp.{os.getpid()}"
            with open(ctmp, "w") as f:
                f.write("\n".join(lines) + "\n")
            os.replace(ctmp, path + ".cdx")
        return pa.table({"path": pa.array([path], pa.string()),
                         "n_records": pa.array([len(batch)], pa.int64())})

    manifest = ds.map_batches(write_block, batch_format="pyarrow")
    return len({r["path"] for r in manifest.take_all()})


def _parse_page_unit(blob: bytes) -> dict:
    """Frame-parse ONE page unit (response + conversion record pair,
    already gunzipped) into a canonical-schema page row."""
    row = {"url": "", "warc_ts": None, "html": b"", "text": "", "lang": ""}
    pos = 0
    while pos < len(blob):
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers = {}
        for line in blob[pos:hdr_end].decode().split("\r\n")[1:]:
            k, _, v = line.partition(": ")
            headers[k] = v
        n = int(headers["Content-Length"])
        body = blob[hdr_end + 4:hdr_end + 4 + n]
        if headers.get("WARC-Type") == "response":
            row["url"] = headers["WARC-Target-URI"]
            row["warc_ts"] = _parse_warc_date(headers["WARC-Date"])
            row["html"] = body
            row["lang"] = headers.get("WARC-Identified-Content-Language", "")
        elif headers.get("WARC-Type") == "conversion":
            row["text"] = body.decode()
        pos = hdr_end + 4 + n + 4
    return row


def fetch_warc_record(path: str, offset: int, length: int) -> dict:
    """Point read of ONE page unit from a WARC shard via its ``.cdx``
    coordinates: seek + read ``length`` bytes (gunzip if the unit is a
    gzip member) + frame-parse — the shard is never scanned. Returns
    the page row as a dict on the canonical schema (the targeted-retry
    analog at the WARC layer)."""
    import gzip
    with open(path, "rb") as f:
        f.seek(offset)
        blob = f.read(length)
    if blob[:2] == b"\x1f\x8b":
        blob = gzip.decompress(blob)
    return _parse_page_unit(blob)


def read_pages_warc_select(dir_path: str, urls) -> rd.Dataset:
    """Targeted BULK retrieval from a WARC corpus via its crawl index:
    read ONLY the requested urls' byte ranges, one task per touched
    shard — the distributed form of :func:`fetch_warc_record` (the
    CommonCrawl cdx-server access pattern: index lookup, then ranged
    GETs against the shard objects; shards are never scanned).

    Shape: the tiny ``.cdx`` index filters map-side against the
    (broadcast) wanted-url set, ONE ``groupby(path)`` co-locates each
    shard's hits, and the per-shard body opens the file once and reads
    its ranges in offset order (sequential-friendly). Unknown urls are
    simply absent from the result. Shard files must be reachable from
    workers (shared store / local FS)."""
    import gzip

    import pyarrow.compute as pc

    want = pa.array(sorted(set(urls)), pa.string())

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["url"], value_set=want))

    def fetch_shard(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("offset", "ascending")])
        group = group.take(order)
        rows = []
        path = group["path"][0].as_py()
        with open(path, "rb") as f:
            for off, ln in zip(group["offset"].to_pylist(),
                               group["length"].to_pylist()):
                f.seek(off)
                blob = f.read(ln)
                if blob[:2] == b"\x1f\x8b":
                    blob = gzip.decompress(blob)
                rows.append(_parse_page_unit(blob))
        return pa.table({
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows],
                                pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.large_binary()),
            "text": pa.array([r["text"] for r in rows], pa.large_string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        })

    idx = warc_cdx_index(dir_path).map_batches(keep, batch_format="pyarrow")
    return idx.groupby("path").map_groups(fetch_shard, batch_format="pyarrow")


def warc_cdx_index(dir_path: str) -> rd.Dataset:
    """The crawl index as a Dataset: one row per page unit across every
    ``.cdx`` sidecar in ``dir_path`` — (url, ts, path, offset, length).
    Joins against a url list to drive targeted :func:`fetch_warc_record`
    reads (re-crawls, spot audits) without touching shard bodies."""
    import glob as globmod
    import json

    sidecars = sorted(globmod.glob(os.path.join(dir_path, "*.cdx")))
    files = rd.from_items([{"cdx": p} for p in sidecars])

    def parse(batch: pa.Table) -> pa.Table:
        urls, tss, paths, offs, lens = [], [], [], [], []
        for cdx_path in batch["cdx"].to_pylist():
            shard = cdx_path[:-len(".cdx")]
            with open(cdx_path) as f:
                for line in f:
                    d = json.loads(line)
                    urls.append(d["url"])
                    tss.append(_parse_warc_date(d["ts"]))
                    paths.append(shard)
                    offs.append(d["offset"])
                    lens.append(d["length"])
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "path": pa.array(paths, pa.string()),
            "offset": pa.array(offs, pa.int64()),
            "length": pa.array(lens, pa.int64()),
        })

    return files.map_batches(parse, batch_format="pyarrow")


def read_pages_warc(dir_path: str) -> rd.Dataset:
    """WARC source: one read task per ``.warc`` file (the standard
    crawl-shard parallelism — files are the split unit, like
    CommonCrawl's per-shard WARCs), parsed by a pure-stdlib framing
    walker (header block to CRLFCRLF, Content-Length payload, CRLFCRLF
    trailer) onto the canonical pages schema. A .warc.gz shard is
    decompressed whole in the task (a 1 GB shard inflates to a few GB
    of task heap — size shards accordingly; a member-streaming reader
    is the upgrade path if shards must grow past that)."""
    files = rd.read_binary_files(dir_path, include_paths=True,
                                 file_extensions=["warc", "gz"])

    def parse(batch: pa.Table) -> pa.Table:
        import gzip
        urls, tss, payloads, texts, langs = [], [], [], [], []
        for blob in batch["bytes"].to_pylist():
            if blob[:2] == b"\x1f\x8b":   # gzip magic: .warc.gz shard
                blob = gzip.decompress(blob)   # concatenated members ok
            blob_first = len(texts)        # first response index of THIS shard
            pos = 0
            while pos < len(blob):
                hdr_end = blob.find(b"\r\n\r\n", pos)
                if hdr_end < 0:
                    break
                headers = {}
                for line in blob[pos:hdr_end].decode().split("\r\n")[1:]:
                    k, _, v = line.partition(": ")
                    headers[k] = v
                n = int(headers["Content-Length"])
                body_start = hdr_end + 4
                body = blob[body_start:body_start + n]
                rec_type = headers.get("WARC-Type")
                if rec_type == "conversion":
                    # the paired text rendition for the PRECEDING
                    # response IN THIS SHARD (writer emits them
                    # adjacently); an orphan conversion at the start of
                    # a foreign shard is skipped — the guard is scoped
                    # to this blob, not the batch, so it can never
                    # overwrite the previous file's last page
                    if len(texts) > blob_first:
                        texts[-1] = body.decode()
                elif rec_type == "response":
                    urls.append(headers["WARC-Target-URI"])
                    tss.append(_parse_warc_date(headers["WARC-Date"]))
                    payloads.append(body)
                    texts.append("")
                    langs.append(headers.get(
                        "WARC-Identified-Content-Language", ""))
                # warcinfo / request / metadata records: framing-skipped
                pos = body_start + n + 4          # skip CRLFCRLF trailer
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(payloads, pa.large_binary()),
            "text": pa.array(texts, pa.large_string()),
            "lang": pa.array(langs, pa.string()),
        })

    return files.map_batches(parse, batch_format="pyarrow")


def write_pages_csv(ds: rd.Dataset, out_dir: str) -> None:
    """CSV interchange sink — the lowest-common-denominator format
    labeling tools and spreadsheets ingest: RFC-4180 quoting via
    pyarrow's CSV writer (embedded commas / quotes / newlines survive),
    binary html as base64 (CSV is a text format). Inverse of
    ``read_pages_csv``; the round-trip is byte-exact per column."""
    def encode(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch["url"].cast(pa.string()),
            "warc_ts": pa.array([t.isoformat() for t in
                                 batch["warc_ts"].to_pylist()],
                                pa.string()),
            "html_b64": pa.array(
                [base64.b64encode(b or b"").decode()
                 for b in batch["html"].to_pylist()], pa.string()),
            "text": batch["text"].cast(pa.string()),
            "lang": batch["lang"].cast(pa.string()),
        })

    ds.map_batches(encode, batch_format="pyarrow").write_csv(out_dir)


def read_pages_csv(path: str) -> rd.Dataset:
    """CSV pages source (inverse of ``write_pages_csv``): arrow CSV
    parse with all columns pinned to string (the reader must not
    re-infer types — a numeric-looking url or an ISO timestamp would
    silently change dtype), then the same decode as the JSONL path."""
    import pyarrow.csv as pacsv

    cols = ["url", "warc_ts", "html_b64", "text", "lang"]
    raw = rd.read_csv(
        path,
        # quoted newlines are legal RFC-4180; arrow rejects them unless
        # opted in (they defeat naive block splitting)
        parse_options=pacsv.ParseOptions(newlines_in_values=True),
        convert_options=pacsv.ConvertOptions(
            column_types={c: pa.string() for c in cols}))

    def decode(batch: pa.Table) -> pa.Table:
        payloads = [base64.b64decode(s) if s else b""
                    for s in batch["html_b64"].to_pylist()]
        ts = pa.array([datetime.fromisoformat(s)
                       for s in batch["warc_ts"].to_pylist()],
                      pa.timestamp("us"))
        return pa.table({
            "url": batch["url"].cast(pa.string()),
            "warc_ts": ts,
            "html": pa.array(payloads, pa.large_binary()),
            "text": pa.array([s if s is not None else ""
                              for s in batch["text"].to_pylist()],
                             pa.large_string()),
            "lang": pa.array([s if s is not None else ""
                              for s in batch["lang"].to_pylist()],
                             pa.string()),
        })

    return raw.map_batches(decode, batch_format="pyarrow")
