"""Per-partition checkpoint manifests (north rule: resumable runs with
per-partition lineage + metrics).

The reference's resume story is dedup-by-hash against a Postgres unique
index (reference: app/routers/extraction.py:110-190 — re-submission skips
completed work, retries partial/failed). Re-expressed for a batch engine
with no DB: the output is partitioned by url-hash bucket; each bucket
directory is written atomically (temp file + rename) and then a JSON
manifest recording lineage (row count, bytes, an order-insensitive input
fingerprint) and throughput counters becomes durable. A restarted run
loads the manifest set and filters finished buckets out of the input
*before* the heavy extraction stage, so nothing completed is recomputed —
and a killed run leaves either a complete (data + manifest) bucket or an
invisible temp file, never a half-truth.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import stable_hash64

MANIFEST_DIR = "_manifests"

MANIFEST_SCHEMA = pa.schema([
    ("bucket", pa.int64()),
    ("n_rows", pa.int64()),
    ("n_bytes", pa.int64()),
    ("fingerprint", pa.uint64()),
    ("elapsed_s", pa.float64()),
    ("n_completed", pa.int64()),
    ("n_rejected", pa.int64()),
    ("n_partial", pa.int64()),
    ("n_primary", pa.int64()),
    ("n_salvage", pa.int64()),
    ("path", pa.string()),
])


def rows_fingerprint(urls: list[str], timestamps: list) -> int:
    """Order-insensitive lineage fingerprint: XOR of per-row key hashes."""
    fp = 0
    for u, ts in zip(urls, timestamps):
        fp ^= stable_hash64(f"{u}\x00{ts}")
    return fp


def bucket_dir(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, f"bucket={bucket:05d}")


def manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"bucket-{bucket:05d}.json")


def write_bucket_group(group: pa.Table, out_dir: str,
                       bucket: int | None = None) -> pa.Table:
    """groupby(bucket) writer: durable data file, then durable manifest.

    Returns the one-row manifest table (the run's metrics stream).
    ``bucket`` overrides the id read from the group's first row — needed
    when the group may be EMPTY (a refresh that drops every row of a
    bucket still rewrites file + manifest so resume stays consistent).
    """
    t0 = time.monotonic()
    if bucket is None:
        bucket = group["bucket"][0].as_py()
    bdir = bucket_dir(out_dir, bucket)
    os.makedirs(bdir, exist_ok=True)
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)

    data_path = os.path.join(bdir, "part-0.parquet")
    tmp_path = data_path + ".tmp"
    pq.write_table(group, tmp_path)
    os.replace(tmp_path, data_path)  # atomic on POSIX

    status = group["status"].to_pylist()
    route = group["route"].to_pylist()
    manifest = {
        "bucket": bucket,
        "n_rows": len(group),
        "n_bytes": int(sum(group["n_chars"].to_pylist())),
        "fingerprint": rows_fingerprint(group["url"].to_pylist(),
                                        group["warc_ts"].to_pylist()),
        "elapsed_s": time.monotonic() - t0,
        "n_completed": sum(1 for s in status if s == "completed"),
        "n_rejected": sum(1 for s in status if s == "rejected"),
        "n_partial": sum(1 for s in status if s == "partial"),
        "n_primary": sum(1 for r in route if r == "primary"),
        "n_salvage": sum(1 for r in route if r == "salvage"),
        "path": data_path,
    }
    mpath = manifest_path(out_dir, bucket)
    mtmp = mpath + ".tmp"
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
    os.replace(mtmp, mpath)
    return pa.Table.from_pylist([manifest], schema=MANIFEST_SCHEMA)


def merge_bucket_group(group: pa.Table, out_dir: str) -> pa.Table:
    """Retry merge: replace this bucket's rows for the group's urls with
    the freshly retried rows, atomically, and refresh the manifest.

    Used by the semantic-retry pass (reference: duplicate-with-status-
    partial → retry with retry_count+1, app/routers/extraction.py:155-190).
    """
    bucket = group["bucket"][0].as_py()
    data_path = os.path.join(bucket_dir(out_dir, bucket), "part-0.parquet")
    retried_urls = set(group["url"].to_pylist())
    if os.path.exists(data_path):
        old = pq.read_table(data_path)
        merged = pa.concat_tables([
            old.filter(pa.array([u not in retried_urls
                                 for u in old["url"].to_pylist()], pa.bool_())),
            group.select(old.column_names)])
    else:
        merged = group
    # first-wins within the merged bucket (retried duplicate urls)
    import pyarrow.compute as pc
    idx = pc.sort_indices(merged.select(["url", "warc_ts"]),
                          sort_keys=[("url", "ascending"),
                                     ("warc_ts", "ascending")])
    merged = merged.take(idx)
    urls = merged["url"].to_pylist()
    keep = [i == 0 or urls[i] != urls[i - 1] for i in range(len(urls))]
    merged = merged.filter(pa.array(keep, pa.bool_()))
    return write_bucket_group(merged, out_dir)


def load_manifests(out_dir: str) -> dict[int, dict]:
    """{bucket: manifest} for buckets whose data file is still present."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    out: dict[int, dict] = {}
    if not os.path.isdir(mdir):
        return out
    for name in sorted(os.listdir(mdir)):
        if not (name.startswith("bucket-") and name.endswith(".json")):
            continue
        path = os.path.join(mdir, name)
        try:
            with open(path) as f:
                m = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue  # torn manifest (should be impossible post-rename)
        if os.path.exists(m.get("path", "")):
            out[int(m["bucket"])] = m
        elif m.get("path"):
            # the recorded spelling can differ from the caller's
            # (relative vs absolute out_dir, moved/symlinked store) —
            # fall back to the store-relative location and repoint
            rel = os.path.join(bucket_dir(out_dir, int(m["bucket"])),
                               os.path.basename(m["path"]))
            if os.path.exists(rel):
                out[int(m["bucket"])] = {**m, "path": rel}
    return out


def expected_fingerprints(pages_path: str, n_buckets: int,
                          dedup: bool = True,
                          exclude_urls: set[str] | None = None
                          ) -> dict[int, int]:
    """Recompute each bucket's lineage fingerprint from the CURRENT input.

    Cheap metadata pass: only (url, warc_ts) leave storage. With
    ``dedup`` (the writer's default) first-wins dedup (min warc_ts per
    url) mirrors what the bucket writer fingerprints; a ``dedup=False``
    run writes EVERY row, so the expectation must XOR every row too —
    otherwise verify_resume would invalidate (and uselessly recompute)
    every bucket of a non-dedup run forever. Partial XORs are combined
    per bucket on the driver (n_buckets ints of state — O(1) per
    partition, never row data).

    ``exclude_urls`` (the takedown registry) removes those urls from the
    expectation: a bucket whose only divergence from the input is its
    taken-down rows is CORRECT, not stale — without this, verify_resume
    would invalidate it and resurrect the removed urls.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    from ..functions.hashing import url_bucket

    meta = rd.read_parquet(pages_path, columns=["url", "warc_ts"])
    if exclude_urls:
        meta = meta.map_batches(banned_url_filter(exclude_urls),
                                batch_format="pyarrow")
    if dedup:
        uniq = meta.groupby("url").aggregate(
            Min("warc_ts", alias_name="warc_ts"))
    else:
        uniq = meta

    def partial_xor(batch: pa.Table) -> pa.Table:
        acc: dict[int, int] = {}
        for u, ts in zip(batch["url"].to_pylist(),
                         batch["warc_ts"].to_pylist()):
            b = url_bucket(u, n_buckets)
            acc[b] = acc.get(b, 0) ^ stable_hash64(f"{u}\x00{ts}")
        return pa.table({
            "bucket": pa.array(sorted(acc), pa.int64()),
            "fp": pa.array([acc[b] for b in sorted(acc)], pa.uint64()),
        })

    out: dict[int, int] = {}
    for batch in (uniq.map_batches(partial_xor, batch_format="pyarrow")
                      .iter_batches(batch_format="pyarrow")):
        for b, fp in zip(batch["bucket"].to_pylist(), batch["fp"].to_pylist()):
            out[b] = out.get(b, 0) ^ fp
    return out


def invalidate_stale(out_dir: str, done: dict[int, dict],
                     expected: dict[int, int]) -> set[int]:
    """Drop manifests whose recorded fingerprint no longer matches the
    input (resume otherwise assumes byte-identical input and would keep
    stale bucket outputs). Mutates ``done``; returns invalidated buckets.
    """
    stale = {b for b, m in done.items()
             if expected.get(b) != int(m["fingerprint"])}
    for b in stale:
        try:
            os.remove(manifest_path(out_dir, b))
        except OSError:
            pass
        done.pop(b, None)
    return stale


TAKEDOWN_SUBDIR = "_takedowns"


def record_takedown(out_dir: str, urls: list[str], reason: str,
                    text_sha256: list[str] | None = None) -> str:
    """Durably register a takedown request (opt-out / right-to-be-
    forgotten / DMCA removal) BEFORE any rows are dropped: the registry
    is the standing exclusion list every later resume / verify-resume /
    refresh honors, so an invalidated bucket can never resurrect a
    removed url. Hash-identified notices register their HASHES too —
    a url-only record would let the same content re-enter under a new
    url. One content-addressed JSON per request (atomic rename;
    re-recording the same request is a byte-identical no-op)."""
    import hashlib

    tdir = os.path.join(out_dir, MANIFEST_DIR, TAKEDOWN_SUBDIR)
    os.makedirs(tdir, exist_ok=True)
    blob = json.dumps({"urls": sorted(set(urls)), "reason": reason,
                       "text_sha256": sorted(set(text_sha256 or []))},
                      sort_keys=True)
    name = hashlib.sha256(blob.encode()).hexdigest()[:16]
    path = os.path.join(tdir, f"takedown-{name}.json")
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(blob)
    os.replace(tmp, path)
    return path


def load_takedowns(out_dir: str) -> tuple[set[str], set[str]]:
    """(banned urls, banned text_sha256 hashes) — the union over every
    registered takedown. Driver-resident by design: a takedown list is
    request-sized (a legal/compliance artifact), never corpus-sized.

    A corrupt registry file RAISES instead of being skipped: unlike a
    torn manifest (worst case: wasted recompute), a silently ignored
    takedown record would let legally removed rows resurrect."""
    tdir = os.path.join(out_dir, MANIFEST_DIR, TAKEDOWN_SUBDIR)
    urls: set[str] = set()
    hashes: set[str] = set()
    if not os.path.isdir(tdir):
        return urls, hashes
    for name in sorted(os.listdir(tdir)):
        if not (name.startswith("takedown-") and name.endswith(".json")):
            continue
        path = os.path.join(tdir, name)
        try:
            with open(path) as f:
                rec = json.load(f)
            urls.update(rec["urls"])
            hashes.update(rec.get("text_sha256", []))
        except (json.JSONDecodeError, OSError, KeyError) as e:
            raise ValueError(
                f"corrupt takedown registry file {path!r}: {e} — refusing "
                "to proceed (ignoring it could resurrect removed rows); "
                "restore or remove the file explicitly") from e
    return urls, hashes


def load_takedown_urls(out_dir: str) -> set[str]:
    """Back-compat wrapper: just the banned urls."""
    return load_takedowns(out_dir)[0]


def banned_url_filter(banned: set[str]):
    """Shared takedown-enforcement batch filter: drops rows whose url is
    in the (broadcast) banned set with ONE vectorized ``is_in`` pass —
    used by the work stream and the expected-fingerprint pass."""
    import pyarrow.compute as pc

    import ray
    banned_ref = ray.put(pa.array(sorted(banned), pa.string()))

    def drop_banned(batch: pa.Table) -> pa.Table:
        keep = pc.invert(pc.is_in(batch["url"],
                                  value_set=ray.get(banned_ref)))
        return batch.filter(keep)

    return drop_banned


def drop_urls_from_bucket(out_dir: str, bucket: int,
                          urls: set[str]) -> int:
    """Remove the given urls' rows from ONE bucket, atomically, and
    refresh its manifest (the snapshot-refresh 'removed/changed url'
    rewrite — same targeted-bucket shape as backfill_lineage). Returns
    the number of rows dropped; a bucket emptied entirely keeps an
    empty data file + manifest so resume stays consistent."""
    data_path = os.path.join(bucket_dir(out_dir, bucket), "part-0.parquet")
    if not os.path.exists(data_path):
        return 0
    old = pq.read_table(data_path)
    mask = [u not in urls for u in old["url"].to_pylist()]
    n_drop = len(mask) - sum(mask)
    if n_drop == 0:
        return 0
    kept = old.filter(pa.array(mask, pa.bool_()))
    write_bucket_group(kept, out_dir, bucket=bucket)
    return n_drop


def backfill_lineage(out_dir: str, refs, n_buckets: int,
                     url_col: str = "url",
                     ref_col: str = "source_ref") -> dict:
    """Lineage backfill — the dedicated J5 operator (reference:
    app/routers/batch.py:156-169 — a duplicate submission backfills the
    missing ``scraped_file_id`` FK on the already-completed deduped
    record instead of re-extracting).

    ``refs`` is a Ray Dataset of (url, source_ref) from the new
    submission. Urls bucket with the engine's one partitioning key, so
    ONLY the buckets that contain a referenced url are read and
    rewritten (atomic replace; fingerprints are over (url, warc_ts) and
    stay valid — resume is unaffected). The column is added on first
    touch (schema evolution), and already-set values are never
    overwritten, so the op is idempotent. Per-bucket work runs inside
    the groupby tasks; the driver folds only count rows.

    Returns {"updated", "already_set", "unknown_url", "buckets_touched"}.
    """
    import ray.data as rd  # noqa: F401 (refs is a Dataset)

    from ..functions.hashing import url_bucket

    done = load_manifests(out_dir)
    done_buckets = set(done)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = [url_bucket(u, n_buckets) for u in batch[url_col].to_pylist()]
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    def apply_bucket(group: pa.Table) -> pa.Table:
        bucket = group["bucket"][0].as_py()
        # deterministic ref per url regardless of block order: min ref
        ref_by_url: dict[str, str] = {}
        for u, r in zip(group[url_col].to_pylist(),
                        group[ref_col].to_pylist()):
            if r is not None and (u not in ref_by_url or r < ref_by_url[u]):
                ref_by_url[u] = r
        counts = {"updated": 0, "already_set": 0, "unknown_url": 0}
        data_path = os.path.join(bucket_dir(out_dir, bucket),
                                 "part-0.parquet")
        if bucket not in done_buckets or not os.path.exists(data_path):
            counts["unknown_url"] = len(ref_by_url)
        else:
            t = pq.read_table(data_path)
            if ref_col in t.column_names:
                cur = t[ref_col].to_pylist()
            else:
                cur = [None] * len(t)
            seen = set()
            for i, u in enumerate(t[url_col].to_pylist()):
                if u not in ref_by_url:
                    continue
                seen.add(u)
                if cur[i] is None:
                    cur[i] = ref_by_url[u]
                    counts["updated"] += 1
                else:
                    counts["already_set"] += 1
            counts["unknown_url"] = len(set(ref_by_url) - seen)
            if counts["updated"]:
                col = pa.array(cur, pa.string())
                if ref_col in t.column_names:
                    t = t.set_column(t.column_names.index(ref_col),
                                     ref_col, col)
                else:
                    t = t.append_column(ref_col, col)
                tmp = data_path + ".tmp"
                pq.write_table(t, tmp)
                os.replace(tmp, data_path)
        return pa.table({
            "bucket": pa.array([bucket], pa.int64()),
            "updated": pa.array([counts["updated"]], pa.int64()),
            "already_set": pa.array([counts["already_set"]], pa.int64()),
            "unknown_url": pa.array([counts["unknown_url"]], pa.int64()),
        })

    out = {"updated": 0, "already_set": 0, "unknown_url": 0,
           "buckets_touched": 0}
    stats = (refs.map_batches(add_bucket, batch_format="pyarrow")
                 .groupby("bucket")
                 .map_groups(apply_bucket, batch_format="pyarrow"))
    for b in stats.iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            upd = int(b["updated"][i].as_py())
            out["updated"] += upd
            out["already_set"] += int(b["already_set"][i].as_py())
            out["unknown_url"] += int(b["unknown_url"][i].as_py())
            if upd:
                out["buckets_touched"] += 1
    if out["updated"] or out["already_set"]:
        # bucket schemas now diverge (only touched buckets carry the
        # column) — record the evolved column so read_output() can pad
        # untouched buckets instead of dropping/mistyping it
        record_evolved_column(out_dir, ref_col)
    return out


def _columns_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, "_columns.json")


def record_evolved_column(out_dir: str, name: str,
                          pa_type: str = "string") -> None:
    """Register a column added by schema evolution (backfill) AFTER the
    buckets were first written, so whole-output readers know to pad it
    where absent. Idempotent; atomic publish."""
    path = _columns_path(out_dir)
    cols: dict[str, str] = {}
    if os.path.exists(path):
        with open(path) as f:
            cols = json.load(f)
    if cols.get(name) == pa_type:
        return
    cols[name] = pa_type
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cols, f)
    os.replace(tmp, path)


def read_output(out_dir: str):
    """Whole-corpus read of a checkpointed output directory that
    survives schema evolution: ``backfill_lineage`` adds ``source_ref``
    only to touched buckets, so fragment schemas diverge and a plain
    ``read_parquet`` (which infers the schema from the first fragment)
    can silently drop or mistype the column. Evolved columns are padded
    with typed nulls where absent."""
    import ray.data as rd

    ds = rd.read_parquet(out_dir)
    path = _columns_path(out_dir)
    if not os.path.exists(path):
        return ds
    with open(path) as f:
        cols = json.load(f)
    if not cols:
        return ds
    types = {"string": pa.string(), "int64": pa.int64(),
             "float64": pa.float64()}

    def pad(batch: pa.Table) -> pa.Table:
        for name, tname in cols.items():
            if name not in batch.column_names:
                batch = batch.append_column(
                    name, pa.nulls(len(batch), types[tname]))
        return batch

    return ds.map_batches(pad, batch_format="pyarrow")


def summarize_manifests(manifests: list[dict]) -> dict:
    """Counter sums over per-bucket manifests — the ONE rollup both the
    run report and the metrics endpoint read (they used to duplicate
    these eight sums and could drift)."""
    return {
        "n_buckets": len(manifests),
        "n_rows": sum(m["n_rows"] for m in manifests),
        "n_text_bytes": sum(m["n_bytes"] for m in manifests),
        "n_completed": sum(m["n_completed"] for m in manifests),
        "n_rejected": sum(m["n_rejected"] for m in manifests),
        "n_partial": sum(m["n_partial"] for m in manifests),
        "n_primary": sum(m["n_primary"] for m in manifests),
        "n_salvage": sum(m["n_salvage"] for m in manifests),
    }


def write_run_summary(out_dir: str, manifests: list[dict],
                      wall_s: float,
                      extra: dict | None = None) -> dict:
    """Aggregate per-bucket manifests into the run report
    (reference analog: ``_batch_summary.json``,
    app/services/batch_processor.py:203-206). ``extra`` records run
    parameters later maintenance passes need (e.g. ``n_buckets`` — a
    takedown against the wrong bucket count would silently drop
    nothing)."""
    summary = summarize_manifests(manifests)
    total_rows = summary["n_rows"]
    total_bytes = summary["n_text_bytes"]
    summary.update({
        "wall_s": wall_s,
        "docs_per_s": total_rows / wall_s if wall_s > 0 else 0.0,
        "mb_per_s": total_bytes / wall_s / 1e6 if wall_s > 0 else 0.0,
        **(extra or {}),
    })
    path = os.path.join(out_dir, MANIFEST_DIR, "_run.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(summary, f, indent=2)
    os.replace(tmp, path)
    return summary


def vacuum_store(out_dir: str) -> dict:
    """Maintenance GC for the checkpointed store — the lifecycle's
    last primitive next to build/resume/upsert/takedown/point-lookup:
    sweep crash leftovers so the directory holds exactly the live
    state a resume reasons about.

    Removes (all safe by the store's own invariants):
    * ``*.tmp`` files anywhere under the store — a tmp is only ever a
      not-yet-published write (every publish is tmp + os.replace);
    * stale ``.claim-*`` straddle-guard files — claims only gate a
      LIVE hash-shuffle pass, so any claim found at rest is from a
      killed run (run_extraction already clears the not-done ones;
      this clears them all);
    * orphan bucket data files with NO valid manifest — an
      unmanifested bucket is incomplete by definition and resume
      recomputes it from input, so the bytes are dead weight;
    * manifests whose data file is gone (already invisible to
      ``load_manifests``; deleting makes the invisibility durable).

    Never touches: manifested data files, the takedown registry, the
    outbox, ``_run.json``. Idempotent. Single-writer like every store
    maintenance op: run it AT REST, not concurrently with an
    extraction/upsert pass (a data file published a moment before its
    manifest would read as an orphan). Returns removal counts."""
    import glob as _glob

    removed = {"tmp": 0, "claims": 0, "orphan_data": 0,
               "dead_manifests": 0}
    for p in _glob.glob(os.path.join(out_dir, "**", "*.tmp"),
                        recursive=True):
        os.remove(p)
        removed["tmp"] += 1
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    for p in _glob.glob(os.path.join(mdir, ".claim-*")):
        os.remove(p)
        removed["claims"] += 1
    # liveness compares STORE-RELATIVE (bucket, basename) — never raw
    # path strings: a manifest written with a different out_dir
    # spelling (relative vs absolute, symlinked mount, moved store)
    # must not make every live file look like an orphan (review
    # finding: string equality here would have wiped the store)
    live_names: dict[int, str] = {}
    if os.path.isdir(mdir):
        for name in sorted(os.listdir(mdir)):
            if not (name.startswith("bucket-") and name.endswith(".json")):
                continue
            path = os.path.join(mdir, name)
            try:
                with open(path) as f:
                    m = json.load(f)
                b = int(m["bucket"])
                base = os.path.basename(m.get("path", ""))
                alive = base and os.path.exists(
                    os.path.join(bucket_dir(out_dir, b), base))
            except (json.JSONDecodeError, OSError, KeyError, ValueError):
                alive = False  # torn manifest: dead by definition
            if alive:
                live_names[b] = base
            else:
                os.remove(path)
                removed["dead_manifests"] += 1
    for p in _glob.glob(os.path.join(out_dir, "bucket=*", "*.parquet")):
        try:
            b = int(os.path.basename(os.path.dirname(p)).split("=", 1)[1])
        except ValueError:
            b = -1
        if live_names.get(b) != os.path.basename(p):
            os.remove(p)
            removed["orphan_data"] += 1
    return removed
