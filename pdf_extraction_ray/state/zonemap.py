"""Zone-map (data-skipping) storage layout.

The lakehouse min/max-pruning primitive: a dataset clustered on an
integer key lands as ``zone=K/`` parquet directories (zone = key //
width) plus a tiny ``_zones.json`` manifest recording each zone's TRUE
key min/max; a later range scan consults the manifest (driver-side,
O(zones)) and reads ONLY the overlapping zone directories — at 100 TB
this is the difference between a full-corpus scan and touching a few
files, and it is exactly what Parquet row-group statistics / Iceberg
manifest pruning do, made explicit.

Zone-map pruning is SOUND whatever the clustering: the manifest stores
the true min/max per zone, so a zone that could contain a matching row
is always read, and a residual map-side filter removes the false
positives the coarse zones admit. Clustering (the ``key // width``
routing) only determines how EFFECTIVE the pruning is.

The manifest is the source of truth for LIVE FILES (Iceberg's rule):
each zone entry lists the parquet files readers may see, publishes are
file-write-then-manifest-list, and maintenance deletes only unlisted
files — so every crash window leaves readers either on the old file
set or the new one, never a mix (round-4 advisor finding: the previous
publish-then-delete compaction permanently duplicated delta rows if it
crashed between the two steps).

Write discipline matches ``stages/joins.write_bucketed``: one pass,
ONE groupby(zone) so each zone lands as one atomic file (tmp +
``os.replace``), the manifest written LAST so a crashed write is
invisible to readers. Maintenance ops (append / compact) are
single-writer at a time — retries of the SAME op are safe
(at-least-once), concurrent DIFFERENT ops are not coordinated, the
repo-wide store convention.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

_MANIFEST = "_zones.json"
_U64 = (1 << 64) - 1


def _write_manifest(out_dir: str, meta: dict) -> None:
    tmp = os.path.join(out_dir, ".zones.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))


def _zone_files(out_dir: str, zone: str, m: dict) -> list[str]:
    """Absolute live files for a zone — the manifest's ``files`` list
    when present (authoritative), else a glob (legacy stores written
    before the live-file manifest)."""
    zdir = os.path.join(out_dir, f"zone={zone}")
    names = m.get("files")
    if names is None:
        return sorted(glob.glob(os.path.join(zdir, "*.parquet")))
    return [os.path.join(zdir, n) for n in sorted(names)]


def write_zonemapped(ds: rd.Dataset, key: str, out_dir: str,
                     zone_width: int) -> str:
    """Write ``ds`` as ``zone=K/part-0.parquet`` directories (zone =
    key // zone_width) with a ``_zones.json`` manifest of per-zone
    (min, max, rows, live files). ``out_dir`` is cleared first (a stale
    zone from a previous write must not survive). Returns ``out_dir``."""
    if zone_width <= 0:
        raise ValueError("zone_width must be positive")
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def tag(t: pa.Table) -> pa.Table:
        z = (t[key].combine_chunks().cast(pa.int64()).to_numpy()
             // zone_width)
        return t.append_column("__z", pa.array(z, pa.int64()))

    def write_zone(g: pd.DataFrame) -> pd.DataFrame:
        z = int(g["__z"].iloc[0])
        d = os.path.join(out_dir, f"zone={z}")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, ".part.tmp")
        pq.write_table(pa.Table.from_pandas(g.drop(columns="__z"),
                                            preserve_index=False), tmp)
        os.replace(tmp, os.path.join(d, "part-0.parquet"))
        return pd.DataFrame({"zone": [z],
                             "lo": [int(g[key].min())],
                             "hi": [int(g[key].max())],
                             "rows": [len(g)]})

    # the stats dataset is one row per zone — tiny by construction
    stats = (ds.map_batches(tag, batch_format="pyarrow")
             .groupby("__z").map_groups(write_zone, batch_format="pandas")
             .to_pandas())
    manifest = {str(int(r.zone)): {"lo": int(r.lo), "hi": int(r.hi),
                                   "rows": int(r.rows),
                                   "files": ["part-0.parquet"]}
                for r in stats.itertuples()}
    _write_manifest(out_dir, {"key": key, "zone_width": zone_width,
                              "zones": manifest})
    return out_dir


def zonemap_plan(out_dir: str, lo: int, hi: int) -> list[str]:
    """Directories whose TRUE [min, max] overlaps [lo, hi] (inclusive)
    — the driver-side prune. O(zones) work on one tiny JSON."""
    with open(os.path.join(out_dir, _MANIFEST)) as f:
        meta = json.load(f)
    return [os.path.join(out_dir, f"zone={z}")
            for z, m in sorted(meta["zones"].items(), key=lambda kv:
                               int(kv[0]))
            if m["lo"] <= hi and m["hi"] >= lo]

def zonemap_scan(out_dir: str, lo: int, hi: int) -> rd.Dataset:
    """Range scan reading ONLY the overlapping zones' LIVE files (per
    the manifest), with the residual map-side filter that makes coarse
    zones exact. An empty plan returns an empty dataset with the
    stored schema."""
    with open(os.path.join(out_dir, _MANIFEST)) as f:
        meta = json.load(f)
    key = meta["key"]
    live = sorted((z, m) for z, m in meta["zones"].items()
                  if m["lo"] <= hi and m["hi"] >= lo)
    if not live:
        any_zone = next(iter(sorted(meta["zones"])), None)
        if any_zone is None:
            raise ValueError(f"zone store {out_dir} is empty")
        first = _zone_files(out_dir, any_zone, meta["zones"][any_zone])
        return rd.from_arrow(pq.read_schema(first[0]).empty_table())

    def residual(t: pa.Table) -> pa.Table:
        kv = t[key].combine_chunks().cast(pa.int64()).to_numpy()
        return t.filter(pa.array((kv >= lo) & (kv <= hi)))

    # a path LIST is treated as files (only a single path may be a
    # directory) — and the manifest's live lists ignore unlisted
    # leftovers a crashed maintenance op may have left behind
    files = [f for z, m in live for f in _zone_files(out_dir, z, m)]
    return rd.read_parquet(files).map_batches(residual,
                                              batch_format="pyarrow")


def _content_fingerprint(ds: rd.Dataset) -> str:
    """Order-independent fingerprint of the FULL row content: per-row
    64-bit hashes over ALL columns (canonical column order), combined
    as (count, wrapping sum, xor) and sha256'd. Two distinct batches
    collide only on engineered 64-bit hash collisions — unlike the
    key-only (n, sum, xor) this replaces, which collided on realistic
    same-day delta batches (round-4 advisor finding, high)."""
    def fp_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        hv = pd.util.hash_pandas_object(
            df[sorted(df.columns)], index=False).to_numpy(np.uint64)
        x = 0
        for v in hv.tolist():
            x ^= int(v)
        return pa.table({
            "n": pa.array([len(hv)], pa.int64()),
            "s": pa.array([int(hv.sum(dtype=np.uint64))], pa.uint64()),
            "x": pa.array([x], pa.uint64())})

    n = s = x = 0
    for b in (ds.map_batches(fp_partial, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        n += sum(b["n"].to_pylist())
        for v in b["s"].to_pylist():
            s = (s + int(v)) & _U64
        for v in b["x"].to_pylist():
            x ^= int(v)
    return hashlib.sha256(f"{n}:{s}:{x}".encode()).hexdigest()[:16]


def append_to_zonemap(ds: rd.Dataset, out_dir: str,
                      batch_id: str | None = None) -> dict:
    """Delta ingestion for the zone store — the time-series append
    (new days land as per-zone DELTA files; existing zones are never
    rewritten) with the repo's at-least-once discipline: the manifest
    records applied-batch fingerprints, a duplicate submission no-ops,
    and a same-pre-state retry reuses its delta tag so partial files
    overwrite idempotently. The fingerprint covers the FULL row
    content (or an explicit caller-supplied ``batch_id``, the stronger
    idempotence token when the ingest source has one). Zone
    true-min/max EXTEND (never shrink) so pruning stays sound; delta
    files become visible only via the manifest's live-file list
    (write-then-list). Returns the updated manifest dict."""
    with open(os.path.join(out_dir, _MANIFEST)) as f:
        meta = json.load(f)
    key, width = meta["key"], meta["zone_width"]

    ds = ds.materialize()  # consumed twice (fingerprint + write)
    if batch_id is not None:
        batch_fp = hashlib.sha256(
            f"id:{batch_id}".encode()).hexdigest()[:16]
    else:
        batch_fp = _content_fingerprint(ds)
    from .appliedlog import applied_contains
    if applied_contains(out_dir, meta.get("applied", []), batch_fp):
        return meta  # duplicate submission (at-least-once) no-ops
    # same-pre-state retries reuse the tag → delta files overwrite
    delta_tag = hashlib.sha256(
        f"{json.dumps(meta.get('applied', []))}:{batch_fp}".encode()
    ).hexdigest()[:12]
    delta_name = f"delta-{delta_tag}.parquet"

    def tag(t: pa.Table) -> pa.Table:
        z = (t[key].combine_chunks().cast(pa.int64()).to_numpy() // width)
        return t.append_column("__z", pa.array(z, pa.int64()))

    def write_zone(g: pd.DataFrame) -> pd.DataFrame:
        z = int(g["__z"].iloc[0])
        d = os.path.join(out_dir, f"zone={z}")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".delta-{delta_tag}.tmp")
        pq.write_table(pa.Table.from_pandas(g.drop(columns="__z"),
                                            preserve_index=False), tmp)
        os.replace(tmp, os.path.join(d, delta_name))
        return pd.DataFrame({"zone": [z],
                             "lo": [int(g[key].min())],
                             "hi": [int(g[key].max())],
                             "rows": [len(g)]})

    stats = (ds.map_batches(tag, batch_format="pyarrow")
             .groupby("__z").map_groups(write_zone, batch_format="pandas")
             .to_pandas())
    zones = {z: dict(m) for z, m in meta["zones"].items()}
    for r in stats.itertuples():
        zk = str(int(r.zone))
        if zk in zones:
            files = zones[zk].get("files")
            if files is not None and delta_name not in files:
                files = files + [delta_name]
            zones[zk].update(
                lo=min(zones[zk]["lo"], int(r.lo)),
                hi=max(zones[zk]["hi"], int(r.hi)),
                rows=zones[zk]["rows"] + int(r.rows))
            if files is not None:
                zones[zk]["files"] = files
        else:
            zones[zk] = {"lo": int(r.lo), "hi": int(r.hi),
                         "rows": int(r.rows), "files": [delta_name]}
    # the applied list is the idempotence log — never FORGOTTEN (a
    # capped log silently re-ingested any duplicate retry older than
    # the cap — round-4 advisor finding); the hot list is BOUNDED by
    # folding old fingerprints into the archive sidecar at compaction
    # (state/appliedlog.py), so membership = hot ∪ archive
    meta = {**meta, "zones": zones,
            "applied": meta.get("applied", []) + [batch_fp]}
    _write_manifest(out_dir, meta)
    return meta


def compact_zonemap(out_dir: str) -> dict:
    """Merge each zone's live delta files into ONE file — the
    maintenance step after many appends (one task per multi-file zone
    via the Dataset scheduler). Crash-convergent by construction: the
    merged file is published under a content-addressed NEW name
    (derived from the input file list), the manifest then atomically
    becomes the zone's sole live-file record, and only files the
    manifest does NOT list are deleted — re-running after a crash at
    any point converges without ever re-concatenating already-merged
    rows. Returns {"zones_compacted", "files_removed"}."""
    mpath = os.path.join(out_dir, _MANIFEST)
    with open(mpath) as f:
        meta = json.load(f)
    # sweep-safety reference point: anything published AFTER this
    # moment belongs to a concurrent writer, never to this run's
    # inputs (our own merged outputs are in the live lists) — see the
    # cleanup sweep below
    start_mtime = os.path.getmtime(mpath)

    zones = {z: dict(m) for z, m in meta["zones"].items()}
    work = []
    for z in sorted(zones, key=int):
        m = zones[z]
        if m.get("files") is None:  # legacy store: adopt the glob set
            m["files"] = sorted(os.path.basename(p) for p in _zone_files(
                out_dir, z, m))
        names = sorted(m["files"])
        if len(names) > 1:
            tag = hashlib.sha256(":".join(names).encode()).hexdigest()[:12]
            merged = f"part-{tag}.parquet"
            if merged in names:  # sha collision with an input (never)
                merged = f"part-{tag}m.parquet"
            work.append({"zone": z, "zdir": os.path.join(
                out_dir, f"zone={z}"), "files": names, "merged": merged})

    if work:
        def merge_one(batch: pa.Table) -> pa.Table:
            for zdir, names, merged in zip(batch["zdir"].to_pylist(),
                                           batch["files"].to_pylist(),
                                           batch["merged"].to_pylist()):
                t = pa.concat_tables(
                    [pq.read_table(os.path.join(zdir, n)) for n in names],
                    promote_options="default")
                tmp = os.path.join(zdir, ".merge.tmp")
                pq.write_table(t, tmp)
                os.replace(tmp, os.path.join(zdir, merged))
            return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

        (rd.from_items(work)
         .map_batches(merge_one, batch_format="pyarrow", batch_size=1)
         .materialize())
        # PRE-PUBLISH guard (review finding): the merge window can be
        # long; a concurrent append that published delta+manifest since
        # our initial read would be silently clobbered by our publish
        # (its delta unlisted, its applied fingerprint dropped). Re-read
        # and abort BEFORE overwriting — the merged files we already
        # wrote are content-addressed and unlisted, so a later rerun
        # reuses them; nothing is lost by aborting here.
        with open(mpath) as f:
            pre = json.load(f)
        if pre != meta:
            raise RuntimeError(
                "compact_zonemap: manifest changed during merge "
                "(concurrent writer — the store is single-writer); "
                "publish aborted, the store is untouched. Re-run "
                "compact_zonemap once the other writer finishes.")
        # publish: the manifest's live lists flip to the merged files
        # in ONE atomic write (readers see old set or new set, never
        # both); inputs are still on disk but now unlisted. Compaction
        # is also when the applied-fingerprint hot list folds into the
        # archive sidecar so the per-append manifest rewrite stays
        # bounded (state/appliedlog.py; archive written FIRST)
        from .appliedlog import fold_applied
        for w in work:
            zones[w["zone"]]["files"] = [w["merged"]]
        meta = {**meta, "zones": zones,
                "applied": fold_applied(out_dir,
                                        meta.get("applied", []))}
        _write_manifest(out_dir, meta)

    # cleanup sweep LAST: delete unlisted parquet files (this run's
    # inputs, plus leftovers of any previously crashed run) — always
    # runs so a rerun after a crash between publish and deletes
    # finishes the job instead of duplicating rows.
    # Single-writer discipline is documented, not enforced — make a
    # violated assumption fail LOUDLY instead of losing data (ADVICE
    # r4): (1) re-read the manifest; if it changed under us a
    # concurrent writer published, so abort the sweep; (2) never delete
    # a file newer than the manifest — a concurrent append that has
    # published its delta but not yet its manifest update keeps it.
    with open(mpath) as f:
        current = json.load(f)
    if current != meta:
        raise RuntimeError(
            "compact_zonemap: manifest changed during compaction "
            "(concurrent writer — the store is single-writer); cleanup "
            "sweep aborted, no file was deleted. Re-run compact_zonemap "
            "once the other writer finishes.")
    removed = 0
    for z, m in zones.items():
        live = set(m["files"])
        zdir = os.path.join(out_dir, f"zone={z}")
        for p in glob.glob(os.path.join(zdir, "*.parquet")):
            # STRICT <: on coarse-mtime filesystems a concurrent delta
            # can share the manifest's timestamp second — leaving a
            # legit input until the next compact is the cheap side of
            # that ambiguity (review finding)
            if os.path.basename(p) not in live \
                    and os.path.getmtime(p) < start_mtime:
                os.remove(p)
                removed += 1
    return {"zones_compacted": len(work), "files_removed": removed}
