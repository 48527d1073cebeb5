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

Write discipline matches ``stages/joins.write_bucketed``: one pass,
ONE groupby(zone) so each zone lands as one atomic file (tmp +
``os.replace``), the manifest written LAST so a crashed write is
invisible to readers.
"""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

_MANIFEST = "_zones.json"


def write_zonemapped(ds: rd.Dataset, key: str, out_dir: str,
                     zone_width: int) -> str:
    """Write ``ds`` as ``zone=K/part-0.parquet`` directories (zone =
    key // zone_width) with a ``_zones.json`` manifest of per-zone
    (min, max, rows). ``out_dir`` is cleared first (a stale zone from
    a previous write must not survive). Returns ``out_dir``."""
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
                                   "rows": int(r.rows)}
                for r in stats.itertuples()}
    tmp = os.path.join(out_dir, ".zones.tmp")
    with open(tmp, "w") as f:
        json.dump({"key": key, "zone_width": zone_width,
                   "zones": manifest}, f, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))
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
    """Range scan reading ONLY the overlapping zones, with the
    residual map-side filter that makes coarse zones exact. An empty
    plan returns an empty dataset with the stored schema."""
    with open(os.path.join(out_dir, _MANIFEST)) as f:
        meta = json.load(f)
    key = meta["key"]
    paths = zonemap_plan(out_dir, lo, hi)
    if not paths:
        any_zone = next(iter(sorted(meta["zones"])), None)
        if any_zone is None:
            raise ValueError(f"zone store {out_dir} is empty")
        schema = pq.read_schema(os.path.join(
            out_dir, f"zone={any_zone}", "part-0.parquet"))
        return rd.from_arrow(schema.empty_table())

    def residual(t: pa.Table) -> pa.Table:
        kv = t[key].combine_chunks().cast(pa.int64()).to_numpy()
        return t.filter(pa.array((kv >= lo) & (kv <= hi)))

    # a path LIST is treated as files (only a single path may be a
    # directory), so expand each planned zone dir to its parquet files
    import glob

    files = sorted(f for d in paths
                   for f in glob.glob(os.path.join(d, "*.parquet")))
    return rd.read_parquet(files).map_batches(residual,
                                              batch_format="pyarrow")


def append_to_zonemap(ds: rd.Dataset, out_dir: str) -> dict:
    """Delta ingestion for the zone store — the time-series append
    (new days land as per-zone DELTA files; existing zones are never
    rewritten) with the repo's at-least-once discipline: the manifest
    records applied-batch fingerprints, a duplicate submission no-ops,
    and a same-pre-state retry reuses its delta tag so partial files
    overwrite idempotently. Zone true-min/max EXTEND (never shrink) so
    pruning stays sound; `zonemap_scan`'s per-zone glob sees deltas
    with no read-path change (the IVF-append property). Returns the
    updated manifest dict."""
    import hashlib

    with open(os.path.join(out_dir, _MANIFEST)) as f:
        meta = json.load(f)
    key, width = meta["key"], meta["zone_width"]

    # batch fingerprint: (n, sum, xor) of the key column — one combiner
    def fp_partial(t: pa.Table) -> pa.Table:
        k = t[key].combine_chunks().cast(pa.int64()).to_numpy()
        x = 0
        for v in k.tolist():
            x ^= v & ((1 << 64) - 1)
        return pa.table({"n": pa.array([len(k)], pa.int64()),
                         "s": pa.array([int(k.sum())], pa.int64()),
                         "x": pa.array([x], pa.uint64())})

    n = s = x = 0
    ds = ds.materialize()  # consumed twice (fingerprint + write)
    for b in (ds.map_batches(fp_partial, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        n += sum(b["n"].to_pylist())
        s += sum(b["s"].to_pylist())
        for v in b["x"].to_pylist():
            x ^= int(v)
    batch_fp = hashlib.sha256(f"{n}:{s}:{x}".encode()).hexdigest()[:16]
    if batch_fp in meta.get("applied", []):
        return meta  # duplicate submission (at-least-once) no-ops
    # same-pre-state retries reuse the tag → delta files overwrite
    delta_tag = hashlib.sha256(
        f"{json.dumps(meta.get('applied', []))}:{batch_fp}".encode()
    ).hexdigest()[:12]

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
        os.replace(tmp, os.path.join(d, f"delta-{delta_tag}.parquet"))
        return pd.DataFrame({"zone": [z],
                             "lo": [int(g[key].min())],
                             "hi": [int(g[key].max())],
                             "rows": [len(g)]})

    stats = (ds.map_batches(tag, batch_format="pyarrow")
             .groupby("__z").map_groups(write_zone, batch_format="pandas")
             .to_pandas())
    zones = dict(meta["zones"])
    for r in stats.itertuples():
        zk = str(int(r.zone))
        if zk in zones:
            zones[zk] = {"lo": min(zones[zk]["lo"], int(r.lo)),
                         "hi": max(zones[zk]["hi"], int(r.hi)),
                         "rows": zones[zk]["rows"] + int(r.rows)}
        else:
            zones[zk] = {"lo": int(r.lo), "hi": int(r.hi),
                         "rows": int(r.rows)}
    meta = {**meta, "zones": zones,
            "applied": (meta.get("applied", []) + [batch_fp])[-64:]}
    tmp = os.path.join(out_dir, ".zones.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))
    return meta


def compact_zonemap(out_dir: str) -> dict:
    """Merge each zone's delta files into its base file — the
    maintenance step after many appends (one task per multi-file zone
    via the Dataset scheduler; crash between publish and deletes
    leaves both, and re-running converges because the merge rewrites
    from whatever files exist). Returns
    {"zones_compacted", "files_removed"}."""
    import glob

    import ray.data as rd

    work = []
    for zdir in sorted(glob.glob(os.path.join(out_dir, "zone=*"))):
        files = sorted(glob.glob(os.path.join(zdir, "*.parquet")))
        if len(files) > 1:
            work.append({"zdir": zdir, "files": files})
    if not work:
        return {"zones_compacted": 0, "files_removed": 0}

    def merge_one(batch: pa.Table) -> pa.Table:
        removed = []
        for zdir, files in zip(batch["zdir"].to_pylist(),
                               batch["files"].to_pylist()):
            t = pa.concat_tables([pq.read_table(f) for f in files],
                                 promote_options="default")
            out = os.path.join(zdir, "part-0.parquet")
            tmp = os.path.join(zdir, ".merge.tmp")
            pq.write_table(t, tmp)
            os.replace(tmp, out)
            n = 0
            for f in files:
                if f != out:
                    os.remove(f)
                    n += 1
            removed.append(n)
        return pa.table({"n": pa.array(removed, pa.int64())})

    removed = 0
    for b in (rd.from_items(work)
              .map_batches(merge_one, batch_format="pyarrow",
                           batch_size=1)
              .iter_batches(batch_format="pyarrow")):
        removed += sum(b["n"].to_pylist())
    return {"zones_compacted": len(work), "files_removed": removed}
