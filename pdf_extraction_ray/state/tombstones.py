"""Shared tombstone machinery for the persisted index families.

All three index families (inverted text, IVF, MinHash-LSH) delete the
same way: a content-addressed ``_tombstones/del-<tag>.json`` file per
request, probe-side filtering against the folded id set, and a deferred
physical apply that rewrites files and folds the meta ATOMICALLY with
the applied tags (``tombs_applied``) so the crash window between the
meta write and the file deletes re-applies as a no-op. This module
holds the shared pieces; each family keeps its own presence scan (what
proves an id is in the index) and meta fold (which count key).

Concurrency contract (review finding): cleanup deletes ONLY files whose
tags the caller folded or the meta already lists — a tombstone written
CONCURRENTLY by a lock-free delete lands after the fold's glob and must
survive for the next apply, never be swept as a stray.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

TOMB_DIR = "_tombstones"


def load(index_dir: str, skip_tags: "set[str] | None" = None,
         with_dls: bool = False) -> dict:
    """Fold tombstone files into {ids, n, tags} (+ {dls, dl_sum} when
    ``with_dls``). Id-deduped across files: per-id payloads keep the
    first value, so overlapping files from a lock-free concurrent
    delete cannot double-subtract. ``skip_tags`` excludes files the
    meta already folded (the apply crash window).

    Legacy format note: files written before per-id dls carried only
    (ids, dl_sum); those contribute their ids with dl 0 plus ONE
    aggregate ``legacy`` lump (cannot dedup per-id — best effort,
    aggregate-preserving)."""
    dls: dict[int, int] = {}
    legacy_sum = 0
    tags: list[str] = []
    for f in sorted(glob.glob(os.path.join(index_dir, TOMB_DIR,
                                           "*.json"))):
        tag = os.path.basename(f)
        if skip_tags and tag in skip_tags:
            continue
        with open(f) as fh:
            rec = json.load(fh)
        per_id = rec.get("dls")
        if per_id is None:
            for i in rec["ids"]:
                if int(i) not in dls:
                    dls[int(i)] = 0
            legacy_sum += int(rec.get("dl_sum", 0))
        else:
            for i, d in zip(rec["ids"], per_id):
                dls.setdefault(int(i), int(d))
        tags.append(tag)
    out = {"ids": set(dls), "n": len(dls), "tags": tags}
    if with_dls:
        out["dls"] = dls
        out["dl_sum"] = sum(dls.values()) + legacy_sum
    return out


def write(index_dir: str, ids: list, dls: "list | None" = None) -> str:
    """Atomic content-addressed tombstone write. Returns the path."""
    tag = hashlib.sha256(",".join(map(str, ids)).encode()).hexdigest()[:16]
    tdir = os.path.join(index_dir, TOMB_DIR)
    os.makedirs(tdir, exist_ok=True)
    path = os.path.join(tdir, f"del-{tag}.json")
    rec: dict = {"ids": list(ids), "n": len(ids)}
    if dls is not None:
        rec["dls"] = list(dls)
        rec["dl_sum"] = sum(dls)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, path)
    return path


def cleanup(index_dir: str, known_tags: "set[str]") -> int:
    """Delete ONLY tombstone files whose tags are known (folded now or
    recorded in the meta) — a concurrently-written tombstone survives
    for the next apply. Returns the number removed."""
    removed = 0
    for f in sorted(glob.glob(os.path.join(index_dir, TOMB_DIR,
                                           "*.json"))):
        if os.path.basename(f) in known_tags:
            os.remove(f)
            removed += 1
    return removed


def rewrite_drop(files: list, wset: set, id_col: str) -> int:
    """Distributed per-file rewrite dropping rows whose id is
    tombstoned (atomic per-file replace). Returns rows dropped."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd

    if not files:
        return 0

    work = [{"f": f} for f in files]

    def rewrite(batch: pa.Table) -> pa.Table:
        dropped = []
        for f in batch["f"].to_pylist():
            t = pq.read_table(f)
            mask = [int(i) not in wset for i in t[id_col].to_pylist()]
            kept = t.filter(pa.array(mask, pa.bool_()))
            if kept.num_rows != t.num_rows:
                tmp = f + ".tmp"
                pq.write_table(kept, tmp)
                os.replace(tmp, f)
            dropped.append(t.num_rows - kept.num_rows)
        return pa.table({"n": pa.array(dropped, pa.int64())})

    rows = 0
    for b in (rd.from_items(work)
              .map_batches(rewrite, batch_format="pyarrow", batch_size=4)
              .iter_batches(batch_format="pyarrow")):
        rows += sum(b["n"].to_pylist())
    return rows


def drop_dead(ds, ids: set, id_col: str):
    """Probe-side filter: broadcast the deleted-id set once, vectorized
    ``is_in`` per batch (the one shared filter all families use)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    dead_ref = ray.put(pa.array(sorted(ids), pa.int64()))

    def drop(b: pa.Table) -> pa.Table:
        dead = ray.get(dead_ref)
        return b.filter(pc.invert(pc.is_in(
            b[id_col].combine_chunks().cast(pa.int64()), value_set=dead)))

    return ds.map_batches(drop, batch_format="pyarrow")
