"""Small-file compaction — sink maintenance for partitioned parquet.

A 100 TB run writing per-bucket / per-shard files accumulates many
small parquet files (stragglers, retries, incremental appends); small
files make every later scan seek-bound. This operator bin-packs input
files into ~``target_mb`` output groups BY METADATA ONLY (file sizes —
no data pass on the driver), then executes one task per group: each
task reads only its own files and writes ONE output file atomically.
Ray Data is the scheduler (one row per group through ``map_batches``),
so compaction parallelism scales with group count, the driver holds
only the file listing, and a re-run skips groups whose output already
exists (resumable by construction — same greedy packing over the same
sorted listing is deterministic).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd


def plan_groups(files: list[str], target_mb: int = 128) -> list[list[str]]:
    """Greedy size bin-packing over the SORTED listing (deterministic:
    same inputs → same groups → same output file names)."""
    target = target_mb * 1_000_000
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for f in sorted(files):
        sz = os.path.getsize(f)
        if cur and cur_bytes + sz > target:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(f)
        cur_bytes += sz
    if cur:
        groups.append(cur)
    return groups


def compact_parquet(in_files: list[str], out_dir: str,
                    target_mb: int = 128) -> dict:
    """Compact ``in_files`` into ``out_dir/compact-NNNNN.parquet`` files
    of ~``target_mb`` each. Returns {"n_in", "n_out", "skipped"}.

    Atomic per group (write-tmp-then-rename): a killed run leaves each
    group either complete or absent, and the next run redoes only the
    absent ones.
    """
    import glob as _glob
    import hashlib
    import json

    os.makedirs(out_dir, exist_ok=True)
    groups = plan_groups(in_files, target_mb)
    # resume is only valid against the SAME plan: a changed input
    # listing renumbers groups, so existing outputs would silently mix
    # stale and fresh contents under reused names. The plan digest
    # (sorted (path, size) pairs + target) gates the skip; a mismatch
    # invalidates every prior output.
    digest = hashlib.sha256(json.dumps(
        [(f, os.path.getsize(f)) for f in sorted(in_files)]
        + [target_mb]).encode()).hexdigest()
    plan_path = os.path.join(out_dir, "_plan.json")
    prior = None
    if os.path.exists(plan_path):
        try:
            with open(plan_path) as f:
                prior = json.load(f).get("digest")
        except (json.JSONDecodeError, OSError):
            prior = None
    if prior != digest:
        for stale in _glob.glob(os.path.join(out_dir, "compact-*.parquet")):
            os.remove(stale)
        tmp = plan_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"digest": digest, "n_groups": len(groups)}, f)
        os.replace(tmp, plan_path)
    rows = [{"gid": i, "paths": g, "out": os.path.join(
        out_dir, f"compact-{i:05d}.parquet")} for i, g in enumerate(groups)]
    todo = [r for r in rows if not os.path.exists(r["out"])]
    skipped = len(rows) - len(todo)

    def compact_one(batch: pa.Table) -> pa.Table:
        outs = []
        for gid, paths, out in zip(batch["gid"].to_pylist(),
                                   batch["paths"].to_pylist(),
                                   batch["out"].to_pylist()):
            t = pa.concat_tables([pq.read_table(p) for p in paths])
            tmp = out + ".tmp"
            pq.write_table(t, tmp)
            os.replace(tmp, out)
            outs.append({"gid": gid, "n_rows": t.num_rows})
        return pa.table({
            "gid": pa.array([o["gid"] for o in outs], pa.int64()),
            "n_rows": pa.array([o["n_rows"] for o in outs], pa.int64()),
        })

    if todo:
        (rd.from_items(todo)
           .map_batches(compact_one, batch_format="pyarrow", batch_size=1)
           .materialize())
    return {"n_in": len(in_files), "n_out": len(rows), "skipped": skipped}
