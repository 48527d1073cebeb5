"""Bounded hot-manifest applied-fingerprint log with an append-only
archive sidecar.

All four persisted stores (zonemap, inverted text index, MinHash-LSH
index, IVF index) keep an ``applied`` list of batch fingerprints in
their hot manifest so an at-least-once retry no-ops. The log must
never forget a fingerprint (a capped log silently re-ingested any
duplicate older than the cap — round-4 advisor finding), but every
append rewrites the whole manifest, so an unbounded hot list makes
manifest size and rewrite cost grow O(appends) forever (ADVICE r4).

Resolution: the hot manifest keeps only the newest ``HOT_KEEP``
fingerprints; maintenance passes (each store's compact step) fold the
older ones into ``_applied_archive.json`` — append-only, deduped,
atomically replaced. Membership = hot list ∪ archive, so nothing is
ever forgotten and the hot manifest stays O(HOT_KEEP).

Crash discipline: ``fold_applied`` writes the archive BEFORE the
caller republishes its manifest. A crash in between leaves the folded
fingerprints present in BOTH places — harmless for a union-membership
check, and the next fold dedupes.
"""
from __future__ import annotations

import json
import os

ARCHIVE = "_applied_archive.json"
HOT_KEEP = 64


def _archive_path(store_dir: str) -> str:
    return os.path.join(store_dir, ARCHIVE)


def fold_applied(store_dir: str, applied: list[str],
                 keep_recent: int = HOT_KEEP) -> list[str]:
    """Fold all but the newest ``keep_recent`` fingerprints into the
    archive sidecar; return the bounded hot list for the caller to
    publish in its manifest. No-op (and no archive touch) when the hot
    list is already within bounds."""
    applied = list(applied)
    if len(applied) <= keep_recent:
        return applied
    old, hot = applied[:-keep_recent], applied[-keep_recent:]
    path = _archive_path(store_dir)
    seen: list[str] = []
    if os.path.exists(path):
        with open(path) as f:
            seen = json.load(f)
    known = set(seen)
    merged = seen + [fp for fp in old if fp not in known]
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(merged, f)
    os.replace(tmp, path)
    return hot


def applied_contains(store_dir: str, applied: list[str],
                     batch_fp: str) -> bool:
    """Has ``batch_fp`` ever been applied? Hot list first (the common
    case — recent retries), then the archive sidecar."""
    if batch_fp in applied:
        return True
    path = _archive_path(store_dir)
    if os.path.exists(path):
        with open(path) as f:
            return batch_fp in set(json.load(f))
    return False
