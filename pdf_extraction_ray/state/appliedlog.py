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


# path -> ((mtime_ns, size), frozenset of fingerprints). The archive
# grows forever, and every NOVEL append (the common case) misses the
# hot list and consults it — without a memo that is a full JSON parse
# per append, i.e. the O(appends) cost the fold removed from manifest
# rewrites reappearing on reads (review finding). The stat-keyed memo
# makes novel appends O(1) after the first read; any archive rewrite
# (fold) changes mtime/size and invalidates naturally. One entry per
# store path, so several live stores never thrash each other.
_ARCHIVE_MEMO: dict[str, tuple[tuple[int, int], frozenset]] = {}


def _archive_set(path: str) -> frozenset:
    try:
        st = os.stat(path)
    except OSError:
        return frozenset()
    stamp = (st.st_mtime_ns, st.st_size)
    hit = _ARCHIVE_MEMO.get(path)
    if hit is None or hit[0] != stamp:
        with open(path) as f:
            hit = (stamp, frozenset(json.load(f)))
        _ARCHIVE_MEMO[path] = hit
    return hit[1]


def applied_contains(store_dir: str, applied: list[str],
                     batch_fp: str) -> bool:
    """Has ``batch_fp`` ever been applied? Hot list first (the common
    case — recent retries), then the archive sidecar (stat-memoized)."""
    if batch_fp in applied:
        return True
    return batch_fp in _archive_set(_archive_path(store_dir))


def fold_manifest(store_dir: str, meta_path: str,
                  keep_recent: int = HOT_KEEP) -> None:
    """The shared compact-time maintenance step: read the store's
    manifest, fold its ``applied`` hot list into the archive sidecar
    (archive written FIRST — a crash in between leaves harmless
    duplicates), and atomically republish the manifest with the
    bounded list. No-ops when the manifest is absent or already within
    bounds. One helper so the four stores (zonemap inlines its own
    publish, text/MinHash/IVF indexes call this) cannot drift."""
    if not os.path.exists(meta_path):
        return
    with open(meta_path) as f:
        meta = json.load(f)
    hot = fold_applied(store_dir, meta.get("applied", []), keep_recent)
    if hot != meta.get("applied", []):
        meta = {**meta, "applied": hot}
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, meta_path)
