"""Persisted inverted text index + index-backed BM25 (the search scale
path).

``bm25_topk`` in pipelines/analytics.py is the SCAN path: every query
streams the whole corpus. This module is the index shape a 100 TB
corpus needs: ONE build pass writes a term-hash-partitioned postings
index (``part=K/`` parquet directories, rows ``(term, doc_id, tf,
dl)`` with the doc length denormalized into the posting so queries
never join a corpus-sized side), and each query then reads ONLY the
partitions its terms hash into — touch fraction ~|query terms|/P of
storage, the same property ``build_ivf_index`` gives ANN. Scoring
reuses the integer-exact BM25 kernel, so the indexed path is
value-identical to the scan path and shares its DuckDB oracle.

Freshness: like the IVF index, ``_meta.json`` carries (row count,
XOR-of-ids) so a regenerated corpus at the same path rebuilds instead
of answering from stale postings.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from collections import Counter

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..functions.hashing import stable_hash64


_U64 = (1 << 64) - 1


def _corpus_stats_and_fingerprint(
        ds: rd.Dataset, text_col: str,
        id_col: str) -> tuple[int, int, int, int]:
    """(n_docs, total_tokens, xor-of-ids, sum-of-ids mod 2^64) in ONE
    combiner pass. The SUM complements the XOR: aligned sequential-id
    batches (0..3, 4..7, ...) all XOR to 0 — the sum tells them apart,
    which the append delta tag depends on."""
    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.uint64)
        tot = sum(len((t or "").split(" "))
                  for t in batch[text_col].to_pylist())
        fp = np.bitwise_xor.reduce(ids) if len(ids) else np.uint64(0)
        s = int(ids.sum(dtype=np.uint64)) if len(ids) else 0
        return pa.table({"n": pa.array([len(ids)], pa.int64()),
                         "tot": pa.array([tot], pa.int64()),
                         "fp": pa.array([int(fp)], pa.uint64()),
                         "s": pa.array([s], pa.uint64())})

    n, tot, fp, ssum = 0, 0, 0, 0
    for b in (ds.select_columns([id_col, text_col])
                .map_batches(partial, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow")):
        n += sum(b["n"].to_pylist())
        tot += sum(b["tot"].to_pylist())
        for v in b["fp"].to_pylist():
            fp ^= int(v)
        for v in b["s"].to_pylist():
            ssum = (ssum + int(v)) & _U64
    return n, tot, fp, ssum


def _postings_fn(id_col: str, text_col: str, num_parts: int,
                 positions: bool = False):
    """Shared doc→postings batch fn: base build and delta ingest MUST
    tokenize identically or compaction's (term, id) dedup assumption
    breaks — one definition, two callers. ``positions=True`` adds a
    ``pos`` list<int32> column (ascending token indices of the term in
    the doc) — the positional-index variant phrase search needs; tf
    stays denormalized so BM25 reads are unchanged."""
    def postings(batch: pa.Table) -> pa.Table:
        t_o, d_o, tf_o, dl_o, p_o = [], [], [], [], []
        pos_o: list = []
        for doc, text in zip(batch[id_col].to_pylist(),
                             batch[text_col].to_pylist()):
            words = (text or "").split(" ")
            dl = len(words)
            if positions:
                posmap: dict[str, list[int]] = {}
                for i, w in enumerate(words):
                    posmap.setdefault(w, []).append(i)
                items = [(t, len(ps)) for t, ps in posmap.items()]
            else:
                posmap = {}
                items = list(Counter(words).items())
            for term, tf in items:
                t_o.append(term)
                d_o.append(doc)
                tf_o.append(tf)
                dl_o.append(dl)
                p_o.append(stable_hash64(term) % num_parts)
                if positions:
                    pos_o.append(posmap[term])
        cols = {
            "term": pa.array(t_o, pa.string()),
            id_col: pa.array(d_o, pa.int64()),
            "tf": pa.array(tf_o, pa.int64()),
            "dl": pa.array(dl_o, pa.int64()),
        }
        if positions:
            cols["pos"] = pa.array(pos_o, pa.list_(pa.int32()))
        cols["part"] = pa.array(p_o, pa.int32())
        return pa.table(cols)
    return postings


def build_inverted_index(ds: rd.Dataset, index_dir: str,
                         text_col: str = "text", id_col: str = "doc_id",
                         num_parts: int = 32,
                         positions: bool = False) -> dict:
    """One pass: docs → (term, doc_id, tf, dl) postings rows, hash-
    partitioned by term into ``part=K/`` parquet. Atomic publish
    (write-tmp-then-rename). Returns the meta dict."""
    n_docs, total_tokens, id_fp, _ = _corpus_stats_and_fingerprint(
        ds, text_col, id_col)
    postings = _postings_fn(id_col, text_col, num_parts, positions)

    tmp = index_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    (ds.select_columns([id_col, text_col])
       .map_batches(postings, batch_format="pyarrow")
       .write_parquet(tmp, partition_cols=["part"]))
    # base_n/base_fp stamp the BUILD corpus and never change; append
    # folds batches into n_docs/id_fp only — ensure_inverted_index
    # accepts a caller corpus matching EITHER (an appended index is a
    # superset of its base, not stale; the minhash-index lesson)
    meta = {"n_docs": n_docs, "total_tokens": total_tokens,
            "id_fp": id_fp, "base_n": n_docs, "base_fp": id_fp,
            "num_parts": num_parts, "positions": positions, "applied": []}
    with open(os.path.join(tmp, "_meta.json"), "w") as f:
        json.dump(meta, f)
    shutil.rmtree(index_dir, ignore_errors=True)
    os.replace(tmp, index_dir)
    return meta


def ensure_inverted_index(ds: rd.Dataset, index_dir: str,
                          text_col: str = "text", id_col: str = "doc_id",
                          num_parts: int = 32,
                          stamp_ds: rd.Dataset | None = None,
                          positions: bool = False) -> dict:
    """Build unless a FRESH index already exists (stamp: row count +
    XOR-of-ids + num_parts).

    ``stamp_ds``: optional id-only dataset (e.g. a read pruned to the
    id column) used for the freshness check. The warm path must stay
    CHEAP — a select_columns on ``ds`` would not retro-prune its
    parquet read, so without this the text column leaves storage on
    every warm query just to be discarded."""
    meta_path = os.path.join(index_dir, "_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if (meta.get("num_parts") == num_parts
                and bool(meta.get("positions", False)) == positions):
            from .similarity import _ids_fingerprint
            n, fp = _ids_fingerprint(stamp_ds if stamp_ds is not None
                                     else ds, id_col)
            if ((meta.get("n_docs") == n and meta.get("id_fp") == fp)
                    or (meta.get("base_n") == n
                        and meta.get("base_fp") == fp)):
                return meta
    return build_inverted_index(ds.materialize(), index_dir, text_col,
                                id_col, num_parts, positions)


def append_to_index(ds_new: rd.Dataset, index_dir: str,
                    text_col: str = "text", id_col: str = "doc_id") -> dict:
    """Incremental ingest: merge NEW documents' postings into the
    existing index — the append path a standing 100 TB index needs
    (a full rebuild per ingest batch is the thing this avoids).

    Work scales with the new batch: its postings rows group by their
    target partition, and each affected ``part=K/`` directory gains one
    delta file (atomic rename — never a rewrite of existing postings,
    so a killed append leaves whole files only). Doc length is
    denormalized per posting, so old rows never change; the corpus
    stats (n_docs, total_tokens, id_fp) fold the batch into _meta.json
    LAST. Visibility model (honest): each partition's delta file is
    readable the moment it lands, so a query racing the append (or a
    crash between deltas and the meta write) can score partial new
    postings against the old stats — RETRYING the same append on the
    same pre-state converges, because the delta tag is keyed on
    (pre-state id_fp, batch stats) and os.replace overwrites the
    partial files idempotently; an engine with concurrent readers
    would hide the window behind a manifest pointer swap.

    At-least-once delivery (the reference's retry scenario): a
    DUPLICATE submission arriving AFTER the meta publish would get a
    fresh pre-state tag and silently double-ingest — _meta.json
    therefore records the fingerprint of each applied batch
    (``applied``, most-recent-last) and an already-folded batch
    no-ops, with NO redelivery horizon: compaction folds old
    fingerprints into the never-forgetting archive sidecar
    (state/appliedlog.py), so the hot manifest stays bounded and a
    duplicate of ANY age still no-ops. Returns the updated meta."""
    import hashlib

    meta_path = os.path.join(index_dir, "_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    num_parts = meta["num_parts"]

    ds_new = ds_new.materialize()  # stats pass + postings pass share it
    n_new, tot_new, fp_new, sum_new = _corpus_stats_and_fingerprint(
        ds_new, text_col, id_col)
    if n_new == 0:
        return meta

    batch_fp = hashlib.sha256(
        f"batch:{n_new}:{fp_new}:{tot_new}:{sum_new}".encode()
    ).hexdigest()[:16]
    from ..state.appliedlog import applied_contains
    if applied_contains(index_dir, meta.get("applied", []), batch_fp):
        return meta  # at-least-once duplicate: already folded, no-op

    postings = _postings_fn(id_col, text_col, num_parts,
                            bool(meta.get("positions", False)))

    # tag = hash of (pre-state fingerprint, batch stats incl. the id
    # SUM): a raw low-bits-XOR tag collided deterministically on
    # aligned sequential-id batches (XOR of ids 4k..4k+3 is 0 AND
    # leaves the pre-state fingerprint unchanged), silently overwriting
    # earlier deltas — the order-insensitive id sum distinguishes those
    # batches. A RETRY of the same batch on the same pre-state reuses
    # the tag, overwriting its own partial deltas (crash recovery).
    delta_tag = hashlib.sha256(
        f"{meta['id_fp']}:{n_new}:{fp_new}:{tot_new}:{sum_new}".encode()
    ).hexdigest()[:16]

    def write_delta(group: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        part = int(group["part"][0].as_py())
        pdir = os.path.join(index_dir, f"part={part}")
        os.makedirs(pdir, exist_ok=True)
        out = os.path.join(pdir, f"delta-{delta_tag}.parquet")
        tmp = out + ".tmp"
        pq.write_table(group.drop_columns(["part"]), tmp)
        os.replace(tmp, out)
        return pa.table({"part": pa.array([part], pa.int32()),
                         "n": pa.array([group.num_rows], pa.int64())})

    (ds_new.select_columns([id_col, text_col])
           .map_batches(postings, batch_format="pyarrow")
           .groupby("part")
           .map_groups(write_delta, batch_format="pyarrow")
           .materialize())

    meta = {**meta,
            "n_docs": meta["n_docs"] + n_new,
            "total_tokens": meta["total_tokens"] + tot_new,
            "id_fp": meta["id_fp"] ^ fp_new,
            "num_parts": num_parts,
            # the applied list is the idempotence log — never
            # FORGOTTEN (a capped log silently re-ingested a duplicate
            # retry older than the cap); the hot list is bounded by
            # folding into the archive sidecar at compact_index
            # (state/appliedlog.py), membership = hot ∪ archive
            "applied": meta.get("applied", []) + [batch_fp]}
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)
    return meta


def compact_index(index_dir: str, id_col: str = "doc_id") -> dict:
    """Merge each partition's delta files back into one base file —
    the maintenance step after many ``append_to_index`` batches (reads
    seek once per file per query; deltas accumulate per ingest). One
    task per multi-file partition via the Dataset scheduler.

    Crash model (documented): a kill between publishing the merged
    file and deleting the old ones leaves BOTH visible. The merge
    therefore dedups on (term, doc_id) — postings are unique per
    (term, doc_id) by construction, with identical tf/dl on any
    duplicate — so re-running compact_index converges to the correct
    single file; queries issued INSIDE the crash window could
    double-count, which an engine with concurrent readers would fix
    with a manifest pointer swap. Returns
    {"parts_compacted", "files_removed"}."""
    import pyarrow.parquet as pq

    work = []
    for pdir in sorted(glob.glob(os.path.join(index_dir, "part=*"))):
        files = sorted(glob.glob(os.path.join(pdir, "*.parquet")))
        if len(files) > 1:
            work.append({"pdir": pdir, "files": files})
    if not work:
        return {"parts_compacted": 0, "files_removed": 0}

    def merge_one(batch: pa.Table) -> pa.Table:
        n_removed = []
        for pdir, files in zip(batch["pdir"].to_pylist(),
                               batch["files"].to_pylist()):
            t = pa.concat_tables([pq.read_table(f) for f in files])
            df = t.to_pandas().drop_duplicates(["term", id_col])
            t = pa.Table.from_pandas(df, preserve_index=False,
                                     schema=t.schema)
            out = os.path.join(pdir, "base-merged.parquet")
            tmp = out + ".tmp"
            pq.write_table(t, tmp)
            os.replace(tmp, out)
            removed = 0
            for f in files:
                if f != out:
                    os.remove(f)
                    removed += 1
            n_removed.append(removed)
        return pa.table({"n": pa.array(n_removed, pa.int64())})

    removed = 0
    for b in (rd.from_items(work)
                .map_batches(merge_one, batch_format="pyarrow",
                             batch_size=1)
                .iter_batches(batch_format="pyarrow")):
        removed += sum(b["n"].to_pylist())

    # maintenance also bounds the applied-fingerprint hot list
    # (shared fold/republish discipline: state/appliedlog.fold_manifest)
    from ..state.appliedlog import fold_manifest
    fold_manifest(index_dir, os.path.join(index_dir, "_meta.json"))
    return {"parts_compacted": len(work), "files_removed": removed}


def bm25_topk_indexed(index_dir: str, queries: dict[int, tuple],
                      k: int = 10, id_col: str = "doc_id") -> rd.Dataset:
    """BM25 top-k against the persisted index: read ONLY the partitions
    the query terms hash into, score each posting row with the
    integer-exact kernel, fold per (query, doc) with one small keyed
    groupby (bounded by the query terms' postings volume, never the
    corpus), and take the per-query top-k. Value-identical to the scan
    path ``analytics.bm25_topk``."""
    from ray.data.aggregate import Sum

    with open(os.path.join(index_dir, "_meta.json")) as f:
        meta = json.load(f)
    n_docs, total_tokens = meta["n_docs"], meta["total_tokens"]
    num_parts = meta["num_parts"]
    # tombstones: deleted docs stop serving immediately (rows filtered,
    # stats adjusted) — compact/apply later makes it physical. Tags the
    # meta already folded (apply's crash window) are skipped so stats
    # never double-adjust.
    tomb = _load_tombstones(index_dir,
                            skip_tags=set(meta.get("tombs_applied", [])))
    n_docs -= tomb["n"]
    total_tokens -= tomb["dl_sum"]

    qterms = sorted({w for terms in queries.values() for w in terms})
    needed = sorted({stable_hash64(w) % num_parts for w in qterms})
    files = [f for p in needed
             for f in sorted(glob.glob(os.path.join(index_dir, f"part={p}",
                                                    "*.parquet")))]
    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      id_col: pa.array([], pa.int64()),
                      "score": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.int64())})
    if not files:
        return rd.from_arrow(empty)

    postings = rd.read_parquet(files, columns=["term", id_col, "tf", "dl"])
    if tomb["n"]:
        postings = _drop_tombstoned(postings, tomb, id_col)

    # df per query term: postings are complete per term, so df is a tiny
    # aggregate over the filtered rows (O(|query terms|) driver state)
    qset = set(qterms)
    df_map: Counter = Counter()

    def df_partial(batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_pylist()
        c = Counter(t for t in terms if t in qset)
        ks = sorted(c)
        return pa.table({"term": pa.array(ks, pa.string()),
                         "df": pa.array([c[t] for t in ks], pa.int64())})

    for b in (postings.map_batches(df_partial, batch_format="pyarrow")
                      .iter_batches(batch_format="pyarrow")):
        for t, d in zip(b["term"].to_pylist(), b["df"].to_pylist()):
            df_map[t] += int(d)
    ctx = ray.put((dict(df_map), {qid: set(ts)
                                  for qid, ts in queries.items()}))

    def score_rows(batch: pa.Table) -> pa.Table:
        df_, q_by_id = ray.get(ctx)
        terms = batch["term"].to_pylist()
        ids = batch[id_col].to_pylist()
        tfs = batch["tf"].to_pylist()
        dls = batch["dl"].to_pylist()
        q_o, d_o, s_o = [], [], []
        for term, doc, tf, dl in zip(terms, ids, tfs, dls):
            if term not in df_:
                continue
            idf = (n_docs * 1000) // df_[term]
            s = (idf * 22 * tf * total_tokens) // (
                total_tokens * (10 * tf + 3) + 9 * dl * n_docs)
            for qid, ts in q_by_id.items():
                if term in ts:
                    q_o.append(qid)
                    d_o.append(doc)
                    s_o.append(s)
        return pa.table({"query_id": pa.array(q_o, pa.int64()),
                         id_col: pa.array(d_o, pa.int64()),
                         "s": pa.array(s_o, pa.int64())})

    summed = (postings.map_batches(score_rows, batch_format="pyarrow")
              .groupby(["query_id", id_col])
              .aggregate(Sum("s", alias_name="score")))

    def merge(group: pa.Table) -> pa.Table:
        scores = np.asarray(group["score"].to_pylist(), dtype=np.int64)
        ids = np.asarray(group[id_col].to_pylist(), dtype=np.int64)
        keep = scores > 0
        scores, ids = scores[keep], ids[keep]
        if not len(ids):
            return empty
        qid = group["query_id"][0].as_py()
        order = np.lexsort((ids, -scores))[:k]
        return pa.table({
            "query_id": pa.array([qid] * len(order), pa.int64()),
            id_col: pa.array(ids[order], pa.int64()),
            "score": pa.array(scores[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        })

    return summed.groupby("query_id").map_groups(merge,
                                                 batch_format="pyarrow")


def phrase_search_indexed(index_dir: str, phrase: str,
                          id_col: str = "doc_id") -> rd.Dataset:
    """Word-level phrase search against a POSITIONAL index (the search
    engine's quoted-query path): reads ONLY the ``part=K/`` partitions
    the phrase words hash into, then resolves adjacency WITHOUT any
    per-doc Python — every posting of word i at token position p emits
    a candidate start s = p - i, and a phrase hit at s is exactly a
    (doc, s) group of size len(phrase words): ONE groupby(doc, s)
    count + ONE groupby(doc) fold. Emitted rows are unique per (doc,
    s, i) by construction (positions within a posting are distinct and
    each (term, doc) posting appears once), so the group count IS the
    number of phrase words found at s. Counts every starting position
    (self-overlapping phrases included); returns (doc_id, n_hits,
    first_tok) with 0-based token indices, hit docs only.

    Requires an index built with ``positions=True`` (ValueError
    otherwise — a tf-only index cannot answer adjacency)."""
    from ray.data.aggregate import Count, Min

    with open(os.path.join(index_dir, "_meta.json")) as f:
        meta = json.load(f)
    if not meta.get("positions", False):
        raise ValueError("phrase search needs a positional index "
                         "(build with positions=True)")
    num_parts = meta["num_parts"]

    words = phrase.split(" ")
    K = len(words)
    widx: dict[str, list[int]] = {}
    for i, w in enumerate(words):
        widx.setdefault(w, []).append(i)

    needed = sorted({stable_hash64(w) % num_parts for w in widx})
    files = [f for p in needed
             for f in sorted(glob.glob(os.path.join(index_dir, f"part={p}",
                                                    "*.parquet")))]
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "n_hits": pa.array([], pa.int64()),
                      "first_tok": pa.array([], pa.int64())})
    if not files:
        return rd.from_arrow(empty)

    postings = rd.read_parquet(files, columns=["term", id_col, "pos"])
    tomb = _load_tombstones(index_dir,
                            skip_tags=set(meta.get("tombs_applied", [])))
    if tomb["n"]:
        postings = _drop_tombstoned(postings, tomb, id_col)

    def starts(batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_pylist()
        ids = batch[id_col].to_pylist()
        poss = batch["pos"].to_pylist()
        d_o: list[np.ndarray] = []
        s_o: list[np.ndarray] = []
        for term, doc, pos in zip(terms, ids, poss):
            offs = widx.get(term)
            if not offs:
                continue
            p = np.asarray(pos, dtype=np.int64)
            for i in offs:
                s = p - i
                s = s[s >= 0]
                d_o.append(np.full(len(s), doc, np.int64))
                s_o.append(s)
        if d_o:
            d = np.concatenate(d_o)
            s = np.concatenate(s_o)
        else:
            d = s = np.array([], np.int64)
        return pa.table({id_col: pa.array(d), "s": pa.array(s)})

    grouped = (postings.map_batches(starts, batch_format="pyarrow")
               .groupby([id_col, "s"]).aggregate(Count(alias_name="k")))

    def hits_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.equal(t["k"], K)).select([id_col, "s"])

    return (grouped.map_batches(hits_only, batch_format="pyarrow")
            .groupby(id_col).aggregate(Count(alias_name="n_hits"),
                                       Min("s", alias_name="first_tok")))


# ---------------------------------------------------------------------------
# tombstone deletion — the takedown path for the persisted index
# (shared machinery: state/tombstones.py; this family adds per-id dl
# bookkeeping because BM25 scoring consumes total_tokens)
# ---------------------------------------------------------------------------

from ..state import tombstones as _tomb

TOMB_DIR = _tomb.TOMB_DIR


def _drop_tombstoned(postings: rd.Dataset, tomb: dict,
                     id_col: str) -> rd.Dataset:
    """Probe-side tombstone filter (see state/tombstones.drop_dead)."""
    return _tomb.drop_dead(postings, tomb["ids"], id_col)


def _load_tombstones(index_dir: str, skip_tags: "set[str] | None" = None
                     ) -> dict:
    """{ids, n, dl_sum, dls, tags} — per-id dls dedup across
    overlapping files (the lock-free concurrent-delete race cannot
    double-subtract a doc's tokens); ``skip_tags`` excludes files the
    meta already folded (the apply crash window). Legacy files without
    per-id dls contribute an aggregate lump (state/tombstones.load)."""
    return _tomb.load(index_dir, skip_tags=skip_tags, with_dls=True)


def delete_from_index(index_dir: str, doc_ids,
                      id_col: str = "doc_id") -> dict:
    """Tombstone deletion — the index half of the takedown story
    (state: a compliance removal must stop SERVING immediately without
    rewriting a term-partitioned index): the deleted ids land as a
    content-addressed tombstone file consulted by every probe (rows
    filtered map-side, corpus stats adjusted by the recorded (n,
    dl_sum)); ``apply_tombstones`` later applies them PHYSICALLY and
    folds the meta.

    The per-doc dl (needed to keep BM25's total_tokens honest) is
    recovered from the index itself with one distributed filtered scan
    (any posting of a doc carries its dl). Ids already PENDING
    deletion are skipped (idempotent); ids in an already-APPLIED
    tombstone file are NOT treated as deleted — their postings are
    physically gone unless the doc was re-ingested since, in which
    case a fresh takedown must land (review finding: the old check
    read applied files too and silently no-opped the re-delete).
    Returns {"n_deleted", "dl_sum", "path"}."""
    with open(os.path.join(index_dir, "_meta.json")) as f:
        meta = json.load(f)
    already = _load_tombstones(
        index_dir,
        skip_tags=set(meta.get("tombs_applied", [])))["ids"]
    want = sorted({int(i) for i in doc_ids} - already)
    if not want:
        return {"n_deleted": 0, "dl_sum": 0, "path": None}
    wset = set(want)

    files = sorted(glob.glob(os.path.join(index_dir, "part=*",
                                          "*.parquet")))
    dl_by_id: dict[int, int] = {}

    def find_dl(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        dls = batch["dl"].to_pylist()
        seen: dict[int, int] = {}
        for i, d in zip(ids, dls):
            if i in wset and i not in seen:
                seen[i] = int(d)
        ks = sorted(seen)
        return pa.table({id_col: pa.array(ks, pa.int64()),
                         "dl": pa.array([seen[k] for k in ks],
                                        pa.int64())})

    for b in (rd.read_parquet(files, columns=[id_col, "dl"])
              .map_batches(find_dl, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        for i, d in zip(b[id_col].to_pylist(), b["dl"].to_pylist()):
            dl_by_id[int(i)] = int(d)

    present = [i for i in want if i in dl_by_id]
    if not present:
        return {"n_deleted": 0, "dl_sum": 0, "path": None}
    dl_sum = sum(dl_by_id[i] for i in present)
    path = _tomb.write(index_dir, present,
                       dls=[dl_by_id[i] for i in present])
    return {"n_deleted": len(present), "dl_sum": dl_sum, "path": path}


def apply_tombstones(index_dir: str, id_col: str = "doc_id") -> dict:
    """Physically remove tombstoned docs' postings: rewrite every
    partition dropping their rows, fold (n, dl_sum, id xor) out of
    ``_meta.json`` in the SAME atomic write that records the folded
    files' tags (``tombs_applied``), then delete exactly the KNOWN
    tombstone files LAST (folded now or already in the meta) — a
    tombstone written concurrently by a lock-free delete survives for
    the next apply (review finding), and a crash between the meta
    write and the deletes re-applies as a no-op. Returns
    {"n_applied", "rows_dropped"}."""
    meta_path = os.path.join(index_dir, "_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    applied_tags = set(meta.get("tombs_applied", []))
    tomb = _load_tombstones(index_dir, skip_tags=applied_tags)
    if not tomb["n"]:
        _tomb.cleanup(index_dir, applied_tags)
        return {"n_applied": 0, "rows_dropped": 0}
    wset = tomb["ids"]

    rows_dropped = _tomb.rewrite_drop(
        sorted(glob.glob(os.path.join(index_dir, "part=*",
                                      "*.parquet"))), wset, id_col)

    fp = meta["id_fp"]
    for i in wset:
        fp ^= int(i) & _U64  # id_fp is the xor of raw ids
    meta = {**meta, "n_docs": meta["n_docs"] - tomb["n"],
            "total_tokens": meta["total_tokens"] - tomb["dl_sum"],
            "id_fp": fp,
            # cap only the PREVIOUS prefix — the current apply's own
            # tags must never truncate out of the crash-window guard
            # (cleanup normally keeps the list near-empty anyway)
            "tombs_applied": sorted(applied_tags)[-64:] + tomb["tags"]}
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)
    _tomb.cleanup(index_dir, applied_tags | set(tomb["tags"]))
    return {"n_applied": tomb["n"], "rows_dropped": rows_dropped}
