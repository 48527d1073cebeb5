"""Similarity search over an embedding column (beyond-the-reference
training-data operator).

Brute-force cosine top-k is the exactness baseline: the (small) query
matrix is broadcast once with ``ray.put`` and every batch does one numpy
matmul against it — no shuffle at all, scales linearly with corpus size.
The IVF variant is the scale path: a deterministic k-means-lite coarse
quantizer (fit on a bounded sample) assigns every vector a cell, the
index is PERSISTED as cell-partitioned parquet (``build_ivf_index``), and
queries read only their probed ``cell=K/`` directories — touch fraction
~n_probe/n_centroids of storage. Recall vs brute force is verified in
tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    if not len(batch):  # reshape(0, -1) raises on size-0 arrays
        return np.zeros((0, 0), np.float64)
    col = batch[vec_col]
    # zero-copy-ish: flatten the arrow list column into one ndarray
    arr = col.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(batch)
    return flat.reshape(n, -1)


def topk_cosine(ds: rd.Dataset, queries: np.ndarray, query_ids: list[int],
                k: int = 10, vec_col: str = "embedding",
                id_col: str = "vec_id") -> rd.Dataset:
    """Exact cosine top-k: per-batch partial top-k (numpy matmul against
    the broadcast query matrix), then a final merge of the tiny partials.

    Ties break on ascending neighbor id (deterministic). Returns
    (query_id, neighbor_id, rank), rank 1-based.
    """
    qmat = _unit_rows(np.asarray(queries, dtype=np.float64))
    qref = ray.put((qmat, list(query_ids)))

    def partials(batch: pa.Table) -> pa.Table:
        qm, qids = ray.get(qref)
        mat = _unit_rows(_batch_matrix(batch, vec_col))
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        sims = qm @ mat.T  # (Q, B)
        out_q, out_n, out_s = [], [], []
        kk = min(k, sims.shape[1])
        for qi in range(sims.shape[0]):
            row = sims[qi]
            # partial top-k with deterministic (-sim, id) order
            order = np.lexsort((ids, -row))[:kk]
            out_q.extend([qids[qi]] * len(order))
            out_n.extend(ids[order].tolist())
            out_s.extend(row[order].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    part = ds.map_batches(partials, batch_format="pyarrow", batch_size=4096)

    def merge(group: pa.Table) -> pa.Table:
        qid = group["query_id"][0].as_py()
        sims = np.asarray(group["sim"].to_pylist())
        ids = np.asarray(group["neighbor_id"].to_pylist(), dtype=np.int64)
        order = np.lexsort((ids, -sims))[:k]
        return pa.table({
            "query_id": pa.array([qid] * len(order), pa.int64()),
            "neighbor_id": pa.array(ids[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        })

    return part.groupby("query_id").map_groups(merge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF (coarse-quantized) variant
# ---------------------------------------------------------------------------


# quantization scale for the integer-exact coarse quantizer: unit-row
# components land in [-Q, Q]; int64 dot products are exact up to
# dim * Q^2 = dim * 2^40 (dim <= 4M before overflow — ample)
IVF_QSCALE = 1 << 20


def quantize_unit_rows(mat: np.ndarray) -> np.ndarray:
    """floor(unit_row * Q) as int64 — the SQL-replicable vector code.

    The float64 unit rows carry summation-order ulp noise (~1e-16)
    between numpy and DuckDB, but a component only mis-floors when
    unit*Q sits within that noise of an integer — empirically the
    nearest boundary distance is ~1e-5 on this corpus (margin asserted
    in tests), so the int codes are bit-identical cross-engine."""
    return np.floor(_unit_rows(np.asarray(mat, np.float64))
                    * IVF_QSCALE).astype(np.int64)


def fit_centroids(sample: np.ndarray, n_centroids: int = 16,
                  iters: int = 10) -> np.ndarray:
    """Deterministic INTEGER k-means-lite on an id-ordered sample: codes
    are quantized unit rows (``quantize_unit_rows``), init picks the
    integer-linspace positions ``j*(n-1)//(C-1)``, assignment is argmax
    of exact int64 dot products (ties -> lowest cell id), and the update
    is an element-wise floor-division mean (empty cells keep their
    centroid). Every operation is BIGINT-exact, so the DuckDB oracle
    (analytics.ann_ivf_sql) unrolls the rounds bit-for-bit — this is
    what makes the pruned-probe IVF query value-oracled rather than
    rows-only. Returns int64 (n_centroids, dim)."""
    qs = quantize_unit_rows(sample)
    n = len(qs)
    if n_centroids > 1:
        idx = (np.arange(n_centroids, dtype=np.int64) * (n - 1)) \
            // (n_centroids - 1)
    else:
        idx = np.zeros(1, np.int64)
    cents = qs[idx].copy()
    for _ in range(iters):
        assign = np.argmax(qs @ cents.T, axis=1)   # first-max tie-break
        for c in range(n_centroids):
            members = qs[assign == c]
            if len(members):
                cents[c] = np.floor_divide(members.sum(axis=0,
                                                       dtype=np.int64),
                                           len(members))
    return cents


def probe_order(cents: np.ndarray, queries: np.ndarray) -> np.ndarray:
    """Per-query cell ranking by exact int dot (desc), cell id asc on
    ties — the deterministic probe rule shared with the SQL oracle."""
    qz = quantize_unit_rows(queries)
    dots = qz @ cents.T
    # stable argsort of -dots keeps ascending cell id within ties
    return np.argsort(-dots, axis=1, kind="stable")


def sample_for_centroids(ds: rd.Dataset, vec_col: str,
                         sample_rows: int = 2048,
                         id_col: str = "vec_id") -> np.ndarray:
    """Quantizer-fitting sample = the ``sample_rows`` SMALLEST ids, in
    id order — deterministic whatever the block layout (a plain
    ``limit`` sampled file order, which no oracle can see). Per-block
    partial bottom-k, then one tiny sort+limit; only the winners'
    vectors reach the driver."""
    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        order = np.argsort(ids, kind="stable")[:sample_rows]
        return batch.take(pa.array(order))

    sample = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=65536)
              .sort(id_col).limit(sample_rows).to_pandas())
    return np.stack(sample[vec_col].to_numpy())


def _ids_fingerprint(ds: rd.Dataset, id_col: str) -> tuple[int, int]:
    """(row count, order-insensitive XOR of ids) in ONE pass — the index
    freshness stamp (row count alone missed a regenerated corpus of the
    same cardinality)."""
    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.uint64)
        fp = np.bitwise_xor.reduce(ids) if len(ids) else np.uint64(0)
        return pa.table({"n": pa.array([len(ids)], pa.int64()),
                         "fp": pa.array([int(fp)], pa.uint64())})

    n, fp = 0, 0
    for b in (ds.select_columns([id_col])
                .map_batches(partial, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow")):
        n += sum(b["n"].to_pylist())
        for v in b["fp"].to_pylist():
            fp ^= int(v)
    return n, fp


def build_ivf_index(ds: rd.Dataset, index_dir: str, n_centroids: int = 16,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    sample_rows: int = 2048) -> np.ndarray:
    """Build a PERSISTED cell-partitioned IVF index: fit the coarse
    quantizer on a bounded sample, assign every vector its nearest-centroid
    cell in one map pass, and write parquet partitioned by cell
    (``cell=K/`` directories). Queries then read ONLY probed cell
    directories — the touch fraction is ~n_probe/n_centroids of storage,
    which is the property the in-memory variant of round 1 lacked.

    Returns the centroid matrix (also persisted as ``_centroids.npy``,
    invisible to parquet discovery). The publish is atomic
    (write-tmp-then-rename), so a killed build leaves no torn index.
    """
    import os
    import shutil

    # the build consumes its input three times (stamp, centroid
    # sample, assignment) — spill the pruned projection once and
    # re-read parquet per pass (never an object-store corpus pin)
    ds = persist_projection(ds, [id_col, vec_col], tag="ivfbuild")
    n_rows, id_fp = _ids_fingerprint(ds, id_col)  # freshness stamp
    cents = fit_centroids(sample_for_centroids(ds, vec_col, sample_rows),
                          n_centroids)
    cref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        cc = ray.get(cref)
        mat = quantize_unit_rows(_batch_matrix(batch, vec_col))
        # exact int64 dots; argmax first-max tie-break (= oracle's
        # row_number over (dot DESC, cid ASC))
        cell = np.argmax(mat @ cc.T, axis=1).astype(np.int32)
        # `cell` becomes the partition directory; `cell_id` stays a plain
        # column so file-list reads need no partition inference
        return (batch.append_column("cell", pa.array(cell, pa.int32()))
                     .append_column("cell_id", pa.array(cell, pa.int32())))

    tmp = index_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    (ds.select_columns([id_col, vec_col])
       .map_batches(assign, batch_format="pyarrow")
       .write_parquet(tmp, partition_cols=["cell"]))
    np.save(os.path.join(tmp, "_centroids.npy"), cents)
    import json
    # base_n/base_fp stamp the BUILD corpus and never change; append
    # folds batches into n_rows/id_fp only — the freshness check accepts
    # a caller corpus matching EITHER (an appended index is a superset
    # of its base, not stale — the minhash-index lesson)
    with open(os.path.join(tmp, "_meta.json"), "w") as f:
        json.dump({"n_rows": n_rows, "id_fp": id_fp,
                   "base_n": n_rows, "base_fp": id_fp,
                   "n_centroids": n_centroids,
                   "quantizer": "int20-v1"}, f)
    shutil.rmtree(index_dir, ignore_errors=True)
    os.replace(tmp, index_dir)
    return cents


def load_ivf_centroids(index_dir: str) -> np.ndarray:
    import os
    return np.load(os.path.join(index_dir, "_centroids.npy"))


def topk_cosine_ivf_indexed(index_dir: str, queries: np.ndarray,
                            query_ids: list[int], k: int = 10,
                            n_probe: int = 4, vec_col: str = "embedding",
                            id_col: str = "vec_id") -> rd.Dataset:
    """IVF top-k against a persisted index: only the union of the queries'
    probed ``cell=K/`` directories is read; per-batch scoring masks each
    query to its own probe set."""
    import glob
    import os

    cents = load_ivf_centroids(index_dir)
    qmat = _unit_rows(np.asarray(queries, dtype=np.float64))
    probe = probe_order(cents, np.asarray(queries,
                                          dtype=np.float64))[:, :n_probe]
    needed = sorted({int(c) for row in probe for c in row})
    files = [f for c in needed
             for f in sorted(glob.glob(os.path.join(index_dir,
                                                    f"cell={c}", "*.parquet")))]
    ds = rd.read_parquet(files, columns=[id_col, vec_col, "cell_id"])
    # tombstones: deleted vectors stop serving immediately (tags the
    # meta already folded are skipped — the crash-window discipline)
    import json as _json

    with open(os.path.join(index_dir, "_meta.json")) as f:
        _meta = _json.load(f)
    tomb = _load_ivf_tombstones(
        index_dir, skip_tags=set(_meta.get("tombs_applied", [])))
    if tomb["n"]:
        from ..state.tombstones import drop_dead as _drop_dead_shared
        ds = _drop_dead_shared(ds, tomb["ids"], id_col)
    ref = ray.put((qmat, list(query_ids), probe))

    def partials(batch: pa.Table) -> pa.Table:
        qm, qids, pr = ray.get(ref)
        mat = _unit_rows(_batch_matrix(batch, vec_col))
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        cell = np.asarray(batch["cell_id"].to_pylist(), dtype=np.int64)
        out_q, out_n, out_s = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(cell, pr[qi])
            if not mask.any():
                continue
            row = qm[qi] @ mat[mask].T
            sub_ids = ids[mask]
            order = np.lexsort((sub_ids, -row))[:k]
            out_q.extend([qids[qi]] * len(order))
            out_n.extend(sub_ids[order].tolist())
            out_s.extend(row[order].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    part = ds.map_batches(partials, batch_format="pyarrow", batch_size=4096)

    def merge(group: pa.Table) -> pa.Table:
        qid = group["query_id"][0].as_py()
        sims = np.asarray(group["sim"].to_pylist())
        ids = np.asarray(group["neighbor_id"].to_pylist(), dtype=np.int64)
        order = np.lexsort((ids, -sims))[:k]
        return pa.table({
            "query_id": pa.array([qid] * len(order), pa.int64()),
            "neighbor_id": pa.array(ids[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        })

    return part.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def topk_cosine_ivf(ds: rd.Dataset, queries: np.ndarray, query_ids: list[int],
                    k: int = 10, n_centroids: int = 16, n_probe: int = 4,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    sample_rows: int = 2048,
                    index_dir: str | None = None) -> rd.Dataset:
    """IVF top-k: builds (or reuses) the persisted cell-partitioned index,
    then probes it. ``index_dir`` defaults to a scratch path; pass a
    durable location to amortize the build across query sessions."""
    import os
    import tempfile

    if index_dir is None:
        index_dir = os.path.join(tempfile.gettempdir(),
                                 "pdf_extraction_ray", "ivf-scratch")
    # no up-front spill: when the index is FRESH, ensure's stamp scan
    # is the only pass over ds (review finding — an unconditional spill
    # paid a full projection write per warm query); the build path
    # spills inside build_ivf_index where the multi-pass reads live
    ensure_ivf_index(ds, index_dir, n_centroids, vec_col, id_col,
                     sample_rows)
    return topk_cosine_ivf_indexed(index_dir, queries, query_ids, k,
                                   n_probe, vec_col, id_col)


def ensure_ivf_index(ds: rd.Dataset, index_dir: str, n_centroids: int = 16,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     sample_rows: int = 2048) -> None:
    """Build unless a FRESH index exists: a stale one (different dataset
    at the same path, regenerated corpus) would silently answer queries
    from the wrong corpus. The stamp is (row count, XOR-of-ids,
    n_centroids, quantizer tag); the caller's corpus may match either
    the immutable BASE build stamp or the post-append folded stats — an
    index that has absorbed ``append_to_ivf_index`` batches is a
    superset of its base corpus, not a stale one (rebuilding would wipe
    every admitted batch)."""
    import json
    import os

    meta_path = os.path.join(index_dir, "_meta.json")
    if os.path.exists(os.path.join(index_dir, "_centroids.npy")) and \
            os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if (meta.get("n_centroids") == n_centroids
                and meta.get("quantizer") == "int20-v1"):
            n, fp = _ids_fingerprint(ds, id_col)
            if ((meta.get("n_rows") == n and meta.get("id_fp") == fp)
                    or (meta.get("base_n") == n
                        and meta.get("base_fp") == fp)):
                return
    build_ivf_index(ds, index_dir, n_centroids, vec_col, id_col,
                    sample_rows)


def append_to_ivf_index(ds_new: rd.Dataset, index_dir: str,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> dict:
    """Incremental ingest into the persisted IVF index — the admit half
    of an embedding ingest loop, completing the index-family symmetry
    (textindex.append_to_index, dedup.append_to_minhash_index). The
    coarse quantizer is FROZEN: new vectors assign against the
    build-time centroids (standard IVF discipline — recall drifts as
    the appended mass grows; ``n_appended`` in the meta tracks the
    drift so callers can schedule a re-train, which is a rebuild).

    Work scales with the batch: each touched ``cell=K/`` directory
    gains ONE delta parquet (atomic tmp-then-rename, never a rewrite of
    existing files) whose schema matches the base files, so
    ``topk_cosine_ivf_indexed``'s per-cell glob sees appended vectors
    with no probe-side change. Corpus stats fold into ``_meta.json``
    LAST.

    At-least-once-safe exactly like the other two indexes: ``applied``
    batch fingerprints make a duplicate submission after the meta
    publish a no-op — with NO redelivery horizon: membership is the
    hot manifest list ∪ the never-forgetting archive sidecar
    (state/appliedlog.py; compaction folds old fingerprints out of the
    hot list but they remain queryable forever) — and a retry on the
    same pre-state reuses the (pre-state fp, batch stats) delta tag,
    overwriting its own partial files idempotently. Returns the
    updated meta."""
    import glob
    import hashlib as _hl
    import json
    import os

    import pyarrow.parquet as pq

    from .dedup import _ids_stats

    meta_path = os.path.join(index_dir, "_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    cents = load_ivf_centroids(index_dir)
    # delta files must carry the INDEX's physical schema, or a later
    # compaction/read concats list<float> base files with list<double>
    # deltas and fails — cast the batch to the on-disk types up front
    base_files = sorted(glob.glob(os.path.join(index_dir, "cell=*",
                                               "*.parquet")))
    disk = pq.read_schema(base_files[0]) if base_files else None

    ds_new = ds_new.materialize()   # stats + assign passes share it
    n_new, fp_new, sum_new = _ids_stats(ds_new, id_col)
    if n_new == 0:
        return meta
    batch_fp = _hl.sha256(
        f"ivf:{n_new}:{fp_new}:{sum_new}".encode()).hexdigest()[:16]
    from ..state.appliedlog import applied_contains
    if applied_contains(index_dir, meta.get("applied", []), batch_fp):
        return meta  # at-least-once duplicate: already folded, no-op
    delta_tag = _hl.sha256(
        f"{meta['id_fp']}:{n_new}:{fp_new}:{sum_new}".encode()
    ).hexdigest()[:16]

    cref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        cc = ray.get(cref)
        mat = quantize_unit_rows(_batch_matrix(batch, vec_col))
        cell = np.argmax(mat @ cc.T, axis=1).astype(np.int32)
        out = batch.append_column("cell_id", pa.array(cell, pa.int32()))
        if disk is not None:
            out = pa.table({f.name: out[f.name].cast(f.type)
                            for f in disk})
        return out

    def write_delta(group: pa.Table) -> pa.Table:
        cell = int(group["cell_id"][0].as_py())
        out = os.path.join(index_dir, f"cell={cell}",
                           f"delta-{delta_tag}.parquet")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        tmp = out + ".tmp"
        pq.write_table(group, tmp)
        os.replace(tmp, out)
        return pa.table({"cell": pa.array([cell], pa.int64()),
                         "n": pa.array([group.num_rows], pa.int64())})

    (ds_new.select_columns([id_col, vec_col])
           .map_batches(assign, batch_format="pyarrow")
           .groupby("cell_id")
           .map_groups(write_delta, batch_format="pyarrow")
           .materialize())

    meta = {**meta,
            "n_rows": meta["n_rows"] + n_new,
            "id_fp": meta["id_fp"] ^ fp_new,
            "n_appended": meta.get("n_appended", 0) + n_new,
            # idempotence log — never FORGOTTEN (a cap re-ingests old
            # retries); hot list bounded by folding into the archive
            # sidecar at compact_ivf_index (state/appliedlog.py)
            "applied": meta.get("applied", []) + [batch_fp]}
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)
    return meta


def compact_ivf_index(index_dir: str, id_col: str = "vec_id") -> dict:
    """Merge each ``cell=K/`` directory's files into one base file —
    the maintenance step after many ``append_to_ivf_index`` batches
    (the textindex.compact_index shape: one task per multi-file
    directory via the Dataset scheduler).

    Crash model (documented): a kill between publishing the merged file
    and deleting the olds leaves both visible; the merge dedups on the
    natural key (``id_col`` — duplicates are byte-identical by
    construction), so a re-run converges. Returns
    {"dirs_compacted", "files_removed"}."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    work = []
    for pdir in sorted(glob.glob(os.path.join(index_dir, "cell=*"))):
        files = sorted(glob.glob(os.path.join(pdir, "*.parquet")))
        if len(files) > 1:
            work.append({"pdir": pdir, "files": files})
    if not work:
        return {"dirs_compacted": 0, "files_removed": 0}

    def merge_one(batch: pa.Table) -> pa.Table:
        n_removed = []
        for pdir, files in zip(batch["pdir"].to_pylist(),
                               batch["files"].to_pylist()):
            t = pa.concat_tables([pq.read_table(f) for f in files],
                                 promote_options="default")
            df = t.to_pandas().drop_duplicates([id_col])
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

    # bound the applied-fingerprint hot list
    # (shared fold/republish discipline: state/appliedlog.fold_manifest)
    from ..state.appliedlog import fold_manifest
    fold_manifest(index_dir, os.path.join(index_dir, "_meta.json"))
    return {"dirs_compacted": len(work), "files_removed": removed}


_PIN_DIRS: list[str] = []
_PIN_MAX_AGE_S = 6 * 3600


def _cleanup_pins() -> None:
    import shutil

    for d in _PIN_DIRS:
        shutil.rmtree(d, ignore_errors=True)


def persist_projection(ds: rd.Dataset, cols: list[str],
                       tag: str = "pin") -> rd.Dataset:
    """Spill a pruned projection to scratch parquet and hand back a
    RE-READABLE dataset — the 100-TB shape for iterative consumers
    (k-means rounds, SemDeDup's fit+assign): each pass re-executes a
    cheap column-pruned parquet read instead of pinning the projection
    in the object store, where a corpus-scale pin is spill pressure
    for every concurrent stage (the round-4 verdict's materialize()
    flag, applied to the embedding family).

    Lifetime (review finding — unbounded scratch was a disk leak): the
    scratch directory is per-call (uuid-tagged), registered for
    removal at process exit, and each call also sweeps sibling pin
    dirs older than ``_PIN_MAX_AGE_S`` (leftovers of killed
    processes). A concurrent session's LIVE pins are younger than the
    age bound, so the sweep never races one."""
    import atexit
    import os
    import shutil
    import tempfile
    import time
    import uuid

    root = os.path.join(tempfile.gettempdir(), "pdf_extraction_ray",
                        "pins")
    try:
        now = time.time()
        for name in os.listdir(root):
            p = os.path.join(root, name)
            if now - os.path.getmtime(p) > _PIN_MAX_AGE_S:
                shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass
    out = os.path.join(root, f"{tag}-{uuid.uuid4().hex[:12]}")
    ds.select_columns(cols).write_parquet(out)
    if not _PIN_DIRS:
        atexit.register(_cleanup_pins)
    _PIN_DIRS.append(out)
    return rd.read_parquet(out)


def kmeans_fit(ds: rd.Dataset, k: int = 10, iters: int = 8,
               vec_col: str = "embedding", id_col: str = "vec_id",
               init_sample: int = 256,
               init_ids: list[int] | None = None,
               ) -> tuple[np.ndarray, list[float]]:
    """Fit Lloyd's k-means and return (centroids, inertia history) —
    the fitting loop of :func:`kmeans`, exposed so composed operators
    (e.g. SemDeDup's cluster-then-prune) can broadcast the centroids
    into their own assignment maps. ``ds`` should already be
    materialized (or cheap to re-read): every Lloyd round re-reads it.
    """
    import pyarrow.compute as pc

    # --- deterministic init on a bounded id-pruned sample ---
    id_bound = (max(init_ids) + 1) if init_ids else init_sample
    sample = ds.map_batches(
        lambda t: t.filter(pc.less(t[id_col], id_bound)),
        batch_format="pyarrow")
    st = sample.take_all()
    if len(st) < k:
        raise ValueError(
            f"kmeans init sample has {len(st)} rows < k={k}: ids in "
            f"[0, {id_bound}) are assumed to exist — raise init_sample "
            f"or re-key {id_col}")
    smat = np.asarray([r[vec_col] for r in st], dtype=np.float64)
    sids = np.asarray([r[id_col] for r in st], dtype=np.int64)
    order = np.argsort(sids, kind="stable")
    smat = smat[order]
    sids = sids[order]
    if init_ids is not None:
        if len(init_ids) != k:
            raise ValueError(f"init_ids has {len(init_ids)} ids != k={k}")
        pos = {int(i): p for p, i in enumerate(sids)}
        try:
            centroids = np.stack([smat[pos[int(i)]] for i in init_ids])
        except KeyError as e:
            raise ValueError(f"init id {e} not present in {id_col}") from e
    else:
        cents = [smat[0]]
        d2 = ((smat - cents[0]) ** 2).sum(axis=1)
        for _ in range(1, k):
            if d2.max() == 0.0:
                raise ValueError(
                    "kmeans init degenerate: fewer than k distinct vectors "
                    "in the init sample — raise init_sample")
            nxt = int(np.argmax(d2))  # first max → deterministic
            cents.append(smat[nxt])
            d2 = np.minimum(d2, ((smat - cents[-1]) ** 2).sum(axis=1))
        centroids = np.stack(cents)

    inertia_hist: list[float] = []
    for _ in range(iters):
        cref = ray.put(centroids)

        def partial(batch: pa.Table, _cref=cref) -> pa.Table:
            C = ray.get(_cref)
            X = _batch_matrix(batch, vec_col)
            d = ((X * X).sum(axis=1, keepdims=True)
                 - 2.0 * (X @ C.T)
                 + (C * C).sum(axis=1))
            assign = np.argmin(d, axis=1)  # first min → deterministic
            sums = np.zeros_like(C)
            np.add.at(sums, assign, X)
            counts = np.bincount(assign, minlength=C.shape[0])
            inertia = float(d[np.arange(len(X)), assign].sum())
            return pa.table({
                "sums": pa.array([sums.tobytes()], pa.large_binary()),
                "counts": pa.array([counts.astype(np.int64).tobytes()],
                                   pa.large_binary()),
                "inertia": pa.array([inertia], pa.float64()),
            })

        # fold partials in a sorted, order-independent way: block arrival
        # order varies run-to-run, and float += in arrival order wobbles
        # the centroids (and thus the history) at ~1e-13 rel
        parts: list[tuple[bytes, bytes, float]] = []
        for b in (ds.map_batches(partial, batch_format="pyarrow")
                    .iter_batches(batch_format="pyarrow")):
            parts.extend(zip(b["sums"].to_pylist(),
                             b["counts"].to_pylist(),
                             b["inertia"].to_pylist()))
        parts.sort()
        sums = np.zeros_like(centroids)
        counts = np.zeros(k, dtype=np.int64)
        for s, c, _ in parts:
            sums += np.frombuffer(s, np.float64).reshape(centroids.shape)
            counts += np.frombuffer(c, np.int64)
        import math
        inertia_hist.append(math.fsum(sorted(i for _, _, i in parts)))
        nonempty = counts > 0
        centroids = np.where(nonempty[:, None],
                             sums / np.maximum(counts, 1)[:, None],
                             centroids)

    return centroids, inertia_hist


def kmeans(ds: rd.Dataset, k: int = 10, iters: int = 8,
           vec_col: str = "embedding", id_col: str = "vec_id",
           init_sample: int = 256,
           init_ids: list[int] | None = None) -> tuple[rd.Dataset, list[float]]:
    """Distributed Lloyd's k-means over an embedding column.

    The iterative-algorithm shape on Ray Data: centroids broadcast once
    per round (``ray.put``), every batch computes its assignments with
    one numpy matmul and reduces to a (k x dim sums, k counts, inertia)
    partial — the driver folds only those fixed-size partials, never
    vectors. Init is deterministic and RNG-free either way: farthest-
    point (k-center greedy) on a bounded id-pruned sample by default, or
    — when ``init_ids`` is given — the vectors with those ids in order
    (centroid j = vector ``init_ids[j]``; the SQL-replicable choice the
    oracle uses, since farthest-point needs k sequential argmax steps).

    Returns (assignments dataset (id_col, cluster_id), per-iteration
    inertia list — non-increasing by Lloyd's monotonicity, asserted in
    tests). Empty clusters keep their previous centroid.
    """
    # persist the (id, vec) projection to scratch parquet ONCE: the
    # sample scan, every Lloyd round, and the final assignment then
    # each re-read a pruned parquet (the 100-TB shape) instead of
    # pinning the projection in the object store or re-executing the
    # caller's full lineage iters+2 times
    ds = persist_projection(ds, [id_col, vec_col], tag="kmeans")
    centroids, inertia_hist = kmeans_fit(
        ds, k=k, iters=iters, vec_col=vec_col, id_col=id_col,
        init_sample=init_sample, init_ids=init_ids)
    cref = ray.put(centroids)

    def assign_final(batch: pa.Table) -> pa.Table:
        C = ray.get(cref)
        X = _batch_matrix(batch, vec_col)
        d = ((X * X).sum(axis=1, keepdims=True) - 2.0 * (X @ C.T)
             + (C * C).sum(axis=1))
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            "cluster_id": pa.array(np.argmin(d, axis=1).astype(np.int64)),
        })

    return (ds.map_batches(assign_final, batch_format="pyarrow"),
            inertia_hist)


# ---------------------------------------------------------------------------
# IVF tombstone deletion — the vector-side takedown (textindex symmetry;
# shared machinery: state/tombstones.py — IVF scoring uses no corpus
# stats, so no dl bookkeeping: the meta fold serves the freshness stamp)
# ---------------------------------------------------------------------------

from ..state import tombstones as _tomb

IVF_TOMB_DIR = _tomb.TOMB_DIR


def _load_ivf_tombstones(index_dir: str,
                         skip_tags: "set[str] | None" = None) -> dict:
    """{ids, n, tags} — id-deduped; applied tags skipped (the crash
    window)."""
    return _tomb.load(index_dir, skip_tags=skip_tags)


def delete_from_ivf_index(index_dir: str, vec_ids,
                          id_col: str = "vec_id") -> dict:
    """Tombstone deletion for the persisted IVF index: probes stop
    serving the vectors immediately (map-side filter); the physical
    cell rewrite + meta fold defers to ``apply_ivf_tombstones``.
    Presence verifies against the cell files (one distributed filtered
    id scan); ids already PENDING no-op, ids in APPLIED files are
    physically gone and a re-ingested vector takes a fresh takedown.
    Returns {"n_deleted", "path"}."""
    import glob
    import json
    import os

    with open(os.path.join(index_dir, "_meta.json")) as f:
        meta = json.load(f)
    already = _load_ivf_tombstones(
        index_dir, skip_tags=set(meta.get("tombs_applied", [])))["ids"]
    want = sorted({int(i) for i in vec_ids} - already)
    if not want:
        return {"n_deleted": 0, "path": None}
    wset = set(want)

    files = sorted(glob.glob(os.path.join(index_dir, "cell=*",
                                          "*.parquet")))
    present: set = set()

    def find_ids(batch: pa.Table) -> pa.Table:
        ids = [int(i) for i in batch[id_col].to_pylist() if int(i) in wset]
        return pa.table({id_col: pa.array(sorted(set(ids)), pa.int64())})

    for b in (rd.read_parquet(files, columns=[id_col])
              .map_batches(find_ids, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        present.update(int(i) for i in b[id_col].to_pylist())
    present_l = sorted(present)
    if not present_l:
        return {"n_deleted": 0, "path": None}
    path = _tomb.write(index_dir, present_l)
    return {"n_deleted": len(present_l), "path": path}


def apply_ivf_tombstones(index_dir: str,
                         id_col: str = "vec_id") -> dict:
    """Physically drop tombstoned vectors from their cell files and
    fold (n_rows, id_fp) atomically with the applied tags; only KNOWN
    tombstone files delete (a concurrent delete's file survives for
    the next apply). After the fold, ``ensure_ivf_index`` accepts the
    FILTERED corpus — a takedown never triggers a rebuild that would
    resurrect the ids. Returns {"n_applied", "rows_dropped"}."""
    import glob
    import json
    import os

    meta_path = os.path.join(index_dir, "_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    applied = set(meta.get("tombs_applied", []))
    tomb = _load_ivf_tombstones(index_dir, skip_tags=applied)
    if not tomb["n"]:
        _tomb.cleanup(index_dir, applied)
        return {"n_applied": 0, "rows_dropped": 0}
    wset = tomb["ids"]

    rows_dropped = _tomb.rewrite_drop(
        sorted(glob.glob(os.path.join(index_dir, "cell=*",
                                      "*.parquet"))), wset, id_col)

    fp = meta["id_fp"]
    for i in wset:
        fp ^= int(i) & ((1 << 64) - 1)  # id_fp is the xor of raw ids
    meta = {**meta, "n_rows": meta["n_rows"] - tomb["n"], "id_fp": fp,
            # prefix-only cap: the current apply's tags never truncate
            "tombs_applied": sorted(applied)[-64:] + tomb["tags"]}
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)
    _tomb.cleanup(index_dir, applied | set(tomb["tags"]))
    return {"n_applied": tomb["n"], "rows_dropped": rows_dropped}
