"""Similarity search over an embedding column (beyond-the-reference
training-data operator).

Brute-force cosine top-k is the exactness baseline: the (small) query
matrix is broadcast once with ``ray.put`` and every batch does one numpy
matmul against it — no shuffle at all, scales linearly with corpus size.
The IVF variant is the scale path: a deterministic k-means-lite coarse
quantizer (fit on a driver-side sample), then candidates only from the
``n_probe`` nearest centroids — recall traded for touch-fraction;
verified against brute force in tests.
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


def fit_centroids(sample: np.ndarray, n_centroids: int = 16,
                  iters: int = 10) -> np.ndarray:
    """Deterministic k-means-lite on a sample (fixed seeding by index)."""
    sample = _unit_rows(np.asarray(sample, dtype=np.float64))
    idx = np.linspace(0, len(sample) - 1, n_centroids).astype(int)
    cents = sample[idx].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(n_centroids):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def topk_cosine_ivf(ds: rd.Dataset, queries: np.ndarray, query_ids: list[int],
                    k: int = 10, n_centroids: int = 16, n_probe: int = 4,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    sample_rows: int = 2048) -> rd.Dataset:
    """IVF top-k: vectors in cells whose centroid is probed are scored;
    the rest are skipped. At scale the centroid assignment becomes the
    partitioning key (one shuffle at index build, then probes touch
    n_probe/n_centroids of the data)."""
    sample = ds.limit(sample_rows).to_pandas()
    smat = np.stack(sample[vec_col].to_numpy())
    cents = fit_centroids(smat, n_centroids)
    qmat = _unit_rows(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(qmat @ cents.T), axis=1)[:, :n_probe]
    ref = ray.put((qmat, list(query_ids), cents, probe))

    def partials(batch: pa.Table) -> pa.Table:
        qm, qids, cc, pr = ray.get(ref)
        mat = _unit_rows(_batch_matrix(batch, vec_col))
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        cell = np.argmax(mat @ cc.T, axis=1)
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
