"""Text → embedding stage: the batched model-inference shape on Ray
Data (actor pool, model state built once per actor, vectorized batch
forward).

The "model" is a deterministic feature-hashing projector: char n-grams
hash into ``n_buckets`` counts (FNV-1a 32-bit), one dense matmul against
a sha256-derived projection matrix produces unit vectors. Stand-in for a
real encoder (sentence-transformers etc. are not in this container) with
the same plumbing: heavy state in ``__init__`` (never per batch),
batch-level numpy forward, small batches for wide rows. Every arithmetic
step is integer-or-closed-form, so the WHOLE model is replicable in SQL
(``analytics.text_embed_dups_sql`` recomputes it in DuckDB) and
embeddings are reproducible across topologies and runs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..functions.hashing import stable_hash64

EMBED_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("embedding", pa.list_(pa.float32())),
])

_2_52 = float(1 << 52)


def projection_matrix(n_buckets: int, dim: int) -> np.ndarray:
    """Deterministic projection: proj[b, d] derives from
    ``stable_hash64(f"proj:{b}:{d}") >> 10`` — 53 uniform bits mapped to
    [-1, 1) as ``(u - 2^52) / 2^52``, which is EXACT in float64 (the
    numerator is an integer of magnitude <= 2^52), so DuckDB reproduces
    the same doubles bit-for-bit (no RNG: round 2 used
    ``np.random.RandomState``, which nothing else can replicate)."""
    vals = np.empty((n_buckets, dim), np.float64)
    for b in range(n_buckets):
        for d in range(dim):
            u = stable_hash64(f"proj:{b}:{d}") >> 10
            vals[b, d] = (u - _2_52) / _2_52
    return vals


class HashingEmbedder:
    """Actor-pool embedding stage.

    ``__init__`` builds the projection table ONCE per actor (the
    model-load analog — reference analog for pinned per-worker state:
    client singletons, app/services/gemini_client.py:11-42);
    ``__call__`` is a vectorized batch forward.
    """

    def __init__(self, dim: int = 64, n_buckets: int = 4096,
                 ngram: int = 3, seed: int = 7,
                 text_col: str = "text", id_col: str = "doc_id"):
        # seed kept for API compatibility; the projection is fully
        # determined by (n_buckets, dim) so SQL oracles can replicate it
        self.proj = projection_matrix(n_buckets, dim)
        self.n_buckets = n_buckets
        self.ngram = ngram
        self.text_col = text_col
        self.id_col = id_col

    def _bucket_counts(self, text: str) -> np.ndarray:
        """Char n-gram counts hashed into buckets (FNV-1a 32-bit, stable).

        Vectorized across positions: the n FNV rounds run as n whole-
        array xor/multiply passes (windows are independent), then one
        scatter-add — no per-character Python.
        """
        counts = np.zeros(self.n_buckets, np.float64)
        n = self.ngram
        b = text.encode("utf-8", "replace")
        if len(b) < n:
            return counts
        arr = np.frombuffer(b, np.uint8).astype(np.uint64)
        L = len(b) - n + 1
        h = np.full(L, 2166136261, np.uint64)
        for j in range(n):
            h = ((h ^ arr[j:j + L]) * np.uint64(16777619)) & np.uint64(0xFFFFFFFF)
        np.add.at(counts, (h & np.uint64(self.n_buckets - 1)).astype(np.int64), 1.0)
        return counts

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        if not texts:  # empty block: keep the output schema stable
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            })
        mat = np.stack([self._bucket_counts(t or "") for t in texts])
        emb = mat @ self.proj                      # one dense forward
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        emb = (emb / norms).astype(np.float32)
        return pa.table({
            "doc_id": batch[self.id_col].cast(pa.int64()),
            "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        })


def embed_documents(ds: rd.Dataset, batch_size: int = 64,
                    concurrency=(1, 8), **kwargs) -> rd.Dataset:
    """documents → (doc_id, embedding) via the actor pool."""
    return ds.map_batches(
        HashingEmbedder, fn_constructor_kwargs=kwargs,
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
