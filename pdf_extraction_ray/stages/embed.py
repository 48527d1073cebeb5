"""Text → embedding stage: the batched model-inference shape on Ray
Data (actor pool, model state built once per actor, vectorized batch
forward).

The "model" is a deterministic feature-hashing projector: char n-grams
hash into ``n_buckets`` counts, one dense matmul against a seeded
projection matrix produces unit vectors. Stand-in for a real encoder
(sentence-transformers etc. are not in this container) with the same
plumbing: heavy state in ``__init__`` (never per batch), batch-level
numpy forward, small batches for wide rows. Deterministic by seed, so
embeddings are reproducible across topologies and runs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

EMBED_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("embedding", pa.list_(pa.float32())),
])


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
        rng = np.random.RandomState(seed)
        self.proj = rng.normal(size=(n_buckets, dim)).astype(np.float32)
        self.n_buckets = n_buckets
        self.ngram = ngram
        self.text_col = text_col
        self.id_col = id_col

    def _bucket_counts(self, text: str) -> np.ndarray:
        """Char n-gram counts hashed into buckets (FNV-1a, stable).

        Vectorized across positions: the n FNV rounds run as n whole-
        array xor/multiply passes (windows are independent), then one
        scatter-add — no per-character Python.
        """
        counts = np.zeros(self.n_buckets, np.float32)
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
