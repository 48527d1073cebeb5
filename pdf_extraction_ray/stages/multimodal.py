"""Multimodal column plumbing: opaque binary media + typed metadata.

Beyond-the-reference operators for image/audio payload pipelines. The
decode kernels themselves are STUBBED (no image/audio libraries in this
environment — clearly marked below); everything Ray-side is real and
tested: schema, actor-pool signature, batching of large binary rows,
deterministic metadata output.

Decode behavior: ``MediaFeatureExtractor`` computes real byte-level
features (length, sha256, entropy estimate) and, where a real decoder
would produce dimensions / durations, emits a deterministic fake derived
from the content hash via ``_stub_decode`` — swap that single function for
a real decoder (PIL / libsndfile) when the libraries exist.
"""

from __future__ import annotations

import hashlib
import math

import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("media_type", pa.string()),
    ("n_bytes", pa.int64()),
    ("media_sha256", pa.string()),
    ("entropy_cbits", pa.int64()),   # centibits/byte (integer for oracle-ability)
    ("width", pa.int64()),
    ("height", pa.int64()),
    ("decoded", pa.bool_()),
])


def _entropy_cbits(payload: bytes) -> int:
    """Byte-histogram Shannon entropy in centibits/byte (0..800)."""
    if not payload:
        return 0
    counts = [0] * 256
    for b in payload:
        counts[b] += 1
    n = len(payload)
    h = -sum((c / n) * math.log2(c / n) for c in counts if c)
    return int(round(h * 100))


def _stub_decode(payload: bytes) -> tuple[int, int]:
    """STUB: a real build calls the image decoder here and returns true
    (width, height). Deterministic fake from the content hash so the
    pipeline plumbing (schemas, joins, partitioning on dims) is testable.
    """
    d = hashlib.sha256(payload).digest()
    return 64 + d[0] % 192, 64 + d[1] % 192


class MediaFeatureExtractor:
    """Actor-pool stage over an opaque binary media column.

    Use with small batch sizes: a batch is ``batch_size`` multi-MB blobs
    resident in one actor's heap (the engine's memory-sizing rule for
    wide binary rows)."""

    def __init__(self, media_col: str = "html", media_type: str = "image"):
        self.media_col = media_col
        self.media_type = media_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        col = batch[self.media_col]
        for i in range(len(batch)):
            payload = col[i].as_py() or b""
            w, h = _stub_decode(payload)
            rows.append({
                "url": batch["url"][i].as_py(),
                "media_type": self.media_type,
                "n_bytes": len(payload),
                "media_sha256": hashlib.sha256(payload).hexdigest(),
                "entropy_cbits": _entropy_cbits(payload),
                "width": w,
                "height": h,
                "decoded": False,  # stays False until a real decoder exists
            })
        return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def media_features(pages_ds, media_col: str = "html",
                   batch_size: int = 16, concurrency=(1, 8)):
    """Pages dataset → media feature rows (actor pool, small batches)."""
    return pages_ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"media_col": media_col},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
