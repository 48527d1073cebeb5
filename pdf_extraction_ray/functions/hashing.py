"""Hashing / fingerprinting scalar functions.

``sha256_hex`` is the reference's dedup identity
(reference: app/services/file_validator.py:79). The rest — MinHash,
SimHash, shingling, rolling fingerprints, stable url-hash bucketing — are
the near-dedup toolkit a 100 TB training-data pipeline needs (beyond the
reference, which only has exact dedup:
migrations/006_add_constraints_and_indexes.sql:10-20).

All functions are deterministic (fixed mixing constants, no process-seeded
hashing) and vectorized where it pays (numpy for minhash/simhash).
"""

from __future__ import annotations

import hashlib
import re
import struct

import numpy as np

_WORD_RE = re.compile(r"\w+", re.UNICODE)

MERSENNE_61 = (1 << 61) - 1


def sha256_hex(data: bytes | str) -> str:
    if isinstance(data, str):
        data = data.encode("utf-8")
    return hashlib.sha256(data).hexdigest()


def stable_hash64(data: bytes | str) -> int:
    """First 8 bytes of sha256 as an unsigned 63-bit int (stable across runs)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    return struct.unpack("<Q", hashlib.sha256(data).digest()[:8])[0] >> 1


def url_bucket(url: str, n_buckets: int) -> int:
    """Stable url-hash partition id (the engine's one partitioning key)."""
    return stable_hash64(url) % n_buckets


def tokens(text: str) -> list[str]:
    return _WORD_RE.findall(text.lower())


def shingles(text: str, k: int = 3) -> set[int]:
    """Hashed word k-shingles."""
    toks = tokens(text)
    if len(toks) < k:
        return {stable_hash64(" ".join(toks))} if toks else set()
    out = set()
    for i in range(len(toks) - k + 1):
        out.add(stable_hash64(" ".join(toks[i:i + k])))
    return out


def _minhash_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(1729)  # fixed seed: permutations are part of the spec
    a = rng.randint(1, MERSENNE_61, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, MERSENNE_61, size=num_perm, dtype=np.uint64)
    return a, b


_PARAM_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def minhash_signature(sh: set[int], num_perm: int = 64) -> np.ndarray:
    """MinHash signature over a shingle set (uint64[num_perm])."""
    if num_perm not in _PARAM_CACHE:
        _PARAM_CACHE[num_perm] = _minhash_params(num_perm)
    a, b = _PARAM_CACHE[num_perm]
    if not sh:
        return np.full(num_perm, np.uint64(MERSENNE_61), dtype=np.uint64)
    v = np.fromiter(sh, dtype=np.uint64, count=len(sh))
    # deterministic permutation family ((a*x + b) mod 2^64) mod p — the
    # uint64 multiply wraps before the Mersenne mod, so this is NOT the
    # textbook universal (a,b) family; the double-mod slightly biases
    # collision probabilities, which the recall tests bound empirically.
    # (Exact 61-bit modular products need 128-bit math numpy lacks.)
    prod = (a[:, None] * v[None, :] + b[:, None]) % np.uint64(MERSENNE_61)
    return prod.min(axis=1)


def minhash_bands(sig: np.ndarray, bands: int = 16) -> list[int]:
    """LSH band hashes: signature split into ``bands`` rows-per-band groups."""
    r = len(sig) // bands
    out = []
    for b in range(bands):
        out.append(stable_hash64(sig[b * r:(b + 1) * r].tobytes()))
    return out


def simhash64(text: str) -> int:
    """64-bit count-weighted SimHash over word tokens (Charikar-style:
    each feature votes with its frequency, so small edits move few bits)."""
    toks = tokens(text)
    if not toks:
        return 0
    freq: dict[str, int] = {}
    for t in toks:
        freq[t] = freq.get(t, 0) + 1
    hs = np.fromiter((stable_hash64(t) for t in freq), dtype=np.uint64)
    ws = np.fromiter(freq.values(), dtype=np.int64)
    votes = np.zeros(64, dtype=np.int64)
    for bit in range(64):
        on = ((hs >> np.uint64(bit)) & np.uint64(1)).astype(np.int64)
        votes[bit] = int((ws * (2 * on - 1)).sum())
    return int(sum(1 << b for b in range(64) if votes[b] > 0))


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def cdc_boundaries(text: str, window: int = 16,
                   boundary_mod: int = 64) -> list[int]:
    """Content-defined chunk boundaries (FastCDC / rsync gear
    principle, with ``rolling_fingerprint``'s exact polynomial hash
    law): the 1-based END positions where the window hash ≡ 0
    (mod ``boundary_mod``); the text's end is always the final
    boundary. An insertion or deletion only re-chunks its local
    neighborhood — the property that makes chunk-level dedup robust to
    edits where fixed-size blocks are not. A text shorter than the
    window is one whole chunk. Average chunk ≈ ``boundary_mod``
    chars."""
    n = len(text)
    if n == 0:
        return []
    if n < window:
        return [n]
    base = 1099511628211
    mod = (1 << 64) - 59
    power = pow(base, window - 1, mod)
    h = 0
    out = []
    for i, ch in enumerate(text):
        if i >= window:
            h = (h - ord(text[i - window]) * power) % mod
        h = (h * base + ord(ch)) % mod
        if i >= window - 1 and h % boundary_mod == 0 and i + 1 < n:
            out.append(i + 1)
    out.append(n)
    return out


def rolling_fingerprint(text: str, window: int = 16, keep_mod: int = 8) -> list[int]:
    """Winnowing-style document fingerprint: polynomial rolling hashes of
    char windows, keeping hashes ≡ 0 (mod keep_mod) — a compact sketch for
    containment checks."""
    n = len(text)
    if n == 0:
        return []
    if n < window:
        return [stable_hash64(text)]
    base = 1099511628211
    mod = (1 << 64) - 59
    power = pow(base, window - 1, mod)
    h = 0
    out = []
    for i, ch in enumerate(text):
        if i >= window:
            h = (h - ord(text[i - window]) * power) % mod
        h = (h * base + ord(ch)) % mod
        if i >= window - 1 and h % keep_mod == 0:
            out.append(h)
    return out
