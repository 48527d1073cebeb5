"""Approximate aggregation sketches (beyond-the-reference training-data
operators).

HyperLogLog distinct counting in the engine's mergeable-partial shape:
every batch reduces to one fixed-size register row (numpy elementwise
max), partials merge with one tiny groupby — the swap-in for exact
distinct counts when group cardinality explodes (SCALE.md known
trade-off #3). The register update is pure sha256 arithmetic, so the
estimate is deterministic across topologies; accuracy (~1.04/sqrt(m))
is asserted against exact counts in tests.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa

import ray.data as rd


def _hll_update(registers: np.ndarray, values, p: int) -> None:
    m = 1 << p
    for v in values:
        d = hashlib.sha256(str(v).encode()).digest()
        h = int.from_bytes(d[:8], "little")
        idx = h & (m - 1)
        w = h >> p
        # rank = leading-zero count of the remaining 64-p bits, + 1
        rank = (64 - p) - w.bit_length() + 1
        if rank > registers[idx]:
            registers[idx] = rank


def hll_estimate(registers: np.ndarray) -> int:
    """Standard HLL estimator with small-range (linear counting)
    correction."""
    m = registers.size
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    zeros = int(np.count_nonzero(registers == 0))
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return int(round(est))


def approx_distinct(ds: rd.Dataset, col: str, p: int = 12) -> int:
    """Approximate COUNT(DISTINCT col) via HyperLogLog (2^p registers).

    One streaming pass: each batch emits its 2^p-byte register row; the
    driver folds the tiny partials with elementwise max (one row per
    block — O(blocks * 2^p bytes), never the values).
    """
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        regs = np.zeros(m, dtype=np.uint8)
        _hll_update(regs, batch[col].to_pylist(), p)
        return pa.table({"regs": pa.array([regs.tobytes()],
                                          pa.large_binary())})

    merged = np.zeros(m, dtype=np.uint8)
    for b in (ds.select_columns([col])
                .map_batches(partial, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow")):
        for r in b["regs"].to_pylist():
            np.maximum(merged, np.frombuffer(r, dtype=np.uint8), out=merged)
    return hll_estimate(merged)


def approx_distinct_by_key(ds: rd.Dataset, key_col: str, col: str,
                           p: int = 10) -> rd.Dataset:
    """Per-key approximate distinct counts: batch-level (key, registers)
    partials, then ONE groupby(key) merging registers elementwise —
    the sketch shape that replaces an exact per-key distinct when
    cardinality explodes. Returns (key_col, approx_distinct)."""
    import pandas as pd

    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        acc: dict = {}
        keys = batch[key_col].to_pylist()
        vals = batch[col].to_pylist()
        for k, v in zip(keys, vals):
            regs = acc.get(k)
            if regs is None:
                regs = acc[k] = np.zeros(m, dtype=np.uint8)
            _hll_update(regs, (v,), p)
        ks = sorted(acc)
        return pa.table({
            key_col: pa.array(ks),
            "regs": pa.array([acc[k].tobytes() for k in ks],
                             pa.large_binary()),
        })

    def merge(g: pd.DataFrame) -> pa.Table:
        regs = np.zeros(m, dtype=np.uint8)
        for r in g["regs"]:
            np.maximum(regs, np.frombuffer(r, dtype=np.uint8), out=regs)
        return pa.table({
            key_col: pa.array([g[key_col].iloc[0]]),
            "approx_distinct": pa.array([hll_estimate(regs)], pa.int64()),
        })

    return (ds.select_columns([key_col, col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby(key_col)
              .map_groups(merge, batch_format="pandas"))
