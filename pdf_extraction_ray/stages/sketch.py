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
    correction.

    The harmonic denominator is summed EXACTLY as an integer in units
    of 2^-63 (every 2^-r term is an integer multiple; registers <= 63),
    so the estimate is a pure function of the register multiset with no
    float-summation-order dependence — which makes it reproducible in
    SQL (``analytics.hll_users_per_type_sql``)."""
    m = registers.size
    alpha = 0.7213 / (1 + 1.079 / m)
    # arbitrary-precision sum: 1024 registers at rank 0 total 2^73,
    # past int64 — bincount collapses it to <= 64 Python-int terms
    counts = np.bincount(registers.astype(np.int64), minlength=64)
    s_exact = sum(int(c) << (63 - r) for r, c in enumerate(counts[:64]) if c)
    est = alpha * m * m * 9223372036854775808.0 / s_exact
    zeros = int(np.count_nonzero(registers == 0))
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return int(math.floor(est + 0.5))


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


def _misra_gries(values, k: int) -> dict:
    """Classic Misra–Gries frequency summary: at most ``k`` counters;
    any value with frequency > n/(k+1) is guaranteed a counter."""
    counters: dict = {}
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < k:
            counters[v] = 1
        else:
            dead = [key for key, c in counters.items() if c == 1]
            for key in counters:
                counters[key] -= 1
            for key in dead:
                del counters[key]
    return counters


def heavy_hitters(ds: rd.Dataset, col: str, k: int = 20,
                  sketch_k: int = 512,
                  values_of=None) -> pa.Table:
    """EXACT top-k frequent values via the two-pass heavy-hitters
    pattern: pass 1 streams per-batch Misra–Gries summaries (bounded
    memory — ``sketch_k`` counters per batch, never a full histogram);
    the candidate union is a guaranteed superset of every value with
    total frequency > n/(sketch_k+1) (pigeonhole over batches). Pass 2
    recounts ONLY the candidates (broadcast set filter + one small
    groupby) and takes the top ``k`` with (count desc, value asc) tie
    order. Exactness requires the true k-th frequency to clear the
    n/(sketch_k+1) bound — asserted at runtime, so a miss is loud, not
    silently wrong.

    ``values_of(batch) -> iterable`` extracts the counted values
    (default: the ``col`` column); pass a tokenizer to count terms
    without materializing an exploded token dataset.
    """
    import ray
    from ray.data.aggregate import Sum

    if values_of is None:
        def values_of(batch):  # noqa: D401
            return batch[col].to_pylist()

    def partial(batch: pa.Table) -> pa.Table:
        mg = _misra_gries(values_of(batch), sketch_k)
        vals = sorted(mg)
        return pa.table({"v": pa.array(vals, pa.string()),
                         "c": pa.array([mg[v] for v in vals], pa.int64())})

    candidates: set = set()
    for b in (ds.map_batches(partial, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow")):
        candidates.update(b["v"].to_pylist())
    cand_ref = ray.put(candidates)

    _SENTINEL = "\x00__total__"  # carries each batch's value total through
    # the groupby even when a batch holds no candidate values at all

    def recount(batch: pa.Table) -> pa.Table:
        wanted = ray.get(cand_ref)
        acc: dict = {}
        total = 0
        for v in values_of(batch):
            total += 1
            if v in wanted:
                acc[v] = acc.get(v, 0) + 1
        vals = sorted(acc)
        return pa.table({
            col: pa.array(vals + [_SENTINEL], pa.string()),
            "n": pa.array([acc[v] for v in vals] + [0], pa.int64()),
            "_total": pa.array([0] * len(vals) + [total], pa.int64()),
        })

    counted = (ds.map_batches(recount, batch_format="pyarrow")
                 .groupby(col)
                 .aggregate(Sum("n", alias_name="n"),
                            Sum("_total", alias_name="_t"))
                 .to_pandas())
    n_total = int(counted["_t"].sum())
    counted = counted[counted[col] != _SENTINEL]
    top = counted.sort_values(["n", col], ascending=[False, True],
                              kind="mergesort").head(k)
    # certification: when candidates account for EVERY occurrence the
    # recount is exact for all values and the sorted top-k is exact
    # (regardless of candidate count). Otherwise a non-candidate value
    # can hide at most n/(sketch_k+1) occurrences, so the k-th returned
    # count must clear that bound — else fail LOUDLY, never return a
    # silently wrong top-k.
    covered = int(counted["n"].sum()) == n_total
    if not covered:
        kth = int(top["n"].iloc[-1]) if len(top) else 0
        assert kth * (sketch_k + 1) > n_total, (
            f"heavy_hitters cannot certify exact top-{k}: k-th count "
            f"{kth} <= n/(sketch_k+1) = {n_total / (sketch_k + 1):.1f}; "
            "raise sketch_k")
    return pa.table({
        col: pa.array(top[col].tolist(), pa.string()),
        "n": pa.array(top["n"].tolist(), pa.int64()),
    })


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
            # typed key: an empty batch would infer arrow `null` and
            # break schema unification in the groupby
            key_col: pa.array(ks, batch.schema.field(key_col).type),
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


def grouped_quantiles_hist(ds: rd.Dataset, key_col: str, value_e: "callable",
                           qs: tuple = (0.5, 0.9, 0.99)) -> rd.Dataset:
    """EXACT per-key discrete quantiles without a global sort: values
    quantize to small non-negative ints (``value_e(batch) -> np.int64``),
    each batch reduces to one (key, histogram) partial, one tiny groupby
    merges histograms, and quantiles read off the cumulative counts —
    the scale path for percentiles (event_value_stats sorts instead; a
    sort of every row is the thing this avoids). Matches DuckDB
    ``quantile_disc`` semantics: sorted[ceil(q*n) - 1].

    Trade-off (documented): memory is O(distinct quantized values) per
    key — pick the quantization so that stays bounded (e.g. cents, ms).
    """
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        v = value_e(batch)
        keys = batch[key_col].to_pylist()
        accs: dict = {}
        kv = pd.Series(v).groupby(pd.Series(keys))
        for k, grp in kv:
            accs[k] = np.bincount(grp.to_numpy())
        ks = sorted(accs)
        return pa.table({
            key_col: pa.array(ks, batch.schema.field(key_col).type),
            "hist": pa.array([accs[k].astype(np.int64).tobytes()
                              for k in ks], pa.large_binary()),
        })

    def merge(g) -> pa.Table:
        hists = [np.frombuffer(h, np.int64) for h in g["hist"]]
        size = max(len(h) for h in hists)
        total = np.zeros(size, np.int64)
        for h in hists:
            total[:len(h)] += h
        cum = np.cumsum(total)
        n = int(cum[-1])
        out = {key_col: pa.array([g[key_col].iloc[0]]),
               "n": pa.array([n], pa.int64())}
        for q in qs:
            qk = round(q * 1000)            # q as exact per-mille int
            target = max(-(-qk * n // 1000), 1)  # ceil(q*n), all-integer
            val = int(np.searchsorted(cum, target, side="left"))
            out[f"q{int(q * 100)}"] = pa.array([val], pa.int64())
        return pa.table(out)

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(key_col).map_groups(merge, batch_format="pandas"))


def global_quantile_threshold(ds: rd.Dataset, col: str, q: float) -> int:
    """EXACT global discrete quantile of a non-negative int column
    without a sort: per-batch SPARSE (value, count) partials — one
    ``np.unique`` per batch — stream to the driver, which folds them
    into a value→count map and reads the threshold off the cumulative
    counts with ``quantile_disc`` semantics (sorted[ceil(q*n) - 1]).
    Driver state is O(distinct values observed), independent of the
    value RANGE (the round-2 dense ``np.bincount`` partial allocated
    max(value)+1 slots, so one ~1e8-char outlier document made every
    partial hundreds of MB). This is phase 1 of the corpus-relative
    percentile FILTER (FineWeb-style "keep the top X% by metric"): one
    cheap pruned pass for the threshold, then a broadcast-compare
    filter — no all-to-all anywhere."""
    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[col].to_pylist(), dtype=np.int64)
        if len(v):
            vals, cnts = np.unique(v, return_counts=True)
        else:
            vals = cnts = np.zeros(0, np.int64)
        return pa.table({"val": pa.array(vals, pa.int64()),
                         "cnt": pa.array(cnts.astype(np.int64))})

    counts: dict[int, int] = {}
    for b in (ds.select_columns([col])
                .map_batches(partial, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow")):
        for v, c in zip(b["val"].to_pylist(), b["cnt"].to_pylist()):
            counts[v] = counts.get(v, 0) + c
    n = sum(counts.values())
    if n == 0:
        return 0
    import math
    # ceil(q*n) in the same double arithmetic quantile_disc uses — a
    # per-mille integerization would diverge for q like 1/3 where
    # round(q*1000)/1000 != q
    target = max(math.ceil(q * n), 1)
    vals = sorted(counts)
    cum = np.cumsum([counts[v] for v in vals])
    return int(vals[int(np.searchsorted(cum, target, side="left"))])
