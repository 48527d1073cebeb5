"""Distributed ordered prefix-scan (global rank / running sum).

Ray Data has no ordered-scan operator; this stage expresses the classic
two-phase parallel scan the Dataset way:

1. a vectorized map derives an integer partition key that is MONOTONE in
   the requested order (key-range partitioning — e.g. dense ``doc_id //
   chunk``, or the high bits of a uniform hash),
2. one small ``groupby(partition)`` aggregate computes per-partition row
   counts and value totals (P rows — driver-side prefix over partitions
   is O(P), independent of data size),
3. partition offsets broadcast via ``ray.put`` and one
   ``groupby(partition).map_groups`` sorts each partition internally and
   emits local ``arange``/``cumsum`` plus the partition's global offset.

Scale shape: two keyed shuffles of (partition) — the second carries the
payload once; driver state is O(partitions), never O(rows). The
partition key must be monotone in the sort order across partitions
(within-partition order is re-established locally), which is the
documented assumption: dense ids or a uniform hash both satisfy it.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum


def prefix_scan(ds: rd.Dataset,
                part_fn: Callable[[pa.Table], np.ndarray],
                sort_cols: list[str],
                value_col: str | None = None,
                rank_col: str = "rank",
                cum_col: str = "cum") -> rd.Dataset:
    """Add a 0-based global ``rank_col`` (position in the total order)
    and, when ``value_col`` is given, an inclusive running sum
    ``cum_col`` of that column.

    ``part_fn`` maps a batch to an int64 partition id per row; partition
    ids must be monotone in the total order defined by ``sort_cols``
    (rows of partition p all precede rows of partition p+1).
    """

    def tag(batch: pa.Table) -> pa.Table:
        p = np.asarray(part_fn(batch), np.int64)
        return batch.append_column("_scan_p", pa.array(p, pa.int64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    # phase 1: per-partition totals (small — P rows reach the driver)
    def totals(batch: pa.Table) -> pa.Table:
        p = np.asarray(batch["_scan_p"])
        vals = (np.asarray(batch[value_col], np.int64)
                if value_col else np.zeros(len(p), np.int64))
        uniq, inv = np.unique(p, return_inverse=True)
        return pa.table({
            "_scan_p": pa.array(uniq, pa.int64()),
            "_n": pa.array(np.bincount(inv), pa.int64()),
            "_s": pa.array(np.bincount(inv, weights=vals).astype(np.int64),
                           pa.int64()),
        })

    agg = (tagged.map_batches(totals, batch_format="pyarrow")
           .groupby("_scan_p")
           .aggregate(Sum("_n", alias_name="n"), Sum("_s", alias_name="s")))

    parts = agg.to_pandas().sort_values("_scan_p")
    rank_off = np.concatenate([[0], parts["n"].to_numpy()[:-1].cumsum()])
    cum_off = np.concatenate([[0], parts["s"].to_numpy()[:-1].cumsum()])
    offsets = {int(p): (int(r), int(c)) for p, r, c in
               zip(parts["_scan_p"], rank_off, cum_off)}
    off_ref = ray.put(offsets)

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:  # empty-block guard: emit the full schema
            out = group.append_column(rank_col, pa.array([], pa.int64()))
            if value_col is not None:
                out = out.append_column(cum_col, pa.array([], pa.int64()))
            return out.drop_columns(["_scan_p"])
        off = ray.get(off_ref)
        pid = int(group["_scan_p"][0].as_py())
        r0, c0 = off[pid]
        idx = pc.sort_indices(
            group, sort_keys=[(c, "ascending") for c in sort_cols])
        g = group.take(idx)
        out = g.append_column(rank_col, pa.array(
            r0 + np.arange(g.num_rows, dtype=np.int64), pa.int64()))
        if value_col is not None:
            run = c0 + np.asarray(g[value_col], np.int64).cumsum()
            out = out.append_column(cum_col, pa.array(run, pa.int64()))
        return out.drop_columns(["_scan_p"])

    return tagged.groupby("_scan_p").map_groups(
        scan_partition, batch_format="pyarrow")


def keyed_scan(ds: rd.Dataset, key_col: str, sort_cols: list[str],
               value_col: str, rank_col: str = "row_num",
               cum_col: str = "run_sum",
               num_partitions: int = 32) -> rd.Dataset:
    """Per-key ordered running aggregates — the ``ROW_NUMBER() /
    SUM(x) OVER (PARTITION BY key ORDER BY ...)`` window-function
    shape, without a global sort.

    Unlike :func:`prefix_scan` (ONE total order spanning partitions),
    each key's scan restarts at zero, so no cross-partition offset
    exchange is needed: tag ``p = key % P``, ONE ``groupby(p)`` shuffle
    co-locates every key's rows, and the per-partition body is a single
    vectorized pandas ``sort_values`` + ``groupby(key).cumsum`` /
    ``cumcount`` — NOT a per-key ``map_groups`` (which costs ~1 ms of
    interpreter per group; see ROUND2_NOTES.md). Driver state is zero.

    ``value_col`` must be int64 (integer running sums are
    association-order-free, which keeps the result bit-identical to the
    SQL window oracle; pre-integerize floats upstream). Skew bound: one
    partition holds ~1/P of the keys — a single pathological key is the
    limit, same as any keyed window (salt upstream if one key dominates).
    """
    def body(g: pd.DataFrame) -> None:
        grp = g.groupby(key_col, sort=False)
        g[rank_col] = grp.cumcount().to_numpy(np.int64) + 1
        g[cum_col] = grp[value_col].cumsum().to_numpy(np.int64)

    return _keyed_window(ds, key_col, sort_cols, [rank_col, cum_col],
                         body, num_partitions)


def keyed_shift(ds: rd.Dataset, key_col: str, sort_cols: list[str],
                value_col: str, shifts: dict[str, int],
                fill: int = -1,
                num_partitions: int = 32) -> rd.Dataset:
    """Per-key ordered LAG/LEAD — the shifted-window sibling of
    :func:`keyed_scan` (``LAG(x) OVER (PARTITION BY key ORDER BY …)``):
    same ONE key-hash shuffle, then a vectorized per-partition sort +
    ``groupby(key).shift`` per requested offset — never per-key Python.

    ``shifts`` maps output column -> periods (positive = LAG, negative
    = LEAD). Rows with no neighbor take the integer ``fill`` sentinel
    (the asof_prior_error convention — hash-safe vs COALESCE in the
    SQL oracle; pick a value outside the column's domain).
    ``value_col`` must be int64."""
    def body(g: pd.DataFrame) -> None:
        grp = g.groupby(key_col, sort=False)[value_col]
        for col, periods in shifts.items():
            # fill_value keeps the dtype int64 END-TO-END: a plain
            # shift() injects NaN (float64), and values >= 2^53 would
            # round-trip through float corruptly
            g[col] = grp.shift(periods, fill_value=fill).to_numpy(np.int64)

    return _keyed_window(ds, key_col, sort_cols, list(shifts), body,
                         num_partitions)


def _keyed_window(ds: rd.Dataset, key_col: str, sort_cols: list[str],
                  out_int_cols: list[str], body,
                  num_partitions: int) -> rd.Dataset:
    """The shared keyed-window shuffle shape (keyed_scan / keyed_shift):
    tag ``_kp = key % P``, ONE ``groupby(_kp)`` shuffle co-locating
    every key's rows, per-partition vectorized mergesort by
    ``(key, *sort_cols)``, then ``body(g)`` appends the window columns
    in place (all int64, named ``out_int_cols`` — the list also shapes
    the empty-partition schema)."""
    P = num_partitions

    def tag(t: pa.Table) -> pa.Table:
        key = np.asarray(t[key_col].cast(pa.int64()))
        return t.append_column("_kp", pa.array(key % P, pa.int64()))

    out_schema = ds.schema()

    def run(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            empty = {f.name: pa.array([], f.type)
                     for f in out_schema.base_schema}
            for col in out_int_cols:
                empty[col] = pa.array([], pa.int64())
            return pa.table(empty)
        g = g.sort_values([key_col] + sort_cols, kind="mergesort")
        body(g)
        return pa.Table.from_pandas(g.drop(columns=["_kp"]),
                                    preserve_index=False)

    return (ds.map_batches(tag, batch_format="pyarrow")
              .groupby("_kp")
              .map_groups(run, batch_format="pandas"))
