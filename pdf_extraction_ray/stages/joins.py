"""Keyed as-of join — the temporal point-lookup Ray Data has no
primitive for (SURVEY.md custom-operator rule: compose map_batches +
one keyed shuffle when semantics allow).

For every left row, attach the id of the newest right row with the same
key and ``right.ts <= left.ts`` (ties on ts resolve to the largest right
id — an explicit total order, never insertion order). The exchange is
the engine's partition-wise cogroup shape: both sides tag ``p = key %
P``, one ``groupby(p)`` shuffle co-locates each partition, and the
per-partition body is a single vectorized ``pandas.merge_asof`` — no
per-key Python calls, no ``Dataset.join`` (see stages/dedup.py
``_lookup_cogroup`` for why).

Partitioning assumption (documented per north rule): one key's rows fit
one partition task; a single pathological key is the skew bound (salt by
time range for such keys at real scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .dedup import _pmod


def asof_join(left: rd.Dataset, right: rd.Dataset,
              key_col: str, ts_col: str,
              left_id_col: str, right_id_col: str,
              out_left: str = "left_id", out_right: str = "asof_id",
              num_partitions: int = 32, fill: int = -1) -> rd.Dataset:
    """Left as-of join: (out_left, out_right) — ``fill`` when no right
    row precedes the left row."""
    P = num_partitions

    def tag(side: int, id_col: str):
        def fn(t: pa.Table) -> pa.Table:
            key = t[key_col].cast(pa.int64()).combine_chunks()
            return pa.table({
                "p": _pmod(key, P),
                "side": pa.array(np.full(len(t), side, np.int8)),
                "key": key,
                "ts": t[ts_col],
                "id": t[id_col].cast(pa.int64()),
            })
        return fn

    both = (left.map_batches(tag(0, left_id_col), batch_format="pyarrow")
                .union(right.map_batches(tag(1, right_id_col),
                                         batch_format="pyarrow")))

    def grp(g: pd.DataFrame) -> pa.Table:
        lf = g[g["side"] == 0]
        rt = g[g["side"] == 1]
        if lf.empty:
            return pa.table({out_left: pa.array([], pa.int64()),
                             out_right: pa.array([], pa.int64())})
        # stable sorts pin the tie order: among right rows sharing
        # (key, ts), merge_asof keeps the last in sort order = max id
        lf = lf.sort_values(["ts", "id"], kind="mergesort")
        if rt.empty:
            return pa.table({
                out_left: pa.array(lf["id"].to_numpy(np.int64)),
                out_right: pa.array(np.full(len(lf), fill, np.int64)),
            })
        rt = rt.sort_values(["ts", "id"], kind="mergesort")
        m = pd.merge_asof(lf[["ts", "key", "id"]],
                          rt[["ts", "key", "id"]],
                          on="ts", by="key", direction="backward",
                          suffixes=("", "_r"))
        prior = m["id_r"].fillna(fill).astype(np.int64)
        return pa.table({
            out_left: pa.array(m["id"].to_numpy(np.int64)),
            out_right: pa.array(prior.to_numpy()),
        })

    return both.groupby("p").map_groups(grp, batch_format="pandas")


def band_self_join(ds: rd.Dataset, key_col: str, ts_col: str,
                   id_col: str, window_s: int) -> rd.Dataset:
    """Range (band) self-join: ordered pairs (a, b) of same-key rows with
    ``0 < ts_b - ts_a <= window_s``. One keyed shuffle; the per-group
    body is sorted searchsorted + vectorized repeat, never a nested
    loop. Output gap is exact integer microseconds.

    Skew bound (documented): output volume is quadratic in a key's rows
    per window — bound the window, or pre-bucket time for hot keys.
    """
    window_us = window_s * 1_000_000

    def pairs(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values([ts_col, id_col],
                              kind="mergesort").reset_index(drop=True)
        ts = (g[ts_col].to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        ids = g[id_col].to_numpy(np.int64)
        lo = np.searchsorted(ts, ts, side="right")        # strictly after a
        hi = np.searchsorted(ts, ts + window_us, side="right")
        counts = hi - lo
        a_idx = np.repeat(np.arange(len(g)), counts)
        if len(a_idx):
            starts = np.repeat(lo, counts)
            offs = np.arange(len(a_idx)) - np.repeat(
                np.cumsum(counts) - counts, counts)
            b_idx = starts + offs
        else:
            b_idx = a_idx
        return pa.table({
            key_col: pa.array(np.repeat(g[key_col].to_numpy(np.int64),
                                        counts)),
            "a_id": pa.array(ids[a_idx]),
            "b_id": pa.array(ids[b_idx]),
            "gap_us": pa.array(ts[b_idx] - ts[a_idx]),
        })

    return (ds.select_columns([key_col, ts_col, id_col])
              .groupby(key_col).map_groups(pairs, batch_format="pandas"))


def band_self_join_salted(ds: rd.Dataset, key_col: str, ts_col: str,
                          id_col: str, window_s: int) -> rd.Dataset:
    """Skew-safe band self-join, value-identical to
    :func:`band_self_join` (shares its oracle): the group key becomes
    (key, ts // window) so a hot key's rows split across time chunks —
    the hottest task shrinks from O(rows of hottest key) to O(rows of
    its hottest window). A qualifying pair spans at most the NEXT chunk
    (gap <= window), so every row is also replicated into chunk+1
    (boundary duplication, the recursive band-partitioning idea of
    Li et al., SIGMOD 2020 band-joins, one level deep) and a pair is
    EMITTED only in the chunk the left event calls home — exactly-once
    by construction, the ``sessionize_salted`` trick applied to joins.
    Replication factor is exactly 2 regardless of skew.
    """
    window_us = window_s * 1_000_000

    def explode(batch: pa.Table) -> pa.Table:
        ts = (batch[ts_col].cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False).astype("datetime64[us]").astype(np.int64))
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        chunk = ts // window_us
        # the dup copy goes to chunk-1: a left event's qualifying
        # partners live in ITS chunk or the next one, so the home group
        # must contain the NEXT chunk's events as non-home rows
        return pa.table({
            key_col: pa.array(np.concatenate([keys, keys])),
            "_chunk": pa.array(np.concatenate([chunk, chunk - 1])),
            "_home": pa.array(np.concatenate(
                [np.ones(len(ts), bool), np.zeros(len(ts), bool)])),
            "_ts_us": pa.array(np.concatenate([ts, ts])),
            id_col: pa.array(np.concatenate([ids, ids])),
        })

    def pairs(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["_ts_us", id_col],
                              kind="mergesort").reset_index(drop=True)
        ts = g["_ts_us"].to_numpy(np.int64)
        ids = g[id_col].to_numpy(np.int64)
        home = g["_home"].to_numpy(bool)
        lo = np.searchsorted(ts, ts, side="right")
        hi = np.searchsorted(ts, ts + window_us, side="right")
        counts = np.where(home, hi - lo, 0)  # left events: home only
        a_idx = np.repeat(np.arange(len(g)), counts)
        if len(a_idx):
            starts = np.repeat(lo, counts)
            offs = np.arange(len(a_idx)) - np.repeat(
                np.cumsum(counts) - counts, counts)
            b_idx = starts + offs
        else:
            b_idx = a_idx
        return pa.table({
            key_col: pa.array(np.repeat(g[key_col].to_numpy(np.int64),
                                        counts)),
            "a_id": pa.array(ids[a_idx]),
            "b_id": pa.array(ids[b_idx]),
            "gap_us": pa.array(ts[b_idx] - ts[a_idx]),
        })

    return (ds.select_columns([key_col, ts_col, id_col])
              .map_batches(explode, batch_format="pyarrow")
              .groupby([key_col, "_chunk"])
              .map_groups(pairs, batch_format="pandas"))


def hash_join(left: rd.Dataset, right: rd.Dataset,
              left_on: str, right_on: str,
              left_cols: list[str], right_cols: list[str],
              how: str = "inner",
              num_partitions: int = 32) -> rd.Dataset:
    """Shuffle hash join as a partition-wise cogroup — the robust
    ``Dataset.join`` replacement (Ray's hash aggregator mishandles
    schema-less empty partitions on small inputs; see stages/dedup.py).

    Both sides tag ``p = key % P``; ONE groupby(p) shuffle co-locates
    each partition; the body is a single vectorized pandas merge. Use
    when BOTH sides are large — for a small dimension side, broadcast
    it instead (pipelines/relational.py:customers_per_region).

    NOTE: this function probes ``schema()`` on BOTH sides to type the
    null padding, and Ray executes an un-materialized lineage to answer
    it — a side with an expensive DAG behind it (shuffles, iterative
    ops) runs TWICE unless the caller pins it first (see
    analytics.cluster_keep_best). Plain read->map lineages only repay
    the read, which is cheap.

    ``left_cols`` / ``right_cols`` name the carried payload columns
    (must be disjoint); the join key comes back as ``left_on``.
    ``how``: 'inner' | 'left' | 'right' | 'full_outer' (outer modes
    emit nulls on the unmatched side) | 'semi' | 'anti' (existence
    filters on the left side — ``right_cols`` must be empty). For
    semi/anti the right side is reduced to per-block DISTINCT keys
    before the shuffle; the union still requires one schema, so each
    right key row also carries typed-null placeholders for the left
    payload columns (~8 B per numeric / ~4 B per varwidth column per
    distinct right key — bounded, but not free for very wide lefts).
    """
    if set(left_cols) & set(right_cols):
        raise ValueError("left_cols and right_cols must be disjoint")
    if how not in ("inner", "left", "right", "full_outer", "semi", "anti"):
        raise ValueError(how)
    if how in ("semi", "anti") and right_cols:
        raise ValueError(f"{how} join carries no right columns")
    P = num_partitions
    rs, ls = right.schema(), left.schema()
    right_types = dict(zip(rs.names, rs.types))
    left_types = dict(zip(ls.names, ls.types))

    out_types = {**{n: left_types[n] for n in left_cols},
                 **{n: right_types[n] for n in right_cols}}

    def tag(side: int, key_col: str, carry: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            key = t[key_col].cast(pa.int64()).combine_chunks()
            cols = {
                "p": _pmod(key, P),
                "side": pa.array(np.full(len(t), side, np.int8)),
                "key": key,
            }
            # IDENTICAL column order on both sides: Ray's shuffle
            # reconciles differing block schemas lossily (observed: an
            # order mismatch promoted null-padded int64 to float64)
            for name in left_cols + right_cols:
                cols[name] = (t[name] if name in carry
                              else pa.nulls(len(t), out_types[name]))
            return pa.table(cols)
        return fn

    lt = left.map_batches(tag(0, left_on, left_cols),
                          batch_format="pyarrow")
    if how in ("semi", "anti"):
        # only key EXISTENCE matters: shed duplicate right keys per
        # block before they ride the all-to-all
        right = right.map_batches(
            lambda t: t.select([right_on]).group_by(right_on).aggregate([]),
            batch_format="pyarrow")
    rt = right.map_batches(tag(1, right_on, right_cols),
                           batch_format="pyarrow")

    def grp(g: pa.Table) -> pa.Table:
        # arrow in, arrow-backed pandas through the merge: each side's
        # own columns are null-free within the side, and ArrowDtype
        # keeps int64 payloads exact (a plain to_pandas would promote
        # null-padded int columns to float64, corrupting ids > 2^53)
        side = g["side"]
        lf = (g.filter(pc.equal(side, 0)).select(["key"] + left_cols)
               .to_pandas(types_mapper=pd.ArrowDtype))
        rg = (g.filter(pc.equal(side, 1)).select(["key"] + right_cols)
               .to_pandas(types_mapper=pd.ArrowDtype))
        if how == "semi":
            m = lf[lf["key"].isin(rg["key"].unique())]
        elif how == "anti":
            m = lf[~lf["key"].isin(rg["key"].unique())]
        else:
            m = lf.merge(rg, on="key",
                         how="outer" if how == "full_outer" else how)
        cols = {left_on: pa.Array.from_pandas(m["key"],
                                              type=pa.int64())}
        for name in left_cols + right_cols:
            cols[name] = pa.Array.from_pandas(m[name],
                                              type=out_types[name])
        return pa.table(cols)

    return lt.union(rt).groupby("p").map_groups(grp, batch_format="pyarrow")
