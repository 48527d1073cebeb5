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


def broadcast_range_join(left: rd.Dataset, intervals: pa.Table,
                         key_col: str, value_col: str,
                         left_cols: list[str], interval_cols: list[str],
                         int_key_col: str = "key",
                         lo_col: str = "lo", hi_col: str = "hi",
                         ) -> rd.Dataset:
    """Broadcast range (interval) join — the third custom join family
    next to ``asof_join`` (temporal point lookup) and ``hash_join``
    (equality): every left row matches the interval row of the same key
    whose half-open range ``[lo, hi)`` contains ``left[value_col]``
    (``hi == -1`` = unbounded, the repo's sentinel convention). Inner
    semantics: left rows covered by no interval drop.

    Shape (the broadcast-dimension rule, SURVEY custom-operator path b):
    the interval table is a DIMENSION — rate cards, value tiers, SLA
    bands — small by nature, so it is validated and indexed ONCE on the
    driver, shipped ONCE via ``ray.put``, and each map task probes it
    with a vectorized ``np.searchsorted`` over the key's sorted lo
    boundaries: O(rows·log intervals) per batch, zero Python per row,
    and the fact table NEVER shuffles. (An interval side too big to
    broadcast needs the partition-wise cogroup shape instead — split by
    key hash like ``hash_join`` and searchsorted per partition.)

    Contract: per key the intervals must be non-overlapping (validated
    driver-side, ValueError otherwise) — that is what makes the sorted
    binary search exact. Overlapping tiers are the union of
    non-overlapping layers; join each layer and union.

    ``value_col`` and the bounds must be integers (exactness: the
    containment compares are int64, never float — the repo's oracle
    discipline).
    """
    import ray as _ray

    names = set(intervals.column_names)
    for c in (int_key_col, lo_col, hi_col, *interval_cols):
        if c not in names:
            raise ValueError(f"intervals table lacks column {c!r}")
    # driver-side index build: key -> (sorted los, his, payload arrays)
    tbl = intervals.sort_by([(int_key_col, "ascending"),
                             (lo_col, "ascending")])
    keys = tbl[int_key_col].to_pylist()
    los = tbl[lo_col].to_numpy(zero_copy_only=False).astype(np.int64)
    his = tbl[hi_col].to_numpy(zero_copy_only=False).astype(np.int64)
    payload = {c: np.asarray(tbl[c].to_pylist(), dtype=object)
               for c in interval_cols}
    index: dict = {}
    start = 0
    for i in range(1, len(keys) + 1):
        if i == len(keys) or keys[i] != keys[start]:
            klos, khis = los[start:i], his[start:i]
            for j in range(len(klos) - 1):
                if khis[j] == -1 or khis[j] > klos[j + 1]:
                    raise ValueError(
                        f"overlapping intervals for key {keys[start]!r}")
            for j in range(len(klos)):
                if khis[j] != -1 and khis[j] <= klos[j]:
                    raise ValueError(
                        f"empty interval for key {keys[start]!r}")
            index[keys[start]] = (
                klos, khis,
                {c: payload[c][start:i] for c in interval_cols})
            start = i
    ref = _ray.put(index)
    int_types = dict(zip(tbl.column_names, tbl.schema.types))

    def probe(t: pa.Table) -> pa.Table:
        idx = _ray.get(ref)
        vals = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        codes, uniq = pd.factorize(
            np.asarray(t[key_col].to_pylist(), dtype=object))
        take_left: list[np.ndarray] = []
        take_int: list[np.ndarray] = []
        uid_of: list = []
        for u, key in enumerate(uniq):
            ent = idx.get(key)
            if ent is None:
                continue
            klos, khis, _pay = ent
            rows = np.nonzero(codes == u)[0]
            v = vals[rows]
            pos = np.searchsorted(klos, v, side="right") - 1
            ok = pos >= 0
            p = np.where(ok, pos, 0)
            hi = khis[p]
            ok &= (hi == -1) | (v < hi)
            take_left.append(rows[ok])
            take_int.append(p[ok])
            uid_of.append(key)
        if take_left:
            li = np.concatenate(take_left)
            order = np.argsort(li, kind="stable")
            li = li[order]
            ii = np.concatenate(take_int)[order]
            # rebuild per-row key lookup for payload gather
            key_rows = np.concatenate(
                [np.full(len(a), k, dtype=np.int64)
                 for k, a in enumerate(take_left)])[order]
        else:
            li = np.array([], np.int64)
            ii = np.array([], np.int64)
            key_rows = np.array([], np.int64)
        out = t.select(left_cols).take(pa.array(li, pa.int64()))
        cols = {c: out[c] for c in left_cols}
        for c in interval_cols:
            vals_c = np.empty(len(li), dtype=object)
            for k, key in enumerate(uid_of):
                m = key_rows == k
                if m.any():
                    vals_c[m] = idx[key][2][c][ii[m]]
            cols[c] = pa.array(vals_c.tolist(), int_types[c])
        return pa.table(cols)

    return left.map_batches(probe, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# skew-aware hybrid join (session 7)
# ---------------------------------------------------------------------------


def skew_join(left: rd.Dataset, right: rd.Dataset,
              left_on: str, right_on: str,
              left_cols: list[str], right_cols: list[str],
              hot_threshold: int = 100_000,
              max_hot: int = 100_000,
              num_partitions: int = 32,
              stats_out: dict | None = None) -> rd.Dataset:
    """Skew-aware hybrid INNER join — the adaptive plan real engines
    pick when one join key owns a disproportionate share of the fact
    side (a web hub, a null-ish default id, a celebrity user): a
    plain hash partition would route every hot-key row to ONE
    partition and serialize the join behind a single task.

    Plan: one combiner pass histograms the LEFT keys (per-block
    partial counts → one tiny groupby over distinct keys); keys with
    ≥ ``hot_threshold`` rows become HOT. Hot right-side rows collect
    to the driver (bounded: hot keys are few BY DEFINITION — a key
    row-bound, not a data-size bound; > ``max_hot`` raises rather
    than silently materializing a non-skewed right) and broadcast via
    ``ray.put``; hot left rows join map-side with zero shuffle. Cold
    rows on both sides flow through the ordinary partition-wise
    ``hash_join``. The union is value-identical to ``hash_join`` —
    the hot path changes the PLAN, never the answer (regression-
    pinned in tests).

    Output schema matches ``hash_join``: [left_on] + left_cols +
    right_cols. ``stats_out`` (tests/observability) receives
    ``n_hot_keys`` / ``n_hot_right_rows``."""
    import ray
    from ray.data.aggregate import Sum

    if set(left_cols) & set(right_cols):
        raise ValueError("left_cols and right_cols must be disjoint")

    def key_partial(t: pa.Table) -> pa.Table:
        k = t[left_on].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(k, return_inverse=True)
        return pa.table({"_k": pa.array(uniq, pa.int64()),
                         "_n": pa.array(np.bincount(inv).astype(np.int64),
                                        pa.int64())})

    counts = (left.map_batches(key_partial, batch_format="pyarrow")
              .groupby("_k").aggregate(Sum("_n", alias_name="n")))

    thr = pa.scalar(hot_threshold, pa.int64())
    hot_tbl = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(
            t["n"].combine_chunks().cast(pa.int64()), thr)),
        batch_format="pyarrow").to_pandas()
    hot = set(hot_tbl["_k"].astype(int)) if len(hot_tbl) else set()
    if len(hot) > max_hot:
        raise ValueError(
            f"{len(hot)} hot keys exceed max_hot={max_hot}: "
            f"hot_threshold={hot_threshold} does not separate skew "
            "on this input")
    if stats_out is not None:
        stats_out["n_hot_keys"] = len(hot)

    if not hot:
        if stats_out is not None:
            stats_out["n_hot_right_rows"] = 0
        return hash_join(left, right, left_on, right_on,
                         left_cols, right_cols, how="inner",
                         num_partitions=num_partitions)

    href = ray.put(hot)

    def right_hot(t: pa.Table) -> pa.Table:
        hs = ray.get(href)
        k = t[right_on].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = np.fromiter((int(x) in hs for x in k), bool, len(k))
        return t.filter(pa.array(mask)).select([right_on] + right_cols)

    hot_rows = right.map_batches(right_hot,
                                 batch_format="pyarrow").take_all()
    lookup: dict[int, list[tuple]] = {}
    for r in hot_rows:
        lookup.setdefault(int(r[right_on]), []).append(
            tuple(r[c] for c in right_cols))
    if stats_out is not None:
        stats_out["n_hot_right_rows"] = len(hot_rows)
    lref = ray.put(lookup)

    rs = right.schema()
    right_types = dict(zip(rs.names, rs.types))
    ls = left.schema()
    left_types = dict(zip(ls.names, ls.types))

    def left_hot_join(t: pa.Table) -> pa.Table:
        hs = ray.get(href)
        lk = ray.get(lref)
        k = t[left_on].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = np.fromiter((int(x) in hs for x in k), bool, len(k))
        kept = t.filter(pa.array(mask))
        kk = kept[left_on].to_numpy(zero_copy_only=False).astype(np.int64)
        out: dict[str, list] = {left_on: []}
        for c in left_cols + right_cols:
            out[c] = []
        lvals = {c: kept[c].to_pylist() for c in left_cols}
        for i, key in enumerate(kk):
            for payload in lk.get(int(key), ()):
                out[left_on].append(int(key))
                for c in left_cols:
                    out[c].append(lvals[c][i])
                for c, v in zip(right_cols, payload):
                    out[c].append(v)
        cols = {left_on: pa.array(out[left_on], left_types[left_on])}
        for c in left_cols:
            cols[c] = pa.array(out[c], left_types[c])
        for c in right_cols:
            cols[c] = pa.array(out[c], right_types[c])
        return pa.table(cols)

    def left_cold(t: pa.Table) -> pa.Table:
        hs = ray.get(href)
        k = t[left_on].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = np.fromiter((int(x) not in hs for x in k), bool, len(k))
        return t.filter(pa.array(mask))

    def right_cold(t: pa.Table) -> pa.Table:
        hs = ray.get(href)
        k = t[right_on].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = np.fromiter((int(x) not in hs for x in k), bool, len(k))
        return t.filter(pa.array(mask))

    hot_joined = left.map_batches(left_hot_join, batch_format="pyarrow")
    cold_joined = hash_join(
        left.map_batches(left_cold, batch_format="pyarrow"),
        right.map_batches(right_cold, batch_format="pyarrow"),
        left_on, right_on, left_cols, right_cols, how="inner",
        num_partitions=num_partitions)
    return hot_joined.union(cold_joined)


def write_bucketed(ds: rd.Dataset, key: str, out_dir: str,
                   num_buckets: int = 32) -> str:
    """Write a dataset as key-hash-bucketed parquet (``bucket=K/``
    directories, bucket = key % num_buckets) — the storage layout that
    makes `bucketed_join` shuffle-free. One pass: tag + ONE
    groupby(bucket) so each bucket lands as one file set; the write is
    the exchange (there is no later one). ``out_dir`` is cleared
    first: a bucket the new dataset doesn't populate must not survive
    from a previous write (a stale bucket silently joins)."""
    import os
    import shutil

    import pyarrow.parquet as pq

    shutil.rmtree(out_dir, ignore_errors=True)

    def tag(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(
            t[key].combine_chunks().cast(pa.int64()),
            num_buckets - 1), pa.int64())
        return t.append_column("__b", b)

    if num_buckets & (num_buckets - 1):
        raise ValueError("num_buckets must be a power of two")

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["__b"].iloc[0])
        d = os.path.join(out_dir, f"bucket={b}")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, ".part.tmp")
        pq.write_table(pa.Table.from_pandas(g.drop(columns="__b"),
                                            preserve_index=False), tmp)
        os.replace(tmp, os.path.join(d, "part-0.parquet"))
        return pd.DataFrame({"bucket": [b], "rows": [len(g)]})

    (ds.map_batches(tag, batch_format="pyarrow")
     .groupby("__b").map_groups(write_bucket, batch_format="pandas")
     .materialize())
    return out_dir


def bucketed_join(left_dir: str, right_dir: str,
                  left_on: str, right_on: str,
                  left_cols: list[str], right_cols: list[str],
                  num_buckets: int = 32) -> rd.Dataset:
    """Storage-partitioned (bucket-local) inner join — the zero-shuffle
    join for tables ALREADY bucketed by the join key (`write_bucketed`):
    bucket K of the left can only match bucket K of the right, so the
    join plan is one task per bucket reading two local directories and
    merging in memory — NO all-to-all, the 100-TB join you get for
    free when both tables share a bucketing key (the lakehouse
    storage-partitioned-join optimization; this repo's checkpointed
    extraction output is exactly such a layout over url buckets).

    Returns (left_on, *left_cols, *right_cols)."""
    import glob
    import os

    import pyarrow.parquet as pq

    # type the empty-bucket output from real footers so every task
    # emits the same schema (a 0-column block breaks consumers)
    def _schema_of(d: str, names: list[str]) -> dict:
        for p in sorted(glob.glob(os.path.join(d, "bucket=*"))):
            s = pq.read_schema(os.path.join(p, "part-0.parquet"))
            return {n: s.field(n).type for n in names}
        raise FileNotFoundError(f"no buckets under {d}")

    types = _schema_of(left_dir, [left_on] + left_cols)
    types.update({n: t for n, t in
                  _schema_of(right_dir, [right_on] + right_cols).items()
                  if n != right_on})
    out_names = [left_on] + left_cols + right_cols
    empty = pa.table({n: pa.array([], types[n]) for n in out_names})

    def join_bucket(t: pa.Table) -> pa.Table:
        out = []
        for b in t["bucket"].to_pylist():
            ld = os.path.join(left_dir, f"bucket={b}")
            rdir = os.path.join(right_dir, f"bucket={b}")
            if not (os.path.isdir(ld) and os.path.isdir(rdir)):
                continue
            lt = pq.read_table(ld, columns=[left_on] + left_cols)
            rt = pq.read_table(rdir, columns=[right_on] + right_cols)
            m = lt.to_pandas().merge(
                rt.to_pandas(), left_on=left_on, right_on=right_on,
                how="inner")
            if right_on != left_on and right_on in m.columns:
                m = m.drop(columns=[right_on])
            out.append(pa.Table.from_pandas(m[out_names],
                                            preserve_index=False)
                       .cast(empty.schema))
        if not out:
            return empty
        return pa.concat_tables(out)

    ids = rd.from_arrow(pa.table({
        "bucket": pa.array(list(range(num_buckets)), pa.int64())}))
    # one bucket per task: override Ray's input-row bundling
    return ids.repartition(num_buckets).map_batches(
        join_bucket, batch_format="pyarrow", batch_size=None)
