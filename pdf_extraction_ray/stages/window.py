"""Windowed / sessionized aggregates over the events stream table.

Ray Data has no event-time windowing; the engine expresses windows the
batch way (ray_guide streaming section): tumbling windows are a plain
keyed groupby on a derived bucket column (vectorized Arrow arithmetic);
session windows sort each key's rows by timestamp inside
``groupby(key).map_groups`` and split on inactivity gaps.

Partitioning assumption (documented per north rule): ``sessionize`` puts
one user's events in one group, so a single pathological user is its skew
bound; ``sessionize_salted`` IS the salt-by-time-chunk form for such keys
(per-chunk session stubs, then a per-key merge over stubs only) and is
value-identical — use it when any key's event volume outgrows a task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def tumbling_window(ds: rd.Dataset, width_s: int,
                    ts_col: str = "ts", key_col: str = "event_type",
                    value_col: str = "value") -> rd.Dataset:
    """Tumbling count/sum per (key, window). Window start is the epoch-
    aligned bucket ``floor(epoch_us / width)``, returned as a timestamp."""
    from ray.data.aggregate import Count, Sum

    width_us = width_s * 1_000_000

    def bucket(batch: pa.Table) -> pa.Table:
        # numpy FLOOR division: Arrow's integer divide truncates toward
        # zero, putting pre-epoch timestamps in the wrong window (the
        # SQL oracle and sliding_window both floor)
        us = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        start = (us // width_us) * width_us
        return batch.append_column(
            "window_start",
            pa.array(start, pa.int64()).cast(pa.timestamp("us")))

    return (ds.map_batches(bucket, batch_format="pyarrow")
              .groupby([key_col, "window_start"])
              .aggregate(Count(alias_name="n_events"),
                         Sum(value_col, alias_name="sum_value")))


def sliding_window(ds: rd.Dataset, width_s: int, step_s: int,
                   ts_col: str = "ts", key_col: str = "event_type",
                   value_col: str = "value") -> rd.Dataset:
    """Sliding (hopping) count/sum per (key, window): windows of
    ``width_s`` starting every ``step_s`` (width must be a multiple of
    step). Each event belongs to exactly width/step windows; the explode
    is vectorized numpy repeat/tile — row count amplifies by width/step
    BEFORE the shuffle, which is the documented cost of hop windows (use
    tumbling + rollup when the ratio is large).
    """
    from ray.data.aggregate import Count, Sum

    if width_s % step_s:
        raise ValueError("width_s must be a multiple of step_s")
    nk = width_s // step_s
    step_us = step_s * 1_000_000

    def explode(batch: pa.Table) -> pa.Table:
        key_type = batch.schema.field(key_col).type
        val_type = batch.schema.field(value_col).type
        us = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = (us // step_us) * step_us
        starts = (np.repeat(base, nk)
                  - np.tile(np.arange(nk, dtype=np.int64) * step_us,
                            len(us)))
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        # explicit types: an empty block would otherwise infer arrow
        # `null` columns and break schema unification downstream
        return pa.table({
            key_col: pa.array(np.repeat(keys, nk), type=key_type),
            "window_start": pa.array(starts, pa.int64())
                              .cast(pa.timestamp("us")),
            value_col: pa.array(np.repeat(vals, nk), type=val_type),
        })

    return (ds.map_batches(explode, batch_format="pyarrow")
              .groupby([key_col, "window_start"])
              .aggregate(Count(alias_name="n_events"),
                         Sum(value_col, alias_name="sum_value")))


def rolling_time_window(ds: rd.Dataset, width_s: int,
                        key_col: str = "user_id", ts_col: str = "ts",
                        value_col: str = "value",
                        id_col: str = "event_id") -> rd.Dataset:
    """Per-key rolling time-range aggregate: for every row, the count and
    sum of the key's rows within the trailing ``width_s`` window
    (inclusive of ts peers — SQL ``RANGE BETWEEN width PRECEDING AND
    CURRENT ROW`` semantics). One keyed shuffle; per-group body is
    cumulative-sum + searchsorted arithmetic, no per-row Python.
    """
    width_ns = width_s * 1_000_000_000

    def roll(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([ts_col, id_col],
                              kind="mergesort").reset_index(drop=True)
        # pin the epoch unit: pandas may hold datetime64[us] or [ns]
        # depending on the Arrow round-trip
        ts = g[ts_col].to_numpy().astype("datetime64[ns]").astype(np.int64)
        v = g[value_col].to_numpy(dtype=np.float64)
        csum = np.concatenate(([0.0], np.cumsum(v)))
        lo = np.searchsorted(ts, ts - width_ns, side="left")
        hi = np.searchsorted(ts, ts, side="right")  # include ts peers
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(np.int64),
            "n_window": (hi - lo).astype(np.int64),
            "sum_window": csum[hi] - csum[lo],
        })

    return (ds.select_columns([key_col, ts_col, value_col, id_col])
              .groupby(key_col).map_groups(roll, batch_format="pandas"))


def sessionize(ds: rd.Dataset, gap_s: int,
               key_col: str = "user_id", ts_col: str = "ts") -> rd.Dataset:
    """Gap-based session windows per key.

    Returns one row per session: (key, session_idx 0-based by start time,
    n_events, session_start, session_end).
    """
    gap = pd.Timedelta(seconds=gap_s)

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([ts_col]).reset_index(drop=True)
        new_session = (g[ts_col].diff() > gap).fillna(True)
        sid = new_session.cumsum() - 1
        out = g.groupby(sid).agg(
            n_events=(ts_col, "size"),
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
        ).reset_index(drop=True)
        out.insert(0, key_col, group[key_col].iloc[0])
        out.insert(1, "session_idx", np.arange(len(out), dtype=np.int64))
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return ds.select_columns([key_col, ts_col]).groupby(key_col).map_groups(
        sessions, batch_format="pandas")


def sessionize_salted(ds: rd.Dataset, gap_s: int,
                      key_col: str = "user_id", ts_col: str = "ts",
                      chunk_s: int = 86400) -> rd.Dataset:
    """Skew-safe sessionization — the SALTED form of ``sessionize``.

    ``sessionize`` puts ALL of a key's events on one task (the
    documented hot-key bound, window.py:9-12). Here the salt is a time
    chunk: phase 1 groups by (key, chunk = ts // chunk_s) and reduces
    each chunk to per-session STUBS (start, end, n_events); phase 2
    groups by key over stubs only and merges consecutive stubs whose
    gap <= gap_s (within-chunk stubs already have gap > gap_s by
    construction, so one generic time-sorted merge handles chunk
    boundaries AND sessions spanning many chunks). The hottest task
    shrinks from O(events of hottest key) to O(sessions of hottest
    key) — value-identical output, shares the ``sessions`` oracle.

    ``chunk_s`` need only be >> gap_s for efficiency; correctness holds
    for any value (pre-epoch timestamps floor correctly: int64 floor
    division is toward -inf).
    """
    gap_us = np.int64(gap_s * 1_000_000)
    chunk_us = np.int64(chunk_s * 1_000_000)
    gap = pd.Timedelta(seconds=gap_s)

    def add_chunk(t) -> "pa.Table":
        import pyarrow as pa
        ts = t[ts_col].combine_chunks().cast(pa.timestamp("us"))
        us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        chunk = us // chunk_us
        return pa.table({key_col: t[key_col], ts_col: ts,
                         "chunk": pa.array(chunk, pa.int64())})

    def chunk_stubs(group: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa
        g = group.sort_values([ts_col]).reset_index(drop=True)
        new_session = (g[ts_col].diff() > gap).fillna(True)
        sid = new_session.cumsum() - 1
        out = g.groupby(sid).agg(
            n_events=(ts_col, "size"),
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
        ).reset_index(drop=True)
        # pa.Table return keeps iterative lineage arrow-only (see
        # ROUND2 notes: mixed pandas/arrow blocks break sort sampling)
        return pa.table({
            key_col: pa.array([group[key_col].iloc[0]] * len(out)),
            "n_events": pa.array(out["n_events"].to_numpy(np.int64)),
            "session_start": pa.array(out["session_start"],
                                      pa.timestamp("us")),
            "session_end": pa.array(out["session_end"], pa.timestamp("us")),
        })

    def merge_stubs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["session_start", "session_end"]).reset_index(
            drop=True)
        # pin the unit before the int view: pandas may hold
        # datetime64[us] or [ns] depending on the Arrow round-trip, and
        # an unpinned astype("int64") would compare ns against gap_us
        start_us = g["session_start"].to_numpy().astype(
            "datetime64[us]").astype(np.int64)
        end_us = g["session_end"].to_numpy().astype(
            "datetime64[us]").astype(np.int64)
        prev_end = np.concatenate(([np.iinfo(np.int64).min], end_us[:-1]))
        # a chunk-local stub chain merges while the boundary gap fits
        new_session = (start_us - prev_end) > gap_us
        new_session[0] = True
        sid = np.cumsum(new_session) - 1
        out = g.groupby(sid).agg(
            n_events=("n_events", "sum"),
            session_start=("session_start", "min"),
            session_end=("session_end", "max"),
        ).reset_index(drop=True)
        out.insert(0, key_col, g[key_col].iloc[0])
        out.insert(1, "session_idx", np.arange(len(out), dtype=np.int64))
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    stubs = (ds.select_columns([key_col, ts_col])
               .map_batches(add_chunk, batch_format="pyarrow")
               .groupby([key_col, "chunk"])
               .map_groups(chunk_stubs, batch_format="pandas"))
    return stubs.groupby(key_col).map_groups(merge_stubs,
                                             batch_format="pandas")
