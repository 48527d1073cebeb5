"""Relational operator pipelines over the TPC-H-ish test tables.

These re-express the reference's aggregation / join / sort / pagination
/ distinct capabilities (SURVEY.md §2.4-2.7: batch counters A1, routing
stats A3, corpus stats A5, created_at ordering O1, dedup probes J1/D1,
cross-table union D3) as Ray Data dataflow, each sized for scale:

* pre-aggregation before every groupby (partials inside map_batches, then
  a tiny shuffle of one row per key per batch)
* broadcast joins for dimension tables (ray.put once, merge per batch)
* top-k as per-batch partial sort + small final merge (never a full sort)
* exact p95 via the same partial pattern the reference computes in memory
  (reference: app/routers/stats.py:238-243) — per-group value collection
  is bounded by group cardinality, documented per query.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum


from ..sources.tables import read_table as _read  # shared reader

# Broadcast-vs-join guard for dimension tables. Below the cap a
# dimension ships once via ray.put (the right plan for the genuinely
# tiny dims — region/nation/languages, the only tables the reference
# itself treats as broadcast-small, sql/languages_table.sql). Above it
# the plan switches to a distributed hash_join: customer SCALES with SF
# (150k rows/SF), so a driver-resident dict of it is ~100 MB+ per
# worker at SF100 (r3 verdict, weak-at-scale #1). parquet row counts
# come from metadata, so the guard probe is O(files), not a scan.
BROADCAST_DIM_MAX_ROWS = 1_000_000


def _fits_broadcast(dim: rd.Dataset, max_rows: int | None) -> bool:
    cap = BROADCAST_DIM_MAX_ROWS if max_rows is None else max_rows
    return dim.count() <= cap


# ---------------------------------------------------------------------------
# A1/A4-style grouped aggregate with partial pre-aggregation (TPC-H Q1 shape)
# ---------------------------------------------------------------------------


def pricing_summary(sf_dir: str) -> rd.Dataset:
    """lineitem pricing summary: groupby (returnflag, linestatus) with the
    combiner pattern — per-batch partial sums, then the groupby shuffles
    one partial row per key per batch instead of every row."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(batch["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        t = batch.append_column("disc_price", disc_price)
        df = t.select(["l_returnflag", "l_linestatus", "l_quantity",
                       "l_extendedprice", "disc_price"]).to_pandas()
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            n_rows=("l_quantity", "size"),
        )
        g["n_rows"] = g["n_rows"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    summed = (partials.groupby(["l_returnflag", "l_linestatus"])
              .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                         Sum("sum_base_price", alias_name="sum_base_price"),
                         Sum("sum_disc_price", alias_name="sum_disc_price"),
                         Sum("n_rows", alias_name="n_rows")))

    # value-hash safety: money columns are fixed-decimal, so sums are
    # integral in cents / 1e-4 units; emitting integers removes the
    # last-ulp sensitivity of distributed vs sequential float summation
    def to_int_units(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "sum_qty": pc.round(batch["sum_qty"]).cast(pa.int64()),
            "sum_base_price_cents":
                pc.round(pc.multiply(batch["sum_base_price"], 100.0)).cast(pa.int64()),
            "sum_disc_price_e4":
                pc.round(pc.multiply(batch["sum_disc_price"], 10000.0)).cast(pa.int64()),
            "n_rows": batch["n_rows"],
        })

    return summed.map_batches(to_int_units, batch_format="pyarrow")


def pricing_summary_sql() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty,
       CAST(round(sum(l_extendedprice) * 100) AS BIGINT) AS sum_base_price_cents,
       CAST(round(sum(l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)
         AS sum_disc_price_e4,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem GROUP BY l_returnflag, l_linestatus"""


# ---------------------------------------------------------------------------
# J3/J4-style broadcast dimension join
# ---------------------------------------------------------------------------


def customers_per_region(sf_dir: str) -> rd.Dataset:
    """customer ⋈ nation ⋈ region via broadcast: the two dimension tables
    are tiny, so they ship to the object store once and every batch does a
    dict lookup — no shuffle join (ray_guide joins section; reference
    analog: languages FK lookup, sql/languages_table.sql:66-67)."""
    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    n2r = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    lookup = dict(zip(n2r["n_nationkey"], n2r["r_name"]))
    ref = ray.put(lookup)

    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def tag(batch: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        regions = [lk[k] for k in batch["c_nationkey"].to_pylist()]
        return batch.append_column("r_name", pa.array(regions, pa.string()))

    summed = (cust.map_batches(tag, batch_format="pyarrow")
              .groupby("r_name")
              .aggregate(Count(alias_name="n_customers"),
                         Sum("c_acctbal", alias_name="sum_acctbal")))

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "r_name": batch["r_name"],
            "n_customers": batch["n_customers"],
            "sum_acctbal_cents":
                pc.round(pc.multiply(batch["sum_acctbal"], 100.0)).cast(pa.int64()),
        })

    return summed.map_batches(to_cents, batch_format="pyarrow")


def customers_per_region_sql() -> str:
    return """
SELECT r.r_name,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(round(sum(c.c_acctbal) * 100) AS BIGINT) AS sum_acctbal_cents
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name"""


def revenue_by_nation(sf_dir: str) -> rd.Dataset:
    """TPC-H Q5-analog: local-supplier revenue by customer nation — the
    multi-way analytic join real relational users run daily, composed
    the scale-shaped way:

      orders ⋈ customer   (both large → ONE distributed hash_join)
      → lineitem ⋈ that    (both large → second hash_join)
      → supplier nation    (dimension-sized → broadcast dict)
      → filter c_nation == s_nation ("local supplier")
      → nation name lookup (tiny dict) + combiner partial sums
      → one tiny groupby(n_name)

    Every read is column-pruned; the only all-to-alls are the two
    large-side joins. Revenue emitted in 1e-4 units (the
    pricing_summary fixed-decimal convention) so the value hash is
    float-fold-order-proof."""
    from ..stages.joins import hash_join

    nation = _read(sf_dir, "nation").to_pandas()
    nname = dict(zip(nation["n_nationkey"], nation["n_name"]))
    supplier = _read(sf_dir, "supplier",
                     ["s_suppkey", "s_nationkey"]).to_pandas()
    snat = dict(zip(supplier["s_suppkey"], supplier["s_nationkey"]))
    nref, sref = ray.put(nname), ray.put(snat)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    o_c = hash_join(orders, cust, left_on="o_custkey",
                    right_on="c_custkey", left_cols=["o_orderkey"],
                    right_cols=["c_nationkey"], how="inner")

    items = _read(sf_dir, "lineitem",
                  ["l_orderkey", "l_suppkey", "l_extendedprice",
                   "l_discount"])
    joined = hash_join(items, o_c, left_on="l_orderkey",
                       right_on="o_orderkey",
                       left_cols=["l_suppkey", "l_extendedprice",
                                  "l_discount"],
                       right_cols=["c_nationkey"], how="inner")

    def partial(batch: pa.Table) -> pa.Table:
        sn = ray.get(sref)
        nn = ray.get(nref)
        c_nat = np.asarray(batch["c_nationkey"].to_pylist(), np.int64)
        s_nat = np.fromiter((sn[k] for k in batch["l_suppkey"].to_pylist()),
                            np.int64, len(batch))
        keep = c_nat == s_nat
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[keep]
        names = [nn[k] for k in c_nat[keep]]
        df = pd.DataFrame({"n_name": names,
                           "revenue": price * (1.0 - disc),
                           "n_items": 1})
        g = df.groupby("n_name", as_index=False).agg(
            revenue=("revenue", "sum"), n_items=("n_items", "sum"))
        g["n_items"] = g["n_items"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    summed = (joined.map_batches(partial, batch_format="pyarrow")
              .groupby("n_name")
              .aggregate(Sum("revenue", alias_name="revenue"),
                         Sum("n_items", alias_name="n_items")))

    def to_units(batch: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": batch["n_name"],
            "revenue_e4":
                pc.round(pc.multiply(batch["revenue"], 10000.0))
                  .cast(pa.int64()),
            "n_items": batch["n_items"],
        })

    return summed.map_batches(to_units, batch_format="pyarrow")


def revenue_by_nation_sql() -> str:
    return """
SELECT n.n_name,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000)
            AS BIGINT) AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_nationkey = s.s_nationkey
GROUP BY n.n_name"""


# ---------------------------------------------------------------------------
# O1-style top-k (sort + limit without a global sort)
# ---------------------------------------------------------------------------


def top_orders(sf_dir: str, k: int = 100) -> rd.Dataset:
    """Top-k orders by total price (o_orderkey tiebreak): per-batch
    partial top-k then one small merge — the global ``ds.sort`` a naive
    port would use is an all-to-all shuffle of every row
    (reference analog: ORDER BY created_at DESC + range pagination,
    app/db/extractions.py:281)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice",
                                  "o_orderdate"])

    def partial(batch: pa.Table) -> pa.Table:
        price = batch["o_totalprice"].to_numpy()
        keys = batch["o_orderkey"].to_numpy()
        order = np.lexsort((keys, -price))[:k]
        return batch.take(pa.array(order))

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    merged = partials.sort(["o_totalprice", "o_orderkey"],
                           descending=[True, False]).limit(k)
    return merged


def top_orders_sql(k: int = 100) -> str:
    return f"""
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT {k}"""


# ---------------------------------------------------------------------------
# A3-style stats with exact p95
# ---------------------------------------------------------------------------


def event_value_stats(sf_dir: str) -> rd.Dataset:
    """Per-event-type count / mean / p95(value): exact discrete p95 with
    DuckDB ``quantile_disc`` semantics (index ceil(0.95*n)-1 of the sorted
    values; the reference computes sorted[int(0.95*len)] in memory,
    app/routers/stats.py:238-243). Values of one group are collected in
    that group's task — bounded by per-key cardinality."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def stats(group: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(group["value"].to_numpy())
        n = len(v)
        idx = max(0, int(np.ceil(0.95 * n)) - 1)
        return pd.DataFrame({
            "event_type": [group["event_type"].iloc[0]],
            "n_events": np.array([n], dtype=np.int64),
            # scaled integer with HALF-AWAY rounding: DuckDB round() is
            # half-away-from-zero while Python round() is banker's — an
            # exact .5 product would hash-mismatch. Values are positive,
            # so floor(x + 0.5) is the DuckDB-compatible form. p95 is an
            # exact element copy, hash-safe as a raw float.
            "mean_value_e6": np.array(
                [int(np.floor(float(v.sum() / n) * 1e6 + 0.5))],
                dtype=np.int64),
            "p95_value": [float(v[idx])],
        })

    return ds.groupby("event_type").map_groups(stats, batch_format="pandas")


def event_value_stats_sql() -> str:
    return """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(avg(value) * 1000000) AS BIGINT) AS mean_value_e6,
       quantile_disc(value, 0.95) AS p95_value
FROM events GROUP BY event_type"""


# ---------------------------------------------------------------------------
# A5/A6-style distinct + presence counts
# ---------------------------------------------------------------------------


def part_stats(sf_dir: str) -> rd.Dataset:
    """Distinct counts via partial distinct-set + merge (corpus stats
    analog: scripts/batch_operations.py:82-160)."""
    ds = _read(sf_dir, "part", ["p_type", "p_size", "p_retailprice"])

    # distinct counts are not mergeable as plain counts, so the partial
    # keeps one row per (p_type, p_size) — the mergeable form: the final
    # stage counts distinct sizes as group rows and sums the partial counts
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["p_type", "p_size"], as_index=False).agg(
            n_parts=("p_size", "size"),
            max_price=("p_retailprice", "max"),
        )
        g["n_parts"] = g["n_parts"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "p_type": [group["p_type"].iloc[0]],
            "n_parts": np.array([group["n_parts"].sum()], dtype=np.int64),
            "n_sizes": np.array([group["p_size"].nunique()], dtype=np.int64),
            "max_price": [float(group["max_price"].max())],
        })

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partials.groupby("p_type").map_groups(final, batch_format="pandas")


def part_stats_sql() -> str:
    return """
SELECT p_type, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(count(DISTINCT p_size) AS BIGINT) AS n_sizes,
       max(p_retailprice) AS max_price
FROM part GROUP BY p_type"""


BIG_ORDER_PRICE = 400_000.0


def customers_without_orders(sf_dir: str) -> rd.Dataset:
    """Anti-join via broadcast key set (the Bloom-filter pattern of the
    ray_guide joins section, exact here): customers with no high-value
    order (every customer in this synthetic data has SOME order, so the
    price threshold keeps the result non-trivial; reference analog: the
    dedup existence probes, app/db/extractions.py:107-180, are the same
    anti-join of incoming keys vs a stored set). The key set is built
    with a pruned, filtered read — only matching keys ship."""
    keys = set()
    filtered = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]) \
        .map_batches(lambda b: b.filter(
            pc.greater(b["o_totalprice"], BIG_ORDER_PRICE))
            .select(["o_custkey"]), batch_format="pyarrow")
    for b in filtered.iter_batches(batch_format="pyarrow"):
        keys.update(b["o_custkey"].to_pylist())
    ref = ray.put(keys)

    def anti(batch: pa.Table) -> pa.Table:
        k = ray.get(ref)
        mask = pa.array([c not in k for c in batch["c_custkey"].to_pylist()],
                        pa.bool_())
        return batch.filter(mask)

    return _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        anti, batch_format="pyarrow")


def customers_without_orders_sql() -> str:
    return f"""
SELECT c_custkey, c_nationkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > {BIG_ORDER_PRICE})"""


def prev_value_by_type(sf_dir: str) -> rd.Dataset:
    """Ordered per-key state: each event joined to the value of the
    previous event of the same type (the as-of/lag pattern —
    ``groupby(key).map_groups`` over ts-sorted groups; a two-table as-of
    join uses the same shape with ``pd.merge_asof`` inside the group).
    Deterministic tie-break: (ts, event_id)."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "ts", "value"])

    def lag(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"]).reset_index(drop=True)
        g["prev_value"] = g["value"].shift(1)
        return g[["event_id", "event_type", "prev_value"]]

    return ds.groupby("event_type").map_groups(lag, batch_format="pandas")


def prev_value_by_type_sql() -> str:
    return """
SELECT event_id, event_type,
       lag(value) OVER (PARTITION BY event_type ORDER BY ts, event_id)
         AS prev_value
FROM events"""


def top_orders_per_segment(sf_dir: str, k: int = 3,
                           broadcast_max_rows: int | None = None
                           ) -> rd.Dataset:
    """Top-k orders per market segment: attach the custkey→segment
    dimension (broadcast below the size guard, distributed hash_join
    above it — customer scales with SF, so a driver dict of it does
    not survive SF100), then per-batch partial top-k per segment and a
    tiny final merge per group. Both plans are value-identical (the
    oracle gates them against the same SQL)."""
    from ..stages.joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])

    if _fits_broadcast(cust, broadcast_max_rows):
        cdf = cust.to_pandas()
        ref = ray.put(dict(zip(cdf.c_custkey, cdf.c_mktsegment)))

        def attach(batch: pa.Table) -> pa.Table:
            m = ray.get(ref)
            segs = [m.get(c) for c in batch["o_custkey"].to_pylist()]
            # drop unmatched custkeys — INNER semantics, identical to
            # the hash_join plan and the oracle (a "" phantom segment
            # would diverge between the two plans; review finding)
            mask = pa.array([s is not None for s in segs], pa.bool_())
            return batch.append_column(
                "c_mktsegment", pa.array(segs, pa.string())).filter(mask)

        tagged = orders.map_batches(attach, batch_format="pyarrow",
                                    batch_size=65536)
    else:
        tagged = hash_join(orders, cust, "o_custkey", "c_custkey",
                           ["o_orderkey", "o_totalprice"],
                           ["c_mktsegment"], how="inner")

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(["o_totalprice", "o_orderkey"],
                            ascending=[False, True])
        return pa.Table.from_pandas(df.groupby("c_mktsegment").head(k),
                                    preserve_index=False)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["o_totalprice", "o_orderkey"],
                              ascending=[False, True]).head(k)
        return g[["c_mktsegment", "o_orderkey", "o_totalprice"]]

    return (tagged.map_batches(partial, batch_format="pyarrow",
                               batch_size=65536)
            .groupby("c_mktsegment").map_groups(final,
                                                batch_format="pandas"))


def top_orders_per_segment_sql(k: int = 3) -> str:
    return f"""
SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
QUALIFY row_number() OVER (PARTITION BY c.c_mktsegment
                           ORDER BY o.o_totalprice DESC, o.o_orderkey) <= {k}"""


def nations_with_presence(sf_dir: str) -> rd.Dataset:
    """Union + presence flags (D3 analog: dedup across extractions ∪
    memo_extractions; A6 presence counts): distinct nation keys seen in
    customers and/or suppliers. Partial distinct per batch shrinks the
    shuffle to the key domain."""
    def tagged(table: str, col: str, flag: str) -> rd.Dataset:
        def distinct_batch(batch: pa.Table) -> pa.Table:
            keys = pc.unique(batch[col]).sort()
            return pa.table({
                "n_nationkey": keys,
                "has_cust": pa.array([1 if flag == "c" else 0] * len(keys), pa.int64()),
                "has_supp": pa.array([1 if flag == "s" else 0] * len(keys), pa.int64()),
            })
        return _read(sf_dir, table, [col]).map_batches(
            distinct_batch, batch_format="pyarrow")

    both = tagged("customer", "c_nationkey", "c").union(
        tagged("supplier", "s_nationkey", "s"))
    return both.groupby("n_nationkey").aggregate(
        Max("has_cust", alias_name="has_cust"),
        Max("has_supp", alias_name="has_supp"))


def nations_with_presence_sql() -> str:
    return """
SELECT n_nationkey,
       CAST(max(has_cust) AS BIGINT) AS has_cust,
       CAST(max(has_supp) AS BIGINT) AS has_supp
FROM (
  SELECT DISTINCT c_nationkey AS n_nationkey, 1 AS has_cust, 0 AS has_supp
  FROM customer
  UNION ALL
  SELECT DISTINCT s_nationkey AS n_nationkey, 0 AS has_cust, 1 AS has_supp
  FROM supplier
) GROUP BY n_nationkey"""


def customers_without_orders_bloom(sf_dir: str) -> rd.Dataset:
    """The SAME anti-join through the Bloom-filter scale path
    (stages/dedup.py:bloom_anti_join): only the ~10-bits/key bloom
    broadcasts wide; bloom positives verify with a semi-join pass.
    Value-identical to the exact broadcast variant, so it shares its
    oracle — surfacing the scale path in the correctness gate."""
    from ..stages.dedup import bloom_anti_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]) \
        .map_batches(lambda b: b.filter(
            pc.greater(b["o_totalprice"], BIG_ORDER_PRICE))
            .select(["o_custkey"]), batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    return bloom_anti_join(cust, orders, "c_custkey",
                           right_key_col="o_custkey")


# ---------------------------------------------------------------------------
# multi-level aggregation: ROLLUP and PIVOT (combiner shape)
# ---------------------------------------------------------------------------

ROLLUP_ALL = "ALL"  # sentinel for a rolled-up level (avoids NULL-sort skew)


def _orders_finest(sf_dir: str) -> pd.DataFrame:
    """The (priority, status) grain from ONE distributed combiner pass —
    shared by ROLLUP and CUBE, whose coarser levels re-aggregate this
    key-domain-bounded table (~15 rows) driver-side."""
    ds = _read(sf_dir, "orders",
               ["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pa.table({
            "priority": batch["o_orderpriority"],
            "status": batch["o_orderstatus"],
            "cents": pc.round(pc.multiply(batch["o_totalprice"], 100.0))
                       .cast(pa.int64()),
        }).to_pandas()
        g = df.groupby(["priority", "status"], as_index=False).agg(
            n_orders=("cents", "size"), sum_cents=("cents", "sum"))
        g["n_orders"] = g["n_orders"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby(["priority", "status"])
            .aggregate(Sum("n_orders", alias_name="n_orders"),
                       Sum("sum_cents", alias_name="sum_cents"))
            .to_pandas())


def orders_cube(sf_dir: str) -> pa.Table:
    """GROUP BY CUBE(o_orderpriority, o_orderstatus): all FOUR grains
    (priority×status, priority, status, grand total) from the same one
    data pass as ``orders_rollup`` — CUBE adds the status-only level
    the rollup lattice lacks. Coarser levels re-aggregate the finest
    table, bounded by the key domain, never by data size."""
    finest = _orders_finest(sf_dir)
    by_p = (finest.groupby("priority", as_index=False)
            [["n_orders", "sum_cents"]].sum())
    by_p["status"] = ROLLUP_ALL
    by_s = (finest.groupby("status", as_index=False)
            [["n_orders", "sum_cents"]].sum())
    by_s["priority"] = ROLLUP_ALL
    total = pd.DataFrame({
        "priority": [ROLLUP_ALL], "status": [ROLLUP_ALL],
        "n_orders": [finest["n_orders"].sum()],
        "sum_cents": [finest["sum_cents"].sum()],
    })
    out = pd.concat([finest, by_p, by_s, total], ignore_index=True)
    out = out[["priority", "status", "n_orders", "sum_cents"]]
    out["n_orders"] = out["n_orders"].astype(np.int64)
    out["sum_cents"] = out["sum_cents"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def orders_cube_sql() -> str:
    return """
SELECT CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
            ELSE o_orderpriority END AS priority,
       CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
            ELSE o_orderstatus END AS status,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM orders
GROUP BY CUBE(o_orderpriority, o_orderstatus)"""


def orders_rollup(sf_dir: str) -> pa.Table:
    """GROUP BY ROLLUP(o_orderpriority, o_orderstatus): order counts and
    totalprice sums at three grains (priority×status, priority, grand
    total) from ONE data pass.

    Shape: the finest groupby runs distributed with the combiner pattern
    (per-batch integer-cents partials, one small keyed shuffle); the
    coarser levels are re-aggregations of that result, whose cardinality
    is bounded by the KEY DOMAIN (|priorities|×|statuses| ≈ 15 rows) —
    never by data size — so deriving them driver-side is the scale-right
    plan at any corpus size. Money integerizes to cents per row before
    summation (association-order-free, hash-safe vs the SQL oracle).
    """
    finest = _orders_finest(sf_dir)
    lvl1 = (finest.groupby("priority", as_index=False)
            [["n_orders", "sum_cents"]].sum())
    lvl1["status"] = ROLLUP_ALL
    lvl0 = pd.DataFrame({
        "priority": [ROLLUP_ALL], "status": [ROLLUP_ALL],
        "n_orders": [finest["n_orders"].sum()],
        "sum_cents": [finest["sum_cents"].sum()],
    })
    out = pd.concat([finest, lvl1, lvl0], ignore_index=True)
    out = out[["priority", "status", "n_orders", "sum_cents"]]
    out["n_orders"] = out["n_orders"].astype(np.int64)
    out["sum_cents"] = out["sum_cents"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def orders_rollup_sql() -> str:
    return """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
            ELSE o_orderstatus END AS status,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM orders
GROUP BY ROLLUP(o_orderpriority, o_orderstatus)"""


def orders_pivot(sf_dir: str) -> rd.Dataset:
    """Pivot (crosstab): one row per o_orderpriority with per-status
    order counts as columns — conditional aggregation, fully combiner-
    shaped (per-batch crosstab partials, one tiny keyed shuffle; no
    driver-side work at all). Statuses are the fixed TPC-H domain
    {F, O, P}; an unexpected status fails loudly rather than silently
    dropping rows."""
    STATUSES = ("F", "O", "P")
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "priority": batch["o_orderpriority"].to_pandas(),
            "status": batch["o_orderstatus"].to_pandas(),
        })
        bad = set(df["status"].unique()) - set(STATUSES)
        if bad:
            raise ValueError(f"unexpected o_orderstatus values: {bad}")
        ct = pd.crosstab(df["priority"], df["status"])
        for s in STATUSES:
            if s not in ct.columns:
                ct[s] = 0
        ct = ct[list(STATUSES)].reset_index()
        ct.columns = ["priority"] + [f"n_{s.lower()}" for s in STATUSES]
        for c in ct.columns[1:]:
            ct[c] = ct[c].astype(np.int64)
        return pa.Table.from_pandas(ct, preserve_index=False)

    aggs = [Sum(f"n_{s.lower()}", alias_name=f"n_{s.lower()}")
            for s in STATUSES]
    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
              .groupby("priority").aggregate(*aggs))


def orders_pivot_sql() -> str:
    return """
SELECT o_orderpriority AS priority,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
FROM orders GROUP BY o_orderpriority"""


# ---------------------------------------------------------------------------
# TPC-H Q3 analog (session 7)
# ---------------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-06-01"
Q3_TOPK = 10
_DAY_US = 86_400 * 1_000_000


def shipping_priority(sf_dir: str, k: int = Q3_TOPK,
                      broadcast_max_rows: int | None = None) -> rd.Dataset:
    """TPC-H Q3 analog (shipping priority): the segment's unshipped
    revenue per order, top-k — the canonical 3-table selective join
    chain, composed the scale-shaped way:

      customer segment filter → broadcast custkey SET (dimension)
      orders: BOTH filters pushed map-side before any exchange
      lineitem: shipdate filter map-side, then a per-block COMBINER
        folds items to (orderkey, partial revenue) — the revenue
        aggregate happens before the one orderkey groupby, and only
        (orderkey, int) pairs ever shuffle
      one hash_join attaches the order header, then the partial-top-k
        merge (never a global sort).

    Revenue integerizes PER ROW — round(price·(1-disc)·1e4) is the
    same double op chain in numpy and DuckDB, so the sum is exact
    BIGINT on both sides. Dates compare as epoch days."""
    from ..stages.joins import hash_join

    cutoff_day = int(np.datetime64(Q3_CUTOFF).astype("datetime64[D]")
                     .astype(np.int64))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders_raw = _read(sf_dir, "orders",
                       ["o_orderkey", "o_custkey", "o_orderdate",
                        "o_orderpriority"])

    def dated(t: pa.Table) -> pa.Table:
        day = (t["o_orderdate"].combine_chunks().cast(pa.timestamp("us"))
               .cast(pa.int64()).to_numpy() // _DAY_US)
        kept = t.filter(pa.array(day < cutoff_day))
        kday = (kept["o_orderdate"].combine_chunks()
                .cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
                // _DAY_US)
        return pa.table({
            "o_orderkey": kept["o_orderkey"],
            "o_custkey": kept["o_custkey"],
            "odate_day": pa.array(kday.astype(np.int64), pa.int64()),
            "o_orderpriority": kept["o_orderpriority"]})

    if _fits_broadcast(cust, broadcast_max_rows):
        # dimension small enough: the segment keep-set ships once and
        # both order filters stay map-side, zero exchanges before the
        # lineitem combiner
        cdf = cust.to_pandas()
        kref = ray.put(set(
            cdf.loc[cdf.c_mktsegment == Q3_SEGMENT, "c_custkey"]
            .astype(int)))

        def seg_filter(t: pa.Table) -> pa.Table:
            ks = ray.get(kref)
            ck = t["o_custkey"].to_numpy(zero_copy_only=False)
            mask = np.fromiter((int(c) in ks for c in ck), bool, len(ck))
            return t.filter(pa.array(mask)).drop_columns(["o_custkey"])

        orders = (orders_raw.map_batches(dated, batch_format="pyarrow")
                  .map_batches(seg_filter, batch_format="pyarrow"))
    else:
        # SF-scaling dimension: the segment filter becomes a semi
        # hash_join against the (filtered) customer keys — no driver-
        # resident key set, both sides stream
        seg_keys = cust.map_batches(
            lambda t: t.filter(pc.equal(t["c_mktsegment"], Q3_SEGMENT))
            .select(["c_custkey"]), batch_format="pyarrow")
        orders = hash_join(
            orders_raw.map_batches(dated, batch_format="pyarrow"),
            seg_keys, "o_custkey", "c_custkey",
            ["o_orderkey", "odate_day", "o_orderpriority"], [],
            how="semi",
        ).materialize()  # pin: the orderkey hash_join below probes
        # schema() and would re-run this semi join's shuffle

    def items_partial(t: pa.Table) -> pa.Table:
        day = (t["l_shipdate"].combine_chunks().cast(pa.timestamp("us"))
               .cast(pa.int64()).to_numpy() // _DAY_US)
        mask = day > cutoff_day
        kept = t.filter(pa.array(mask))
        price = kept["l_extendedprice"].to_numpy()
        disc = kept["l_discount"].to_numpy()
        rev = np.round(price * (1.0 - disc) * 10000.0).astype(np.int64)
        keys = kept["l_orderkey"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(keys, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, rev)  # int64-exact (bincount weights
        # would round through float64 past 2^53)
        return pa.table({
            "l_orderkey": pa.array(uniq.astype(np.int64), pa.int64()),
            "r": pa.array(sums, pa.int64())})

    # pin: hash_join probes schema() and would re-execute this whole
    # read+combiner+shuffle lineage a second time (its docstring note)
    items = (_read(sf_dir, "lineitem",
                   ["l_orderkey", "l_extendedprice", "l_discount",
                    "l_shipdate"])
             .map_batches(items_partial, batch_format="pyarrow")
             .groupby("l_orderkey").aggregate(Sum("r",
                                                  alias_name="revenue_e4"))
             .materialize())

    joined = hash_join(items, orders, "l_orderkey", "o_orderkey",
                       ["revenue_e4"], ["odate_day", "o_orderpriority"],
                       how="inner")

    def partial_topk(t: pa.Table) -> pa.Table:
        rev = t["revenue_e4"].to_numpy(zero_copy_only=False)
        keys = t["l_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, -rev))[:k]
        return t.take(pa.array(order))

    merged = (joined.map_batches(partial_topk, batch_format="pyarrow")
              .sort(["revenue_e4", "l_orderkey"], descending=[True, False])
              .limit(k))

    def rank(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["l_orderkey"],
            "revenue_e4": t["revenue_e4"],
            "odate_day": t["odate_day"],
            "o_orderpriority": t["o_orderpriority"],
            "rank": pa.array(np.arange(1, t.num_rows + 1, dtype=np.int64)),
        })

    # the limit(k) output is a single tiny block; rank is its position
    return merged.repartition(1).map_batches(rank, batch_format="pyarrow")


def shipping_priority_sql(k: int = Q3_TOPK) -> str:
    return f"""
WITH j AS (
  SELECT l.l_orderkey AS o_orderkey,
         sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                  AS BIGINT)) AS revenue_e4,
         epoch_us(o.o_orderdate) // {_DAY_US} AS odate_day,
         o.o_orderpriority
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = '{Q3_SEGMENT}'
    AND o.o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
    AND l.l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
  GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
)
SELECT o_orderkey, revenue_e4, CAST(odate_day AS BIGINT) AS odate_day,
       o_orderpriority,
       CAST(row_number() OVER (ORDER BY revenue_e4 DESC, o_orderkey)
            AS BIGINT) AS rank
FROM j
QUALIFY rank <= {k}"""


# ---------------------------------------------------------------------------
# TPC-H Q5 analog: local supplier volume (5-table join, equality on a
# NON-join attribute — customer and supplier must share a nation)
# ---------------------------------------------------------------------------

Q5_REGION = "ASIA"
Q5_YEAR = 1997


def local_supplier_volume(sf_dir: str, region: str = Q5_REGION,
                          year: int = Q5_YEAR) -> rd.Dataset:
    """TPC-H Q5 analog (local supplier volume): revenue per nation from
    orders where the CUSTOMER and the line's SUPPLIER sit in the same
    nation of one region, within one order year. The canonical
    many-table join, composed the scale-shaped way:

      region → nation → tiny dicts, driver-side (≤25 rows)
      supplier / customer → (key → nationkey) dicts RESTRICTED to the
        region's nations, shipped ONCE via ray.put (dimension
        broadcast; at TPC-H scale supplier is 0.01% and customer 1.5%
        of lineitem — the survey's broadcast-small-sides rule)
      orders: year filter pushed map-side, c_nat attached from the
        broadcast (non-region customers drop here — the region
        predicate is applied before any exchange)
      lineitem: s_nat attached map-side (non-region suppliers drop),
        then a per-block COMBINER folds to (orderkey·64+s_nat, partial
        revenue) — nationkey < 25 < 64, orderkey < 2^57 so the packed
        key is exact int64
      ONE groupby(packed key) + ONE hash_join against orders, the
        c_nat == s_nat equality filtered AFTER the join (it is not a
        join key — the classic Q5 trap), and a ≤|nations|-row final
        groupby.

    Revenue integerizes per row (round(price·(1−disc)·1e4), the Q3
    convention) so the sums are exact BIGINT on both engines. Returns
    (n_name, revenue_e4)."""
    from ..stages.joins import hash_join

    lo_day = int(np.datetime64(f"{year}-01-01").astype("datetime64[D]")
                 .astype(np.int64))
    hi_day = int(np.datetime64(f"{year + 1}-01-01").astype("datetime64[D]")
                 .astype(np.int64))

    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rkeys = set(reg.loc[reg.r_name == region, "r_regionkey"].astype(int))
    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    nat = nat[nat.n_regionkey.astype(int).isin(rkeys)]
    nmap = {int(k): str(v) for k, v in zip(nat.n_nationkey, nat.n_name)}
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    smap = {int(k): int(n) for k, n in zip(sup.s_suppkey, sup.s_nationkey)
            if int(n) in nmap}
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).to_pandas()
    cmap = {int(k): int(n) for k, n in zip(cust.c_custkey, cust.c_nationkey)
            if int(n) in nmap}
    nref, sref, cref = ray.put(nmap), ray.put(smap), ray.put(cmap)

    def orders_f(t: pa.Table) -> pa.Table:
        cm = ray.get(cref)
        day = (t["o_orderdate"].combine_chunks().cast(pa.timestamp("us"))
               .cast(pa.int64()).to_numpy() // _DAY_US)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        cn = np.fromiter((cm.get(int(c), -1) for c in ck),
                         np.int64, len(ck))
        mask = (day >= lo_day) & (day < hi_day) & (cn >= 0)
        kept = t.filter(pa.array(mask))
        return pa.table({"o_orderkey": kept["o_orderkey"],
                         "c_nat": pa.array(cn[mask], pa.int64())})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        orders_f, batch_format="pyarrow")

    def items_partial(t: pa.Table) -> pa.Table:
        sm = ray.get(sref)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        sn = np.fromiter((sm.get(int(s), -1) for s in sk),
                         np.int64, len(sk))
        mask = sn >= 0
        kept = t.filter(pa.array(mask))
        price = kept["l_extendedprice"].to_numpy()
        disc = kept["l_discount"].to_numpy()
        rev = np.round(price * (1.0 - disc) * 10000.0).astype(np.int64)
        okey = kept["l_orderkey"].to_numpy(zero_copy_only=False)
        packed = okey.astype(np.int64) * 64 + sn[mask]
        uniq, inv = np.unique(packed, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, rev)  # int64-exact
        return pa.table({
            "k": pa.array(uniq.astype(np.int64), pa.int64()),
            "r": pa.array(sums, pa.int64())})

    # pin: hash_join probes schema() and would re-execute this whole
    # read+combiner+shuffle lineage a second time (its docstring note)
    items = (_read(sf_dir, "lineitem",
                   ["l_orderkey", "l_suppkey", "l_extendedprice",
                    "l_discount"])
             .map_batches(items_partial, batch_format="pyarrow")
             .groupby("k").aggregate(Sum("r", alias_name="rev"))
             .materialize())

    def unpack(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        return pa.table({"l_orderkey": pa.array(k // 64, pa.int64()),
                         "s_nat": pa.array(k % 64, pa.int64()),
                         "rev": t["rev"]})

    items = items.map_batches(unpack, batch_format="pyarrow")
    joined = hash_join(items, orders, "l_orderkey", "o_orderkey",
                       ["s_nat", "rev"], ["c_nat"], how="inner")

    def same_nation(t: pa.Table) -> pa.Table:
        nm = ray.get(nref)
        sn = t["s_nat"].to_numpy(zero_copy_only=False)
        cn = t["c_nat"].to_numpy(zero_copy_only=False)
        kept = t.filter(pa.array(sn == cn))
        names = [nm[int(n)] for n in
                 kept["s_nat"].to_numpy(zero_copy_only=False)]
        return pa.table({"n_name": pa.array(names, pa.string()),
                         "rev": kept["rev"]})

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"n_name": t["n_name"],
                         "revenue_e4": t["sum(rev)"]})

    return (joined.map_batches(same_nation, batch_format="pyarrow")
            .groupby("n_name").aggregate(Sum("rev"))
            .map_batches(rename, batch_format="pyarrow"))


def local_supplier_volume_sql(region: str = Q5_REGION,
                              year: int = Q5_YEAR) -> str:
    return f"""
SELECT n.n_name,
       sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                AS BIGINT)) AS revenue_e4
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{region}'
  AND c.c_nationkey = s.s_nationkey
  AND o.o_orderdate >= TIMESTAMP '{year}-01-01'
  AND o.o_orderdate < TIMESTAMP '{year + 1}-01-01'
GROUP BY n.n_name"""


# ---------------------------------------------------------------------------
# storage-partitioned (bucket-local) join demo — session 8
# ---------------------------------------------------------------------------


def bucketed_order_revenue(sf_dir: str, num_buckets: int = 32,
                           tmp_root: str | None = None) -> rd.Dataset:
    """Revenue per order via a STORAGE-PARTITIONED join: both sides are
    first written key-hash-bucketed (`stages/joins.write_bucketed` —
    the layout this repo's checkpointed extraction already uses for url
    buckets), then `bucketed_join` joins bucket-by-bucket with ZERO
    all-to-all — one task per bucket reading two local directories.
    At 100 TB this is the difference between a free join and a
    full-corpus shuffle whenever two tables share a bucketing key
    (the lakehouse storage-partitioned-join optimization).

    The lineitem side pre-aggregates to (orderkey, revenue partials)
    BEFORE the bucketed write (the Q3 combiner), so the bucket files
    hold one row per (orderkey, block) — the write exchange carries
    combiner output, never raw items. Returns (o_orderkey,
    o_orderpriority, revenue_e4)."""
    import os
    import shutil

    from ..sources.corpus import _input_digest
    from ..stages.joins import bucketed_join, write_bucketed

    # key the scratch dir by basename + input digest (the bm25 index
    # convention) so two sf dirs sharing a leaf name, or concurrent
    # runs over different inputs, never clobber each other's buckets
    root = tmp_root or os.path.join(
        "/tmp/pdf_extraction_ray", "bucketed",
        f"{os.path.basename(os.path.normpath(sf_dir))}"
        f"-{_input_digest(sf_dir)}")
    shutil.rmtree(root, ignore_errors=True)

    def items_partial(t: pa.Table) -> pa.Table:
        price = t["l_extendedprice"].to_numpy()
        disc = t["l_discount"].to_numpy()
        rev = np.round(price * (1.0 - disc) * 10000.0).astype(np.int64)
        keys = t["l_orderkey"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(keys, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, rev)  # int64-exact
        return pa.table({
            "l_orderkey": pa.array(uniq.astype(np.int64), pa.int64()),
            "rev": pa.array(sums, pa.int64())})

    items = (_read(sf_dir, "lineitem",
                   ["l_orderkey", "l_extendedprice", "l_discount"])
             .map_batches(items_partial, batch_format="pyarrow"))
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    write_bucketed(items, "l_orderkey", os.path.join(root, "items"),
                   num_buckets)
    write_bucketed(orders, "o_orderkey", os.path.join(root, "orders"),
                   num_buckets)

    joined = bucketed_join(os.path.join(root, "items"),
                           os.path.join(root, "orders"),
                           "l_orderkey", "o_orderkey",
                           ["rev"], ["o_orderpriority"], num_buckets)

    # bucket alignment means EVERY partial of an orderkey sits in this
    # block — the final fold is per-block pandas with NO exchange (the
    # whole point of the storage-partitioned plan)
    def fold_local(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:   # bucketed_join emits typed empty blocks
            return pa.table({
                "o_orderkey": pa.array([], pa.int64()),
                "o_orderpriority": pa.array([], pa.string()),
                "revenue_e4": pa.array([], pa.int64())})
        df = t.to_pandas()
        g = (df.groupby(["l_orderkey", "o_orderpriority"], as_index=False)
             ["rev"].sum())
        return pa.table({
            "o_orderkey": pa.array(g.l_orderkey.astype("int64")),
            "o_orderpriority": pa.array(g.o_orderpriority, pa.string()),
            "revenue_e4": pa.array(g.rev.astype("int64"))})

    return joined.map_batches(fold_local, batch_format="pyarrow",
                              batch_size=None)


def bucketed_order_revenue_sql() -> str:
    return """
SELECT o.o_orderkey, o.o_orderpriority,
       sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                AS BIGINT)) AS revenue_e4
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, o.o_orderpriority"""


# ---------------------------------------------------------------------------
# TPC-H Q14 analog: promotion revenue share — session 9
# ---------------------------------------------------------------------------

Q14_YEAR = 1997
Q14_MONTH = 9


def promo_revenue_share(sf_dir: str, year: int = Q14_YEAR,
                        month: int = Q14_MONTH) -> rd.Dataset:
    """TPC-H Q14 analog (promotion effect): the share of one shipping
    month's revenue that came from PROMO-type parts. The canonical
    "big fact ⋈ dimension predicate → two global sums" shape, composed
    the scale-shaped way:

      part → broadcast SET of promo partkeys (part is a dimension;
        ray.put once, probed per batch — never a shuffle join)
      lineitem: the ship-month filter pushes map-side, then a per-block
        COMBINER folds each block to ONE (promo_e4, total_e4) partial
        row — the whole corpus reduces to n_blocks rows before the one
        constant-key groupby.

    Revenue integerizes per row (round(price·(1−disc)·1e4), the Q3
    convention) so both sums are exact BIGINT, and the share is
    integer parts-per-2^20 (promo·2^20 // total — exact in int64 up to
    ~2^43 revenue units; at 100 TB promote the fold to Python bigints
    the way bigram_lift does). Returns one row
    (promo_e4, total_e4, share_ppm)."""
    lo_day = int(np.datetime64(f"{year}-{month:02d}-01")
                 .astype("datetime64[D]").astype(np.int64))
    nxt_y, nxt_m = (year + 1, 1) if month == 12 else (year, month + 1)
    hi_day = int(np.datetime64(f"{nxt_y}-{nxt_m:02d}-01")
                 .astype("datetime64[D]").astype(np.int64))

    parts = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    promo = set(parts.loc[parts.p_type == "PROMO", "p_partkey"].astype(int))
    pref = ray.put(promo)

    def fold(t: pa.Table) -> pa.Table:
        ps = ray.get(pref)
        day = (t["l_shipdate"].combine_chunks().cast(pa.timestamp("us"))
               .cast(pa.int64()).to_numpy() // _DAY_US)
        mask = (day >= lo_day) & (day < hi_day)
        kept = t.filter(pa.array(mask))
        price = kept["l_extendedprice"].to_numpy()
        disc = kept["l_discount"].to_numpy()
        rev = np.round(price * (1.0 - disc) * 10000.0).astype(np.int64)
        pk = kept["l_partkey"].to_numpy(zero_copy_only=False)
        is_promo = np.fromiter((int(p) in ps for p in pk), bool, len(pk))
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "p": pa.array([int(rev[is_promo].sum())], pa.int64()),
            "t": pa.array([int(rev.sum())], pa.int64())})

    agg = (_read(sf_dir, "lineitem",
                 ["l_partkey", "l_extendedprice", "l_discount",
                  "l_shipdate"])
           .map_batches(fold, batch_format="pyarrow")
           .groupby("k")
           .aggregate(Sum("p", alias_name="promo_e4"),
                      Sum("t", alias_name="total_e4")))

    def share(t: pa.Table) -> pa.Table:
        p = int(t["promo_e4"][0].as_py())
        tot = int(t["total_e4"][0].as_py())
        return pa.table({
            "promo_e4": pa.array([p], pa.int64()),
            "total_e4": pa.array([tot], pa.int64()),
            "share_ppm": pa.array([(p << 20) // tot if tot else 0],
                                  pa.int64())})

    return agg.map_batches(share, batch_format="pyarrow")


def promo_revenue_share_sql(year: int = Q14_YEAR,
                            month: int = Q14_MONTH) -> str:
    nxt_y, nxt_m = (year + 1, 1) if month == 12 else (year, month + 1)
    return f"""
WITH f AS (
  SELECT CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
              AS BIGINT) AS rev,
         (p.p_type = 'PROMO') AS is_promo
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '{year}-{month:02d}-01'
    AND l.l_shipdate < TIMESTAMP '{nxt_y}-{nxt_m:02d}-01'
)
SELECT sum(CASE WHEN is_promo THEN rev ELSE 0 END) AS promo_e4,
       sum(rev) AS total_e4,
       (sum(CASE WHEN is_promo THEN rev ELSE 0 END) * 1048576)
         // sum(rev) AS share_ppm
FROM f"""


# ---------------------------------------------------------------------------
# TPC-H Q18 analog: large-volume customers (HAVING over a fact groupby)
# ---------------------------------------------------------------------------

Q18_QTY = 300


def large_volume_customers(sf_dir: str,
                           qty_threshold: int = Q18_QTY) -> rd.Dataset:
    """TPC-H Q18 analog (large-volume customers): orders whose total
    line quantity exceeds a threshold, with their customer and header.
    The canonical HAVING-over-a-fact-groupby, composed the scale-shaped
    way:

      lineitem → per-block (orderkey, qty) COMBINER → ONE groupby
        (ids+ints only ever shuffle) → the HAVING filter
      the survivors are PROVABLY small — at most Σqty/threshold orders
        (the threshold bounds the driver state by construction), so
        they broadcast as a dict and orders/customer attach MAP-SIDE:
        the big orders table never shuffles at all.

    Quantities are integral in this corpus (asserted in tests) and sum
    as exact int64; the order total integerizes to cents per row
    (round(·100), the repo convention — never a float compare).
    Returns (c_custkey, c_name, o_orderkey, odate_day, total_cents,
    sum_qty)."""
    def items_partial(t: pa.Table) -> pa.Table:
        qty = np.round(t["l_quantity"].to_numpy()).astype(np.int64)
        keys = t["l_orderkey"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(keys, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, qty)  # int64-exact
        return pa.table({
            "l_orderkey": pa.array(uniq.astype(np.int64), pa.int64()),
            "q": pa.array(sums, pa.int64())})

    big = (_read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
           .map_batches(items_partial, batch_format="pyarrow")
           .groupby("l_orderkey").aggregate(Sum("q", alias_name="sum_qty")))

    def having(t: pa.Table) -> pa.Table:
        q = t["sum_qty"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(q > qty_threshold))

    # ≤ Σqty/threshold rows by construction — safe to collect
    kept = big.map_batches(having, batch_format="pyarrow").to_pandas()
    qmap = {int(k): int(v) for k, v in
            zip(kept["l_orderkey"], kept["sum_qty"])}
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"]).to_pandas()
    cmap = {int(k): str(v) for k, v in zip(cust.c_custkey, cust.c_name)}
    qref, cref = ray.put(qmap), ray.put(cmap)

    def orders_f(t: pa.Table) -> pa.Table:
        qm, cm = ray.get(qref), ray.get(cref)
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False)
        mask = np.fromiter((int(k) in qm for k in ok), bool, len(ok))
        kept_o = t.filter(pa.array(mask))
        okey = kept_o["o_orderkey"].to_numpy(zero_copy_only=False)
        day = (kept_o["o_orderdate"].combine_chunks()
               .cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
               // _DAY_US)
        cents = np.round(kept_o["o_totalprice"].to_numpy()
                         * 100.0).astype(np.int64)
        ck = kept_o["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "c_custkey": pa.array(ck.astype(np.int64), pa.int64()),
            "c_name": pa.array([cm[int(c)] for c in ck], pa.string()),
            "o_orderkey": pa.array(okey.astype(np.int64), pa.int64()),
            "odate_day": pa.array(day.astype(np.int64), pa.int64()),
            "total_cents": pa.array(cents, pa.int64()),
            "sum_qty": pa.array([qm[int(k)] for k in okey], pa.int64())})

    return _read(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_orderdate",
                  "o_totalprice"]).map_batches(
        orders_f, batch_format="pyarrow")


def large_volume_customers_sql(qty_threshold: int = Q18_QTY) -> str:
    return f"""
WITH big AS (
  SELECT l_orderkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
           AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > {qty_threshold}
)
SELECT o.o_custkey AS c_custkey, c.c_name, o.o_orderkey,
       epoch_us(o.o_orderdate) // {_DAY_US} AS odate_day,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
       big.sum_qty
FROM big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey"""


# ---------------------------------------------------------------------------
# TPC-H Q10 analog: returned-item revenue report (top-k lost customers)
# ---------------------------------------------------------------------------

Q10_QUARTER = "1996-10-01"
Q10_TOPK = 20


def returned_item_report(sf_dir: str, quarter: str = Q10_QUARTER,
                         k: int = Q10_TOPK) -> rd.Dataset:
    """TPC-H Q10 analog (returned-item reporting): customers ranked by
    the revenue they returned (returnflag = 'R') against orders placed
    in one quarter — "who did we lose the most money on". Composed the
    scale-shaped way:

      orders: the quarter filter pushes map-side → (orderkey, custkey)
        ids only (the header never rides the shuffle)
      lineitem: returnflag filter map-side, per-block COMBINER to
        (orderkey, rev_e4) partials
      ONE hash_join on orderkey, ONE groupby(custkey), then the
        partial-top-k merge (per-block top-k, tiny final sort — never
        a global sort)
      names attach LAST: customer/nation broadcast dicts probe only
        the k winner rows.

    Revenue integerizes per row (the Q3 convention). Returns
    (c_custkey, c_name, n_name, revenue_e4, rank)."""
    from ..stages.joins import hash_join

    lo_day = int(np.datetime64(quarter).astype("datetime64[D]")
                 .astype(np.int64))
    lo = np.datetime64(quarter).astype("datetime64[M]")
    hi_day = int((lo + 3).astype("datetime64[D]").astype(np.int64))

    def orders_f(t: pa.Table) -> pa.Table:
        day = (t["o_orderdate"].combine_chunks().cast(pa.timestamp("us"))
               .cast(pa.int64()).to_numpy() // _DAY_US)
        kept = t.filter(pa.array((day >= lo_day) & (day < hi_day)))
        return pa.table({"o_orderkey": kept["o_orderkey"],
                         "o_custkey": kept["o_custkey"]})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        orders_f, batch_format="pyarrow")

    def items_partial(t: pa.Table) -> pa.Table:
        flag = t["l_returnflag"].to_numpy(zero_copy_only=False)
        kept = t.filter(pa.array(flag == "R"))
        price = kept["l_extendedprice"].to_numpy()
        disc = kept["l_discount"].to_numpy()
        rev = np.round(price * (1.0 - disc) * 10000.0).astype(np.int64)
        keys = kept["l_orderkey"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(keys, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, rev)  # int64-exact (bincount weights
        # would round through float64 past 2^53)
        return pa.table({
            "l_orderkey": pa.array(uniq.astype(np.int64), pa.int64()),
            "r": pa.array(sums, pa.int64())})

    # pin: hash_join probes schema() and would re-execute this whole
    # read+combiner+shuffle lineage a second time (its docstring note)
    items = (_read(sf_dir, "lineitem",
                   ["l_orderkey", "l_returnflag", "l_extendedprice",
                    "l_discount"])
             .map_batches(items_partial, batch_format="pyarrow")
             .groupby("l_orderkey").aggregate(Sum("r", alias_name="rev"))
             .materialize())

    joined = hash_join(items, orders, "l_orderkey", "o_orderkey",
                       ["rev"], ["o_custkey"], how="inner")
    per_cust = (joined.groupby("o_custkey")
                .aggregate(Sum("rev", alias_name="revenue_e4")))

    def partial_topk(t: pa.Table) -> pa.Table:
        rev = t["revenue_e4"].to_numpy(zero_copy_only=False)
        keys = t["o_custkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, -rev))[:k]
        return t.take(pa.array(order))

    merged = (per_cust.map_batches(partial_topk, batch_format="pyarrow")
              .sort(["revenue_e4", "o_custkey"], descending=[True, False])
              .limit(k))

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nmap = {int(k_): str(v) for k_, v in zip(nat.n_nationkey, nat.n_name)}
    cmap = {int(k_): (str(nm), nmap[int(nk)]) for k_, nm, nk in
            zip(cust.c_custkey, cust.c_name, cust.c_nationkey)}
    cref = ray.put(cmap)

    def finish(t: pa.Table) -> pa.Table:
        cm = ray.get(cref)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        names = [cm[int(c)] for c in ck]
        return pa.table({
            "c_custkey": pa.array(ck.astype(np.int64), pa.int64()),
            "c_name": pa.array([n for n, _ in names], pa.string()),
            "n_name": pa.array([n for _, n in names], pa.string()),
            "revenue_e4": t["revenue_e4"],
            "rank": pa.array(np.arange(1, t.num_rows + 1, dtype=np.int64)),
        })

    # the limit(k) output is a single tiny block; rank is its position
    return merged.repartition(1).map_batches(finish, batch_format="pyarrow")


def returned_item_report_sql(quarter: str = Q10_QUARTER,
                             k: int = Q10_TOPK) -> str:
    y, m, _ = quarter.split("-")
    mm = int(m) + 3
    nxt = f"{int(y) + 1}-{mm - 12:02d}-01" if mm > 12 else f"{y}-{mm:02d}-01"
    return f"""
WITH j AS (
  SELECT o.o_custkey AS c_custkey,
         sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                  AS BIGINT)) AS revenue_e4
  FROM orders o
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate >= TIMESTAMP '{quarter}'
    AND o.o_orderdate < TIMESTAMP '{nxt}'
    AND l.l_returnflag = 'R'
  GROUP BY o.o_custkey
)
SELECT j.c_custkey, c.c_name, n.n_name, j.revenue_e4,
       CAST(row_number() OVER (ORDER BY j.revenue_e4 DESC, j.c_custkey)
            AS BIGINT) AS rank
FROM j
JOIN customer c ON c.c_custkey = j.c_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
QUALIFY rank <= {k}"""


# ---------------------------------------------------------------------------
# TPC-H Q8 analog: national market share (session 9)
# ---------------------------------------------------------------------------

Q8_REGION = "ASIA"
Q8_NATION = "NATION_2"
Q8_PTYPE = "PROMO"
Q8_YEARS = (1996, 1997)


def nation_market_share(sf_dir: str, region: str = Q8_REGION,
                        nation: str = Q8_NATION,
                        ptype: str = Q8_PTYPE,
                        years: tuple = Q8_YEARS) -> rd.Dataset:
    """TPC-H Q8 analog (national market share): within one region's
    market for one part type across two order years, the revenue share
    supplied by one nation, per year. The ratio-per-group sibling of
    Q5, composed the scale-shaped way:

      part / customer / supplier reduce to broadcast structures (promo
        partkey SET, region-restricted custkey SET, suppkey →
        is-target-nation DICT)
      orders: year + region-customer filters map-side → (orderkey,
        year) ids only
      lineitem: part filter map-side, per-block COMBINER to
        (orderkey, tgt_e4, tot_e4) partials
      ONE hash_join on orderkey, ONE ≤|years|-row groupby, share_ppm =
        tgt·2^20 // tot exactly.

    Returns (o_year, tgt_e4, total_e4, share_ppm)."""
    from ..stages.joins import hash_join

    lo_day = int(np.datetime64(f"{years[0]}-01-01")
                 .astype("datetime64[D]").astype(np.int64))
    hi_day = int(np.datetime64(f"{years[1] + 1}-01-01")
                 .astype("datetime64[D]").astype(np.int64))

    parts = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    promo = set(parts.loc[parts.p_type == ptype, "p_partkey"].astype(int))
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rkeys = set(reg.loc[reg.r_name == region, "r_regionkey"].astype(int))
    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    region_nats = set(nat.loc[nat.n_regionkey.astype(int).isin(rkeys),
                              "n_nationkey"].astype(int))
    target_nat = set(nat.loc[nat.n_name == nation,
                             "n_nationkey"].astype(int))
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).to_pandas()
    ckeys = set(cust.loc[cust.c_nationkey.astype(int).isin(region_nats),
                         "c_custkey"].astype(int))
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    stgt = {int(k): int(n) in target_nat
            for k, n in zip(sup.s_suppkey, sup.s_nationkey)}
    pref, cref, sref = ray.put(promo), ray.put(ckeys), ray.put(stgt)

    def orders_f(t: pa.Table) -> pa.Table:
        cs = ray.get(cref)
        day = (t["o_orderdate"].combine_chunks().cast(pa.timestamp("us"))
               .cast(pa.int64()).to_numpy() // _DAY_US)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        mask = (day >= lo_day) & (day < hi_day) & np.fromiter(
            (int(c) in cs for c in ck), bool, len(ck))
        kept = t.filter(pa.array(mask))
        yr = (kept["o_orderdate"].combine_chunks()
              .cast(pa.timestamp("us")).to_pandas().dt.year
              .to_numpy(np.int64))
        return pa.table({"o_orderkey": kept["o_orderkey"],
                         "o_year": pa.array(yr, pa.int64())})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        orders_f, batch_format="pyarrow")

    def items_partial(t: pa.Table) -> pa.Table:
        ps, sm = ray.get(pref), ray.get(sref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        mask = np.fromiter((int(p) in ps for p in pk), bool, len(pk))
        kept = t.filter(pa.array(mask))
        price = kept["l_extendedprice"].to_numpy()
        disc = kept["l_discount"].to_numpy()
        rev = np.round(price * (1.0 - disc) * 10000.0).astype(np.int64)
        sk = kept["l_suppkey"].to_numpy(zero_copy_only=False)
        tgt = np.fromiter((sm.get(int(s), False) for s in sk),
                          bool, len(sk))
        okey = kept["l_orderkey"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(okey, return_inverse=True)
        tsum = np.zeros(len(uniq), np.int64)
        np.add.at(tsum, inv, rev * tgt)  # int64-exact
        asum = np.zeros(len(uniq), np.int64)
        np.add.at(asum, inv, rev)
        return pa.table({
            "l_orderkey": pa.array(uniq.astype(np.int64), pa.int64()),
            "t": pa.array(tsum, pa.int64()),
            "a": pa.array(asum, pa.int64())})

    # pin: hash_join probes schema() and would re-execute this whole
    # read+combiner+shuffle lineage a second time (its docstring note)
    items = (_read(sf_dir, "lineitem",
                   ["l_orderkey", "l_partkey", "l_suppkey",
                    "l_extendedprice", "l_discount"])
             .map_batches(items_partial, batch_format="pyarrow")
             .groupby("l_orderkey")
             .aggregate(Sum("t", alias_name="tgt"),
                        Sum("a", alias_name="tot"))
             .materialize())

    joined = hash_join(items, orders, "l_orderkey", "o_orderkey",
                       ["tgt", "tot"], ["o_year"], how="inner")
    agg = (joined.groupby("o_year")
           .aggregate(Sum("tgt", alias_name="tgt_e4"),
                      Sum("tot", alias_name="total_e4")))

    def share(t: pa.Table) -> pa.Table:
        tg = t["tgt_e4"].to_numpy(zero_copy_only=False)
        tot = t["total_e4"].to_numpy(zero_copy_only=False)
        ppm = np.where(tot > 0, (tg.astype(object) * (1 << 20)) // np.maximum(tot, 1), 0)
        return pa.table({"o_year": t["o_year"],
                         "tgt_e4": t["tgt_e4"],
                         "total_e4": t["total_e4"],
                         "share_ppm": pa.array(
                             [int(x) for x in ppm], pa.int64())})

    return agg.map_batches(share, batch_format="pyarrow")


def nation_market_share_sql(region: str = Q8_REGION,
                            nation: str = Q8_NATION,
                            ptype: str = Q8_PTYPE,
                            years: tuple = Q8_YEARS) -> str:
    return f"""
WITH f AS (
  SELECT year(o.o_orderdate) AS o_year,
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
              AS BIGINT) AS rev,
         (sn.n_name = '{nation}') AS is_tgt
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = cn.n_regionkey
  WHERE p.p_type = '{ptype}' AND r.r_name = '{region}'
    AND o.o_orderdate >= TIMESTAMP '{years[0]}-01-01'
    AND o.o_orderdate < TIMESTAMP '{years[1] + 1}-01-01'
)
SELECT CAST(o_year AS BIGINT) AS o_year,
       sum(CASE WHEN is_tgt THEN rev ELSE 0 END) AS tgt_e4,
       sum(rev) AS total_e4,
       CAST(sum(CASE WHEN is_tgt THEN rev ELSE 0 END) * 1048576
            // sum(rev) AS BIGINT) AS share_ppm
FROM f GROUP BY o_year"""


# ---------------------------------------------------------------------------
# open_orders_daily — sweep-line interval counting (session 9)
# ---------------------------------------------------------------------------


def open_orders_daily(sf_dir: str) -> rd.Dataset:
    """Operational backlog curve — for every day, how many orders are
    OPEN (placed, not yet fully shipped): the interval-stabbing count
    behind concurrency / WIP / occupancy dashboards, computed as a
    SWEEP LINE instead of a day × order join:

      lineitem → per-block (orderkey, max ship day) combiner → ONE
        groupby(orderkey) Max (ids+ints only)
      ONE hash_join attaches the order date; each order emits TWO
        delta rows (+1 at start, −1 at end+1) — the difference array
      a ≤|days|-row groupby folds deltas per day, and the running sum
        over the zero-filled day spine runs on the driver (O(span)
        rows — ~2.5k days here; the wau_daily spine convention).

    An order with no line items never opens (inner semantics — the
    oracle joins the same way), and an INVERTED interval (max ship day
    before the order day — this synthetic corpus has ~20% of them)
    counts as open on NO day, exactly like the oracle's BETWEEN: its
    deltas must not emit (a naive ±1 pair would subtract 1 from every
    day between them), though it still widens the day spine. Returns
    (day, n_open)."""
    from ..stages.joins import hash_join

    def items_partial(t: pa.Table) -> pa.Table:
        day = (t["l_shipdate"].combine_chunks().cast(pa.timestamp("us"))
               .cast(pa.int64()).to_numpy() // _DAY_US)
        keys = t["l_orderkey"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(keys, return_inverse=True)
        mx = np.full(len(uniq), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, day)
        return pa.table({
            "l_orderkey": pa.array(uniq.astype(np.int64), pa.int64()),
            "ed": pa.array(mx, pa.int64())})

    ends = (_read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
            .map_batches(items_partial, batch_format="pyarrow")
            .groupby("l_orderkey").aggregate(Max("ed", alias_name="ed"))
            .materialize())  # hash_join schema probe re-executes lineage

    def orders_f(t: pa.Table) -> pa.Table:
        day = (t["o_orderdate"].combine_chunks().cast(pa.timestamp("us"))
               .cast(pa.int64()).to_numpy() // _DAY_US)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "sd": pa.array(day.astype(np.int64), pa.int64())})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate"]).map_batches(
        orders_f, batch_format="pyarrow")
    iv = hash_join(ends, orders, "l_orderkey", "o_orderkey",
                   ["ed"], ["sd"], how="inner").materialize()

    # spine bounds over ALL intervals (inverted ones widen the spine
    # but contribute no deltas — BETWEEN semantics)
    def bounds(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        sd = t["sd"].to_numpy(zero_copy_only=False)
        ed = t["ed"].to_numpy(zero_copy_only=False)
        return pa.table({"lo": pa.array([int(sd.min())], pa.int64()),
                         "hi": pa.array([int(ed.max())], pa.int64())})

    brows = iv.map_batches(bounds, batch_format="pyarrow").to_pandas()
    if not len(brows):
        raise ValueError("no order intervals: empty join input")
    lo, hi = int(brows.lo.min()), int(brows.hi.max())

    def deltas(t: pa.Table) -> pa.Table:
        sd = t["sd"].to_numpy(zero_copy_only=False)
        ed = t["ed"].to_numpy(zero_copy_only=False)
        ok = ed >= sd
        sd, ed = sd[ok], ed[ok]
        days = np.concatenate([sd, ed + 1])
        dd = np.concatenate([np.ones(len(sd), np.int64),
                             -np.ones(len(ed), np.int64)])
        uniq, inv = np.unique(days, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, dd)
        return pa.table({"day": pa.array(uniq.astype(np.int64), pa.int64()),
                         "d": pa.array(sums, pa.int64())})

    folded = (iv.map_batches(deltas, batch_format="pyarrow")
              .groupby("day").aggregate(Sum("d", alias_name="d"))
              .to_pandas().sort_values("day"))  # O(day span) rows
    days = folded.day.to_numpy(np.int64) if len(folded) else \
        np.array([], np.int64)
    dsum = folded.d.to_numpy(np.int64) if len(folded) else \
        np.array([], np.int64)
    spine = np.arange(lo, hi + 1, dtype=np.int64)
    delta_full = np.zeros(len(spine), np.int64)
    in_range = days <= hi
    delta_full[days[in_range] - lo] = dsum[in_range]
    n_open = np.cumsum(delta_full)
    return rd.from_arrow(pa.table({
        "day": pa.array(spine, pa.int64()),
        "n_open": pa.array(n_open, pa.int64())}))


def open_orders_daily_sql() -> str:
    return f"""
WITH o AS (
  SELECT o_orderkey, epoch_us(o_orderdate) // {_DAY_US} AS sd FROM orders
), e AS (
  SELECT l_orderkey, max(epoch_us(l_shipdate) // {_DAY_US}) AS ed
  FROM lineitem GROUP BY l_orderkey
), iv AS (
  SELECT o.sd, e.ed FROM o JOIN e ON e.l_orderkey = o.o_orderkey
), spine AS (
  SELECT unnest(range((SELECT min(sd) FROM iv),
                      (SELECT max(ed) FROM iv) + 1)) AS day
)
SELECT s.day, CAST(count(iv.sd) AS BIGINT) AS n_open
FROM spine s LEFT JOIN iv ON s.day BETWEEN iv.sd AND iv.ed
GROUP BY s.day"""


# ---------------------------------------------------------------------------
# TPC-H completion set (session 10): Q4 / Q6 / Q13 / Q17 / Q19 / Q22 / Q7
# analogs over the available columns (no partsupp / commitdate /
# shipmode in the test tables — predicates adapted, shapes preserved).
# Reference parity: the reference's corpus-stats endpoints are grouped
# counts over one table (app/routers/stats.py); these carry the same
# aggregate semantics into the multi-table shapes a warehouse needs.
# ---------------------------------------------------------------------------

Q6_SHIP_LO = "1997-01-01"
Q6_SHIP_HI = "1998-01-01"


def _day_col(t: pa.Table, col: str) -> np.ndarray:
    return (t[col].combine_chunks().cast(pa.timestamp("us"))
            .cast(pa.int64()).to_numpy() // _DAY_US)


def forecast_revenue(sf_dir: str) -> rd.Dataset:
    """TPC-H Q6 analog (forecast revenue change): one-table map-side
    filter (ship year, discount band, quantity cap) + per-block
    two-sum combiner + ONE constant-key fold — the minimal
    filter-aggregate every warehouse benchmarks first. Revenue
    integerizes per row (round(price·disc·1e4), the Q3 convention) so
    the sum is exact BIGINT in both engines."""
    lo = int(np.datetime64(Q6_SHIP_LO).astype("datetime64[D]").astype(np.int64))
    hi = int(np.datetime64(Q6_SHIP_HI).astype("datetime64[D]").astype(np.int64))

    def partial(t: pa.Table) -> pa.Table:
        day = _day_col(t, "l_shipdate")
        disc100 = np.round(t["l_discount"].to_numpy() * 100.0).astype(np.int64)
        qty = t["l_quantity"].to_numpy()
        mask = ((day >= lo) & (day < hi) & (disc100 >= 5) & (disc100 <= 7)
                & (qty < 24))
        price = t["l_extendedprice"].to_numpy()[mask]
        disc = t["l_discount"].to_numpy()[mask]
        rev = np.round(price * disc * 10000.0).astype(np.int64)
        return pa.table({"k": pa.array([0], pa.int64()),
                         "revenue_e4": pa.array([int(rev.sum())], pa.int64()),
                         "n_items": pa.array([int(mask.sum())], pa.int64())})

    ds = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])
    folded = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("k").aggregate(Sum("revenue_e4", alias_name="revenue_e4"),
                                      Sum("n_items", alias_name="n_items")))

    def drop_k(t: pa.Table) -> pa.Table:
        return t.select(["revenue_e4", "n_items"])

    return folded.map_batches(drop_k, batch_format="pyarrow")


def forecast_revenue_sql() -> str:
    return f"""
SELECT CAST(coalesce(sum(CAST(round(l_extendedprice * l_discount * 10000)
                              AS BIGINT)), 0) AS BIGINT) AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_SHIP_LO}'
  AND l_shipdate < TIMESTAMP '{Q6_SHIP_HI}'
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24"""


Q4_GAP_DAYS = 365


def late_order_priority_counts(sf_dir: str,
                               gap_days: int = Q4_GAP_DAYS) -> rd.Dataset:
    """TPC-H Q4 analog (order priority checking): orders with at least
    one lineitem shipped more than ``gap_days`` after the order date,
    counted by priority. EXISTS(late item) folds to
    max(shipdate) > orderdate + gap, so the plan is a per-block
    (orderkey, max shipday) combiner → ONE groupby(orderkey) Max →
    ONE hash_join to the order header → map filter → tiny priority
    count — the semi-join-with-inequality shape expressed as
    aggregate-then-join (the all-row semi join would carry every
    lineitem through the exchange)."""
    from ..stages.joins import hash_join

    def li_partial(t: pa.Table) -> pa.Table:
        day = _day_col(t, "l_shipdate")
        keys = t["l_orderkey"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(keys, return_inverse=True)
        mx = np.full(len(uniq), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, day)
        return pa.table({"l_orderkey": pa.array(uniq.astype(np.int64)),
                         "msd": pa.array(mx, pa.int64())})

    maxship = (_read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
               .map_batches(li_partial, batch_format="pyarrow")
               .groupby("l_orderkey").aggregate(Max("msd", alias_name="msd"))
               .materialize())

    def o_proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "oday": pa.array(_day_col(t, "o_orderdate").astype(np.int64),
                             pa.int64()),
            "o_orderpriority": t["o_orderpriority"]})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"]
                   ).map_batches(o_proj, batch_format="pyarrow")
    joined = hash_join(maxship, orders, "l_orderkey", "o_orderkey",
                       ["msd"], ["oday", "o_orderpriority"], how="inner")

    def late_counts(t: pa.Table) -> pa.Table:
        msd = t["msd"].combine_chunks().cast(pa.int64()).to_numpy()
        oday = t["oday"].combine_chunks().cast(pa.int64()).to_numpy()
        kept = t.filter(pa.array(msd > oday + gap_days))
        if not kept.num_rows:  # typed empty (schema survives the union)
            return pa.table({"o_orderpriority": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        df = (kept.select(["o_orderpriority"]).to_pandas()
              .groupby("o_orderpriority", as_index=False).size()
              .rename(columns={"size": "n"}))
        df["n"] = df["n"].astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (joined.map_batches(late_counts, batch_format="pyarrow")
            .groupby("o_orderpriority")
            .aggregate(Sum("n", alias_name="n_late_orders")))


def late_order_priority_counts_sql(gap_days: int = Q4_GAP_DAYS) -> str:
    return f"""
WITH m AS (
  SELECT l_orderkey, max(epoch_us(l_shipdate) // {_DAY_US}) AS msd
  FROM lineitem GROUP BY l_orderkey
)
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_late_orders
FROM m JOIN orders o ON o.o_orderkey = m.l_orderkey
WHERE m.msd > epoch_us(o.o_orderdate) // {_DAY_US} + {gap_days}
GROUP BY o.o_orderpriority"""


def customer_order_counts_hist(sf_dir: str) -> rd.Dataset:
    """TPC-H Q13 analog (customer order-count distribution): how many
    customers placed exactly N qualifying orders — INCLUDING the
    zero-order customers a plain join silently drops. Plan: per-block
    (custkey, partial count) combiner over the filtered orders → ONE
    groupby(custkey) Sum → LEFT hash_join from the customer id list
    (null → 0) → per-block histogram combiner → tiny
    groupby(n_orders). The left join is the whole point: correctness
    of the zero bucket rides the outer-join null handling."""
    from ..stages.joins import hash_join

    def o_partial(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.not_equal(t["o_orderstatus"], "P"))
        keys = kept["o_custkey"].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(keys, return_counts=True)
        return pa.table({"o_custkey": pa.array(uniq.astype(np.int64)),
                         "n": pa.array(counts.astype(np.int64), pa.int64())})

    counts = (_read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
              .map_batches(o_partial, batch_format="pyarrow")
              .groupby("o_custkey").aggregate(Sum("n", alias_name="n"))
              .materialize())
    cust = _read(sf_dir, "customer", ["c_custkey"])
    joined = hash_join(cust, counts, "c_custkey", "o_custkey",
                       [], ["n"], how="left")

    def hist_partial(t: pa.Table) -> pa.Table:
        n = t["n"].combine_chunks().cast(pa.int64()).to_numpy()
        uniq, counts = np.unique(n, return_counts=True)
        return pa.table({"n_orders": pa.array(uniq.astype(np.int64)),
                         "c": pa.array(counts.astype(np.int64), pa.int64())})

    def null_to_zero(t: pa.Table) -> pa.Table:
        n = pc.coalesce(t["n"].combine_chunks().cast(pa.int64()),
                        pa.scalar(0, pa.int64()))
        return pa.table({"n": n})

    return (joined.map_batches(null_to_zero, batch_format="pyarrow")
            .map_batches(hist_partial, batch_format="pyarrow")
            .groupby("n_orders")
            .aggregate(Sum("c", alias_name="n_customers")))


def customer_order_counts_hist_sql() -> str:
    return """
WITH cnt AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
  FROM orders WHERE o_orderstatus <> 'P' GROUP BY o_custkey
)
SELECT coalesce(cnt.n, 0) AS n_orders,
       CAST(count(*) AS BIGINT) AS n_customers
FROM customer c LEFT JOIN cnt ON cnt.o_custkey = c.c_custkey
GROUP BY 1"""


Q22_CUTOFF = "2001-01-01"


def idle_customer_balance(sf_dir: str,
                          cutoff: str = Q22_CUTOFF) -> rd.Dataset:
    """TPC-H Q22 analog (global sales opportunity): high-balance
    customers with NO recent order, grouped by nation. The
    above-average predicate stays integer-exact by cross-multiplying
    (bal_cents · n_pos > sum_pos_cents — never a float division), the
    positive-balance scalar is a two-int per-block fold (O(1) driver
    state), and the recency test is an ANTI hash_join against the
    recent-order custkeys (per-block distinct sheds duplicates before
    the exchange — never a driver-resident key set; customer and
    orders both scale with SF)."""
    from ..stages.joins import hash_join

    cut_day = int(np.datetime64(cutoff).astype("datetime64[D]")
                  .astype(np.int64))

    def bal_proj(t: pa.Table) -> pa.Table:
        cents = np.round(t["c_acctbal"].to_numpy() * 100.0).astype(np.int64)
        return pa.table({"c_custkey": t["c_custkey"],
                         "c_nationkey": t["c_nationkey"],
                         "bal_cents": pa.array(cents, pa.int64())})

    cust = (_read(sf_dir, "customer",
                  ["c_custkey", "c_nationkey", "c_acctbal"])
            .map_batches(bal_proj, batch_format="pyarrow").materialize())

    def pos_partial(t: pa.Table) -> pa.Table:
        b = t["bal_cents"].to_numpy()
        pos = b[b > 0]
        return pa.table({"s": pa.array([int(pos.sum())], pa.int64()),
                         "n": pa.array([len(pos)], pa.int64())})

    folded = (cust.map_batches(pos_partial, batch_format="pyarrow")
              .to_pandas())
    sum_pos, n_pos = int(folded.s.sum()), int(folded.n.sum())

    def rich(t: pa.Table) -> pa.Table:
        b = t["bal_cents"].to_numpy()
        return t.filter(pa.array(b * n_pos > sum_pos))

    def recent_keys(t: pa.Table) -> pa.Table:
        day = _day_col(t, "o_orderdate")
        kept = t.filter(pa.array(day >= cut_day))
        return pa.table({"o_custkey": pc.unique(kept["o_custkey"])})

    recent = (_read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
              .map_batches(recent_keys, batch_format="pyarrow"))
    idle = hash_join(cust.map_batches(rich, batch_format="pyarrow"),
                     recent, "c_custkey", "o_custkey",
                     ["c_nationkey", "bal_cents"], [], how="anti")

    def nat_partial(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].combine_chunks().cast(pa.int64()).to_numpy()
        bal = t["bal_cents"].combine_chunks().cast(pa.int64()).to_numpy()
        uniq, inv = np.unique(nk, return_inverse=True)
        s = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, bal)
        c = np.zeros(len(uniq), np.int64)
        np.add.at(c, inv, 1)
        return pa.table({"c_nationkey": pa.array(uniq.astype(np.int64)),
                         "nc": pa.array(c, pa.int64()),
                         "sb": pa.array(s, pa.int64())})

    return (idle.map_batches(nat_partial, batch_format="pyarrow")
            .groupby("c_nationkey")
            .aggregate(Sum("nc", alias_name="n_customers"),
                       Sum("sb", alias_name="sum_bal_cents")))


def idle_customer_balance_sql(cutoff: str = Q22_CUTOFF) -> str:
    return f"""
WITH cents AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
), tot AS (
  SELECT CAST(sum(bal_cents) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM cents WHERE bal_cents > 0
), recent AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '{cutoff}'
)
SELECT c.c_nationkey,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(c.bal_cents) AS BIGINT) AS sum_bal_cents
FROM cents c, tot
WHERE c.bal_cents * tot.n > tot.s
  AND NOT EXISTS (SELECT 1 FROM recent r
                  WHERE r.o_custkey = c.c_custkey)
GROUP BY c.c_nationkey"""


Q17_BRAND = "Brand#23"


def small_quantity_revenue(sf_dir: str,
                           brand: str = Q17_BRAND) -> rd.Dataset:
    """TPC-H Q17 analog (small-quantity-order revenue): revenue from
    lineitems whose quantity is under 20% of their part's average,
    restricted to one brand. The correlated avg becomes a per-part
    (sum_qty, n) combiner groupby over the brand-filtered items, the
    brand restriction is a SEMI hash_join (part scales with SF — never
    a driver key set), and the threshold compares integers cross-
    multiplied (5·qty·n < sum_qty). One row out: total and per-week
    revenue in exact cents."""
    from ..stages.joins import hash_join

    def brand_keys(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.equal(t["p_brand"], brand))
        return pa.table({"p_partkey": kept["p_partkey"]})

    bkeys = _read(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        brand_keys, batch_format="pyarrow")

    def li_proj(t: pa.Table) -> pa.Table:
        qty = np.round(t["l_quantity"].to_numpy()).astype(np.int64)
        cents = np.round(t["l_extendedprice"].to_numpy() * 100.0
                         ).astype(np.int64)
        return pa.table({"l_partkey": t["l_partkey"],
                         "qty": pa.array(qty, pa.int64()),
                         "price_e2": pa.array(cents, pa.int64())})

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"]).map_batches(
        li_proj, batch_format="pyarrow")
    filtered = hash_join(li, bkeys, "l_partkey", "p_partkey",
                         ["qty", "price_e2"], [], how="semi").materialize()

    def stat_partial(t: pa.Table) -> pa.Table:
        keys = t["l_partkey"].combine_chunks().cast(pa.int64()).to_numpy()
        qty = t["qty"].combine_chunks().cast(pa.int64()).to_numpy()
        uniq, inv = np.unique(keys, return_inverse=True)
        s = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, qty)
        c = np.zeros(len(uniq), np.int64)
        np.add.at(c, inv, 1)
        return pa.table({"l_partkey": pa.array(uniq.astype(np.int64)),
                         "sq": pa.array(s, pa.int64()),
                         "nl": pa.array(c, pa.int64())})

    stats = (filtered.map_batches(stat_partial, batch_format="pyarrow")
             .groupby("l_partkey")
             .aggregate(Sum("sq", alias_name="sum_qty"),
                        Sum("nl", alias_name="n_li")).materialize())
    joined = hash_join(filtered, stats, "l_partkey", "l_partkey",
                       ["qty", "price_e2"], ["sum_qty", "n_li"],
                       how="inner")

    def fold(t: pa.Table) -> pa.Table:
        qty = t["qty"].combine_chunks().cast(pa.int64()).to_numpy()
        sq = t["sum_qty"].combine_chunks().cast(pa.int64()).to_numpy()
        nl = t["n_li"].combine_chunks().cast(pa.int64()).to_numpy()
        price = t["price_e2"].combine_chunks().cast(pa.int64()).to_numpy()
        mask = 5 * qty * nl < sq
        return pa.table({"k": pa.array([0], pa.int64()),
                         "revenue_e2": pa.array([int(price[mask].sum())],
                                                pa.int64()),
                         "n_items": pa.array([int(mask.sum())], pa.int64())})

    folded = (joined.map_batches(fold, batch_format="pyarrow")
              .groupby("k").aggregate(Sum("revenue_e2",
                                          alias_name="revenue_e2"),
                                      Sum("n_items", alias_name="n_items")))

    def finish(t: pa.Table) -> pa.Table:
        rev = t["revenue_e2"].combine_chunks().cast(pa.int64())
        return pa.table({
            "revenue_e2": rev,
            "n_items": t["n_items"].combine_chunks().cast(pa.int64()),
            "weekly_revenue_e2": pc.divide(rev, pa.scalar(7, pa.int64()))})

    return folded.map_batches(finish, batch_format="pyarrow")


def small_quantity_revenue_sql(brand: str = Q17_BRAND) -> str:
    return f"""
WITH li AS (
  SELECT l.l_partkey, CAST(round(l.l_quantity) AS BIGINT) AS qty,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS price_e2
  FROM lineitem l
  WHERE EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey
                AND p.p_brand = '{brand}')
), st AS (
  SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS sum_qty,
         CAST(count(*) AS BIGINT) AS n_li
  FROM li GROUP BY l_partkey
), f AS (
  SELECT li.price_e2
  FROM li JOIN st ON st.l_partkey = li.l_partkey
  WHERE 5 * li.qty * st.n_li < st.sum_qty
)
SELECT CAST(coalesce(sum(price_e2), 0) AS BIGINT) AS revenue_e2,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(coalesce(sum(price_e2), 0) // 7 AS BIGINT)
         AS weekly_revenue_e2
FROM f"""


Q19_BANDS = (("Brand#12", 1, 11, 1, 5),
             ("Brand#23", 10, 20, 1, 10),
             ("Brand#34", 20, 30, 1, 15))


def disjunctive_revenue(sf_dir: str) -> rd.Dataset:
    """TPC-H Q19 analog (discounted revenue, disjunctive predicate):
    revenue over an OR of three (brand, quantity band, size band)
    conjunctions — the predicate shape that defeats naive pushdown.
    ONE big-big hash_join attaches the two part attributes, the OR
    evaluates vectorized per block, then a two-sum constant fold."""
    from ..stages.joins import hash_join

    def part_proj(t: pa.Table) -> pa.Table:
        return t.select(["p_partkey", "p_brand", "p_size"])

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]
                 ).map_batches(part_proj, batch_format="pyarrow")

    def li_proj(t: pa.Table) -> pa.Table:
        qty = np.round(t["l_quantity"].to_numpy()).astype(np.int64)
        price = t["l_extendedprice"].to_numpy()
        disc = t["l_discount"].to_numpy()
        rev = np.round(price * (1.0 - disc) * 10000.0).astype(np.int64)
        return pa.table({"l_partkey": t["l_partkey"],
                         "qty": pa.array(qty, pa.int64()),
                         "rev_e4": pa.array(rev, pa.int64())})

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
               ).map_batches(li_proj, batch_format="pyarrow")
    joined = hash_join(li, part, "l_partkey", "p_partkey",
                       ["qty", "rev_e4"], ["p_brand", "p_size"],
                       how="inner")

    def fold(t: pa.Table) -> pa.Table:
        qty = t["qty"].combine_chunks().cast(pa.int64()).to_numpy()
        size = t["p_size"].combine_chunks().cast(pa.int64()).to_numpy()
        brand = np.asarray(t["p_brand"].to_pylist())
        rev = t["rev_e4"].combine_chunks().cast(pa.int64()).to_numpy()
        mask = np.zeros(len(qty), bool)
        for b, qlo, qhi, slo, shi in Q19_BANDS:
            mask |= ((brand == b) & (qty >= qlo) & (qty <= qhi)
                     & (size >= slo) & (size <= shi))
        return pa.table({"k": pa.array([0], pa.int64()),
                         "revenue_e4": pa.array([int(rev[mask].sum())],
                                                pa.int64()),
                         "n_items": pa.array([int(mask.sum())], pa.int64())})

    def drop_k(t: pa.Table) -> pa.Table:
        return t.select(["revenue_e4", "n_items"])

    return (joined.map_batches(fold, batch_format="pyarrow")
            .groupby("k").aggregate(Sum("revenue_e4",
                                        alias_name="revenue_e4"),
                                    Sum("n_items", alias_name="n_items"))
            .map_batches(drop_k, batch_format="pyarrow"))


def disjunctive_revenue_sql() -> str:
    ors = " OR ".join(
        f"(p.p_brand = '{b}' AND li.qty BETWEEN {qlo} AND {qhi}"
        f" AND p.p_size BETWEEN {slo} AND {shi})"
        for b, qlo, qhi, slo, shi in Q19_BANDS)
    return f"""
WITH li AS (
  SELECT l_partkey, CAST(round(l_quantity) AS BIGINT) AS qty,
         CAST(round(l_extendedprice * (1 - l_discount) * 10000)
              AS BIGINT) AS rev_e4
  FROM lineitem
)
SELECT CAST(coalesce(sum(li.rev_e4), 0) AS BIGINT) AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_items
FROM li JOIN part p ON p.p_partkey = li.l_partkey
WHERE {ors}"""


def nation_pair_volume(sf_dir: str) -> rd.Dataset:
    """TPC-H Q7 analog (volume shipping between nations): revenue by
    (supplier nation, customer nation, ship year) for cross-nation
    trade — the canonical 3-fact-join chain (lineitem→supplier,
    →orders, →customer), every join a big-big hash_join (supplier and
    customer both scale with SF), each intermediate pinned so the next
    join's schema probe never re-runs a shuffle. The final aggregate
    packs (s_nation, c_nation, year) into ONE int64 key so a single
    combiner groupby carries it, and the 25-row nation-name dimension
    broadcasts at the end (the one legitimately tiny dim)."""
    from ..stages.joins import hash_join

    def li_proj(t: pa.Table) -> pa.Table:
        price = t["l_extendedprice"].to_numpy()
        disc = t["l_discount"].to_numpy()
        rev = np.round(price * (1.0 - disc) * 10000.0).astype(np.int64)
        yr = pc.year(t["l_shipdate"].combine_chunks().cast(
            pa.timestamp("us"))).cast(pa.int64())
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"],
                         "rev_e4": pa.array(rev, pa.int64()),
                         "year": yr})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount", "l_shipdate"]
               ).map_batches(li_proj, batch_format="pyarrow")
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    j1 = hash_join(li, supp, "l_suppkey", "s_suppkey",
                   ["l_orderkey", "rev_e4", "year"], ["s_nationkey"],
                   how="inner").materialize()
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    j2 = hash_join(j1, orders, "l_orderkey", "o_orderkey",
                   ["rev_e4", "year", "s_nationkey"], ["o_custkey"],
                   how="inner").materialize()
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j3 = hash_join(j2, cust, "o_custkey", "c_custkey",
                   ["rev_e4", "year", "s_nationkey"], ["c_nationkey"],
                   how="inner")

    # pack (s_nat < 32, c_nat < 32, year < 4096) into one int64 key
    def pack_partial(t: pa.Table) -> pa.Table:
        sn = t["s_nationkey"].combine_chunks().cast(pa.int64()).to_numpy()
        cn = t["c_nationkey"].combine_chunks().cast(pa.int64()).to_numpy()
        yr = t["year"].combine_chunks().cast(pa.int64()).to_numpy()
        rev = t["rev_e4"].combine_chunks().cast(pa.int64()).to_numpy()
        # the pack's bit-width assumptions must fail loudly, never
        # silently merge unrelated groups (ADVICE r4)
        if len(sn) and (sn.max() >= 32 or cn.max() >= 32
                        or sn.min() < 0 or cn.min() < 0
                        or yr.max() >= 4096 or yr.min() < 0):
            raise ValueError(
                "nation_pair_volume pack overflow: nationkey must be in "
                f"[0,32) and year in [0,4096); got nation max "
                f"{max(sn.max(), cn.max())}, year range "
                f"[{yr.min()}, {yr.max()}]")
        mask = sn != cn
        key = (sn[mask] << 17) | (cn[mask] << 12) | yr[mask]
        uniq, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, rev[mask])
        return pa.table({"pk": pa.array(uniq.astype(np.int64)),
                         "r": pa.array(s, pa.int64())})

    folded = (j3.map_batches(pack_partial, batch_format="pyarrow")
              .groupby("pk").aggregate(Sum("r", alias_name="revenue_e4")))

    names = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nref = ray.put(dict(zip(names.n_nationkey.astype(int), names.n_name)))

    def unpack(t: pa.Table) -> pa.Table:
        nm = ray.get(nref)
        pk = t["pk"].combine_chunks().cast(pa.int64()).to_numpy()
        sn = pk >> 17
        cn = (pk >> 12) & 31
        yr = pk & 4095
        return pa.table({
            "supp_nation": pa.array([nm[int(v)] for v in sn], pa.string()),
            "cust_nation": pa.array([nm[int(v)] for v in cn], pa.string()),
            "year": pa.array(yr.astype(np.int64), pa.int64()),
            "revenue_e4": t["revenue_e4"].combine_chunks().cast(pa.int64())})

    return folded.map_batches(unpack, batch_format="pyarrow")


def nation_pair_volume_sql() -> str:
    return """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS year,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS revenue_e4
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
WHERE s.s_nationkey <> c.c_nationkey
GROUP BY 1, 2, 3"""
