"""Local replica of the driver's Ray-vs-DuckDB correctness compare.

For each ``queries()`` entry with a matching ``oracle_sql()`` entry: run
the Ray callable and the SQL over the same sf dir, normalize (columns
sorted by name, rows sorted by all columns), and compare exact values.
Usable standalone (``python tests/oracle_check.py [sf_dir]``) and from
pytest.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ray_result, sql: str, sf_dir: str) -> list[str]:
    """Returns a list of problem strings (empty = match)."""
    problems: list[str] = []
    got = normalize(to_pandas(ray_result))
    con = duckdb_con(sf_dir)
    want = normalize(con.sql(sql).df())
    con.close()
    if list(got.columns) != list(want.columns):
        problems.append(f"{name}: columns {list(got.columns)} != {list(want.columns)}")
        return problems
    if len(got) != len(want):
        problems.append(f"{name}: rows {len(got)} != {len(want)}")
        return problems
    for c in got.columns:
        a, b = got[c], want[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            # STRICT: the driver hashes values, so floats must match
            # bit-for-bit (NaN==NaN allowed)
            av, bv = a.astype(float).to_numpy(), b.astype(float).to_numpy()
            ok = bool(np.all((av == bv) | (np.isnan(av) & np.isnan(bv))))
        else:
            ok = a.equals(b.astype(a.dtype)) if a.dtype != b.dtype else a.equals(b)
        if not ok:
            mism = (a != b) if a.dtype == b.dtype else None
            detail = ""
            if mism is not None and mism.any():
                i = int(np.argmax(mism.to_numpy()))
                detail = f" first diff row {i}: {a.iloc[i]!r} != {b.iloc[i]!r}"
            problems.append(f"{name}: column {c} values differ{detail}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pdf_extraction_ray.config import tune_data_context
    tune_data_context()
    import __ray_entry__ as entrymod
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles:
            res = fn(sf_dir)
            df = to_pandas(res)
            print(f"  {name}: rows-only ({len(df)} rows)")
            continue
        problems = compare(name, fn(sf_dir), oracles[name], sf_dir)
        if problems:
            n_fail += 1
            for p in problems:
                print("FAIL", p)
        else:
            print(f"  {name}: OK")
    ray.shutdown()
    print("failures:", n_fail)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
