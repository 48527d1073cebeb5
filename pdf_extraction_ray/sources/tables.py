"""Shared test-table reader: parquet read + schema-metadata strip.

pandas-written parquet carries schema metadata that makes ``pa.Schema``
unhashable inside Ray's shuffle schema dedup ("Failed to hash the
schemas" warnings) — every read boundary drops it here, in ONE place
(this helper was duplicated across the pipelines modules).
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd


def strip_meta(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None)


def read_table(sf_dir: str, name: str,
               columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
                           columns=columns).map_batches(
        strip_meta, batch_format="pyarrow")
